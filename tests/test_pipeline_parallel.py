"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over the
'pipe' mesh axis on the 8-virtual-device CPU mesh.

Locks: (1) pipelined forward logits equal the plain model's forward
bit-for-bit under transplanted params (pp=4 and dp2 x pp4, lp=1 and
lp=2); (2) the pipelined TRAIN STEP (make_train_step apply_fn=...)
reproduces the plain trainer's loss/grad-norm sequence; (3) dropout
mode runs and stays finite; (4) geometry errors are friendly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.models import MusicTransformer
from musicgeneration_tpu.models.music_transformer import (
    stack_layer_params,
)
from musicgeneration_tpu.parallel import (
    make_mesh,
    make_pipeline_apply,
    pipeline_param_shardings,
    shard_batch,
)
from musicgeneration_tpu.train.trainer import (
    TrainerConfig,
    create_train_state,
    make_train_step,
)

VOCAB = 37
L = 16
D = 64


def _model(num_layers, dropout=0.0):
    return MusicTransformer(vocab_size=VOCAB, num_layers=num_layers,
                            d_model=D, max_seq=L,
                            dropout_rate=dropout)


def _params(model, rng=0):
    x = jnp.zeros((2, L), jnp.int32)
    return model.init(jax.random.PRNGKey(rng), x)["params"]


def _tokens(rng, batch):
    return jax.random.randint(jax.random.PRNGKey(rng), (batch, L),
                              0, VOCAB - 1)


@pytest.mark.parametrize("num_layers,pp", [(4, 4), (8, 4), (4, 2)])
def test_forward_equality(num_layers, pp):
    model = _model(num_layers)
    params = _params(model)
    mesh = make_mesh(dp=1, pp=pp,
                     devices=jax.devices()[: pp])
    apply_fn = make_pipeline_apply(model, mesh, n_micro=4)
    x = _tokens(1, 8)
    ref = model.apply({"params": params}, x, deterministic=True)
    stacked = stack_layer_params(params, num_layers)
    got = apply_fn(stacked, x)
    # microbatching changes the matmul batch shape -> ~1e-6 f32 noise
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_forward_equality_dp_pp():
    model = _model(4)
    params = _params(model)
    mesh = make_mesh(dp=2, pp=4, devices=jax.devices())
    apply_fn = make_pipeline_apply(model, mesh, n_micro=2)
    x = _tokens(2, 8)  # microbatch 4, shards 2-way over 'data'
    ref = model.apply({"params": params}, x, deterministic=True)
    stacked = stack_layer_params(params, 4)
    stacked = jax.device_put(stacked,
                             pipeline_param_shardings(mesh, stacked))
    xs = shard_batch(mesh, x)
    got = jax.jit(apply_fn)(stacked, xs)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-6, atol=2e-6)


def test_forward_equality_no_pad_in_input():
    """pad_in_input=False (cli.train's dense-window setting) must give
    the same pipeline forward bit-for-bit as the default flag on
    pad-free batches — the stage layers see key_pad=None and a
    causal-only mask."""
    model = _model(4)
    params = _params(model)
    model_np = MusicTransformer(vocab_size=VOCAB, num_layers=4,
                                d_model=D, max_seq=L,
                                pad_in_input=False)
    mesh = make_mesh(dp=1, pp=4, devices=jax.devices()[:4])
    x = _tokens(5, 8)
    stacked = stack_layer_params(params, 4)
    ref = make_pipeline_apply(model, mesh, n_micro=4)(stacked, x)
    got = make_pipeline_apply(model_np, mesh, n_micro=4)(stacked, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_single_microbatch_degenerate():
    model = _model(4)
    params = _params(model)
    mesh = make_mesh(dp=1, pp=4, devices=jax.devices()[:4])
    apply_fn = make_pipeline_apply(model, mesh, n_micro=1)
    x = _tokens(3, 4)
    ref = model.apply({"params": params}, x, deterministic=True)
    got = apply_fn(stack_layer_params(params, 4), x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_train_step_matches_plain():
    """Pipelined train step reproduces the plain trainer's loss and
    grad-norm sequence (dropout 0 so the streams coincide)."""
    model = _model(4)
    cfg = TrainerConfig(vocab_size=VOCAB, d_model=D, pad_id=VOCAB - 1)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   jnp.zeros((2, L), jnp.int32))
    mesh = make_mesh(dp=2, pp=4, devices=jax.devices())
    apply_fn = make_pipeline_apply(model, mesh, n_micro=2)

    def pipe_apply(params, x, rng):
        return apply_fn(params, x, rng=None)  # dropout 0: deterministic

    plain_step = jax.jit(make_train_step(model, tx, cfg))
    pipe_step = jax.jit(make_train_step(model, tx, cfg,
                                        apply_fn=pipe_apply))
    pstate = state.replace(
        params=stack_layer_params(state.params, 4),
        opt_state=tx.init(stack_layer_params(state.params, 4)))
    pstate = pstate.replace(
        params=jax.device_put(
            pstate.params, pipeline_param_shardings(mesh, pstate.params)))

    for i in range(3):
        x = _tokens(10 + i, 8)
        y = jnp.roll(x, -1, axis=1)
        state, m_ref = plain_step(state, x, y)
        xs, ys = shard_batch(mesh, (x, y))
        pstate, m_pipe = pipe_step(pstate, xs, ys)
        np.testing.assert_allclose(float(m_ref["loss"]),
                                   float(m_pipe["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m_ref["grad_norm"]),
                                   float(m_pipe["grad_norm"]),
                                   rtol=1e-4)


def test_dropout_mode_runs():
    model = _model(4, dropout=0.1)
    params = stack_layer_params(_params(model), 4)
    mesh = make_mesh(dp=1, pp=4, devices=jax.devices()[:4])
    apply_fn = make_pipeline_apply(model, mesh, n_micro=2)
    x = _tokens(4, 4)
    out = apply_fn(params, x, rng=jax.random.PRNGKey(9))
    assert bool(jnp.isfinite(out).all())
    # and differs from the deterministic forward (dropout active)
    det = apply_fn(params, x)
    assert not np.array_equal(np.asarray(out), np.asarray(det))


def test_dropout_decorrelated_across_data_shards(monkeypatch):
    """Two IDENTICAL examples on different data shards must not draw
    bit-identical LAYER dropout masks: the key enters the shard_map
    replicated (in-spec P()), so pipeline.py folds the data-axis index
    into the per-(tick, stage, layer) keys — without the fold both
    shards drew the same mask (correlated dropout). The embedding
    dropout runs OUTSIDE the shard_map over the full batch (per-row
    masks already); it is stubbed out so the check isolates the
    in-pipeline keys."""
    from musicgeneration_tpu.parallel import pipeline as pl
    monkeypatch.setattr(pl, "_flax_dropout", lambda x, rate, rng: x)
    model = _model(2, dropout=0.5)
    params = stack_layer_params(_params(model), 2)
    mesh = make_mesh(dp=2, pp=2, devices=jax.devices()[:4])
    apply_fn = make_pipeline_apply(model, mesh, n_micro=1)
    row = np.asarray(_tokens(4, 1))
    x = jnp.asarray(np.tile(row, (2, 1)))       # identical examples
    out = np.asarray(apply_fn(params, x, rng=jax.random.PRNGKey(9)))
    assert not np.array_equal(out[0], out[1]), (
        "data shards drew bit-identical dropout masks")
    # deterministic path: identical rows do stay identical
    det = np.asarray(apply_fn(params, x))
    np.testing.assert_array_equal(det[0], det[1])


def test_geometry_errors():
    model = _model(4)
    mesh = make_mesh(dp=1, pp=4, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="not divisible"):
        make_pipeline_apply(_model(3), mesh, n_micro=2)
    apply_fn = make_pipeline_apply(model, mesh, n_micro=3)
    params = stack_layer_params(_params(model), 4)
    with pytest.raises(ValueError, match="n_micro"):
        apply_fn(params, _tokens(5, 8))
    with pytest.raises(ValueError, match="layers_scan"):
        make_pipeline_apply(model, mesh, n_micro=1)(
            _params(model), _tokens(5, 4))
