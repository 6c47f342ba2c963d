"""Data-parallel decode over the 8-virtual-device CPU mesh
(decode/engine.py generate_dp — VERDICT round-2 #2: the serving-side
counterpart of the trainer's dp axis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.decode import DecodeParams, generate
from musicgeneration_tpu.decode.engine import generate_dp
from musicgeneration_tpu.decode.sampling import SamplingParams
from musicgeneration_tpu.models import MusicTransformer
from musicgeneration_tpu.models.event_rnn import EventMelodyRNN
from musicgeneration_tpu.models.performance_rnn import PerformanceRNN
from musicgeneration_tpu.parallel.mesh import make_mesh


def _mt():
    model = MusicTransformer(vocab_size=64, num_layers=2, d_model=128,
                             max_seq=64, dropout_rate=0.0)
    x = jnp.zeros((2, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params


def test_dp_greedy_token_identical_to_single_device():
    model, params = _mt()
    mesh = make_mesh(dp=8, tp=1, sp=1)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (8, 8), 0, 60)
    dp = DecodeParams(max_len=32, steps=12,
                      sampling=SamplingParams(greedy=True))
    rng = jax.random.PRNGKey(2)
    single = np.asarray(generate(model, params, prompt, rng, dp))
    sharded = np.asarray(
        generate_dp(model, params, prompt, rng, dp, mesh))
    np.testing.assert_array_equal(sharded, single)


def test_dp_greedy_multirow_shards():
    """16 rows over 8 devices: 2 rows per shard."""
    model, params = _mt()
    mesh = make_mesh(dp=8, tp=1, sp=1)
    prompt = jax.random.randint(jax.random.PRNGKey(3), (16, 8), 0, 60)
    dp = DecodeParams(max_len=32, steps=8,
                      sampling=SamplingParams(greedy=True))
    rng = jax.random.PRNGKey(4)
    single = np.asarray(generate(model, params, prompt, rng, dp))
    sharded = np.asarray(
        generate_dp(model, params, prompt, rng, dp, mesh))
    np.testing.assert_array_equal(sharded, single)


def test_dp_dp4_mesh_subset():
    """dp smaller than the device count (dp=4 on the 8-device host)."""
    model, params = _mt()
    mesh = make_mesh(dp=4, tp=1, sp=1, devices=jax.devices()[:4])
    prompt = jax.random.randint(jax.random.PRNGKey(5), (4, 8), 0, 60)
    dp = DecodeParams(max_len=32, steps=8,
                      sampling=SamplingParams(greedy=True))
    rng = jax.random.PRNGKey(6)
    single = np.asarray(generate(model, params, prompt, rng, dp))
    sharded = np.asarray(
        generate_dp(model, params, prompt, rng, dp, mesh))
    np.testing.assert_array_equal(sharded, single)


def test_dp_sampled_deterministic_and_valid():
    """Sampled runs: per-shard rng streams — deterministic across calls,
    tokens in range (distribution parity with the single-device sampler
    is by construction: same sample_logits per shard)."""
    model, params = _mt()
    mesh = make_mesh(dp=8, tp=1, sp=1)
    prompt = jax.random.randint(jax.random.PRNGKey(7), (8, 8), 0, 60)
    dp = DecodeParams(max_len=32, steps=12,
                      sampling=SamplingParams(temperature=1.0))
    rng = jax.random.PRNGKey(8)
    a = np.asarray(generate_dp(model, params, prompt, rng, dp, mesh))
    b = np.asarray(generate_dp(model, params, prompt, rng, dp, mesh))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (8, 12)
    assert (a >= 0).all() and (a < 64).all()
    # different shards see different streams: rows shouldn't all match
    assert not all(np.array_equal(a[0], a[i]) for i in range(1, 8))


def test_dp_bucketed_prompt_len():
    """Padded-prompt bucketing (dynamic prompt_len) under the mesh."""
    model, params = _mt()
    mesh = make_mesh(dp=8, tp=1, sp=1)
    true_len = 5
    prompt = np.full((8, 8), model.pad_id, np.int32)
    prompt[:, :true_len] = np.asarray(
        jax.random.randint(jax.random.PRNGKey(9), (8, true_len), 0, 60))
    dp = DecodeParams(max_len=32, steps=8,
                      sampling=SamplingParams(greedy=True))
    rng = jax.random.PRNGKey(10)
    pl = jnp.int32(true_len)
    single = np.asarray(generate(model, params, jnp.asarray(prompt), rng,
                                 dp, prompt_len=pl))
    sharded = np.asarray(generate_dp(model, params, jnp.asarray(prompt),
                                     rng, dp, mesh, prompt_len=pl))
    np.testing.assert_array_equal(sharded, single)


def test_dp_rnn_cache0_and_controls():
    """RNN families: latent-derived cache0 (EventMelodyRNN) and per-step
    controls (PerformanceRNN) shard their batch axes."""
    mesh = make_mesh(dp=8, tp=1, sp=1)
    rng = jax.random.PRNGKey(11)

    model = EventMelodyRNN(event_dim=32, init_dim=4, hidden_dim=16,
                           num_layers=2, dropout_rate=0.0)
    init = jax.random.normal(jax.random.PRNGKey(12), (8, 4))
    params = model.init(jax.random.PRNGKey(13), init,
                        jnp.zeros((3, 8), jnp.int32))["params"]
    cache0 = model.apply({"params": params}, 8, 0, init,
                         method=model.init_cache)
    prompt = jnp.full((8, 1), model.primary_event, jnp.int32)
    dp = DecodeParams(max_len=16, steps=10,
                      sampling=SamplingParams(greedy=True))
    single = np.asarray(generate(model, params, prompt, rng, dp,
                                 cache0=cache0))
    sharded = np.asarray(generate_dp(model, params, prompt, rng, dp,
                                     mesh, cache0=cache0))
    np.testing.assert_array_equal(sharded, single)

    pmodel = PerformanceRNN(event_dim=32, control_dim=4, init_dim=4,
                            hidden_dim=16, num_layers=2,
                            dropout_rate=0.0)
    pparams = pmodel.init(jax.random.PRNGKey(14), init,
                          jnp.zeros((3, 8), jnp.int32))["params"]
    controls = jax.random.uniform(jax.random.PRNGKey(15), (1, 8, 4))
    pcache = pmodel.apply({"params": pparams}, 8, 0, init,
                          method=pmodel.init_cache)
    single = np.asarray(generate(pmodel, pparams, prompt, rng, dp,
                                 controls=controls, cache0=pcache))
    sharded = np.asarray(generate_dp(pmodel, pparams, prompt, rng, dp,
                                     mesh, controls=controls,
                                     cache0=pcache))
    np.testing.assert_array_equal(sharded, single)


def test_dp_rejects_indivisible_batch():
    model, params = _mt()
    mesh = make_mesh(dp=8, tp=1, sp=1)
    prompt = jnp.zeros((6, 4), jnp.int32)
    dp = DecodeParams(max_len=16, steps=4,
                      sampling=SamplingParams(greedy=True))
    with pytest.raises(ValueError, match="not divisible"):
        generate_dp(model, params, prompt, jax.random.PRNGKey(0), dp,
                    mesh)


@pytest.mark.slow
def test_dp_cp_generate_greedy_identical():
    """CP compound-row generation sharded over 'data'
    (decode/cp_generate.py mesh=): greedy rows identical."""
    from musicgeneration_tpu.decode.cp_generate import generate_cp
    from musicgeneration_tpu.models.cp_transformer import CPTransformer

    model = CPTransformer(num_layers=1, d_model=64, max_seq=32,
                          dropout_rate=0.0)
    prompt = jnp.zeros((8, 3, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt)["params"]
    mesh = make_mesh(dp=8, tp=1, sp=1)
    rng = jax.random.PRNGKey(1)
    single = generate_cp(model, params, prompt, rng, steps=6,
                         greedy=True)
    sharded = generate_cp(model, params, prompt, rng, steps=6,
                          greedy=True, mesh=mesh)
    np.testing.assert_array_equal(sharded, single)


@pytest.mark.slow
def test_dp_popmag_arrangement_greedy_identical():
    """PoPMAG bar-scan arrangement generation sharded over 'data'
    (decode/popmag_generate.generate_arrangement_dp): greedy outputs
    identical to the unsharded call."""
    from musicgeneration_tpu.decode.popmag_generate import (
        generate_arrangement,
        generate_arrangement_dp,
    )
    from musicgeneration_tpu.models.popmag import PoPMAGRNN

    model = PoPMAGRNN(embed_dim=16, hidden_dim=16, num_layers=1,
                      init_dim=4, dropout_rate=0.0)
    b, bars, s_len = 8, 2, 6
    rng = np.random.default_rng(91)
    src = jnp.asarray(rng.integers(0, 485, size=(b, bars, s_len, 7)))
    src_len = jnp.asarray(rng.integers(1, s_len + 1, size=(b, bars)))
    init = jax.random.normal(jax.random.PRNGKey(0), (b, 4))
    params = model.init(jax.random.PRNGKey(1), init, src, src_len,
                        src, src_len)["params"]
    key = jax.random.PRNGKey(2)
    t1, v1 = generate_arrangement(model, params, init, src, src_len,
                                  key, n_target_bar=bars, max_steps=12)
    mesh = make_mesh(dp=8, tp=1, sp=1)
    t2, v2 = generate_arrangement_dp(model, params, init, src, src_len,
                                     key, n_target_bar=bars, mesh=mesh,
                                     max_steps=12)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


# -- tensor-parallel decode (generate_tp) ---------------------------------

def test_tp_greedy_token_identical_to_single_device():
    """Heads sharded over 'model' (tp=2): bit-identical greedy tokens
    (the name-rule shardings re-replicate logits via XLA's psum)."""
    from musicgeneration_tpu.decode.engine import generate_tp
    model, params = _mt()  # d128 -> 2 heads
    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    prompt = jax.random.randint(jax.random.PRNGKey(11), (4, 8), 0, 60)
    dp = DecodeParams(max_len=32, steps=12,
                      sampling=SamplingParams(greedy=True))
    rng = jax.random.PRNGKey(12)
    single = np.asarray(generate(model, params, prompt, rng, dp))
    tp = np.asarray(generate_tp(model, params, prompt, rng, dp, mesh))
    np.testing.assert_array_equal(tp, single)


def test_tp_sampled_token_identical():
    """Sampled decode: logits are replicated after the psum so the SAME
    rng draws the SAME tokens as the single-device engine."""
    from musicgeneration_tpu.decode.engine import generate_tp
    model, params = _mt()
    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    prompt = jax.random.randint(jax.random.PRNGKey(13), (2, 8), 0, 60)
    dp = DecodeParams(max_len=32, steps=10,
                      sampling=SamplingParams(temperature=1.0, top_k=8))
    rng = jax.random.PRNGKey(14)
    single = np.asarray(generate(model, params, prompt, rng, dp))
    tp = np.asarray(generate_tp(model, params, prompt, rng, dp, mesh))
    np.testing.assert_array_equal(tp, single)


def test_tp_dp_composed():
    """dp4 x tp2 serving mesh: batch over 'data', heads over 'model'."""
    from musicgeneration_tpu.decode.engine import generate_tp
    model, params = _mt()
    mesh = make_mesh(dp=4, tp=2)
    prompt = jax.random.randint(jax.random.PRNGKey(15), (8, 8), 0, 60)
    dp = DecodeParams(max_len=32, steps=8,
                      sampling=SamplingParams(greedy=True))
    rng = jax.random.PRNGKey(16)
    single = np.asarray(generate(model, params, prompt, rng, dp))
    tp = np.asarray(generate_tp(model, params, prompt, rng, dp, mesh))
    np.testing.assert_array_equal(tp, single)


def test_tp_rejects_fused_and_bad_geometry():
    from musicgeneration_tpu.decode.engine import generate_tp
    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    dp = DecodeParams(max_len=32, steps=4,
                      sampling=SamplingParams(greedy=True))
    fused = MusicTransformer(vocab_size=64, num_layers=1, d_model=128,
                             max_seq=64, decode_impl="fused")
    x = jnp.zeros((2, 8), jnp.int32)
    params = fused.init(jax.random.PRNGKey(0), x)["params"]
    with pytest.raises(ValueError, match="xla"):
        generate_tp(fused, params, x, jax.random.PRNGKey(1), dp, mesh)
    model, params = _mt()
    mesh3 = make_mesh(dp=1, tp=4, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="num_heads"):
        generate_tp(model, params, x, jax.random.PRNGKey(1), dp, mesh3)
