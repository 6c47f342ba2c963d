"""Speculative decoding (decode/speculative.py): chunked verify-forward
exactness and draft/lookup generation parity with the plain engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.decode import (
    DecodeParams,
    SpecParams,
    generate,
    generate_speculative,
)
from musicgeneration_tpu.decode.sampling import SamplingParams
from musicgeneration_tpu.models import MusicTransformer

VOCAB = 48


def _model(decode_impl="auto", **kw):
    cfg = dict(vocab_size=VOCAB, num_layers=2, d_model=64, max_seq=128,
               decode_impl=decode_impl)
    cfg.update(kw)
    return MusicTransformer(**cfg)


def _init(model, seed=0, batch=2, length=8):
    x = jnp.zeros((batch, length), jnp.int32)
    return model.init(jax.random.PRNGKey(seed), x)["params"]


@pytest.mark.parametrize("decode_impl,kernel,c", [
    ("xla", False, 5),
    ("fused", False, 5),
    ("fused", True, 8),   # Pallas chunk kernel (interpret off-TPU)
])
def test_decode_chunk_matches_sequential_steps(decode_impl, kernel, c):
    """decode_chunk over C tokens == C sequential decode_steps,
    position by position (logits + written cache rows), in both cache
    layouts and through the fused chunk kernel."""
    model = _model(decode_impl)
    params = _init(model)
    b, p = 2, 8
    rng = np.random.RandomState(0)
    prompt = jnp.asarray(rng.randint(0, VOCAB - 1, (b, p)), jnp.int32)
    toks = jnp.asarray(rng.randint(0, VOCAB - 1, (b, c)), jnp.int32)

    _, cache = model.apply({"params": params}, prompt, 64,
                           method=model.prefill)
    # sequential oracle
    cache_seq = jax.tree.map(lambda x: x, cache)
    seq_logits = []
    t = jnp.int32(p)
    for i in range(c):
        lg, cache_seq = model.apply({"params": params}, toks[:, i],
                                    cache_seq, t + i,
                                    method=model.decode_step)
        seq_logits.append(lg)
    seq_logits = jnp.stack(seq_logits, axis=1)  # [B, C, V]

    chunk_logits, cache_chunk = model.apply(
        {"params": params}, toks, cache, jnp.int32(p), kernel,
        method=model.decode_chunk)
    np.testing.assert_allclose(np.asarray(chunk_logits),
                               np.asarray(seq_logits),
                               rtol=2e-4, atol=2e-4)
    # written cache rows p..p+c-1 agree (row axis differs per layout)
    row_axis = 2 if decode_impl == "fused" else 3
    for key in ("k", "v"):
        a = np.take(np.asarray(cache_chunk[key]),
                    np.arange(p, p + c), axis=row_axis)
        bb = np.take(np.asarray(cache_seq[key]),
                     np.arange(p, p + c), axis=row_axis)
        np.testing.assert_allclose(a, bb, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("grid", [True, "stream"])
def test_fused_decode_chunk_grid_modes_match_resident(grid):
    """The layer-grid and weight-streaming chunk-kernel variants agree
    with the resident mode (interpret; d=256 so the stream tiling
    divides)."""
    from musicgeneration_tpu.models.music_transformer import (
        _stacked_decode_weights,
    )
    from musicgeneration_tpu.ops.pallas_decode import fused_decode_chunk

    model = _model("fused", d_model=256, num_layers=2)
    params = _init(model)
    b, p, c = 1, 16, 8
    rng = np.random.RandomState(1)
    prompt = jnp.asarray(rng.randint(0, VOCAB - 1, (b, p)), jnp.int32)
    toks = jnp.asarray(rng.randint(0, VOCAB - 1, (b, c)), jnp.int32)
    _, cache = model.apply({"params": params}, prompt, 128,
                           method=model.prefill)
    bound = model.bind({"params": params})
    w_all, e_all = _stacked_decode_weights(bound.layers, model.dtype)
    h = bound.embedding(toks) * jnp.sqrt(jnp.float32(model.d_model))
    h = (h + jax.lax.dynamic_slice(
        jnp.asarray(bound.pos_table, model.dtype), (p, 0),
        (c, model.d_model))[None]).astype(model.dtype)
    args = (h, jnp.int32(p), e_all, w_all, cache["k"], cache["v"],
            model.num_heads)
    want, wk, wv = fused_decode_chunk(*args, chunk_c=c, interpret=True,
                                      grid=False)
    got, gk, gv = fused_decode_chunk(*args, chunk_c=c, interpret=True,
                                     grid=grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(wk),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("batch", [1, 3])
def test_lookup_greedy_token_identical(batch):
    """Draft-free prompt-lookup speculation, greedy: token-identical to
    the plain engine (exact-match verification keeps the target's own
    greedy chain regardless of proposal quality)."""
    model = _model()
    params = _init(model)
    # repetitive prompt -> some lookup acceptance; correctness must hold
    # either way
    base = np.tile(np.array([3, 7, 11, 7], np.int32), 6)
    prompt = jnp.asarray(np.stack([base + i for i in range(batch)]))
    dp = DecodeParams(max_len=96, steps=40,
                      sampling=SamplingParams(greedy=True))
    want = generate(model, params, prompt, jax.random.PRNGKey(1), dp)
    got, stats = generate_speculative(
        model, params, prompt, jax.random.PRNGKey(2), dp,
        spec=SpecParams(chunk=4, ngram=2), with_stats=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert stats["emitted"] >= dp.steps
    assert stats["iterations"] >= 1


def test_draft_greedy_token_identical_and_full_acceptance():
    """Greedy speculation with the TARGET as its own draft: every
    proposal must be accepted (mean_accepted == chunk-1) and the output
    must equal the plain engine's."""
    model = _model()
    params = _init(model)
    prompt = jnp.asarray(
        np.random.RandomState(3).randint(0, VOCAB - 1, (1, 12)),
        jnp.int32)
    dp = DecodeParams(max_len=96, steps=33,
                      sampling=SamplingParams(greedy=True))
    want = generate(model, params, prompt, jax.random.PRNGKey(1), dp)
    got, stats = generate_speculative(
        model, params, prompt, jax.random.PRNGKey(2), dp,
        draft_model=model, draft_params=params,
        spec=SpecParams(chunk=6), with_stats=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert stats["mean_accepted"] == pytest.approx(5.0)


def test_small_draft_greedy_token_identical():
    """A different (smaller, independently initialized) draft still
    yields the target's exact greedy sequence — only speed, never
    content, depends on the draft."""
    model = _model()
    params = _init(model)
    draft = _model(num_layers=1, d_model=32, head_dim=32)
    draft_params = _init(draft, seed=9)
    prompt = jnp.asarray(
        np.random.RandomState(5).randint(0, VOCAB - 1, (2, 10)),
        jnp.int32)
    dp = DecodeParams(max_len=96, steps=25,
                      sampling=SamplingParams(greedy=True))
    want = generate(model, params, prompt, jax.random.PRNGKey(1), dp)
    got = generate_speculative(
        model, params, prompt, jax.random.PRNGKey(2), dp,
        draft_model=draft, draft_params=draft_params,
        spec=SpecParams(chunk=4))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sampled_speculation_valid_and_plumbed():
    """Sampled speculation: tokens in range, stats consistent. (Not
    token-identical to the engine by design — same per-position
    conditionals, different rng consumption.)"""
    model = _model()
    params = _init(model)
    prompt = jnp.asarray(
        np.random.RandomState(7).randint(0, VOCAB - 1, (2, 8)),
        jnp.int32)
    dp = DecodeParams(
        max_len=96, steps=30,
        sampling=SamplingParams(temperature=0.9, top_k=12))
    toks, stats = generate_speculative(
        model, params, prompt, jax.random.PRNGKey(4), dp,
        spec=SpecParams(chunk=4, ngram=2), with_stats=True)
    arr = np.asarray(toks)
    assert arr.shape == (2, 30)
    assert arr.min() >= 0 and arr.max() < VOCAB
    # emitted = 1 (pre-loop) + iterations (bonus each) + accepted
    acc = stats["emitted"] - 1 - stats["iterations"]
    assert 0 <= acc <= stats["iterations"] * 3
    assert stats["mean_accepted"] == pytest.approx(
        acc / stats["iterations"])


def test_generate_rejects_beyond_max_seq():
    """Decoding past the positional/relative tables must raise, not
    clamp (on TPU the fused kernel faults the chip on out-of-range E
    rows)."""
    model = _model()
    params = _init(model)
    prompt = jnp.zeros((1, 16), jnp.int32)
    dp = DecodeParams(max_len=160, steps=120,
                      sampling=SamplingParams(greedy=True))
    with pytest.raises(ValueError, match="max_seq"):
        generate(model, params, prompt, jax.random.PRNGKey(0), dp)


def test_speculative_validation_errors():
    model = _model()
    params = _init(model)
    prompt = jnp.zeros((1, 8), jnp.int32)
    with pytest.raises(ValueError, match="chunk"):
        generate_speculative(
            model, params, prompt, jax.random.PRNGKey(0),
            DecodeParams(max_len=64, steps=8), spec=SpecParams(chunk=1))
    with pytest.raises(ValueError, match="max_seq"):
        generate_speculative(
            model, params, prompt, jax.random.PRNGKey(0),
            DecodeParams(max_len=128, steps=118),
            spec=SpecParams(chunk=8))
    with pytest.raises(ValueError, match="go together"):
        generate_speculative(
            model, params, prompt, jax.random.PRNGKey(0),
            DecodeParams(max_len=64, steps=8), draft_model=model)
