"""Sliding-window serving (decode/serving.py `window=` requests).

A sliding request's max_new is unbounded by the serve window: the slot
re-primes from its last `window` tokens whenever the context would
exceed 2*window. The per-request context evolution is exactly
`engine.generate_sliding`'s (ctx seed = prompt[-w:], re-prime at 2w
with the last w), so when the re-prime points are segment-aligned
(first chunk 2w - p and the following w-sized chunks all multiples of
seg_len) greedy serving is token-identical to the dedicated sliding
run. Same cross-width f32-tie caveat as tests/test_serving.py — the
seeds here avoid near-tied argmaxes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.decode import DecodeParams, generate
from musicgeneration_tpu.decode.engine import generate_sliding
from musicgeneration_tpu.decode.sampling import SamplingParams
from musicgeneration_tpu.decode.serving import ContinuousBatcher
from musicgeneration_tpu.models import MusicTransformer

VOCAB = 64
GREEDY = SamplingParams(greedy=True)

# segment-aligned sliding geometry: seg 32, window 96, prompt 64 ->
# generate_sliding chunks are 2w-p = 128, then w = 96 (4 and 3 segments)
SEG, WINDOW, PROMPT = 32, 96, 64


def _model(impl="fused", max_seq=256):
    m = MusicTransformer(decode_impl=impl, vocab_size=VOCAB,
                         num_layers=2, d_model=128, max_seq=max_seq)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 8), jnp.int32))["params"]
    return m, params


def _prompt(seed, p=PROMPT):
    return np.random.RandomState(seed).randint(
        0, VOCAB - 1, size=p).astype(np.int32)


def _sliding_reference(m, params, prompt, steps):
    return np.asarray(generate_sliding(
        m, params, jnp.asarray(prompt)[None], jax.random.PRNGKey(1),
        steps, window=WINDOW, sampling=GREEDY))[0]


def test_sliding_matches_generate_sliding():
    """One sliding request in a width-1 pool: token-identical to the
    dedicated generate_sliding run (same batch width, several
    re-primes, max_new far beyond the serve window)."""
    m, params = _model()
    prompt = _prompt(11)
    max_new = 320                      # > max_seq - p: needs sliding
    cb = ContinuousBatcher(m, params, slots=1, seg_len=SEG,
                           min_slots=1, sampling=GREEDY)
    rid = cb.submit(prompt, max_new, window=WINDOW)
    outs = cb.run()
    assert outs[rid].shape == (max_new,)
    assert cb.stats()["reprimes"] >= 2
    np.testing.assert_array_equal(
        outs[rid], _sliding_reference(m, params, prompt, max_new))


def test_sliding_mixed_pool_matches_references():
    """Sliding and bounded requests share a pool: the sliding row
    matches generate_sliding, the bounded rows match dedicated
    generate runs — re-primes don't disturb neighbours."""
    m, params = _model()
    cb = ContinuousBatcher(m, params, slots=3, seg_len=SEG,
                           min_slots=3, sampling=GREEDY)
    sp = _prompt(5)
    srid = cb.submit(sp, 288, window=WINDOW)
    rng = np.random.RandomState(17)
    normals = []
    for k in range(4):
        p = rng.randint(0, VOCAB - 1, size=rng.randint(4, 40)).astype(
            np.int32)
        mn = int(rng.randint(16, 60))
        normals.append((cb.submit(p, mn), p, mn))
    outs = cb.run()
    np.testing.assert_array_equal(
        outs[srid], _sliding_reference(m, params, sp, 288))
    for rid, p, mn in normals:
        dp = DecodeParams(max_len=p.size + mn, steps=mn, sampling=GREEDY)
        ref = np.asarray(generate(m, params, jnp.asarray(p)[None],
                                  jax.random.PRNGKey(1), dp))[0]
        np.testing.assert_array_equal(outs[rid], ref)


def test_sliding_long_prompt_trimmed_to_window():
    """A prompt longer than the window seeds the context with its last
    `window` tokens — generate_sliding's ctx = prompt[-w:]."""
    m, params = _model()
    long_prompt = _prompt(23, p=180)   # > window
    cb = ContinuousBatcher(m, params, slots=1, seg_len=SEG,
                           min_slots=1, sampling=GREEDY)
    rid = cb.submit(long_prompt, 224, window=WINDOW)
    outs = cb.run()
    np.testing.assert_array_equal(
        outs[rid], _sliding_reference(m, params, long_prompt, 224))


def test_sliding_validation():
    m, params = _model()
    cb = ContinuousBatcher(m, params, slots=2, seg_len=SEG,
                           sampling=GREEDY)
    with pytest.raises(ValueError, match="seg_len"):
        cb.submit(_prompt(0), 64, window=SEG - 8)
    with pytest.raises(ValueError, match="serve window"):
        cb.submit(_prompt(0), 64, window=120)   # 2*120+32 > 256
    # bounded requests keep the hard serve-window check (and point at
    # the sliding option)
    with pytest.raises(ValueError, match="window="):
        cb.submit(_prompt(0), 4096)
    with pytest.raises(TypeError):
        cb.submit(_prompt(0), 64, windw=96)


def test_sliding_cancel_mid_flight():
    """Cancelling an active sliding request frees the slot and delivers
    the tokens collected so far; its sliding bookkeeping is dropped."""
    m, params = _model()
    cb = ContinuousBatcher(m, params, slots=1, seg_len=SEG,
                           min_slots=1, sampling=GREEDY)
    rid = cb.submit(_prompt(3), 320, window=WINDOW)
    cb.step()
    cb.step()
    assert cb.cancel(rid)
    outs = cb.run()
    assert outs[rid].shape[0] <= 320
    assert not cb._sliding_prompts


def test_sliding_warm_compiles_reprime():
    """warm(window=) drives the probe through a re-prime so the
    re-prime admission program compiles before real traffic."""
    m, params = _model()
    cb = ContinuousBatcher(m, params, slots=1, seg_len=SEG,
                           min_slots=1, sampling=GREEDY)
    cb.warm(PROMPT, window=WINDOW)
    assert cb.stats()["reprimes"] >= 1
    assert not cb.pending and not any(s.active for s in cb.slots)


def test_cp_sliding_smoke():
    """The CP engine inherits sliding: a window request produces the
    full row count, and the pre-first-re-prime prefix (context still
    identical to the bounded run) matches dedicated generate_cp."""
    from musicgeneration_tpu.decode.cp_generate import generate_cp
    from musicgeneration_tpu.decode.serving_cp import CPContinuousBatcher
    from musicgeneration_tpu.models import CPTransformer
    from musicgeneration_tpu.tokenizers import cp

    m = CPTransformer(num_layers=2, d_model=64, max_seq=256,
                      dropout_rate=0.0)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 8, 8), jnp.int32))["params"]
    rng = np.random.RandomState(9)
    fdims = cp.field_dims()
    rows = np.stack([rng.randint(0, fd, (16,)) for fd in fdims],
                    axis=-1).astype(np.int32)
    cb = CPContinuousBatcher(m, params, slots=1, seg_len=16,
                             min_slots=1, prompt_bucket=16,
                             sampling=GREEDY)
    rid = cb.submit(rows, 224, window=64)      # 2*64+16 <= 256
    outs = cb.run()
    assert outs[rid].shape == (224, 8)
    assert cb.stats()["reprimes"] >= 1
    # first chunk (2w - p = 112 rows) decodes with the same context as
    # the bounded run
    ref = np.asarray(generate_cp(m, params, jnp.asarray(rows)[None],
                                 jax.random.PRNGKey(1), 112,
                                 max_len=128, greedy=True))[0]
    np.testing.assert_array_equal(outs[rid][:112], ref)
