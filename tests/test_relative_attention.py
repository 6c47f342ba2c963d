"""Numerical tests for relative global attention (SURVEY.md §4 test #3):
the skew-trick path and the KV-cache decode path must match a naive O(L^2)
gather oracle and each other."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.models import MusicTransformer
from musicgeneration_tpu.ops import relative_attention as ra


@pytest.fixture(scope="module")
def qkve():
    rng = np.random.RandomState(0)
    b, h, l, dh, max_seq = 2, 4, 48, 16, 64
    q = jnp.asarray(rng.randn(b, h, l, dh), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(b, h, l, dh), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(b, h, l, dh), jnp.float32) * 0.3
    e = jnp.asarray(rng.randn(max_seq, dh), jnp.float32) * 0.3
    return q, k, v, e


def test_skew_matches_naive_oracle(qkve):
    q, k, v, e = qkve
    l = q.shape[2]
    causal = jnp.triu(jnp.ones((l, l)), k=1)[None, None]
    out_skew = jax.jit(ra.relative_global_attention)(q, k, v, e, causal)
    out_naive = ra.naive_relative_attention_reference(q, k, v, e, True)
    np.testing.assert_allclose(np.asarray(out_skew), np.asarray(out_naive),
                               atol=1e-5, rtol=1e-5)


def test_decode_bias_matches_srel_row(qkve):
    q, _, _, e = qkve
    l = q.shape[2]
    ts = [0, 1, 7, l - 1]

    @jax.jit
    def compute(q, e):
        srel = ra.relative_logits(q, e)  # [B,H,L,L]
        biases = [ra.relative_decode_bias(q[:, :, t], e, jnp.int32(t), l)
                  for t in ts]
        return srel, biases

    srel, biases = compute(q, e)
    for t, bias in zip(ts, biases):
        # row t of Srel is only valid for j <= t
        np.testing.assert_allclose(
            np.asarray(bias[..., : t + 1]),
            np.asarray(srel[:, :, t, : t + 1]),
            atol=1e-5, rtol=1e-5,
        )


def test_sinusoid_matches_reference_formula():
    import math as m
    max_seq, d = 8, 6
    table = ra.sinusoid_position_encoding(max_seq, d)
    for pos in range(max_seq):
        for i in range(d):
            want = m.sin(
                pos * m.exp(-m.log(10000) * i / d)
                * m.exp(m.log(10000) / d * (i % 2)) + 0.5 * m.pi * (i % 2))
            assert table[pos, i] == pytest.approx(want, abs=1e-6)


class TestMusicTransformer:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = MusicTransformer(vocab_size=309, num_layers=2, d_model=128,
                                 max_seq=64)
        x = jnp.zeros((2, 32), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x)
        return model, params

    def test_forward_shapes(self, model_and_params):
        model, params = model_and_params
        x = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 308)
        logits = jax.jit(lambda p, x: model.apply(p, x))(params, x)
        assert logits.shape == (2, 32, 309)
        assert logits.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_decode_step_matches_full_forward(self, model_and_params):
        """KV-cached decode must reproduce the full forward's next-token
        logits exactly (same math, different schedule)."""
        model, params = model_and_params
        x = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 308)
        full = jax.jit(model.apply)(params, x)  # [B, 16, V]

        @jax.jit
        def run_stepped(params, x):
            cache = model.init_cache(batch=2, cache_len=32)

            def body(carry, tok):
                cache, t = carry
                logits, cache = model.apply(params, tok, cache, t,
                                            method=model.decode_step)
                return (cache, t + 1), logits

            _, logits = jax.lax.scan(body, (cache, jnp.int32(0)), x.T)
            return logits.transpose(1, 0, 2)

        stepped = run_stepped(params, x)  # [B, 16, V]
        np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                                   atol=2e-4, rtol=2e-4)

    def test_pad_mask_blocks_attention(self, model_and_params):
        """Changing tokens after a pad position must not change logits at
        positions before it (causality), and pad positions are masked as
        keys."""
        model, params = model_and_params
        x1 = jax.random.randint(jax.random.PRNGKey(3), (1, 16), 0, 308)
        x2 = x1.at[:, 10:].set(7)
        apply = jax.jit(model.apply)
        l1 = apply(params, x1)
        l2 = apply(params, x2)
        np.testing.assert_allclose(np.asarray(l1[:, :10]),
                                   np.asarray(l2[:, :10]),
                                   atol=1e-5, rtol=1e-5)
