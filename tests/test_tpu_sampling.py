"""Hardware distribution locks for the loop-kernel sampler.

The whole-generation megakernel (ops/pallas_decode_loop.py) samples with
the on-core TPU PRNG (Gumbel-max + sort-free top-k/nucleus masking) — a
different random STREAM than jax.random.categorical but the same
distribution. The set-equality of the masking is CPU-tested
(test_pallas_decode.py::test_sample_mask_*); these tests close the loop
on real hardware with a chi-square lock of kernel draws against the
ANALYTIC masked-softmax probabilities (SURVEY.md §7 hard-part 5: lock
tests on distributions, not sequences). Skipped off-TPU: pltpu.prng_*
has no interpret-mode lowering.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="on-core PRNG needs real TPU (no interpret lowering)")


def _model_and_logits():
    from musicgeneration_tpu.models import MusicTransformer

    model = MusicTransformer(vocab_size=309, num_layers=2, d_model=256,
                             max_seq=128, dtype=jnp.bfloat16,
                             decode_impl="fused")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    return model, params


def _kernel_draws(model, params, sampling, n_rows=64, n_seeds=64):
    """First-token draws from identical prompts: every row samples iid
    from the same last-logits row -> n_rows * n_seeds draws."""
    from musicgeneration_tpu.decode import DecodeParams, generate

    dp = DecodeParams(max_len=32, steps=1, sampling=sampling,
                      use_loop_kernel=True)
    prompt = jnp.ones((n_rows, 4), jnp.int32)
    draws = []
    for s in range(n_seeds):
        toks = np.asarray(generate(model, params, prompt,
                                   jax.random.PRNGKey(s), dp))
        draws.append(toks[:, 0])
    return np.concatenate(draws)


def _analytic_probs(model, params, sampling):
    from musicgeneration_tpu.ops.pallas_decode_loop import sample_mask

    prompt = jnp.ones((1, 4), jnp.int32)
    logits = model.apply({"params": params}, prompt)[0, -1]
    scaled = logits[None, :] / max(sampling.temperature, 1e-6)
    if sampling.top_k or sampling.top_p < 1.0:
        scaled = sample_mask(scaled, sampling.top_k, sampling.top_p)
    return np.asarray(jax.nn.softmax(scaled, axis=-1))[0]


def _chi_square_ok(draws, probs, n_bins=20, crit=52.0):
    """One-sample chi-square of draws vs analytic probs: top n_bins
    tokens as individual bins + one tail bin. crit ~ chi2(df=20,
    alpha=1e-4) — loose enough to be deterministic-ish in practice,
    tight enough to catch a broken sampler (wrong masking or a biased
    PRNG shifts the statistic by orders of magnitude)."""
    n = len(draws)
    top = np.argsort(probs)[::-1][:n_bins]
    counts = np.array([(draws == t).sum() for t in top], np.float64)
    expect = probs[top] * n
    tail_c = n - counts.sum()
    tail_e = max(n - expect.sum(), 1e-9)
    keep = expect > 5
    chi2 = (((counts[keep] - expect[keep]) ** 2) / expect[keep]).sum()
    if tail_e > 5:
        chi2 += (tail_c - tail_e) ** 2 / tail_e
    # every sampled token must be in the allowed support
    support = probs > 0
    assert support[draws].all(), "kernel sampled outside the masked set"
    return chi2


def test_loop_kernel_temperature_distribution():
    from musicgeneration_tpu.decode.sampling import SamplingParams

    model, params = _model_and_logits()
    sp = SamplingParams(temperature=1.0)
    draws = _kernel_draws(model, params, sp)
    probs = _analytic_probs(model, params, sp)
    chi2 = _chi_square_ok(draws, probs)
    assert chi2 < 52.0, f"chi2={chi2:.1f} vs analytic softmax"


def test_loop_kernel_topk_distribution():
    from musicgeneration_tpu.decode.sampling import SamplingParams

    model, params = _model_and_logits()
    sp = SamplingParams(temperature=0.9, top_k=20)
    draws = _kernel_draws(model, params, sp)
    probs = _analytic_probs(model, params, sp)
    chi2 = _chi_square_ok(draws, probs)
    assert chi2 < 52.0, f"chi2={chi2:.1f} vs analytic top-k softmax"


def test_loop_kernel_nucleus_distribution():
    from musicgeneration_tpu.decode.sampling import SamplingParams

    model, params = _model_and_logits()
    sp = SamplingParams(temperature=1.0, top_p=0.9)
    draws = _kernel_draws(model, params, sp)
    probs = _analytic_probs(model, params, sp)
    chi2 = _chi_square_ok(draws, probs)
    assert chi2 < 52.0, f"chi2={chi2:.1f} vs analytic nucleus softmax"
