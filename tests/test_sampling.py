"""sample_logits_batched row-parity locks (decode/sampling.py).

The per-row sampler must be ROW-FOR-ROW equal to the scalar-param path
at the same rng: `jax.random.categorical` draws per-element Gumbel
noise, so row i's outcome depends only on row i's masked logits and the
noise slice for row i — a mixed-param batch therefore decomposes into
per-row scalar runs. The parity must hold through every mask
interaction (top-k kth-value ties, top-p renormalizing over only the
top-k survivors, temperature, greedy bypass).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.decode.sampling import (
    SamplingParams, pack_sampling, sample_logits, sample_logits_batched,
    unpack_sampling)

PARAM_GRID = [
    SamplingParams(),                                    # plain categorical
    SamplingParams(greedy=True),
    SamplingParams(temperature=0.5),
    SamplingParams(temperature=1.7, top_k=5),
    SamplingParams(top_k=1),                             # degenerate argmax
    SamplingParams(top_k=1000),                          # k > V: keep all
    SamplingParams(top_p=0.3),
    SamplingParams(temperature=0.8, top_p=0.9),
    SamplingParams(top_k=12, top_p=0.5),                 # p over k survivors
    SamplingParams(temperature=0.2, top_k=3, top_p=0.95),
]


def _samp_rows(param_list):
    rows = np.asarray([pack_sampling(p) for p in param_list], np.int32)
    return unpack_sampling(*(jnp.asarray(rows[:, j]) for j in range(4)))


@pytest.mark.parametrize("v", [64, 309])
def test_batched_matches_scalar_mixed_rows(v):
    """A batch whose rows each carry a DIFFERENT param set: row i of the
    batched sampler equals row i of a whole-batch scalar run under
    params_i at the same rng."""
    b = len(PARAM_GRID)
    for seed in range(4):
        rng = jax.random.PRNGKey(seed)
        logits = jax.random.normal(
            jax.random.PRNGKey(100 + seed), (b, v)) * 3.0
        got = np.asarray(sample_logits_batched(
            rng, logits, _samp_rows(PARAM_GRID)))
        for i, p in enumerate(PARAM_GRID):
            want = np.asarray(sample_logits(rng, logits, p))
            assert got[i] == want[i], (seed, v, i, p)


def test_batched_matches_scalar_uniform():
    """All rows sharing one param set reproduces the scalar path's full
    output vector (the serving engine's uniform-pool equivalence)."""
    for p, seed in itertools.product(PARAM_GRID, range(2)):
        rng = jax.random.PRNGKey(seed)
        logits = jax.random.normal(jax.random.PRNGKey(7 + seed), (6, 309))
        got = sample_logits_batched(rng, logits, _samp_rows([p] * 6))
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(sample_logits(rng, logits, p)),
            err_msg=str(p))


def test_pack_unpack_roundtrip():
    p = SamplingParams(temperature=0.73, top_k=17, top_p=0.81,
                       greedy=False)
    rows = np.asarray([pack_sampling(p), pack_sampling(
        SamplingParams(greedy=True))], np.int32)
    d = unpack_sampling(*(jnp.asarray(rows[:, j]) for j in range(4)))
    assert float(d["temperature"][0]) == np.float32(0.73)
    assert int(d["top_k"][0]) == 17
    assert float(d["top_p"][0]) == np.float32(0.81)
    assert not bool(d["greedy"][0]) and bool(d["greedy"][1])


def test_batched_tie_heavy_logits():
    """Ties at the kth value and at the top-p cutoff take the same
    value-threshold branch in both paths (the masks compare against the
    kth/cutoff VALUE, not index)."""
    logits = jnp.asarray(np.repeat(
        np.arange(8, dtype=np.float32), 4)[None].repeat(3, 0))  # 4-way ties
    grid = [SamplingParams(top_k=6), SamplingParams(top_p=0.6),
            SamplingParams(top_k=5, top_p=0.4)]
    for seed in range(4):
        rng = jax.random.PRNGKey(seed)
        got = np.asarray(sample_logits_batched(rng, logits,
                                               _samp_rows(grid)))
        for i, p in enumerate(grid):
            assert got[i] == np.asarray(sample_logits(rng, logits, p))[i]
