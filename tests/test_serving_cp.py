"""CP continuous-batching engine (decode/serving_cp.py).

Greedy serving must be ROW-identical to dedicated `generate_cp` runs:
the CP decode_step threads the same ragged start bounds as the flat
transformer, so staggered admissions, compaction and drain-tail
resizes leave rows unchanged. Same cross-width f32 caveat as
tests/test_serving.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.decode.cp_generate import generate_cp
from musicgeneration_tpu.decode.sampling import SamplingParams
from musicgeneration_tpu.decode.serving_cp import CPContinuousBatcher
from musicgeneration_tpu.models import CPTransformer
from musicgeneration_tpu.tokenizers import cp

GREEDY = SamplingParams(greedy=True)


@pytest.fixture(scope="module")
def model():
    m = CPTransformer(num_layers=2, d_model=64, max_seq=256,
                      dropout_rate=0.0)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 8, 8), jnp.int32))["params"]
    return m, params


def _rows(rng, p):
    fdims = cp.field_dims()
    return np.stack([rng.randint(0, fd, (p,)) for fd in fdims],
                    axis=-1).astype(np.int32)


def _reference(m, params, rows, steps):
    return np.asarray(generate_cp(
        m, params, jnp.asarray(rows)[None], jax.random.PRNGKey(1),
        steps, max_len=rows.shape[0] + steps, greedy=True))[0]


def test_cp_serving_staggered_matches_generate(model):
    """Staggered admissions into a 2-slot pool: every request's greedy
    rows equal its dedicated generate_cp run."""
    m, params = model
    rng = np.random.RandomState(3)
    reqs = [(_rows(rng, rng.randint(1, 12)), int(rng.randint(8, 40)))
            for _ in range(5)]
    cb = CPContinuousBatcher(m, params, slots=2, seg_len=8,
                             prompt_bucket=16, sampling=GREEDY)
    rids = [cb.submit(r, mn) for r, mn in reqs[:2]]
    cb.step()
    rids += [cb.submit(r, mn) for r, mn in reqs[2:]]
    outs = cb.run()
    for (r, mn), rid in zip(reqs, rids):
        assert outs[rid].shape == (mn, 8)
        np.testing.assert_array_equal(outs[rid],
                                      _reference(m, params, r, mn))


def test_cp_serving_compaction_exact(model):
    """A cache half the request volume forces roll-compactions; rows
    stay identical (the ragged start bound rides the shared shift)."""
    m, params = model
    rng = np.random.RandomState(7)
    reqs = [(_rows(rng, rng.randint(1, 10)), int(rng.randint(20, 40)))
            for _ in range(6)]
    cb = CPContinuousBatcher(m, params, slots=2, seg_len=8,
                             cache_len=64, prompt_bucket=16,
                             sampling=GREEDY, depth=3)
    rids = [cb.submit(r, mn) for r, mn in reqs]
    outs = cb.run()
    assert cb.t <= cb.cache_len
    assert cb.stats()["compactions"] >= 1
    for (r, mn), rid in zip(reqs, rids):
        np.testing.assert_array_equal(outs[rid],
                                      _reference(m, params, r, mn))


def test_cp_serving_eos_family_row(model):
    """eos_id matches the FAMILY column: the emitted rows cut at the
    first row whose family equals it."""
    m, params = model
    rng = np.random.RandomState(11)
    r = _rows(rng, 6)
    ref = _reference(m, params, r, 40)
    fam = int(ref[9, 0])
    first = int(np.argmax(ref[:, 0] == fam))
    cb = CPContinuousBatcher(m, params, slots=1, seg_len=8,
                             prompt_bucket=16, sampling=GREEDY)
    rid = cb.submit(r, 40, eos_id=fam)
    outs = cb.run()
    np.testing.assert_array_equal(outs[rid], ref[:first])


def test_cp_serving_shrink_and_warm(model):
    """Drain-tail shrinking + warm(widths=True) over [B, 8] row state;
    outputs unchanged and the pool ends narrow."""
    m, params = model
    rng = np.random.RandomState(13)
    cb = CPContinuousBatcher(m, params, slots=4, seg_len=8,
                             prompt_bucket=16, min_slots=1,
                             sampling=GREEDY)
    cb.warm(widths=True)
    assert cb.b == 4
    long_r = _rows(rng, 8)
    short_r = _rows(rng, 3)
    rid_a = cb.submit(long_r, 64)
    rid_b = cb.submit(short_r, 12)
    outs = cb.run()
    assert cb.b < 4
    np.testing.assert_array_equal(outs[rid_a],
                                  _reference(m, params, long_r, 64))
    np.testing.assert_array_equal(outs[rid_b],
                                  _reference(m, params, short_r, 12))


def test_cp_serving_sampled_rows_masked(model):
    """Stochastic serving: every emitted row respects the type-first
    family masking (fields not owned by the family sit at ignore ids)."""
    m, params = model
    rng = np.random.RandomState(17)
    cb = CPContinuousBatcher(
        m, params, slots=2, seg_len=8, prompt_bucket=16,
        sampling=SamplingParams(temperature=0.9),
        rng=jax.random.PRNGKey(5))
    rids = [cb.submit(_rows(rng, 4), 24) for _ in range(3)]
    outs = cb.run()
    ign = cp.ignore_ids()
    for rid in rids:
        rows = outs[rid]
        assert rows.shape == (24, 8)
        note = rows[:, 0] == cp.FAMILY_NOTE
        for f in (1, 2, 3, 4):       # metric fields ignored on notes
            assert (rows[note, f] == ign[f]).all()
        for f in (5, 6, 7):          # note fields ignored elsewhere
            assert (rows[~note, f] == ign[f]).all()


def test_cp_serving_validation(model):
    m, params = model
    with pytest.raises(ValueError, match="top-k/top-p"):
        CPContinuousBatcher(m, params,
                            sampling=SamplingParams(top_k=8))
    cb = CPContinuousBatcher(m, params, slots=2, prompt_bucket=16)
    with pytest.raises(ValueError, match="compound rows"):
        cb.submit(np.ones(5, np.int32), 8)
    with pytest.raises(ValueError, match="per-request sampling"):
        cb.submit(np.zeros((2, 8), np.int32), 8, sampling=GREEDY)


def test_cp_queued_cancel_keeps_row_shape(model):
    """Empty CP results (queued cancel, eos on the first row) keep the
    documented [n, 8] row contract instead of collapsing to (0,)."""
    m, params = model
    rng = np.random.RandomState(11)
    cb = CPContinuousBatcher(m, params, slots=2, seg_len=8,
                             prompt_bucket=16, sampling=GREEDY)
    rid = cb.submit(_rows(rng, 4), 16)
    assert cb.cancel(rid) is True
    assert cb.done[rid].shape == (0, 8)
