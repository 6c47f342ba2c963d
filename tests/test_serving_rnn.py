"""RNN continuous-batching engine (decode/serving_rnn.py).

Greedy serving must be token-identical to per-request `generate` runs:
a slot's admission prefill scans the same decode_step the dedicated
engine scans, from the same latent-seeded state, and the per-row
control cursor reproduces expand_controls exactly — so any scheduling
(staggered admissions, slot reuse, drain-tail resizes) leaves tokens
unchanged.

Like tests/test_serving.py, the vs-generate comparisons run at
DIFFERENT batch widths (pool vs B=1), where f32 reassociation drifts
logits ~1e-6-relative; seeds avoid near-ties in the untrained models'
greedy argmax.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.decode import DecodeParams, generate
from musicgeneration_tpu.decode.sampling import SamplingParams
from musicgeneration_tpu.decode.serving_rnn import RNNContinuousBatcher
from musicgeneration_tpu.models import (EventMelodyRNN, MelodyRNN,
                                        PerformanceRNN)

GREEDY = SamplingParams(greedy=True)
EDIM = 32


def _event_model():
    m = EventMelodyRNN(event_dim=EDIM, init_dim=8, hidden_dim=32,
                       num_layers=2)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)),
                    jnp.zeros((4, 1), jnp.int32))["params"]
    return m, params


def _perf_model():
    m = PerformanceRNN(event_dim=EDIM, control_dim=4, init_dim=8,
                       hidden_dim=32, num_layers=2)
    params = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 8)),
                    jnp.zeros((4, 1), jnp.int32))["params"]
    return m, params


def _melody_model(attn=5):
    m = MelodyRNN(hidden_dim=16, num_layers=2, attn_length=attn)
    params = m.init(jax.random.PRNGKey(2),
                    jnp.zeros((4, 1), jnp.int32))["params"]
    return m, params


def _reference(m, params, prompt, max_new, init=None, control=None):
    """Dedicated B=1 engine.generate run (the oracle every serving
    output must match token-for-token under greedy)."""
    cache0 = None
    if init is not None:
        cache0 = m.apply({"params": params}, 1, 0,
                         jnp.asarray(init, jnp.float32)[None],
                         method=m.init_cache)
    controls = None
    if control is not None:
        c = np.asarray(control, np.float32)
        if c.ndim == 1:
            c = c[None]
        controls = jnp.asarray(c)[:, None, :]     # [S, 1, C]
    dp = DecodeParams(max_len=prompt.size + max_new, steps=max_new,
                      sampling=GREEDY)
    return np.asarray(generate(m, params, jnp.asarray(prompt)[None],
                               jax.random.PRNGKey(1), dp,
                               controls=controls, cache0=cache0))[0]


def _requests(seed, n, max_p=12, max_new=40, init_dim=None):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        p = rng.randint(0, EDIM - 1,
                        size=rng.randint(1, max_p)).astype(np.int32)
        init = (rng.randn(init_dim).astype(np.float32)
                if init_dim else None)
        out.append((p, int(rng.randint(8, max_new)), init))
    return out


def test_event_rnn_staggered_matches_generate():
    """Latent-seeded requests staggered into a 3-slot pool: every
    greedy output equals its dedicated generate run."""
    m, params = _event_model()
    reqs = _requests(7, 6, init_dim=m.init_dim)
    cb = RNNContinuousBatcher(m, params, slots=3, seg_len=8,
                              prompt_bucket=8, sampling=GREEDY)
    rids = [cb.submit(p, mn, init=z) for p, mn, z in reqs[:3]]
    cb.step()                       # mid-flight arrivals
    rids += [cb.submit(p, mn, init=z) for p, mn, z in reqs[3:]]
    outs = cb.run()
    for (p, mn, z), rid in zip(reqs, rids):
        assert outs[rid].shape == (mn,)
        np.testing.assert_array_equal(
            outs[rid], _reference(m, params, p, mn, init=z))


def test_performance_rnn_mixed_control_pool():
    """Conditioned and unconditioned requests share one pool (the
    per-row control_default mask): each matches its dedicated run —
    single controls repeat, sequences consume per global step and hold
    their last row (expand_controls clamp), None rows take the default
    path."""
    m, params = _perf_model()
    rng = np.random.RandomState(11)
    reqs = []
    for j in range(5):
        p = rng.randint(0, EDIM - 1,
                        size=rng.randint(1, 10)).astype(np.int32)
        mn = int(rng.randint(8, 30))
        z = rng.randn(m.init_dim).astype(np.float32)
        if j % 3 == 0:
            ctrl = None
        elif j % 3 == 1:
            ctrl = rng.rand(m.control_dim).astype(np.float32)  # repeats
        else:
            # shorter than p + steps: the clamp must match the engine's
            ctrl = rng.rand(p.size + mn // 2,
                            m.control_dim).astype(np.float32)
        reqs.append((p, mn, z, ctrl))
    cb = RNNContinuousBatcher(m, params, slots=2, seg_len=8,
                              prompt_bucket=8, ctrl_window=64,
                              sampling=GREEDY)
    rids = [cb.submit(p, mn, init=z, control=c) for p, mn, z, c in reqs]
    outs = cb.run()
    for (p, mn, z, c), rid in zip(reqs, rids):
        np.testing.assert_array_equal(
            outs[rid], _reference(m, params, p, mn, init=z, control=c),
            err_msg=f"rid={rid} ctrl={'none' if c is None else c.shape}")


@pytest.mark.parametrize("attn", [0, 5])
def test_melody_rnn_slot_reuse_matches_generate(attn):
    """MelodyRNN (basic and attention variants): slot reuse across
    staggered retirements — the per-row attn_n window mask keeps a
    late-admitted slot's attention identical to its dedicated run."""
    m, params = _melody_model(attn)
    rng = np.random.RandomState(5)
    reqs = [(rng.randint(0, 129, size=rng.randint(1, 10))
             .astype(np.int32), int(rng.randint(8, 30)))
            for _ in range(5)]
    cb = RNNContinuousBatcher(m, params, slots=2, seg_len=8,
                              prompt_bucket=8, sampling=GREEDY)
    rids = [cb.submit(p, mn) for p, mn in reqs]
    outs = cb.run()
    for (p, mn), rid in zip(reqs, rids):
        np.testing.assert_array_equal(
            outs[rid], _reference(m, params, p, mn))


def test_rnn_serving_eos_and_stats():
    """eos_id truncates at first occurrence and frees the slot; the
    scheduler counters add up (shared SlotScheduler accounting)."""
    m, params = _event_model()
    prompt = np.arange(1, 7, dtype=np.int32)
    z = np.ones((m.init_dim,), np.float32)
    ref = _reference(m, params, prompt, 40, init=z)
    eos = int(ref[11])
    first = int(np.argmax(ref == eos))
    cb = RNNContinuousBatcher(m, params, slots=1, seg_len=8,
                              prompt_bucket=8, sampling=GREEDY)
    rid = cb.submit(prompt, 40, eos_id=eos, init=z)
    rid2 = cb.submit(prompt[:3], 12, init=z)
    outs = cb.run()
    np.testing.assert_array_equal(outs[rid], ref[:first])
    assert outs[rid2].shape == (12,)
    st = cb.stats()
    assert st["committed_tokens"] == first + 12
    assert st["admitted"] == 2
    assert 0 < st["occupancy"] <= 1
    assert "compactions" not in st          # RNN slots never compact


def test_rnn_serving_drain_tail_shrink_exact():
    """Drain-tail pool shrinking (shared resize over the hidden-state
    pytree incl. control windows): outputs unchanged, pool ends
    narrow, grow-back admits new work."""
    m, params = _perf_model()
    rng = np.random.RandomState(9)
    z = rng.randn(m.init_dim).astype(np.float32)
    ctrl = rng.rand(m.control_dim).astype(np.float32)
    long = np.arange(1, 8, dtype=np.int32)
    short = np.arange(1, 4, dtype=np.int32)
    cb = RNNContinuousBatcher(m, params, slots=4, seg_len=8,
                              prompt_bucket=8, min_slots=1,
                              sampling=GREEDY)
    rid_a = cb.submit(long, 80, init=z, control=ctrl)
    rid_b = cb.submit(short, 12, init=z)
    outs = cb.run()
    assert cb.b < 4
    rid_c = cb.submit(short, 16, init=z, control=ctrl)
    outs2 = cb.run()
    np.testing.assert_array_equal(
        outs[rid_a], _reference(m, params, long, 80, init=z,
                                control=ctrl))
    np.testing.assert_array_equal(
        outs[rid_b], _reference(m, params, short, 12, init=z))
    np.testing.assert_array_equal(
        outs2[rid_c], _reference(m, params, short, 16, init=z,
                                 control=ctrl))


def test_rnn_serving_per_row_mixed_sampling():
    """per_row_sampling pool mixing greedy and stochastic requests:
    greedy rows stay token-identical to dedicated runs while sharing
    segments with sampled neighbours."""
    m, params = _event_model()
    cb = RNNContinuousBatcher(
        m, params, slots=3, seg_len=8, prompt_bucket=8, min_slots=1,
        per_row_sampling=True,
        sampling=SamplingParams(temperature=0.9, top_k=10),
        rng=jax.random.PRNGKey(3))
    reqs = _requests(13, 6, init_dim=m.init_dim)
    rids, greedy_set = [], set()
    for j, (p, mn, z) in enumerate(reqs):
        if j % 2 == 0:
            rid = cb.submit(p, mn, init=z, sampling=GREEDY)
            greedy_set.add(rid)
        else:
            rid = cb.submit(p, mn, init=z)
        rids.append(rid)
    outs = cb.run()
    for (p, mn, z), rid in zip(reqs, rids):
        assert outs[rid].shape == (mn,)
        if rid in greedy_set:
            np.testing.assert_array_equal(
                outs[rid], _reference(m, params, p, mn, init=z))
        else:
            assert outs[rid].min() >= 0 and outs[rid].max() < EDIM


def test_rnn_serving_warm_and_streaming():
    """warm() compiles without leaking its request; on_finalize streams
    results mid-drain; latency summary covers finalized requests."""
    m, params = _event_model()
    got = {}
    cb = RNNContinuousBatcher(
        m, params, slots=2, seg_len=8, prompt_bucket=8, min_slots=1,
        sampling=GREEDY,
        on_finalize=lambda rid, toks: got.__setitem__(rid, toks.copy()))
    cb.warm(widths=True)
    assert not got
    assert cb.b == 2
    reqs = _requests(17, 3, init_dim=m.init_dim)
    rids = [cb.submit(p, mn, init=z) for p, mn, z in reqs]
    outs = cb.run()
    assert set(got) == set(rids)
    for rid in rids:
        np.testing.assert_array_equal(got[rid], outs[rid])
    lat = cb.latency_summary()
    assert lat["n"] == 3
    assert lat["e2e_p50"] <= lat["e2e_p95"]


def test_rnn_serving_cancel():
    """cancel(): queued requests drop with empty results; an active
    request delivers its prefix; survivors are unaffected."""
    m, params = _event_model()
    reqs = _requests(21, 2, max_new=60, init_dim=m.init_dim)
    cb = RNNContinuousBatcher(m, params, slots=2, seg_len=8,
                              prompt_bucket=8, depth=1, sampling=GREEDY)
    rids = [cb.submit(p, mn, init=z) for p, mn, z in reqs]
    rid_q = cb.submit(np.asarray([3, 5], np.int32), 16)
    assert cb.cancel(rid_q) is True
    assert cb.cancel(rid_q) is False
    for _ in range(2):
        cb.step()
    assert cb.cancel(rids[0]) is True
    outs = cb.run()
    assert outs[rid_q].size == 0
    ref0 = _reference(m, params, reqs[0][0], reqs[0][1],
                      init=reqs[0][2])
    got0 = outs[rids[0]]
    assert 0 < got0.size <= reqs[0][1]
    np.testing.assert_array_equal(got0, ref0[:got0.size])
    np.testing.assert_array_equal(
        outs[rids[1]], _reference(m, params, reqs[1][0], reqs[1][1],
                                  init=reqs[1][2]))


def test_rnn_serving_validation():
    m, params = _event_model()
    cb = RNNContinuousBatcher(m, params, slots=2, prompt_bucket=8)
    with pytest.raises(ValueError, match="no control"):
        cb.submit(np.asarray([1], np.int32), 8, control=np.ones(4))
    with pytest.raises(ValueError, match="init must be"):
        cb.submit(np.asarray([1], np.int32), 8, init=np.ones(3))
    with pytest.raises(ValueError, match="empty"):
        cb.submit(np.zeros(0, np.int32), 8)
    with pytest.raises(TypeError, match="unexpected"):
        cb.submit(np.asarray([1], np.int32), 8, bogus=1)
    mp, pp = _perf_model()
    cbp = RNNContinuousBatcher(mp, pp, slots=2, prompt_bucket=8,
                               ctrl_window=16)
    with pytest.raises(ValueError, match="ctrl_window"):
        cbp.submit(np.asarray([1], np.int32), 8,
                   control=np.ones((32, mp.control_dim)))
    mm, pm = _melody_model(0)
    cbm = RNNContinuousBatcher(mm, pm, slots=2, prompt_bucket=8)
    with pytest.raises(ValueError, match="no init"):
        cbm.submit(np.asarray([1], np.int32), 8, init=np.ones(8))


@pytest.mark.slow
def test_rnn_serving_fuzz_parity():
    """Property stress across random geometry x request mix for the
    control-bearing family (the most stateful path)."""
    rng = np.random.RandomState(123)
    m, params = _perf_model()
    cb = RNNContinuousBatcher(
        m, params, slots=int(rng.choice([2, 3])),
        seg_len=int(rng.choice([4, 8])), prompt_bucket=8,
        min_slots=1, depth=int(rng.choice([1, 2, 4])),
        ctrl_window=64, sampling=GREEDY)
    reqs, rids = [], []

    def submit_one():
        p = rng.randint(0, EDIM - 1,
                        size=rng.randint(1, 14)).astype(np.int32)
        mn = int(rng.randint(5, 30))
        z = rng.randn(m.init_dim).astype(np.float32)
        r = rng.rand()
        ctrl = (None if r < 0.34 else
                rng.rand(m.control_dim).astype(np.float32) if r < 0.67
                else rng.rand(rng.randint(1, 40),
                              m.control_dim).astype(np.float32))
        eos = None
        if rng.rand() < 0.25:
            ref = _reference(m, params, p, mn, init=z, control=ctrl)
            eos = int(ref[rng.randint(len(ref))])
        reqs.append((p, mn, z, ctrl, eos))
        rids.append(cb.submit(p, mn, eos_id=eos, init=z, control=ctrl))

    for _ in range(rng.randint(2, 5)):
        submit_one()
    outs = {}
    for _ in range(3):
        outs.update(cb.run())
        if len(reqs) < 10:
            for _ in range(rng.randint(1, 3)):
                submit_one()
    outs.update(cb.run())
    for (p, mn, z, ctrl, eos), rid in zip(reqs, rids):
        ref = _reference(m, params, p, mn, init=z, control=ctrl)
        if eos is not None and eos in list(ref):
            ref = ref[:list(ref).index(eos)]
        np.testing.assert_array_equal(
            outs[rid], ref,
            err_msg=f"rid={rid} p={p.size} mn={mn} eos={eos}")


def test_rnn_serving_boost_greedy_parity():
    """boost=4: long eos-free requests decode through fused
    4*seg_len-step launches once the queue drains; greedy outputs are
    token-identical to the boost=1 pool and to dedicated generate runs
    (the boosted scan is the same op stream, just fewer dispatches)."""
    m, params = _event_model()
    reqs = _requests(21, 4, max_p=10, max_new=90, init_dim=m.init_dim)
    outs = {}
    segs = {}
    for boost in (1, 4):
        cb = RNNContinuousBatcher(m, params, slots=2, seg_len=8,
                                  prompt_bucket=8, min_slots=2,
                                  boost=boost, sampling=GREEDY)
        cb.warm()
        rids = [cb.submit(p, mn, init=z) for p, mn, z in reqs]
        res = cb.run()
        outs[boost] = {i: res[rid] for i, rid in enumerate(rids)}
        segs[boost] = cb.stats()["segments"]
    assert segs[4] < segs[1]          # boost actually fused launches
    for i, (p, mn, z) in enumerate(reqs):
        np.testing.assert_array_equal(outs[1][i], outs[4][i])
        np.testing.assert_array_equal(
            outs[4][i], _reference(m, params, p, mn, init=z))


def test_rnn_serving_boost_defers_to_eos_and_queue():
    """An eos-bearing or queued request pins dispatches back to
    seg_len (boost must not delay retirement or admission)."""
    m, params = _event_model()
    cb = RNNContinuousBatcher(m, params, slots=1, seg_len=8,
                              prompt_bucket=8, min_slots=1, boost=4,
                              sampling=GREEDY)
    p = np.asarray([3, 5, 7], np.int32)
    cb.submit(p, 64, eos_id=EDIM + 5)   # unreachable eos, but set
    cb.run()
    assert cb.stats()["slot_steps"] == cb.stats()["segments"] * 8


def test_boosted_seg_base_cases():
    """_boosted_seg returns the BASE seg_len on an all-free pool (so
    warm(widths=True)'s probe compiles the plain program per width —
    the boosted variant is _warm_after_drain's job) and with requests
    queued; the boosted length only with active eos-free slots that
    all have >= boost*seg_len steps left."""
    m, params = _event_model()
    cb = RNNContinuousBatcher(m, params, slots=2, seg_len=8,
                              prompt_bucket=8, min_slots=2, boost=4,
                              sampling=GREEDY)
    assert cb._boosted_seg() == 8            # all free (warm probe)
    r = cb.submit(np.asarray([3, 5], np.int32), 100)
    assert cb._boosted_seg() == 8            # queued, not yet admitted
    cb._try_admit()
    assert cb._boosted_seg() == 32           # active, 100 >= 32 left
    cb.submit(np.asarray([4], np.int32), 8)
    assert cb._boosted_seg() == 8            # queue non-empty again
    cb.run()
