"""Continuous-batching serving engine (decode/serving.py).

Greedy serving must be token-identical to per-request `generate` runs:
right-aligned slots + the ragged start bound reproduce a dedicated
single-request decode bit-for-bit at the same batch width (the
test_pallas_decode ragged lock), so any scheduling — staggered
admissions, slot reuse, roll-compaction — leaves tokens unchanged.

The vs-generate comparisons run at DIFFERENT batch widths (pool vs
B=1), where f32 reassociation drifts logits ~1e-5-relative; the seeds
here avoid near-ties in the untrained model's greedy argmax (a 0.003
top-2 gap at one step of one rejected seed flipped — that is reference
numerics, not an engine defect)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.decode import DecodeParams, generate
from musicgeneration_tpu.decode.sampling import SamplingParams
from musicgeneration_tpu.decode.serving import ContinuousBatcher
from musicgeneration_tpu.models import MusicTransformer

VOCAB = 64
GREEDY = SamplingParams(greedy=True)


def _model(impl, max_seq=256):
    m = MusicTransformer(decode_impl=impl, vocab_size=VOCAB,
                         num_layers=2, d_model=128, max_seq=max_seq)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 8), jnp.int32))["params"]
    return m, params


def _requests(seed, n, max_p=30, max_new=80):
    rng = np.random.RandomState(seed)
    return [(rng.randint(0, VOCAB - 1,
                         size=rng.randint(1, max_p)).astype(np.int32),
             int(rng.randint(10, max_new)))
            for _ in range(n)]


def _reference(m, params, prompt, max_new):
    dp = DecodeParams(max_len=prompt.size + max_new, steps=max_new,
                      sampling=GREEDY)
    return np.asarray(generate(m, params, jnp.asarray(prompt)[None],
                               jax.random.PRNGKey(1), dp))[0]


def _assert_greedy_match(m, params, prompt, got, ref):
    """Token equality vs the dedicated run, tolerating fp TIES only.

    Cross-width greedy comparisons on an untrained model occasionally
    hit a knife-edge argmax: this environment's XLA:CPU binaries vary
    per process (AOT kernel-cache loads fail on machine-feature
    mismatches and fall back to fresh codegen), so reassociation noise
    can flip a near-tied argmax in EITHER program run-to-run. A flip at
    a genuine tie is reference numerics, not an engine defect — but a
    divergence at a decisive step (large top-2 gap) IS a bug. On
    mismatch: the prefix must agree, and the first divergent step must
    be a near-tie of the teacher-forced logits."""
    got, ref = np.asarray(got), np.asarray(ref)
    if np.array_equal(got, ref):
        return
    d = int(np.argmax(got != ref))
    np.testing.assert_array_equal(got[:d], ref[:d])
    full = np.concatenate([prompt, ref.astype(np.int32)])
    logits = np.asarray(m.apply({"params": params},
                                jnp.asarray(full)[None]))[0]
    lg = np.sort(logits[prompt.size - 1 + d])[::-1]
    gap = float(lg[0] - lg[1]) / max(abs(float(lg[0])), 1e-6)
    assert gap < 1e-3, (
        f"serving diverged from the dedicated run at step {d} with a "
        f"decisive top-2 logit gap ({gap:.5f} relative) — a real "
        "mismatch, not an fp tie")


def test_serving_matches_generate_staggered():
    """Staggered admissions into a 3-slot pool (fused kernels): every
    request's greedy output equals its dedicated generate run."""
    m, params = _model("fused")
    reqs = _requests(7, 7, max_p=40, max_new=50)
    cb = ContinuousBatcher(m, params, slots=3, seg_len=16,
                           sampling=GREEDY)
    rids = [cb.submit(p, mn) for p, mn in reqs[:4]]
    cb.step()                       # mid-flight arrivals
    rids += [cb.submit(p, mn) for p, mn in reqs[4:]]
    outs = cb.run()
    for (p, mn), rid in zip(reqs, rids):
        assert outs[rid].shape == (mn,)
        np.testing.assert_array_equal(outs[rid],
                                      _reference(m, params, p, mn))


@pytest.mark.parametrize(
    "impl",
    ["fused", pytest.param("xla", marks=pytest.mark.slow)])
def test_serving_compaction_exact(impl):
    """A cache 1/2 the request volume forces repeated roll-compactions
    (the clock wraps several times); tokens stay identical — shifting
    all row windows by a common amount changes neither relative
    distances nor per-row positions."""
    m, params = _model(impl)
    reqs = _requests(3, 10 if impl == "xla" else 7, max_p=20,
                     max_new=70)
    cb = ContinuousBatcher(m, params, slots=2, seg_len=8,
                           cache_len=128, sampling=GREEDY,
                           prompt_bucket=32, depth=3)
    rids = [cb.submit(p, mn) for p, mn in reqs]
    outs = cb.run()
    # compaction invariant: every DISPATCH saw t + seg <= cache_len,
    # so the clock never passes the cache end
    assert cb.t <= cb.cache_len
    for (p, mn), rid in zip(reqs, rids):
        np.testing.assert_array_equal(outs[rid],
                                      _reference(m, params, p, mn))


def test_serving_eos_truncation():
    """eos_id cuts the emitted stream at its first occurrence and frees
    the slot for the next pending request."""
    m, params = _model("fused")
    prompt = np.arange(1, 9, dtype=np.int32)
    ref = _reference(m, params, prompt, 40)
    eos = int(ref[13])
    first = int(np.argmax(ref == eos))
    cb = ContinuousBatcher(m, params, slots=1, seg_len=8,
                           sampling=GREEDY)
    rid = cb.submit(prompt, 40, eos_id=eos)
    rid2 = cb.submit(prompt[:4], 12)
    outs = cb.run()
    np.testing.assert_array_equal(outs[rid], ref[:first])
    assert outs[rid2].shape == (12,)


def test_serving_drain_tail_shrink_exact():
    """A wide pool over few long requests forces drain-tail shrinking
    (4 slots -> min 1 as actives retire) and a late submit forces the
    grow-back path; every output still equals its dedicated generate
    run, and the pool ends narrow."""
    m, params = _model("fused")
    cb = ContinuousBatcher(m, params, slots=4, seg_len=8, min_slots=1,
                           sampling=GREEDY)
    long = np.arange(1, 10, dtype=np.int32)
    short = np.arange(1, 5, dtype=np.int32)
    rid_a = cb.submit(long, 100)          # outlives everything
    rid_b = cb.submit(short, 16)
    outs = cb.run()                       # b retires early -> shrink
    assert cb.b < 4
    rid_c = cb.submit(short, 24)          # pending -> grow back
    outs2 = cb.run()
    np.testing.assert_array_equal(outs[rid_a],
                                  _reference(m, params, long, 100))
    np.testing.assert_array_equal(outs[rid_b],
                                  _reference(m, params, short, 16))
    np.testing.assert_array_equal(outs2[rid_c],
                                  _reference(m, params, short, 24))
    st = cb.stats()
    assert st["committed_tokens"] == 140


def test_serving_stats_accounting():
    """Scheduler counters: committed tokens match delivered outputs,
    active slot-steps bound dispatched slot-steps, occupancy in (0, 1],
    every request admitted exactly once."""
    m, params = _model("fused")
    cb = ContinuousBatcher(m, params, slots=2, seg_len=8,
                           sampling=GREEDY)
    reqs = _requests(5, 5, max_p=15, max_new=40)
    rids = [cb.submit(p, mn) for p, mn in reqs]
    outs = cb.run()
    st = cb.stats()
    assert st["committed_tokens"] == sum(len(outs[r]) for r in rids)
    assert st["admitted"] == len(reqs)
    assert 1 <= st["admit_calls"] <= len(reqs)
    assert st["slot_steps"] == st["segments"] * 8 * 2
    assert 0 < st["active_slot_steps"] <= st["slot_steps"]
    assert 0 < st["occupancy"] <= 1
    # active slot-steps cover at least the committed tokens
    assert st["active_slot_steps"] >= st["committed_tokens"]


@pytest.mark.parametrize("seed", [0, pytest.param(1, marks=pytest.mark.slow),
                                  pytest.param(2, marks=pytest.mark.slow)])
def test_serving_fuzz_parity(seed):
    """Property stress: random engine geometry (pool width, segment
    length, cache budget, shrink floor, pipeline depth) x random
    request mix (lengths, staggered submits, occasional eos) — every
    greedy output must equal its dedicated generate run. Exercises the
    compaction x shrink x eos x pipelining interplay that the targeted
    tests cover one axis at a time."""
    rng = np.random.RandomState(100 + seed)
    m, params = _model("fused", max_seq=256)
    cb = ContinuousBatcher(
        m, params,
        slots=int(rng.choice([2, 3, 4])),
        seg_len=int(rng.choice([4, 8, 16])),
        cache_len=int(rng.choice([128, 192, 256])),
        min_slots=1, depth=int(rng.choice([1, 2, 4])),
        sampling=GREEDY)
    reqs, rids = [], []

    def submit_one():
        p = rng.randint(1, VOCAB - 1,
                        size=rng.randint(1, 24)).astype(np.int32)
        mn = int(rng.randint(5, 50))
        eos = None
        if rng.rand() < 0.3:
            # a plausible eos: some token of the dedicated run
            ref = _reference(m, params, p, mn)
            eos = int(ref[rng.randint(len(ref))])
        reqs.append((p, mn, eos))
        rids.append(cb.submit(p, mn, eos_id=eos))

    for _ in range(rng.randint(2, 6)):
        submit_one()
    outs = {}
    while True:
        outs.update(cb.run())
        if len(outs) == len(reqs) and rng.rand() < 0.6:
            break
        if len(reqs) < 9:
            for _ in range(rng.randint(1, 3)):
                submit_one()
        else:
            break
    outs.update(cb.run())
    for (p, mn, eos), rid in zip(reqs, rids):
        ref = _reference(m, params, p, mn)
        if eos is not None and eos in list(ref):
            ref = ref[:list(ref).index(eos)]
        np.testing.assert_array_equal(
            outs[rid], ref,
            err_msg=f"seed={seed} rid={rid} p={p.size} mn={mn} eos={eos}")


def test_serving_rejects_oversized_request():
    m, params = _model("fused")
    cb = ContinuousBatcher(m, params, slots=2, seg_len=16)
    with pytest.raises(ValueError, match="serve window"):
        cb.submit(np.zeros(100, np.int32), 300)
    with pytest.raises(ValueError, match="empty"):
        cb.submit(np.zeros(0, np.int32), 8)


def test_serving_sampled_runs():
    """Stochastic sampling: lengths and slot reuse only (tokens are
    rng-stream-dependent by design)."""
    m, params = _model("fused")
    cb = ContinuousBatcher(
        m, params, slots=2, seg_len=8,
        sampling=SamplingParams(temperature=0.9, top_k=20),
        rng=jax.random.PRNGKey(5))
    reqs = _requests(11, 5, max_p=20, max_new=30)
    rids = [cb.submit(p, mn) for p, mn in reqs]
    outs = cb.run()
    for (p, mn), rid in zip(reqs, rids):
        assert outs[rid].shape == (mn,)
        assert outs[rid].min() >= 0 and outs[rid].max() < VOCAB


def test_serving_per_row_mixed_sampling():
    """per_row_sampling pool mixing greedy and stochastic requests
    (engine default = stochastic): the greedy rows stay token-identical
    to their dedicated generate runs while sharing segments with
    sampled neighbours, across slot reuse AND a drain-tail resize (the
    samp mirror rides the gather)."""
    m, params = _model("fused")
    cb = ContinuousBatcher(
        m, params, slots=3, seg_len=8, min_slots=1,
        per_row_sampling=True,
        sampling=SamplingParams(temperature=0.9, top_k=20),
        rng=jax.random.PRNGKey(3))
    reqs = _requests(13, 6, max_p=20, max_new=40)
    rids, greedy_set = [], set()
    for j, (p, mn) in enumerate(reqs):
        if j % 2 == 0:
            rid = cb.submit(p, mn, sampling=GREEDY)
            greedy_set.add(rid)
        else:
            rid = cb.submit(p, mn)       # engine default (stochastic)
        rids.append(rid)
    outs = cb.run()
    assert cb.b < 3                       # drain tail actually shrank
    for (p, mn), rid in zip(reqs, rids):
        assert outs[rid].shape == (mn,)
        if rid in greedy_set:
            _assert_greedy_match(m, params, p, outs[rid],
                                 _reference(m, params, p, mn))
        else:
            assert outs[rid].min() >= 0 and outs[rid].max() < VOCAB


def test_serving_per_row_uniform_matches_uniform_engine():
    """All rows sharing the default params: the per-row program is
    token-identical to the uniform-static program (same rng structure,
    same masked logits), for BOTH greedy and stochastic defaults."""
    m, params = _model("fused")
    for sp in (GREEDY, SamplingParams(temperature=0.8, top_k=16)):
        reqs = _requests(17, 4, max_p=15, max_new=25)
        outs = {}
        for per_row in (False, True):
            cb = ContinuousBatcher(m, params, slots=2, seg_len=8,
                                   sampling=sp, per_row_sampling=per_row,
                                   rng=jax.random.PRNGKey(9))
            rids = [cb.submit(p, mn) for p, mn in reqs]
            got = cb.run()
            outs[per_row] = [got[r] for r in rids]
        for a, b in zip(outs[False], outs[True]):
            np.testing.assert_array_equal(a, b)


def test_serving_per_row_requires_flag():
    m, params = _model("fused")
    cb = ContinuousBatcher(m, params, slots=2)
    with pytest.raises(ValueError, match="per_row_sampling"):
        cb.submit(np.arange(1, 5, dtype=np.int32), 8, sampling=GREEDY)


def test_serving_streaming_delivery_and_latency():
    """on_finalize fires once per request, mid-drain (short requests
    deliver while long ones are still decoding), with the same array
    run() later returns; warm()'s throwaway request is suppressed.
    Per-request times are monotone submit <= admit <= done and the
    summary aggregates every finalized request."""
    m, params = _model("fused")
    got = {}
    order = []

    def cb_fn(rid, toks):
        got[rid] = toks.copy()
        order.append(rid)

    cb = ContinuousBatcher(m, params, slots=2, seg_len=8,
                           sampling=GREEDY, on_finalize=cb_fn)
    cb.warm()
    assert not got                        # warm request suppressed
    short = np.arange(1, 5, dtype=np.int32)
    long = np.arange(1, 9, dtype=np.int32)
    rid_s = cb.submit(short, 8)
    rid_l = cb.submit(long, 80)
    outs = cb.run()
    assert set(got) == {rid_s, rid_l}
    assert order[0] == rid_s              # short finalized first
    for rid in (rid_s, rid_l):
        np.testing.assert_array_equal(got[rid], outs[rid])
        t = cb.times[rid]
        assert t["submit"] <= t["admit"] <= t["done"]
    lat = cb.latency_summary()
    assert lat["n"] == 2
    assert 0 <= lat["wait_p50"] <= lat["e2e_p95"]
    assert lat["e2e_p50"] <= lat["e2e_p95"]


def test_serving_long_prompt_waits_for_clock():
    """A prompt longer than the current clock queues until the clock
    advances past it (admission needs p-1 <= t), then completes."""
    m, params = _model("fused")
    cb = ContinuousBatcher(m, params, slots=2, seg_len=8,
                           sampling=GREEDY)
    short = np.arange(1, 4, dtype=np.int32)
    rid_a = cb.submit(short, 30)
    cb.step()          # clock now ~8; long prompt must wait
    long = np.arange(1, 60, dtype=np.int32) % (VOCAB - 2)
    long = long.astype(np.int32)
    rid_b = cb.submit(long, 20)
    outs = cb.run()
    np.testing.assert_array_equal(outs[rid_a],
                                  _reference(m, params, short, 30))
    np.testing.assert_array_equal(outs[rid_b],
                                  _reference(m, params, long, 20))


def test_serving_cancel_pending_and_active():
    """cancel(): a queued request drops with an empty result; an active
    request frees its slot and delivers the tokens collected so far;
    unknown rids return False; survivors are unaffected (token-equal to
    dedicated generate)."""
    m, params = _model("xla")
    cb = ContinuousBatcher(m, params, slots=2, sampling=GREEDY,
                           seg_len=8, cache_len=256, depth=1)
    rng = np.random.RandomState(21)
    reqs = [(rng.randint(0, VOCAB - 1, size=rng.randint(4, 12))
             .astype(np.int32), 64) for _ in range(2)]
    rids = [cb.submit(p, n) for p, n in reqs]
    # a third request queues behind the full pool, then is cancelled
    extra_p = np.asarray([3, 5, 7], np.int32)
    rid_q = cb.submit(extra_p, 16)
    assert cb.cancel(rid_q) is True
    assert cb.cancel(rid_q) is False          # already finished
    assert cb.cancel(10_000) is False         # unknown
    # run a few segments, then cancel one ACTIVE request mid-flight
    for _ in range(3):
        cb.step()
    assert cb.cancel(rids[0]) is True
    out = cb.run()
    assert out[rid_q].size == 0
    # the cancelled-active request delivered a PREFIX of its dedicated
    # run (however many tokens its segments had committed)
    ref0 = _reference(m, params, *reqs[0])
    got0 = out[rids[0]]
    assert 0 < got0.size <= reqs[0][1]
    np.testing.assert_array_equal(got0, ref0[:got0.size])
    # the survivor is untouched
    np.testing.assert_array_equal(out[rids[1]],
                                  _reference(m, params, *reqs[1]))
    # its slot was genuinely freed: a new request admits and completes
    p_new, n_new = _requests(22, 1, max_p=8, max_new=24)[0]
    rid_new = cb.submit(p_new, n_new)
    out2 = cb.run()
    np.testing.assert_array_equal(out2[rid_new],
                                  _reference(m, params, p_new, n_new))


def test_serving_compact_mid_admission_no_orphan():
    """A compaction triggered by a LATER pending request inside one
    _try_admit pass must not drop the clock below an EARLIER-grouped
    request's start: grouped-but-not-yet-active requests cap the shift
    exactly like active slots (serving.py _maybe_compact extra_starts).
    Before that cap, this scenario computed start = -12 for the first
    grouped request — silently corrupt output, no error raised."""
    m, params = _model("fused")
    cb = ContinuousBatcher(m, params, slots=4, seg_len=8,
                           cache_len=128, prompt_bucket=16,
                           sampling=GREEDY, depth=1)
    # jump the clock high with a throwaway long-prompt request
    cb.submit(np.ones(97, np.int32), 8)
    cb.step()                                  # t = 104, retired
    # a long-running active whose start (102) pins the naive shift high
    pA = np.asarray([5, 9, 2], np.int32)
    rA = cb.submit(pA, 112)
    cb.step()
    cb.step()                                  # t = 120
    assert cb.t == 120 and int(cb._start_host[0]) == 102
    # ONE admission pass: q1 (p=31 -> pb=32, need 8 rows: no compact,
    # implied start 90) groups first; q2 (p=3 -> pb=16, need 14 rows:
    # t+14 > cache_len) then forces a compaction whose naive shift
    # (min of ACTIVE starts = 102) exceeds q1's start
    p1 = np.arange(1, 32, dtype=np.int32)
    p2 = np.asarray([7, 3, 11], np.int32)
    r1 = cb.submit(p1, 16)
    r2 = cb.submit(p2, 16)
    cb.step()
    assert (cb._start_host >= 0).all(), cb._start_host
    outs = cb.run()
    _assert_greedy_match(m, params, p1, outs[r1],
                         _reference(m, params, p1, 16))
    _assert_greedy_match(m, params, p2, outs[r2],
                         _reference(m, params, p2, 16))
    _assert_greedy_match(m, params, pA, outs[rA],
                         _reference(m, params, pA, 112))


def test_latency_summary_queued_cancel_only():
    """A request cancelled while still QUEUED records done but never
    admit; latency_summary must not crash on the empty wait list."""
    m, params = _model("fused")
    cb = ContinuousBatcher(m, params, slots=2, sampling=GREEDY)
    rid = cb.submit(np.asarray([1, 2, 3], np.int32), 16)
    assert cb.cancel(rid) is True
    s = cb.latency_summary()
    assert s["n"] == 1
    assert s["wait_p50"] == 0.0 and s["wait_p95"] == 0.0
    assert s["e2e_p50"] >= 0.0


def test_warm_refuses_live_traffic():
    """warm()'s internal drain would silently discard already-submitted
    requests (their on_finalize is suppressed by _warming); it must
    refuse to run once real traffic exists."""
    m, params = _model("fused")
    cb = ContinuousBatcher(m, params, slots=2, sampling=GREEDY)
    cb.submit(np.asarray([1, 2, 3], np.int32), 8)
    with pytest.raises(RuntimeError, match="warm"):
        cb.warm()


def test_transformer_boost_greedy_parity():
    """boost=4 on the KV-cache engine: once the queue drains, eos-free
    requests decode through fused 4*seg_len-step launches; greedy
    outputs are token-identical to the boost=1 pool (same op stream,
    same clock/compaction path, fewer dispatches). Sliding or
    eos-bearing slots and cache headroom pin dispatch back to
    seg_len (scheduling.py _boosted_seg + serving.py _pre_segment)."""
    m, params = _model("fused")
    reqs = _requests(31, 4, max_p=12, max_new=120)
    outs, segs = {}, {}
    for boost in (1, 4):
        cb = ContinuousBatcher(m, params, slots=2, seg_len=8,
                               min_slots=2, boost=boost,
                               sampling=GREEDY)
        cb.warm()
        rids = [cb.submit(p, mn) for p, mn in reqs]
        res = cb.run()
        outs[boost] = {i: res[rid] for i, rid in enumerate(rids)}
        segs[boost] = cb.stats()["segments"]
    assert segs[4] < segs[1]
    for i, (p, mn) in enumerate(reqs):
        np.testing.assert_array_equal(outs[1][i], outs[4][i])
        _assert_greedy_match(m, params, p, outs[4][i],
                             _reference(m, params, p, mn))
