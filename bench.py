"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: KV-cached autoregressive decode throughput on the
flagship MusicTransformer (reference config: vocab 309, 6 layers,
d_model 256) — 512-token continuations, the BASELINE.json north-star
workload. vs_baseline compares against the reference's generation
schedule (full-prefix re-forward per token with no KV cache,
MusicTransformer/network.py:52-78) measured as OUR full-forward cost per
token on the same hardware — i.e. the honest speedup of cached decode
over the reference's algorithm with an identical, already-optimized
forward implementation (a lower bound on the real speedup vs torch).

Extra metrics (printed as additional diagnostics on stderr): train
steps/sec and tokenizer files/sec.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def bench_decode(model, params, batch=8, prompt_len=16, steps=512,
                 max_len=1024):
    from musicgeneration_tpu.decode import DecodeParams, generate
    from musicgeneration_tpu.decode.sampling import SamplingParams

    dp = DecodeParams(max_len=max_len, steps=steps,
                      sampling=SamplingParams(temperature=1.0))
    prompt = jnp.ones((batch, prompt_len), jnp.int32)
    rng = jax.random.PRNGKey(0)
    import numpy as np

    # NB: device_get forces real completion; on the tunneled axon backend
    # block_until_ready can return before execution finishes.
    np.asarray(generate(model, params, prompt, rng, dp))  # compile+warm
    n_iter = 3
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = np.asarray(
            generate(model, params, prompt, jax.random.PRNGKey(i), dp))
    dt = (time.perf_counter() - t0) / n_iter
    return batch * steps / dt, dt


def bench_reference_schedule(model, params, batch=8, prompt_len=16,
                             steps=None, window=512):
    """Cost of the reference's algorithm: one full-window forward per
    generated token (threshold_len=500~512 truncation, config.py:21).
    Measured as time of a window-length forward, per token."""
    x = jnp.ones((batch, window), jnp.int32)
    import numpy as np

    # return only the last-position logits (all the reference schedule
    # consumes per step) so the host transfer doesn't skew the comparison
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x)[:, -1])
    np.asarray(fwd(params, x))  # compile+warm
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = np.asarray(fwd(params, x))
    per_token = (time.perf_counter() - t0) / n_iter  # 1 fwd per token
    return batch / per_token  # tokens/sec under the reference schedule


def bench_tokenize(n_files: int = 500, scheme: str = "midilike") -> float:
    """Host tokenizer throughput (files/sec, auto-sized worker pool,
    all-native parse+emission path). A full 10k-file corpus run on this
    1-CPU host measured 1623 files/s = 97k files/min for midilike
    (BASELINE.md); set MG_BENCH_TOK10K=1 to repeat it.
    MG_BENCH_SWEEP also reports remi/mumidi/cp/midilike_control (every
    scheme's hot path now runs in C++ or fully vectorized numpy)."""
    import os
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.fixtures import multitrack_midi, simple_piano_midi

    from musicgeneration_tpu.data.pipeline import tokenize_corpus

    if os.environ.get("MG_BENCH_TOK10K"):
        n_files = 10000
    builder = multitrack_midi if scheme == "mumidi" else simple_piano_midi
    with tempfile.TemporaryDirectory() as d:
        midi_dir = os.path.join(d, "m")
        os.makedirs(midi_dir)
        for i in range(n_files):
            builder(os.path.join(midi_dir, f"f{i}.mid"), seed=i,
                    **({} if scheme == "mumidi" else {"n_notes": 400}))
        out = os.path.join(d, "tok")
        t0 = time.perf_counter()
        stats = tokenize_corpus(midi_dir, out, scheme=scheme,
                                num_workers=0)
        dt = time.perf_counter() - t0
        assert stats.n_ok == n_files
    return n_files / dt


def bench_serve(model, params, slots=32, n_req=256, prompt_len=64,
                seg_len=32, depth=4, seed=0, static=True):
    """MG_BENCH_SERVE=1: continuous-batching serving goodput on a
    mixed-length workload (n_req requests, max_new uniform in
    [64, 512]) vs the static-batch server — the strongest thing a
    fixed compiled program can do: batches of `slots` requests all
    decoded to 512 steps (a jitted decode cannot early-exit per batch
    without a recompile; that inability is exactly what continuous
    batching removes). Goodput counts only requested tokens."""
    import numpy as np

    from musicgeneration_tpu.decode import DecodeParams, generate
    from musicgeneration_tpu.decode.sampling import SamplingParams
    from musicgeneration_tpu.decode.serving import ContinuousBatcher

    rng = np.random.RandomState(seed)
    sp = SamplingParams(temperature=1.0)
    lens = rng.randint(64, 513, size=n_req)
    prompts = rng.randint(0, model.vocab_size - 1,
                          size=(n_req, prompt_len)).astype(np.int32)
    total = int(lens.sum())

    cb = ContinuousBatcher(model, params, slots=slots, seg_len=seg_len,
                           depth=depth, sampling=sp,
                           rng=jax.random.PRNGKey(seed))
    # compile segment scan + prompt-bucket admit + compaction roll +
    # the drain-tail shrink chain
    cb.warm(prompt_len, widths=True)
    t0 = time.perf_counter()
    for p, n in zip(prompts, lens):
        cb.submit(p, int(n))
    outs = cb.run()
    dt_cb = time.perf_counter() - t0
    got = sum(len(v) for v in outs.values())
    assert got == total, (got, total)
    goodput_cb = total / dt_cb

    if not static:
        return goodput_cb, None, None, total, dt_cb, None
    dp = DecodeParams(max_len=prompt_len + 512, steps=512, sampling=sp)
    np.asarray(generate(model, params, jnp.asarray(prompts[:slots]),
                        jax.random.PRNGKey(0), dp))  # compile+warm
    t0 = time.perf_counter()
    for i in range(0, n_req, slots):
        np.asarray(generate(model, params, jnp.asarray(prompts[i:i + slots]),
                            jax.random.PRNGKey(i), dp))
    dt_st = time.perf_counter() - t0
    goodput_st = total / dt_st
    # oracle static: per-batch max steps (needs one compile per length —
    # impractical live; derived from the measured per-step rate)
    step_cost = dt_st / ((n_req // slots) * 512)
    oracle = total / (step_cost * sum(
        int(lens[i:i + slots].max()) for i in range(0, n_req, slots)))
    return goodput_cb, goodput_st, oracle, total, dt_cb, dt_st


def bench_serve_rnn(slots=64, n_req=256, prompt_len=16, seg_len=64,
                    depth=4, seed=0, boost=None):
    """MG_BENCH_SERVE_RNN=1: RNN-family continuous batching
    (decode/serving_rnn.py) on the reference EventMelodyRNN config
    (308/512/3, bf16) vs the static-512 batch server. The RNN static
    decode can NOT early-exit per request at all, so the oracle equals
    static here — continuous batching's win is pure occupancy."""
    import numpy as np

    from musicgeneration_tpu.decode import DecodeParams, generate
    from musicgeneration_tpu.decode.sampling import SamplingParams
    from musicgeneration_tpu.decode.serving_rnn import RNNContinuousBatcher
    from musicgeneration_tpu.models import EventMelodyRNN

    m = EventMelodyRNN(dtype=jnp.bfloat16)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32)),
                    jnp.zeros((4, 1), jnp.int32))["params"]
    rng = np.random.RandomState(seed)
    sp = SamplingParams(temperature=1.0)
    lens = rng.randint(64, 513, size=n_req)
    prompts = rng.randint(0, m.event_dim - 1,
                          size=(n_req, prompt_len)).astype(np.int32)
    inits = rng.randn(n_req, m.init_dim).astype(np.float32)
    total = int(lens.sum())
    if boost is None:
        boost = int(os.environ.get("MG_BENCH_RNN_BOOST", "8"))
    cb = RNNContinuousBatcher(m, params, slots=slots, seg_len=seg_len,
                              depth=depth, sampling=sp, boost=boost,
                              prompt_bucket=prompt_len,
                              rng=jax.random.PRNGKey(seed))
    cb.warm(prompt_len, widths=True)
    t0 = time.perf_counter()
    for p, n, z in zip(prompts, lens, inits):
        cb.submit(p, int(n), init=z)
    outs = cb.run()
    dt_cb = time.perf_counter() - t0
    assert sum(len(v) for v in outs.values()) == total
    dp = DecodeParams(max_len=prompt_len + 512, steps=512, sampling=sp)

    def static_batch(i):
        c0 = m.apply({"params": params}, slots, 0,
                     jnp.asarray(inits[i:i + slots]),
                     method=m.init_cache)
        np.asarray(generate(m, params, jnp.asarray(prompts[i:i + slots]),
                            jax.random.PRNGKey(i), dp, cache0=c0))

    static_batch(0)                      # compile+warm
    t0 = time.perf_counter()
    for i in range(0, n_req, slots):
        static_batch(i)
    dt_st = time.perf_counter() - t0
    return total / dt_cb, total / dt_st, total, dt_cb, dt_st


def bench_serve_cp(slots=32, n_req=256, prompt_len=16, seg_len=32,
                   depth=4, seed=0):
    """MG_BENCH_SERVE_CP=1: CP-transformer continuous batching
    (decode/serving_cp.py, 4L d256 bf16 compound rows) vs the
    static-512 row server."""
    import numpy as np

    from musicgeneration_tpu.decode.cp_generate import generate_cp
    from musicgeneration_tpu.decode.sampling import SamplingParams
    from musicgeneration_tpu.decode.serving_cp import CPContinuousBatcher
    from musicgeneration_tpu.models import CPTransformer
    from musicgeneration_tpu.tokenizers import cp

    m = CPTransformer(num_layers=4, d_model=256, max_seq=1024,
                      dtype=jnp.bfloat16)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 8, 8), jnp.int32))["params"]
    rng = np.random.RandomState(seed)
    sp = SamplingParams(temperature=1.0)
    lens = rng.randint(64, 513, size=n_req)
    fdims = cp.field_dims()
    prompts = np.stack([rng.randint(0, fd, (n_req, prompt_len))
                        for fd in fdims], axis=-1).astype(np.int32)
    total = int(lens.sum())
    cb = CPContinuousBatcher(m, params, slots=slots, seg_len=seg_len,
                             depth=depth, sampling=sp,
                             prompt_bucket=prompt_len,
                             rng=jax.random.PRNGKey(seed))
    cb.warm(prompt_len, widths=True)
    t0 = time.perf_counter()
    for p, n in zip(prompts, lens):
        cb.submit(p, int(n))
    outs = cb.run()
    dt_cb = time.perf_counter() - t0
    assert sum(len(v) for v in outs.values()) == total
    np.asarray(generate_cp(m, params, jnp.asarray(prompts[:slots]),
                           jax.random.PRNGKey(0), 512,
                           max_len=prompt_len + 512))
    t0 = time.perf_counter()
    for i in range(0, n_req, slots):
        np.asarray(generate_cp(m, params,
                               jnp.asarray(prompts[i:i + slots]),
                               jax.random.PRNGKey(i), 512,
                               max_len=prompt_len + 512))
    dt_st = time.perf_counter() - t0
    return total / dt_cb, total / dt_st, total, dt_cb, dt_st


def bench_serve_popmag(slots=16, n_req=64, bar_len=32, max_steps=64,
                       seg_bars=2, depth=4, seed=0):
    """MG_BENCH_SERVE_POPMAG=1: PoPMAG melody->arrangement continuous
    batching (decode/serving_popmag.py, production 2L/h256 model) vs
    static generate_arrangement batches padded to each group's longest
    melody. Unit = requested target BARS per second (each bar costs a
    fixed max_steps-scan, so bars/s is the capacity number; the
    continuous win comes from not decoding short requests out to the
    group max)."""
    import numpy as np

    from musicgeneration_tpu.data import mumidi_packing as mp
    from musicgeneration_tpu.decode.popmag_generate import (
        generate_arrangement)
    from musicgeneration_tpu.decode.sampling import SamplingParams
    from musicgeneration_tpu.decode.serving_popmag import (
        PopMAGContinuousBatcher)
    from musicgeneration_tpu.models.popmag import PoPMAGRNN

    m = PoPMAGRNN()
    rng = np.random.RandomState(seed)
    init0 = jnp.zeros((1, m.init_dim))
    src0 = jnp.zeros((1, 4, bar_len, 7), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), init0, src0,
                    jnp.ones((1, 4), jnp.int32), src0,
                    jnp.ones((1, 4), jnp.int32))["params"]
    n_bars = rng.randint(4, 17, size=n_req)
    mels = [rng.randint(1, mp.EVENT_DIM,
                        size=(int(b), bar_len, 7)).astype(np.int32)
            for b in n_bars]
    lens = [rng.randint(8, bar_len + 1, size=int(b)).astype(np.int32)
            for b in n_bars]
    total_bars = int(n_bars.sum())
    boost = int(os.environ.get("MG_BENCH_POPMAG_BOOST", "4"))
    cb = PopMAGContinuousBatcher(
        m, params, slots=slots, seg_len=seg_bars, max_bars=16,
        max_bar_len=bar_len, max_steps=max_steps, prompt_bucket=4,
        depth=depth, boost=boost,
        sampling=SamplingParams(temperature=1.0),
        rng=jax.random.PRNGKey(seed))
    cb.warm(4, widths=True)
    t0 = time.perf_counter()
    for mel, ln in zip(mels, lens):
        cb.submit(mel, mel.shape[0], src_len=ln)
    outs = cb.run()
    dt_cb = time.perf_counter() - t0
    assert len(outs) == n_req

    # static: groups of `slots`, each padded/decoded to the group max
    def run_static():
        for i in range(0, n_req, slots):
            grp = list(range(i, min(i + slots, n_req)))
            gb = max(int(n_bars[j]) for j in grp)
            src = np.zeros((len(grp), gb, bar_len, 7), np.int32)
            sl = np.ones((len(grp), gb), np.int32)
            for r, j in enumerate(grp):
                src[r, :n_bars[j]] = mels[j]
                sl[r, :n_bars[j]] = lens[j]
            toks, valid = generate_arrangement(
                m, params, jnp.zeros((len(grp), m.init_dim)),
                jnp.asarray(src), jnp.asarray(sl),
                jax.random.PRNGKey(i), n_target_bar=gb,
                max_steps=max_steps, greedy=False)
            np.asarray(toks)

    run_static()   # compile per distinct group bar-count
    t0 = time.perf_counter()
    run_static()
    dt_st = time.perf_counter() - t0
    return (total_bars / dt_cb, total_bars / dt_st, total_bars, dt_cb,
            dt_st)


def bench_train(model, params, batch=8, seq=512) -> float:
    """Fused train step throughput (steps/sec) on the flagship model."""
    import numpy as np

    from musicgeneration_tpu.train.trainer import (
        TrainerConfig,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    cfg = TrainerConfig(vocab_size=model.vocab_size,
                        pad_id=model.vocab_size - 1, d_model=model.d_model)
    tx = make_optimizer(cfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params),
                       dropout_rng=jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))
    x = jax.random.randint(jax.random.PRNGKey(2), (batch, seq), 0,
                           model.vocab_size - 1)
    y = jnp.roll(x, -1, axis=1)
    state, metrics = step(state, x, y)
    np.asarray(metrics["loss"])  # compile + warm
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, metrics = step(state, x, y)
    np.asarray(metrics["loss"])
    return n_iter / (time.perf_counter() - t0)


def train_step_flops(batch, seq, d, n_layers, vocab, ffn_dim=None,
                     n_heads=None):
    """Analytic train-step FLOPs (2 per MAC, step = 3x forward):
    per layer 4 qkv/out projections + 2 FFN matmuls + causal
    QK^T / srel QE^T / PV attention terms, plus the vocab head.
    Matches the BASELINE.md round-3 accounting."""
    ffn = ffn_dim or d // 2
    per_layer = (4 * 2 * batch * seq * d * d          # q,k,v,out proj
                 + 2 * 2 * batch * seq * d * ffn      # FFN pre+suf
                 + 3 * batch * seq * seq * d)         # QK^T+QE^T+PV causal
    head = 2 * batch * seq * d * vocab
    return 3 * (n_layers * per_layer + head)


def bench_mfu():
    """MG_BENCH_MFU=1: the production-shape MFU study (BASELINE.md
    round-3 ceiling claim): the SAME kernels at dh=128 / FFN=4d /
    vocab 32k instead of the reference's dh=64 / FFN=d/2 / vocab 309.
    Reports TFLOP/s + MFU for pallas and xla attention."""
    import numpy as np

    from musicgeneration_tpu.models import MusicTransformer
    from musicgeneration_tpu.train.trainer import (
        TrainerConfig,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    peak = 197e12  # v5e bf16
    batch, seq, d, layers, vocab = 6, 2048, 1024, 6, 32000
    for impl in ("pallas", "xla"):
        model = MusicTransformer(
            vocab_size=vocab, num_layers=layers, d_model=d, max_seq=seq,
            dtype=jnp.bfloat16, head_dim=128, ffn_dim=4 * d,
            attention_impl=impl, scan_layers=True,
            pad_in_input=False)  # dense windows, like cli.train
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 8), jnp.int32))["params"]
        cfg = TrainerConfig(vocab_size=vocab, pad_id=vocab - 1, d_model=d)
        tx = make_optimizer(cfg)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(params),
                           dropout_rng=jax.random.PRNGKey(1))
        step = jax.jit(make_train_step(model, tx, cfg),
                       donate_argnums=(0,))
        x = jax.random.randint(jax.random.PRNGKey(2), (batch, seq), 0,
                               vocab - 1)
        y = jnp.roll(x, -1, axis=1)
        t0 = time.perf_counter()
        state, metrics = step(state, x, y)
        np.asarray(metrics["loss"])  # compile + warm
        compile_s = time.perf_counter() - t0
        n_iter = 10  # pipelined: one host sync for 10 dispatches
        t0 = time.perf_counter()
        for _ in range(n_iter):
            state, metrics = step(state, x, y)
        np.asarray(metrics["loss"])
        dt = (time.perf_counter() - t0) / n_iter
        fl = train_step_flops(batch, seq, d, layers, vocab,
                              ffn_dim=4 * d)
        print(f"# mfu[{impl}]: {dt * 1e3:.1f} ms/step, "
              f"{fl / dt / 1e12:.1f} TFLOP/s, "
              f"MFU {fl / dt / peak * 100:.1f}% "
              f"(B{batch} L{seq} d{d} dh128 ffn{4 * d} vocab{vocab} "
              f"bf16, {fl / 1e12:.2f} TF/step, compile {compile_s:.0f}s)",
              file=sys.stderr)


def main():
    import os

    from musicgeneration_tpu.models import MusicTransformer

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = MusicTransformer(vocab_size=309, num_layers=6, d_model=256,
                             max_seq=2048, dtype=dtype)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32))["params"]

    toks_per_sec, _ = bench_decode(model, params)
    ref_toks_per_sec = bench_reference_schedule(model, params)
    speedup = toks_per_sec / ref_toks_per_sec

    if os.environ.get("MG_BENCH_SWEEP"):
        for b in (16, 32, 64, 128):
            try:
                tps, _ = bench_decode(model, params, batch=b)
                print(f"# decode batch={b}: {tps:.0f} tok/s", file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                print(f"# decode batch={b} skipped: {e}", file=sys.stderr)
    if os.environ.get("MG_BENCH_SCALE"):
        # decode model-size scaling (BASELINE.md scale rows): fused
        # kernels auto-select resident (d256) / grid (d512) / stream
        # (d1024) vs the XLA decode path; the fused rows also report
        # the VMEM-limited serving-peak batch (round-4 sweep)
        for d, peak_b in ((512, 128), (1024, 64)):
            for impl in ("fused", "xla"):
                m = MusicTransformer(vocab_size=309, num_layers=6,
                                     d_model=d, max_seq=2048,
                                     dtype=dtype, decode_impl=impl)
                p = None
                batches = (8, peak_b) if impl == "fused" else (8,)
                for b in batches:
                    try:
                        if p is None:
                            p = m.init(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 8), jnp.int32)
                                       )["params"]
                        tps, _ = bench_decode(m, p, batch=b)
                        print(f"# decode d{d} {impl} B{b}: "
                              f"{tps:.0f} tok/s", file=sys.stderr)
                    except Exception as e:  # noqa: BLE001
                        print(f"# decode d{d} {impl} B{b} skipped: {e}",
                              file=sys.stderr)
    try:
        files_per_sec = bench_tokenize()
        import multiprocessing
        print(f"# tokenizer: {files_per_sec:.1f} files/sec "
              f"(midilike, auto pool on {multiprocessing.cpu_count()} "
              "CPU(s), 400-note files, native parse+emission)",
              file=sys.stderr)
        if os.environ.get("MG_BENCH_SWEEP"):
            for scheme in ("remi", "cp", "midilike_control", "mumidi"):
                fps = bench_tokenize(300, scheme)
                print(f"# tokenizer {scheme}: {fps:.1f} files/sec",
                      file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — diagnostics must not kill bench
        print(f"# tokenizer bench skipped: {e}", file=sys.stderr)
    if os.environ.get("MG_BENCH_RNN"):
        try:
            from musicgeneration_tpu.models.event_rnn import EventMelodyRNN
            rnn = EventMelodyRNN(dtype=dtype)
            rparams = rnn.init(jax.random.PRNGKey(0),
                               jnp.zeros((8, 32)),
                               jnp.zeros((4, 8), jnp.int32))["params"]
            tps, _ = bench_decode(rnn, rparams)
            print(f"# rnn decode: {tps:.0f} tok/s (EventMelodyRNN 3x512, "
                  f"batch 8, {jnp.dtype(dtype).name})", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# rnn decode bench skipped: {e}", file=sys.stderr)
    if os.environ.get("MG_BENCH_SERVE"):
        try:
            cb, st, oracle, total, dt_cb, dt_st = bench_serve(model, params)
            print(f"# serve: continuous-batching {cb:.0f} tok/s goodput "
                  f"vs static-512 {st:.0f} ({cb / st:.2f}x) "
                  f"[oracle per-batch-max static {oracle:.0f}, "
                  f"{cb / oracle:.2f}x]; {total} tokens, 256 reqs "
                  f"(max_new U[64,512]), 32 slots seg32 depth4 "
                  f"({dt_cb:.1f}s vs {dt_st:.1f}s)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# serve bench skipped: {e}", file=sys.stderr)
    if os.environ.get("MG_BENCH_SERVE_RNN"):
        try:
            cbr, str_, total, dt_cb, dt_st = bench_serve_rnn()
            print(f"# serve-rnn: continuous {cbr:.0f} tok/s goodput vs "
                  f"static-512 {str_:.0f} ({cbr / str_:.2f}x); {total} "
                  f"tokens, 256 reqs, 64 slots seg64 boost"
                  f"{os.environ.get('MG_BENCH_RNN_BOOST', '8')} "
                  f"({dt_cb:.2f}s vs {dt_st:.2f}s)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# serve-rnn bench skipped: {e}", file=sys.stderr)
    if os.environ.get("MG_BENCH_SERVE_CP"):
        try:
            cbr, str_, total, dt_cb, dt_st = bench_serve_cp()
            print(f"# serve-cp: continuous {cbr:.0f} rows/s goodput vs "
                  f"static-512 {str_:.0f} ({cbr / str_:.2f}x); {total} "
                  f"rows, 256 reqs, 32 slots seg32 "
                  f"({dt_cb:.2f}s vs {dt_st:.2f}s)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# serve-cp bench skipped: {e}", file=sys.stderr)
    if os.environ.get("MG_BENCH_SERVE_POPMAG"):
        try:
            cbr, str_, total, dt_cb, dt_st = bench_serve_popmag()
            print(f"# serve-popmag: continuous {cbr:.0f} bars/s goodput "
                  f"vs static-padded {str_:.0f} ({cbr / str_:.2f}x); "
                  f"{total} bars, 64 reqs, 16 slots seg2 "
                  f"({dt_cb:.2f}s vs {dt_st:.2f}s)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# serve-popmag bench skipped: {e}", file=sys.stderr)
    if os.environ.get("MG_BENCH_MFU"):
        try:
            bench_mfu()
        except Exception as e:  # noqa: BLE001
            print(f"# mfu bench skipped: {e}", file=sys.stderr)
    if os.environ.get("MG_BENCH_TRAIN"):
        try:
            sps = bench_train(model, params)
            print(f"# train: {sps:.2f} steps/sec (batch 8, seq 512, "
                  "fused step)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# train bench skipped: {e}", file=sys.stderr)

    print(
        json.dumps({
            "metric": "decode_tokens_per_sec",
            "value": round(toks_per_sec, 1),
            "unit": "tokens/sec (512-tok continuations, batch 8, "
                    "MusicTransformer 6L/256d, KV-cached scan)",
            "vs_baseline": round(speedup, 2),
        })
    )
    print(f"# reference-schedule throughput: {ref_toks_per_sec:.1f} tok/s; "
          f"cached decode: {toks_per_sec:.1f} tok/s; "
          f"backend={jax.default_backend()}", file=sys.stderr)


if __name__ == "__main__":
    main()
