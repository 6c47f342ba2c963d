"""Batch-serve generation requests with continuous batching.

    python -m musicgeneration_tpu.cli.serve <ckpt> requests.jsonl outdir \
        --slots 8 --seg-len 64 [--greedy | --temperature/--topk/--topp]

`requests.jsonl`: one JSON object per line —
    {"id": "a", "prime": "prompt.mid", "max_new": 256}
    {"id": "b", "tokens": [24, 28, 31], "max_new": 512, "eos": 107,
     "temperature": 0.8, "top_k": 20, "top_p": 0.95, "greedy": false}
(`prime` tokenizes a MIDI through the checkpoint's scheme; `tokens`
supplies raw ids. `id` defaults to the line number. Any sampling field
on any line switches the engine to per-row sampling: each request
decodes under its own params, defaulting to the CLI-level flags.
Transformer requests may add {"window": 256} for sliding-context
decoding: max_new is then unbounded by the serve window — the slot
re-primes from its last `window` tokens whenever the context would
exceed 2*window, generate_sliding's semantics inside the pool.)

Serves BOTH engine families: MusicTransformer checkpoints decode
through the KV-cache engine (decode/serving.py), the RNN families
(event_rnn / performance_rnn / melody_rnn) through the hidden-state
engine (decode/serving_rnn.py). RNN requests may also carry
    {"init_seed": 3}          — N(0,1) latent from that seed, or
    {"init": [..init_dim..]}  — an explicit latent (default: zeros),
    {"control": [..C..] | [[..C..], ...]}
                              — PerformanceRNN conditioning (a single
                                control repeats; a sequence is consumed
                                per step, reference expand_controls
                                semantics). PerformanceRNN prompts from
                                `prime`/default get the primary event
                                prepended, mirroring cli.generate.

Each request's continuation is written to `outdir/<id>.mid` the moment
it finalizes (streamed mid-drain). Requests of different prompt and
continuation lengths share the slot pool via the continuous-batching
engines: no per-request process, no batch drained to its slowest
member — the TPU-native replacement for running the reference's
per-request generate.py in a shell loop (its only serving option;
MusicTransformer/generate.py and Event_MelodyRNN/generate.py process
one prompt per invocation).

ONLINE mode: pass `-` as the request file to read JSONL from stdin as
it arrives — requests submit into the live pool between decode
segments (continuous batching's submit-any-time), and one JSON line
per completion streams to stdout ({"id", "file", "tokens"}) so a
client piping requests in sees results as they finish:

    client | python -m musicgeneration_tpu.cli.serve <ckpt> - outdir

HTTP mode: `--http PORT` (the requests positional is ignored; pass -)
starts a threaded endpoint in front of the same live pool —
    POST /generate   one request object (the JSONL line schema);
                     blocks until the continuation finalizes, returns
                     {"id", "tokens": [...], "n_tokens", "file"}
    POST /submit     same body, returns {"id", "status": "queued"}
                     immediately (non-blocking)
    POST /stream     same body, server-sent events: one
                     `data: {"id", "tokens": [...]}` chunk per decoded
                     segment AS IT COMMITS (tokens observable
                     mid-generation), then `event: done` with
                     {"id", "n_tokens", "file"}; the chunks
                     concatenate to exactly /generate's tokens
    GET  /result/ID  202 {"status": "pending", "n_tokens": so-far}
                     while decoding; 200 with the /generate payload
                     once finalized (result is consumed on first 200);
                     404 unknown
    POST /cancel     {"id": ID} — queued: dropped, active: slot freed;
                     /result then reports {"status": "cancelled"}
    GET  /stats      scheduler counters + latency summary
    GET  /healthz    {"ready": true, "slots": N}
    POST /shutdown   drain and exit (also SIGINT)
Handler threads only parse and enqueue; every submit/step/collect
stays on the engine thread, so arbitrary concurrent clients share the
slot pool exactly like the stdin mode's interleaved lines:

    python -m musicgeneration_tpu.cli.serve <ckpt> - outdir --http 8765
    curl -d '{"tokens": [24, 28, 31], "max_new": 64}' \\
         localhost:8765/generate
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

RNN_MODELS = ("event_rnn", "performance_rnn", "melody_rnn")


def main(argv=None) -> int:
    from ..utils import enable_persistent_compile_cache
    enable_persistent_compile_cache()  # MG_NO_COMPILE_CACHE=1 opts out
    p = argparse.ArgumentParser(
        prog="musicgeneration_tpu.cli.serve", description=__doc__)
    p.add_argument("checkpoint")
    p.add_argument("requests", help="JSONL request file")
    p.add_argument("outdir")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--seg-len", type=int, default=64)
    p.add_argument("--depth", type=int, default=2,
                   help="segments in flight (pipelined dispatch)")
    p.add_argument("--cache-len", type=int, default=None)
    p.add_argument("--ctrl-window", type=int, default=256,
                   help="per-slot control window (performance_rnn)")
    p.add_argument("--seg-bars", type=int, default=2,
                   help="bars per dispatched segment (popmag)")
    p.add_argument("--boost", type=int, default=None,
                   help="fuse up to this many segments into one launch "
                        "when the queue is empty and every active "
                        "request has that much left (amortizes "
                        "dispatch/fetch RTT; 1 disables). Per-engine "
                        "defaults: RNN 8 (the measured winner at <= 64 "
                        "slots), popmag 4, transformer 1 (measured "
                        "neutral); CP rows don't support it")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--topk", type=int, default=0)
    p.add_argument("--topp", type=float, default=1.0)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-new", type=int, default=512,
                   help="default when a request omits max_new")
    p.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="serve an HTTP endpoint instead of a request "
                        "file (0 = ephemeral port, printed on ready)")
    p.add_argument("--http-timeout", type=float, default=600.0,
                   help="per-request completion timeout (seconds)")
    args = p.parse_args(argv)

    import jax

    from ..decode.sampling import SamplingParams
    from ..decode.serving import ContinuousBatcher
    from ..decode.serving_cp import CPContinuousBatcher
    from ..decode.serving_rnn import RNNContinuousBatcher
    from ..models import MusicTransformer
    from ..utils.checkpoint import restore_checkpoint
    from .generate import _prime_tokens, _write_midi
    from .train import TrainCLIConfig, build_session

    payload = restore_checkpoint(args.checkpoint)
    meta = payload.get("config", {})
    if "cli" not in meta:
        raise SystemExit("checkpoint has no CLI config; re-save with "
                         "cli.train or load it programmatically")
    cfg = TrainCLIConfig.from_dict(meta["cli"])
    scheme = meta.get("scheme", "midilike")
    model_kwargs = dict(meta.get("model_kwargs", {}))
    scanned = bool(model_kwargs.pop("scan_layers", False))
    model, _tcfg, _apply, _loss, _adapter = build_session(
        cfg, scheme, model_kwargs)
    is_rnn = cfg.model in RNN_MODELS
    is_cp = cfg.model == "cp_transformer"
    is_popmag = cfg.model == "popmag"
    if not isinstance(model, MusicTransformer) and not is_rnn \
            and not is_cp and not is_popmag:
        raise SystemExit(
            f"cli.serve drives the MusicTransformer, CP, RNN and "
            f"PoPMAG families; {cfg.model} has no serving engine")
    params = payload["state"]["params"]
    # "layers_scan" in params catches pp-trained checkpoints whose
    # stacked layout was injected at session-build time without the
    # scan_layers kwarg being persisted (same probe as cli.generate)
    if scanned or "layers_scan" in params:
        from ..models.music_transformer import unstack_scanned_params
        params = unstack_scanned_params(dict(params), model.num_layers)
    print(f"restored {cfg.model} at step {payload['step']} "
          f"(scheme={scheme})")

    sampling = SamplingParams(temperature=args.temperature,
                              top_k=args.topk, top_p=args.topp,
                              greedy=args.greedy)
    samp_fields = ("temperature", "top_k", "top_p", "greedy")

    def parse_request(line: str, ln: int):
        req = json.loads(line)
        if not isinstance(req, dict):
            raise ValueError("request must be a JSON object, got "
                             f"{type(req).__name__}")
        name = str(req.get("id", ln))
        if is_popmag:
            # melody->arrangement: {"prime": melody.mid} or
            # {"melody": [[..7-wide rows..] per bar]}; max_new counts
            # target BARS (default: the melody's bar count)
            if "melody" in req:
                src = np.asarray(req["melody"], np.int32)
                src_len = (np.asarray(req.get(
                    "src_len", (src != 0).any(-1).sum(-1)), np.int32))
            elif req.get("prime"):
                from .generate import _melody_compound_from_midi
                src, src_len = _melody_compound_from_midi(
                    req["prime"], cfg.max_bars, cfg.max_bar_len)
            else:
                raise ValueError(
                    "PoPMAG requests need 'prime' (a melody MIDI) or "
                    "'melody' (packed [bars, S, 7] compound rows)")
            extra = {"src_len": src_len}
            if "init" in req:
                extra["init"] = np.asarray(req["init"], np.float32)
            elif "init_seed" in req:
                extra["init"] = np.random.RandomState(
                    int(req["init_seed"])).randn(
                        model.init_dim).astype(np.float32)
            if req.get("eos") is not None:
                raise ValueError("PoPMAG requests retire by bar count; "
                                 "drop 'eos'")
            if any(f in req for f in samp_fields) or "window" in req:
                raise ValueError(
                    "per-request sampling / window= are not defined "
                    "for PoPMAG; set the CLI-level flags")
            return (name, src, int(req.get("max_new", src.shape[0])),
                    None, None, extra)
        if "tokens" in req:
            toks = np.asarray(req["tokens"], np.int32)
        elif is_cp:
            from ..tokenizers import cp as cp_codec
            if req.get("prime") is None:
                # bare bar-marker row (cli.generate's CP default)
                toks = np.asarray(
                    [cp_codec._row(cp_codec.FAMILY_METRIC, position=0)],
                    np.int32)
            else:
                toks = np.asarray(cp_codec.extract_events(
                    req["prime"])[:req.get("prime_len", 500)], np.int32)
        else:
            toks = np.asarray(_prime_tokens(
                scheme, req.get("prime"), req.get("prime_len", 500)),
                np.int32)
            if cfg.model == "performance_rnn":
                # reference generation starts from the primary event
                # (generate.py:171-175); raw `tokens` are taken as-is
                toks = np.concatenate(
                    [[model.primary_event], toks]).astype(np.int32)
        sp = None
        if any(f in req for f in samp_fields):
            if is_cp:
                raise ValueError(
                    "per-request sampling params are not defined for "
                    "compound-word rows; set the CLI-level flags")
            sp = SamplingParams(
                temperature=float(req.get("temperature",
                                          args.temperature)),
                top_k=int(req.get("top_k", args.topk)),
                top_p=float(req.get("top_p", args.topp)),
                greedy=bool(req.get("greedy", args.greedy)))
        extra = {}
        if "window" in req:
            if is_rnn:
                raise ValueError(
                    "window= is a KV-cache sliding-context option; RNN "
                    "slots are O(1)-state and serve unbounded max_new "
                    "natively — drop the field")
            extra["window"] = int(req["window"])
        if is_rnn:
            if "init" in req:
                extra["init"] = np.asarray(req["init"], np.float32)
            elif "init_seed" in req and hasattr(model, "init_dim"):
                extra["init"] = np.random.RandomState(
                    int(req["init_seed"])).randn(
                        model.init_dim).astype(np.float32)
            if "control" in req:
                extra["control"] = np.asarray(req["control"],
                                              np.float32)
        return (name, toks, int(req.get("max_new", args.max_new)),
                req.get("eos"), sp, extra)

    def build_cb(per_row: bool, on_finalize):
        if is_popmag:
            from ..decode.serving_popmag import PopMAGContinuousBatcher
            return PopMAGContinuousBatcher(
                model, params, slots=args.slots, sampling=sampling,
                seg_len=args.seg_bars, max_bars=cfg.max_bars,
                max_bar_len=cfg.max_bar_len, depth=args.depth,
                boost=args.boost if args.boost is not None else 4,
                # a bucket that always divides max_bars (melody buffers
                # are max_bars wide; a non-divisor bucket could round a
                # prompt past them)
                prompt_bucket=math.gcd(8, cfg.max_bars),
                on_finalize=on_finalize,
                rng=jax.random.PRNGKey(args.seed))
        if is_rnn:
            if args.slots > 64:
                # measured guidance (BASELINE.md RNN serving rows): the
                # GRU step is cheap enough that wide pools pay more in
                # dispatch than they save in occupancy on this backend
                print(f"note: RNN serving measured best at <= 64 slots; "
                      f"{args.slots} slots ran "
                      "0.86-0.93x the static server in benchmarks",
                      file=sys.stderr)
            return RNNContinuousBatcher(
                model, params, slots=args.slots, sampling=sampling,
                seg_len=args.seg_len, depth=args.depth,
                ctrl_window=args.ctrl_window,
                boost=args.boost if args.boost is not None else 8,
                per_row_sampling=per_row, on_finalize=on_finalize,
                rng=jax.random.PRNGKey(args.seed))
        if is_cp:
            if args.boost and args.boost > 1:
                print("note: --boost is not supported for compound-word "
                      "rows; ignored", file=sys.stderr)
            return CPContinuousBatcher(
                model, params, slots=args.slots, sampling=sampling,
                seg_len=args.seg_len, cache_len=args.cache_len,
                depth=args.depth, on_finalize=on_finalize,
                rng=jax.random.PRNGKey(args.seed))
        return ContinuousBatcher(
            model, params, slots=args.slots, sampling=sampling,
            seg_len=args.seg_len, cache_len=args.cache_len,
            depth=args.depth, per_row_sampling=per_row,
            boost=args.boost if args.boost is not None else 1,
            on_finalize=on_finalize,
            rng=jax.random.PRNGKey(args.seed))

    if args.http is not None:
        return _serve_http(scheme, build_cb, parse_request, args)
    if args.requests == "-":
        return _serve_follow(scheme, build_cb, parse_request, args)

    parsed = []
    with open(args.requests) as fh:
        for ln, line in enumerate(fh):
            line = line.strip()
            if not line:
                continue
            try:
                parsed.append(parse_request(line, ln))
            except ValueError as e:
                raise SystemExit(f"request line {ln}: {e}")
    if not parsed:
        raise SystemExit(f"no requests in {args.requests}")

    per_row = any(sp is not None for *_, sp, _e in parsed)
    os.makedirs(args.outdir, exist_ok=True)
    names, written = {}, []

    def deliver(rid, toks):
        # streams each result the moment it finalizes (mid-drain, while
        # later segments are still decoding) instead of after the queue
        # empties
        path = os.path.join(args.outdir, f"{names[rid]}.mid")
        _write_midi(scheme, toks, path)
        written.append((path, len(toks)))

    cb = build_cb(per_row, deliver)
    # sliding requests are known upfront in file mode: precompile the
    # widest window's re-prime admission too (a mid-serve compile
    # stalls the whole pool ~0.8 s on the tunneled v5e)
    wmax = max((e.get("window", 0) for *_, e in parsed), default=0)
    try:
        cb.warm(**({"window": wmax} if wmax else {}))
    except ValueError as e:
        # an invalid window= fails per-request at submit; surface the
        # skipped precompile so the ~0.8 s mid-serve re-prime compile
        # on the first sliding request isn't a silent stall
        print(f"warning: window precompile skipped ({e}); sliding "
              "requests pay their re-prime compile mid-serve",
              file=sys.stderr)
        cb.warm()

    rids = []
    for name, toks, max_new, eos, sp, extra in parsed:
        rid = cb.submit(toks, max_new, eos_id=eos, sampling=sp, **extra)
        names[rid] = name
        rids.append(rid)
    print(f"serving {len(rids)} requests over {args.slots} slots "
          f"(seg_len={args.seg_len}, depth={args.depth})")

    t0 = time.perf_counter()
    outs = cb.run()
    dt = time.perf_counter() - t0
    total = sum(len(v) for v in outs.values())
    st = cb.stats()
    lat = cb.latency_summary()
    print(f"generated {total} tokens in {dt:.1f}s "
          f"({total / dt:.0f} tok/s goodput); "
          f"{st['segments']:.0f} segments, "
          f"occupancy {st['occupancy']:.0%}, "
          f"{st['admit_calls']:.0f} admission calls, "
          f"{st.get('compactions', 0):.0f} compactions; "
          f"latency p50/p95 {lat['e2e_p50']:.2f}/{lat['e2e_p95']:.2f}s "
          f"(queue wait {lat['wait_p50']:.2f}/{lat['wait_p95']:.2f}s)")
    missing = set(rids) - set(outs)
    if missing:
        raise SystemExit(f"requests never finalized: {sorted(missing)}")
    for path, n in written:
        print(f"wrote {path} ({n} tokens)")
    return 0


def _serve_http(scheme, build_cb, parse_request, args) -> int:
    """HTTP serving loop: a ThreadingHTTPServer accepts requests on
    handler threads, which parse (pure numpy/file work), enqueue, and
    block on a completion event; the engine thread drains the intake
    queue between decode segments and runs cb.step() — the engine
    objects are only ever touched from this one thread (same
    single-driver discipline as the stdin follow mode)."""
    import queue
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from .generate import _write_midi

    os.makedirs(args.outdir, exist_ok=True)
    intake = queue.Queue()   # (parsed, holder) | ("cancel", name)
    stopping = threading.Event()
    stats_lock = threading.Lock()
    shared = {"stats": {}, "latency": {}, "ready": False,
              "progress": {},  # name -> tokens emitted so far
              "results": {}}   # name -> finished async payload
    seq_lock = threading.Lock()
    seq = [0]

    def next_id():
        with seq_lock:
            seq[0] += 1
            return seq[0] - 1

    class Handler(BaseHTTPRequestHandler):
        # suppress per-request stderr lines (the engine prints a
        # summary on shutdown)
        def log_message(self, fmt, *a):  # noqa: D401, N802
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                self._json(200, {"ready": shared["ready"],
                                 "slots": args.slots})
            elif self.path == "/stats":
                with stats_lock:
                    self._json(200, {"stats": shared["stats"],
                                     "latency": shared["latency"]})
            elif self.path.startswith("/result/"):
                name = self.path[len("/result/"):]
                with stats_lock:
                    if name in shared["results"]:
                        self._json(200, shared["results"].pop(name))
                    elif name in shared["progress"]:
                        self._json(202, {
                            "id": name, "status": "pending",
                            "n_tokens": shared["progress"][name]})
                    else:
                        self._json(404, {"error": f"unknown id {name}"})
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def _read_body(self):
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n).decode()

        def _stream(self, parsed):
            """POST /stream: server-sent events — one `data:` event per
            freshly decoded token chunk (flushed as the engine commits
            each segment, so a client reads tokens MID-generation), then
            an `event: done` with the /generate-style summary. The
            streamed chunks concatenate to exactly the /generate
            `tokens` array (both run through the engine's
            `_assemble_result`, so eos cuts and max_new trims apply to
            the stream too, prefix-exact)."""
            q = queue.Queue()
            holder = {"stream": q, "sent": 0}
            intake.put((parsed, holder))
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()

            def emit(event, obj):
                head = f"event: {event}\n" if event else ""
                self.wfile.write(
                    (head + f"data: {json.dumps(obj)}\n\n").encode())
                self.wfile.flush()

            # IDLE timeout: the clock resets on every delivered
            # event — a long generation that is actively streaming
            # must not be cut mid-flight; only a stall of
            # --http-timeout with no progress errors out
            try:
                while True:
                    try:
                        kind, payload = q.get(timeout=args.http_timeout)
                    except queue.Empty:
                        holder["gone"] = True   # stop engine pushes
                        emit("error", {"error": "generation timed out"})
                        return
                    if kind == "tok":
                        emit(None, {"id": parsed[0], "tokens": payload})
                    elif kind == "done":
                        emit("done", payload)
                        return
                    else:   # error
                        emit("error", payload)
                        return
            except (BrokenPipeError, ConnectionResetError):
                holder["gone"] = True   # client went away: stop pushing

        def do_POST(self):  # noqa: N802
            if self.path == "/shutdown":
                stopping.set()
                self._json(200, {"ok": True})
                return
            if self.path == "/cancel":
                try:
                    name = str(json.loads(self._read_body())["id"])
                except (ValueError, KeyError) as e:
                    self._json(400, {"error": f"need {{'id': ...}}: {e}"})
                    return
                intake.put(("cancel", name))
                self._json(202, {"id": name,
                                 "status": "cancel_requested"})
                return
            if self.path not in ("/generate", "/submit", "/stream"):
                self._json(404, {"error": f"no route {self.path}"})
                return
            if stopping.is_set():
                self._json(503, {"error": "server is draining"})
                return
            try:
                parsed = parse_request(self._read_body(), next_id())
            except (ValueError, TypeError, KeyError, AttributeError,
                    UnicodeDecodeError) as e:
                # TypeError/KeyError/AttributeError: malformed field
                # types (e.g. "max_new": {}) must 400, not kill the
                # handler thread
                self._json(400, {"error": str(e)})
                return
            if self.path == "/submit":
                intake.put((parsed, {"async": True}))
                self._json(200, {"id": parsed[0], "status": "queued"})
                return
            if self.path == "/stream":
                return self._stream(parsed)
            holder = {"event": threading.Event()}
            intake.put((parsed, holder))
            if not holder["event"].wait(args.http_timeout):
                self._json(504, {"error": "generation timed out"})
                return
            if "error" in holder:
                self._json(400, {"error": holder["error"]})
                return
            toks = holder["tokens"]
            # .tolist() serves flat ids AND the CP engine's [n, 8] rows
            self._json(200, {"id": parsed[0],
                             "tokens": np.asarray(toks).tolist(),
                             "n_tokens": int(len(toks)),
                             "file": holder["path"]})

    pending = {}  # rid -> (name, holder)

    def resolve_cancel(name, holder, toks):
        if holder.get("async"):
            with stats_lock:
                shared["results"][name] = {"id": name,
                                           "status": "cancelled",
                                           "n_tokens": int(len(toks))}
        elif "stream" in holder:
            holder["stream"].put(("done", {
                "id": name, "status": "cancelled",
                "n_tokens": int(len(toks))}))
        else:
            holder["error"] = "cancelled"
            holder["event"].set()

    def deliver(rid, toks):
        name, holder = pending.pop(rid)
        if holder.get("cancelled"):
            # an ACTIVE cancel finalizes through here (partial tokens)
            resolve_cancel(name, holder, toks)
            return
        path = os.path.join(args.outdir, f"{name}.mid")
        _write_midi(scheme, toks, path)
        if holder.get("async"):
            with stats_lock:
                shared["results"][name] = {
                    "id": name, "tokens": np.asarray(toks).tolist(),
                    "n_tokens": int(len(toks)), "file": path}
            return
        if "stream" in holder:
            # flush whatever the per-segment pushes haven't sent (the
            # finalize may run ahead of the last streaming sweep), then
            # the done event; `toks` IS the assembled result, so the
            # streamed concatenation equals /generate's tokens exactly
            arr = np.asarray(toks)
            if len(arr) > holder["sent"] and not holder.get("gone"):
                holder["stream"].put(("tok",
                                      arr[holder["sent"]:].tolist()))
                holder["sent"] = len(arr)
            holder["stream"].put(("done", {
                "id": name, "n_tokens": int(len(arr)), "file": path}))
            return
        holder["tokens"] = toks
        holder["path"] = path
        holder["event"].set()

    cb = build_cb(True, deliver)  # per-row: params may vary per POST
    cb.warm(widths=True)
    server = ThreadingHTTPServer(("127.0.0.1", args.http), Handler)
    server.daemon_threads = True
    threading.Thread(target=server.serve_forever, daemon=True).start()
    shared["ready"] = True
    port = server.server_address[1]
    print(json.dumps({"ready": True, "port": port,
                      "slots": args.slots}), flush=True)

    n_sub = 0
    t0 = time.perf_counter()
    try:
        while True:
            while True:  # drain intake without blocking
                try:
                    parsed, holder = intake.get_nowait()
                except queue.Empty:
                    break
                if parsed == "cancel":
                    name = holder
                    rids = [r for r, (n2, _h) in pending.items()
                            if n2 == name]
                    for r in rids:
                        pending[r][1]["cancelled"] = True
                        cb.cancel(r)  # active: finalizes via deliver()
                        if r in pending:  # queued: no finalize fired
                            _n2, h = pending.pop(r)
                            resolve_cancel(name, h, [])
                    continue
                name, toks, max_new, eos, sp, extra = parsed
                try:
                    rid = cb.submit(toks, max_new, eos_id=eos,
                                    sampling=sp, **extra)
                except ValueError as e:
                    if holder.get("async"):
                        with stats_lock:
                            shared["results"][name] = {
                                "id": name, "error": str(e)}
                    elif "stream" in holder:
                        holder["stream"].put(("error",
                                              {"error": str(e)}))
                    else:
                        holder["error"] = str(e)
                        holder["event"].set()
                    continue
                if "stream" in holder:
                    holder["req"] = (max_new, eos)
                pending[rid] = (name, holder)
                n_sub += 1
            busy = cb.step()
            # push fresh tokens to /stream clients: the emitted list is
            # run through the engine's _assemble_result so the stream
            # is always a PREFIX of the final /generate result (max_new
            # trim + eos cut applied mid-flight)
            for rid, (name, holder) in list(pending.items()):
                if "stream" not in holder or holder.get("gone") \
                        or holder.get("cancelled"):
                    continue
                em = cb._emitted.get(rid)
                if not em:
                    continue
                mn, eos2 = holder["req"]
                cur = cb._assemble_result(list(em), mn, eos2)
                if len(cur) > holder["sent"]:
                    holder["stream"].put(
                        ("tok",
                         np.asarray(cur[holder["sent"]:]).tolist()))
                    holder["sent"] = len(cur)
            # step()-driven modes deliver through on_finalize; drop the
            # scheduler's retained copy so a long-running server does
            # not grow without bound (run() is what consumes `done`)
            cb.done.clear()
            with stats_lock:
                shared["stats"] = cb.stats()
                shared["latency"] = cb.latency_summary()
                shared["progress"] = {
                    n2: len(cb._emitted.get(r, []))
                    for r, (n2, _h) in pending.items()}
            if not busy and not pending:
                if stopping.is_set():
                    break
                try:  # idle: block until the next request (or stop)
                    item = intake.get(timeout=0.5)
                    intake.put(item)
                except queue.Empty:
                    continue
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
    dt = time.perf_counter() - t0
    st = cb.stats()
    print(f"served {n_sub} requests in {dt:.1f}s; "
          f"{st['committed_tokens']:.0f} tokens, "
          f"occupancy {st['occupancy']:.0%}", file=sys.stderr)
    return 0


def _serve_follow(scheme, build_cb, parse_request, args) -> int:
    """ONLINE serving loop: JSONL requests from stdin submit into the
    live pool between decode segments; each completion streams one JSON
    line to stdout immediately. Ends when stdin closes AND the pool
    drains. Uses select() so intake never blocks decode: with work
    active the loop polls, idle it waits on the pipe."""
    import select

    from .generate import _write_midi

    os.makedirs(args.outdir, exist_ok=True)
    names = {}

    def deliver(rid, toks):
        path = os.path.join(args.outdir, f"{names[rid]}.mid")
        _write_midi(scheme, toks, path)
        print(json.dumps({"id": names[rid], "file": path,
                          "tokens": int(len(toks))}), flush=True)

    # per-row sampling always on: requests with their own params can
    # arrive at any time (the flag picks the program at construction)
    cb = build_cb(True, deliver)
    cb.warm(widths=True)
    print(json.dumps({"ready": True, "slots": args.slots}), flush=True)

    fh = sys.stdin
    fd = fh.fileno()
    rbuf = b""
    eof = False
    ln = 0
    n_sub = 0

    def take_lines():
        """Every complete line the pipe has ready, without blocking.
        select() on the RAW fd must pair with os.read: a buffered
        readline() can pull several lines into Python's TextIOWrapper
        buffer while select then reports the fd empty — a burst of
        requests written in one pipe write would stall after the
        first."""
        nonlocal rbuf, eof
        out = []
        while not eof and select.select([fh], [], [], 0)[0]:
            chunk = os.read(fd, 1 << 16)
            if not chunk:
                eof = True
                break
            rbuf += chunk
        while b"\n" in rbuf:
            raw, rbuf = rbuf.split(b"\n", 1)
            out.append(raw.decode())
        if eof and rbuf:               # trailing line without newline
            out.append(rbuf.decode())
            rbuf = b""
        return out

    t0 = time.perf_counter()
    while True:
        for line in take_lines():
            if not line.strip():
                continue
            try:
                name, toks, max_new, eos, sp, extra = parse_request(
                    line.strip(), ln)
            except (ValueError, TypeError, KeyError,
                    AttributeError) as e:
                # malformed field types must error THIS line, not
                # kill the server with queued requests in flight
                print(json.dumps({"id": str(ln), "error": str(e)}),
                      flush=True)
                ln += 1
                continue
            ln += 1
            try:
                rid = cb.submit(toks, max_new, eos_id=eos, sampling=sp,
                                **extra)
            except ValueError as e:
                print(json.dumps({"id": name, "error": str(e)}),
                      flush=True)
                continue
            names[rid] = name
            n_sub += 1
        busy = cb.step()
        # results stream through deliver(); run() is what consumes done
        cb.done.clear()
        if not busy:
            if eof:
                break
            # idle pool: block until the next request (or EOF)
            if not select.select([fh], [], [], 1.0)[0]:
                continue
    dt = time.perf_counter() - t0
    st = cb.stats()
    print(f"served {n_sub} requests in {dt:.1f}s; "
          f"{st['committed_tokens']:.0f} tokens, "
          f"occupancy {st['occupancy']:.0%}, "
          f"{st.get('compactions', 0):.0f} compactions", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
