"""Generate MIDI from a trained checkpoint.

One CLI replaces the reference's per-model generate.py scripts
(MusicTransformer/generate.py, Event_MelodyRNN/generate.py, ...):

    python -m musicgeneration_tpu.cli.generate <ckpt_dir_or_file> out.mid \
        --steps 512 --prime prompt.mid --temperature 1.0 --topk 0

The checkpoint carries the training CLI config + model kwargs (written
by cli.train), so the model is rebuilt without re-specifying it.
Decoding is the KV-cached lax.scan engine (decode/engine.py) — the
reference's per-token full re-forward (network.py:52-78) exists only as
bench.py's baseline schedule.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

import numpy as np


def _prime_tokens(scheme: str, prime: Optional[str],
                  prime_len: int) -> List[int]:
    """Tokenize a prompt MIDI; default prime = [24, 28, 31]
    (MusicTransformer/generate.py:103-110)."""
    if prime is None:
        return [24, 28, 31]
    if scheme in ("midilike", "midilike_control"):
        from ..tokenizers import midilike
        arr = midilike.extract_events(prime).to_array()
    elif scheme == "remi":
        from ..tokenizers import remi
        arr = remi.REMI_EventSeq.to_array(
            remi.REMI_EventSeq.extract_events(prime))
    elif scheme == "pedal":
        from ..tokenizers import pedal_midilike
        arr = np.asarray(pedal_midilike.encode_midi(prime))
    elif scheme == "melody":
        from ..tokenizers import melody
        arr = melody.midi_to_note_array(prime)
    else:
        raise ValueError(f"cannot prime scheme {scheme!r}")
    return [int(t) for t in arr[:prime_len]]


def _write_midi(scheme: str, tokens: np.ndarray, path: str) -> None:
    tokens = np.asarray(tokens)
    if scheme in ("midilike", "midilike_control"):
        from ..tokenizers import midilike
        # sampled pad/eos ids (>= vocab dim) are dropped before decoding —
        # same documented sanitization as pedal_midilike.decode_midi
        tokens = tokens[tokens < midilike.EventSeq.dim()]
        midilike.write_midi(midilike.EventSeq.from_array(tokens), path)
    elif scheme == "remi":
        from ..tokenizers import remi
        tokens = tokens[tokens < remi.REMI_EventSeq.dim()]
        remi.REMI_EventSeq.write_midi(
            remi.REMI_EventSeq.from_array(tokens), path)
    elif scheme == "pedal":
        from ..tokenizers import pedal_midilike
        pedal_midilike.decode_midi([int(t) for t in tokens], path)
    elif scheme == "melody":
        from ..tokenizers import melody
        # drop sampled pad ids (the melody+transformer config adds a pad
        # slot above the 130-id note-array vocab)
        tokens = tokens[tokens < melody.MELODY_VOCAB]
        melody.note_array_to_midi(tokens, path)
    elif scheme == "cp":
        from ..tokenizers import cp as cp_codec
        cp_codec.write_midi(tokens.reshape(-1, 8), path)
    elif scheme == "mumidi":
        from ..tokenizers.mumidi import MuMIDI_EventSeq
        MuMIDI_EventSeq.write_midi(
            MuMIDI_EventSeq.from_array(tokens.astype(np.int64)), path)
    else:
        raise ValueError(f"cannot write scheme {scheme!r}")


def _melody_compound_from_midi(prime: str, max_bars: int,
                               max_bar_len: int):
    """Melody MIDI -> packed compound (src [bars, S, 7] int32,
    src_len [bars] int32) for PoPMAG decoding — the input side of the
    reference's generate_arrangement (PoPMAG_RNN/generate.py:150-177).
    Shared by cli.generate --model popmag and cli.serve's PoPMAG
    requests."""
    from ..data import mumidi_packing as mp
    from ..tokenizers.mumidi import MuMIDI_EventSeq

    melody_events, _ = MuMIDI_EventSeq.extract_split_events(prime)
    if melody_events is None:
        raise ValueError(
            f"prime {prime!r} has no extractable melody track — "
            "PoPMAG needs a multi-track MIDI whose melody/role "
            "classification succeeds (MuMIDI.extract_split_events "
            "returned None, the reference's skip condition)")
    melody = MuMIDI_EventSeq.to_array(melody_events).astype(np.int64)
    bars = list(MuMIDI_EventSeq.segmentation(melody))[:max_bars]
    # truncate at the first overlong bar — clipping inside a bar would
    # cut compound token groups mid-way (same rule as train batching)
    for k, bar in enumerate(bars):
        if len(bar) > max_bar_len:
            bars = bars[:k]
            break
    if not bars:
        raise ValueError(
            "prime melody has no usable bars after MuMIDI encoding "
            "(first bar longer than max_bar_len?)")
    packed, lens = mp.pack_compound(bars, 0)
    s_len = max(len(a) for a in packed)
    src = np.zeros((len(packed), s_len, 7), np.int32)
    for gi, arr in enumerate(packed):
        src[gi, :len(arr)] = arr
    src_len = np.maximum(np.asarray(lens, np.int32), 1)
    return src, src_len


def _dp_mesh(dp: int, batch: int, tp: int = 1):
    """Shared --dp/--tp validation + mesh construction for the engine,
    CP and PoPMAG decode branches: friendly SystemExit on too-few
    devices or a non-divisible batch instead of a make_mesh reshape
    error."""
    import jax

    from ..parallel.mesh import make_mesh

    if batch % dp:
        raise SystemExit(f"--batch {batch} not divisible by --dp {dp}")
    need = dp * tp
    if len(jax.devices()) < need:
        raise SystemExit(f"--dp {dp} x --tp {tp} needs {need} devices, "
                         f"have {len(jax.devices())}")
    return make_mesh(dp=dp, tp=tp, sp=1, devices=jax.devices()[:need])


def _parse_control(spec: str, index: Optional[int],
                   seed: int) -> np.ndarray:
    """--control value -> control array [S, control_dim].

    Reference semantics (PerformanceRNN/generate.py:103-131): a file or
    directory loads a processed control sequence (here: a tokenized
    midilike_control corpus dir or one .npz shard; a random sequence is
    picked unless --control-index); otherwise the value is parsed as
    'p1,...,p12;density' (empty histogram = uniform) and the single
    control repeats at every step."""
    from ..tokenizers.midilike import Control, ControlSeq

    if os.path.isdir(spec) or os.path.isfile(spec):
        comp = _load_compressed_controls(spec, index, seed)
        return ControlSeq.recover_compressed_array(comp)  # [S, 24]
    hist_s, dens_s = spec.split(";")
    vals = [v for v in hist_s.split(",") if v]
    if not vals:
        hist = (np.ones(12) / 12).tolist()
    else:
        hist = np.array([float(v) for v in vals])
        if hist.size != 12 or np.any(hist < 0):
            raise SystemExit("--control pitch histogram needs 12 "
                             "non-negative values")
        hist = (hist / hist.sum() if hist.sum()
                else np.ones(12) / 12).tolist()
    density = int(dens_s)
    if density not in range(len(ControlSeq.note_density_bins)):
        raise SystemExit(f"--control note density must be in "
                         f"[0, {len(ControlSeq.note_density_bins)})")
    return Control(hist, density).to_array()[None]  # [1, 24]


def _load_compressed_controls(path: str, index: Optional[int],
                              seed: int) -> np.ndarray:
    """Compressed [S, 13] controls from a tokenized corpus dir or one
    .npz shard produced by cli.tokenize --scheme midilike_control."""
    if os.path.isdir(path):
        from ..data.pipeline import TokenCorpus
        corpus = TokenCorpus(path)
        if not len(corpus):
            raise SystemExit(f"no sequences in corpus {path!r}")
        i = (np.random.RandomState(seed).randint(0, len(corpus))
             if index is None else index)
        return np.asarray(corpus.pair(i, "controls"),
                          np.uint8).reshape(-1, 13)
    with np.load(path) as z:
        if "controls" not in z or "controls_offsets" not in z:
            raise SystemExit(f"{path!r} has no control data (tokenize "
                             "with --scheme midilike_control)")
        offs = z["controls_offsets"]
        i = (np.random.RandomState(seed).randint(0, len(offs) - 1)
             if index is None else index)
        return np.asarray(z["controls"][offs[i]:offs[i + 1]],
                          np.uint8).reshape(-1, 13)


def main(argv=None) -> int:
    from ..utils import enable_persistent_compile_cache
    enable_persistent_compile_cache()  # MG_NO_COMPILE_CACHE=1 opts out
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", help="checkpoint file or directory "
                   "(latest is used)")
    p.add_argument("output", help="output .mid path")
    p.add_argument("--steps", type=int, default=512)
    p.add_argument("--prime", default=None, help="prompt MIDI file")
    p.add_argument("--prime-len", type=int, default=500,
                   help="max prompt tokens (reference generate.py:106)")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--topk", type=int, default=0)
    p.add_argument("--topp", type=float, default=1.0,
                   help="nucleus sampling mass; 1.0 (or 0) = off")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--beam", type=int, default=0,
                   help="beam size for the RNN LMs (reference "
                        "beam_search, Event_MelodyRNN/network.py:166-268)")
    p.add_argument("--stochastic-beam", action="store_true",
                   help="Gumbel-perturbed beam (reference "
                        "stochastic_beam_search)")
    p.add_argument("--quant", default="none", choices=("none", "int8"),
                   help="weight-only int8 STREAMING decode (d_model >= "
                        "1024 models): halves per-step weight HBM "
                        "traffic and weight memory at ~1e-2 logit error")
    p.add_argument("--include-prime", action="store_true",
                   help="write prompt + continuation instead of "
                        "continuation only")
    p.add_argument("--control", default=None,
                   help="PerformanceRNN conditioning (reference "
                        "PerformanceRNN/generate.py:20-29): either "
                        "'PITCH_HISTOGRAM;NOTE_DENSITY' like "
                        "'2,0,1,1,0,1,0,1,1,0,0,1;4' or ';3' (uniform "
                        "pitches), or a tokenized midilike_control corpus "
                        "directory / .npz shard whose per-event control "
                        "sequence drives every step")
    p.add_argument("--control-index", type=int, default=None,
                   help="sequence index inside a --control corpus "
                        "(default: random, like the reference's "
                        "np.random.choice)")
    p.add_argument("--init-zero", action="store_true",
                   help="zero init latent instead of N(0,1) (reference "
                        "generate.py:-z)")
    p.add_argument("--batch", type=int, default=1,
                   help="generate N continuations in one device batch; "
                        "N>1 writes <stem>-000.mid ... like the "
                        "reference's per-batch outputs "
                        "(PerformanceRNN/generate.py:190-196)")
    p.add_argument("--dp", type=int, default=1,
                   help="shard the batch over N devices (data-parallel "
                        "decode on a ('data',...) mesh; --batch must be "
                        "divisible by N; greedy output is identical to "
                        "--dp 1, sampled runs use per-shard rng streams)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel decode (music_transformer): "
                        "attention heads / FFN shard over N devices on "
                        "the 'model' mesh axis (composes with --dp as a "
                        "dp x tp mesh; pins the XLA decode path — "
                        "decode/engine.py generate_tp). Token-identical "
                        "to --tp 1")
    p.add_argument("--spec", default=None, metavar="lookup|DRAFT_CKPT",
                   help="speculative decoding (music_transformer): "
                        "'lookup' = draft-free n-gram prompt-lookup "
                        "proposals; otherwise a smaller "
                        "music_transformer checkpoint drafts. Exact: "
                        "greedy output is token-identical to plain "
                        "decoding; a small-batch LATENCY feature "
                        "(decode/speculative.py)")
    p.add_argument("--spec-chunk", type=int, default=8,
                   help="tokens per speculative verify forward")
    p.add_argument("--spec-ngram", type=int, default=3,
                   help="lookup match length (--spec lookup)")
    args = p.parse_args(argv)

    import jax

    from ..cli.train import TrainCLIConfig, build_session
    from ..decode import DecodeParams, generate
    from ..decode.sampling import SamplingParams
    from ..utils.checkpoint import restore_checkpoint

    payload = restore_checkpoint(args.checkpoint)
    meta = payload.get("config", {})
    if "cli" not in meta:
        raise SystemExit("checkpoint has no CLI config; re-save with "
                         "cli.train or load it programmatically")
    cfg = TrainCLIConfig.from_dict(meta["cli"])
    scheme = meta.get("scheme", "midilike")
    model_kwargs = dict(meta.get("model_kwargs", {}))
    scanned = bool(model_kwargs.pop("scan_layers", False))
    if args.quant != "none":
        if cfg.model not in ("music_transformer", "cp_transformer"):
            raise SystemExit("--quant applies to the transformer "
                             "families (fused streaming decode)")
        model_kwargs["decode_quant"] = args.quant
    if args.tp > 1:
        if cfg.model != "music_transformer":
            raise SystemExit("--tp applies to model=music_transformer")
        if args.quant != "none":
            raise SystemExit("--quant rides the fused kernels; --tp "
                             "pins the XLA decode path (pick one)")
        # the fused Pallas kernels are opaque to the SPMD partitioner
        model_kwargs["decode_impl"] = "xla"
    model, _tcfg, _apply, _loss, _adapter = build_session(
        cfg, scheme, model_kwargs)
    if (args.quant != "none"
            and not getattr(model, "_decode_fused", lambda: False)()):
        print("WARNING: --quant int8 rides the fused decode kernels "
              "(TPU backend); this run uses the XLA decode path and "
              "ignores it")
    params = payload["state"]["params"]
    if scanned or "layers_scan" in params:
        # scan_layers checkpoints store one stacked [L, ...] layer
        # subtree; decoding uses the unrolled layout. The params probe
        # also catches stacked trees whose kwargs never said so (e.g.
        # pp training injects scan_layers at session-build time)
        from ..models.music_transformer import unstack_scanned_params
        params = unstack_scanned_params(dict(params), model.num_layers)
    print(f"restored {cfg.model} at step {payload['step']} "
          f"(scheme={scheme})")
    if cfg.model == "popmag":
        if args.prime is None:
            raise SystemExit("popmag needs --prime <melody midi> "
                             "(melody -> arrangement seq2seq)")

        _generate_arrangement(model, params, cfg, args)
        return 0
    if cfg.model == "cp_transformer":
        _generate_cp(model, params, cfg, args)
        return 0

    if args.spec is not None:
        if cfg.model != "music_transformer":
            raise SystemExit("--spec needs a music_transformer target "
                             "(chunked verify forward)")
        if args.dp > 1 or args.beam > 1:
            raise SystemExit("--spec is mutually exclusive with --dp "
                             "and --beam")

    controls = cache0 = None
    if args.control is not None:
        if cfg.model != "performance_rnn":
            raise SystemExit("--control is PerformanceRNN conditioning "
                             "(reference PerformanceRNN/generate.py)")
        ctrl = _parse_control(args.control, args.control_index, args.seed)
        if args.steps <= 0:
            # reference: max_len defaults to the control sequence length
            if ctrl.shape[0] <= 1:
                raise SystemExit("--steps must be given with a single "
                                 "control spec")
            args.steps = int(ctrl.shape[0])
        elif ctrl.shape[0] > 1 and ctrl.shape[0] < args.steps:
            raise SystemExit(
                f"control sequence ({ctrl.shape[0]}) shorter than --steps "
                f"({args.steps}) (reference expand_controls asserts "
                "controls.shape[0] >= steps, network.py:97-104)")
        import jax.numpy as _jnp
        controls = _jnp.asarray(ctrl, _jnp.float32)[:, None, :]

    nb = max(args.batch, 1)
    if cfg.model == "performance_rnn":
        # reference generation starts from the primary event with a
        # latent-derived hidden (generate.py:171-175, network.py:89-95);
        # each batch row gets its own latent
        import jax as _jax
        import jax.numpy as _jnp
        init = (_jnp.zeros((nb, model.init_dim)) if args.init_zero else
                _jax.random.normal(_jax.random.PRNGKey(args.seed + 7),
                                   (nb, model.init_dim)))
        cache0 = model.apply({"params": params}, nb, 0, init,
                             method=model.init_cache)
        if args.prime is None:
            prime = [model.primary_event]
        else:
            prime = [model.primary_event] + _prime_tokens(
                scheme, args.prime, args.prime_len)
    else:
        prime = _prime_tokens(scheme, args.prime, args.prime_len)
    prompt = np.tile(np.asarray(prime, np.int32)[None], (nb, 1))
    if controls is not None and nb > 1:
        import jax.numpy as _jnp
        controls = _jnp.broadcast_to(
            controls, (controls.shape[0], nb, controls.shape[2]))
    # top_p=0 would mean "keep only the argmax" in sample_logits; treat it
    # as off (the flag's documented default) so sampling stays categorical
    # temperature 0 = greedy, consistently with the CP/PoPMAG branches
    # (dividing by the 1e-6 floor would be a numerically extreme argmax)
    sampling = SamplingParams(temperature=args.temperature,
                              top_k=args.topk,
                              top_p=args.topp if args.topp > 0 else 1.0,
                              greedy=(args.temperature == 0.0))
    if args.beam > 1:
        if cfg.model not in ("event_rnn", "performance_rnn"):
            raise SystemExit("--beam is for the RNN LMs "
                             "(event_rnn / performance_rnn)")
        if nb > 1:
            raise SystemExit("--batch and --beam are mutually exclusive "
                             "(a beam already explores N hypotheses)")
        if args.dp > 1 or args.tp > 1:
            raise SystemExit("--dp/--tp do not apply to beam search "
                             "(single-hypothesis-set decode)")
        out = _beam_decode(model, params, prompt, args,
                           controls=controls, cache0=cache0)
    elif (cfg.model == "music_transformer"
          and len(prime) + args.steps > model.max_seq):
        if nb > 1 or args.dp > 1 or args.tp > 1 or args.spec is not None:
            raise SystemExit("--batch/--dp/--tp/--spec with a "
                             "continuation beyond max_seq (sliding "
                             "window) is not supported")
        # continuation longer than the relative table: sliding-window
        # re-priming (the reference's threshold_len behavior done in
        # cached chunks — decode/engine.py)
        import jax.numpy as jnp

        from ..decode.engine import generate_sliding

        # cache is 2*window, which must fit the relative table
        window = max(model.max_seq // 2, 16)
        out = generate_sliding(model, params, jnp.asarray(prompt),
                               jax.random.PRNGKey(args.seed), args.steps,
                               window=window, sampling=sampling)[0]
    else:
        # bucket the prime to a static length so different prime lengths
        # reuse ONE compiled decode scan (compiles take minutes on the
        # tunneled TPU); the engine gates the pad positions off the cache
        prompt_len = None
        if controls is None and args.spec is None:
            bucket = 16
            while bucket < prompt.shape[1]:
                bucket *= 2
            if (cfg.model != "music_transformer"
                    or bucket + args.steps <= model.max_seq):
                p_true = prompt.shape[1]
                pad_tok = (model.pad_id
                           if cfg.model == "music_transformer" else 0)
                prompt = np.pad(prompt,
                                ((0, 0), (0, bucket - p_true)),
                                constant_values=pad_tok)
                import jax.numpy as _jnp
                prompt_len = _jnp.int32(p_true)
        max_len = prompt.shape[1] + args.steps
        if cfg.model == "music_transformer":
            max_len = min(max(cfg.seq_len, max_len), model.max_seq)
        dp = DecodeParams(max_len=max_len, steps=args.steps,
                          sampling=sampling)
        if args.spec is not None:
            if args.tp > 1:
                raise SystemExit("--spec with --tp is not supported")
            outs = _speculative_decode(model, params, prompt, dp, args,
                                       scheme)
        elif args.tp > 1:
            # heads/FFN sharded over the 'model' mesh axis (composed
            # with --dp batch sharding; decode/engine.py generate_tp)
            from ..decode.engine import generate_tp

            mesh = _dp_mesh(args.dp, nb, tp=args.tp)
            outs = np.asarray(generate_tp(
                model, params, prompt, jax.random.PRNGKey(args.seed),
                dp, mesh, controls, cache0, prompt_len))
        elif args.dp > 1:
            # batch-sharded decode over the 'data' mesh axis
            # (decode/engine.py generate_dp)
            from ..decode.engine import generate_dp

            mesh = _dp_mesh(args.dp, nb)
            outs = np.asarray(generate_dp(
                model, params, prompt, jax.random.PRNGKey(args.seed),
                dp, mesh, controls, cache0, prompt_len))
        else:
            outs = np.asarray(generate(model, params, prompt,
                                       jax.random.PRNGKey(args.seed), dp,
                                       controls, cache0, prompt_len))
        if nb > 1:
            import os as _os
            stem, ext = _os.path.splitext(args.output)
            for i, row in enumerate(outs):
                tokens = (np.concatenate([np.asarray(prime, np.int32),
                                          row])
                          if args.include_prime else row)
                path_i = f"{stem}-{i:03d}{ext or '.mid'}"
                _write_midi(scheme, tokens, path_i)
                print(f"wrote {path_i} ({len(tokens)} tokens)")
            return 0
        out = outs[0]
    tokens = (np.concatenate([np.asarray(prime, np.int32), out])
              if args.include_prime else out)
    _write_midi(scheme, tokens, args.output)
    print(f"wrote {args.output} ({len(tokens)} tokens)")
    return 0


def _speculative_decode(model, params, prompt: np.ndarray, dp, args,
                        scheme: str) -> np.ndarray:
    """--spec dispatch: lookup drafting or a draft checkpoint
    (decode/speculative.py). Prints acceptance stats."""
    import jax
    import jax.numpy as jnp

    from ..decode import SpecParams, generate_speculative

    draft_model = draft_params = None
    if args.spec != "lookup":
        from ..cli.train import TrainCLIConfig, build_session
        from ..utils.checkpoint import restore_checkpoint

        payload = restore_checkpoint(args.spec)
        meta = payload.get("config", {})
        if "cli" not in meta:
            raise SystemExit("--spec draft checkpoint has no CLI config")
        dcfg = TrainCLIConfig.from_dict(meta["cli"])
        if dcfg.model != "music_transformer":
            raise SystemExit("--spec draft must be a music_transformer "
                             "checkpoint (or 'lookup')")
        dkwargs = dict(meta.get("model_kwargs", {}))
        dscanned = bool(dkwargs.pop("scan_layers", False))
        draft_model, _, _, _, _ = build_session(
            dcfg, meta.get("scheme", scheme), dkwargs)
        draft_params = payload["state"]["params"]
        if dscanned or "layers_scan" in draft_params:
            from ..models.music_transformer import unstack_scanned_params
            draft_params = unstack_scanned_params(
                dict(draft_params), draft_model.num_layers)
        if draft_model.vocab_size != model.vocab_size:
            raise SystemExit(
                f"draft vocab ({draft_model.vocab_size}) != target vocab "
                f"({model.vocab_size}) — train the draft on the same "
                "scheme")
    spec = SpecParams(chunk=args.spec_chunk, ngram=args.spec_ngram)
    try:
        outs, stats = generate_speculative(
            model, params, jnp.asarray(prompt), jax.random.PRNGKey(
                args.seed), dp, draft_model=draft_model,
            draft_params=draft_params, spec=spec, with_stats=True)
    except ValueError as e:
        raise SystemExit(str(e)) from e
    print(f"speculative: {stats['iterations']} verify forwards for "
          f"{args.steps} tokens "
          f"(mean accepted {stats['mean_accepted']:.2f}/"
          f"{spec.chunk - 1})")
    return np.asarray(outs)


def _beam_decode(model, params, prompt: np.ndarray, args,
                 controls=None, cache0=None) -> np.ndarray:
    """(Stochastic) beam search continuation for the GRU LMs.

    controls: optional [1 or S, 1, C] conditioning threaded per step
    (reference PerformanceRNN/network.py:156-257 beam with controls)."""
    import jax
    import jax.numpy as jnp

    from ..decode.beam import beam_search, replicate_for_beams
    from ..decode.engine import _prefill, expand_controls

    prompt_j = jnp.asarray(prompt, jnp.int32)  # [1, P]
    p = prompt_j.shape[1]
    cache = (cache0 if cache0 is not None else
             model.apply({"params": params}, 1, 0,
                         method=model.init_cache))
    ctrl_all = (None if controls is None
                else expand_controls(controls, p + args.steps))
    if p > 1:
        cache, _, _ = _prefill(
            model, params, prompt_j[:, :-1], cache, jnp.int32(0),
            controls=None if ctrl_all is None else ctrl_all[:p - 1])
    # RNN caches carry batch on axis 1 ([layers, B, hidden])
    cache = replicate_for_beams(cache, args.beam, batch_axis=1)

    if ctrl_all is None:
        def step_fn(tokens, state):
            return model.apply({"params": params}, tokens, state,
                               method=model.decode_step)
        per_step = None
    else:
        def step_fn(tokens, state, ctrl):
            ctrl = jnp.broadcast_to(ctrl, (tokens.shape[0], ctrl.shape[-1]))
            return model.apply({"params": params}, tokens, state, None,
                               ctrl, method=model.decode_step)
        # the beam's step i feeds the token sampled for position p-1+i
        per_step = ctrl_all[p - 1:p - 1 + args.steps, 0]

    seq = beam_search(
        step_fn, cache, prompt_j[:, -1], steps=args.steps,
        beam_size=args.beam, vocab_size=model.event_dim,
        rng=jax.random.PRNGKey(args.seed),
        temperature=args.temperature or 1.0,
        stochastic=args.stochastic_beam, state_batch_axis=1,
        per_step_inputs=per_step)
    return np.asarray(seq[0])


def _generate_cp(model, params, cfg, args) -> None:
    """Compound-word continuation: prime rows from a MIDI (or a bare
    bar-marker row) -> type-first sampled rows -> MIDI."""
    import jax
    import jax.numpy as jnp

    from ..decode.cp_generate import generate_cp
    from ..tokenizers import cp as cp_codec

    if args.prime is not None:
        rows = cp_codec.extract_events(args.prime)[:args.prime_len]
        if not len(rows):
            raise SystemExit("prime MIDI produced no CP rows")
    else:
        import numpy as _np
        rows = _np.asarray(
            [cp_codec._row(cp_codec.FAMILY_METRIC, position=0)],
            _np.int32)  # start at a bar marker
    rows = rows[:max(1, model.max_seq - args.steps)]  # fit the table
    nb = max(args.batch, 1)
    prompt = jnp.tile(jnp.asarray(rows, jnp.int32)[None], (nb, 1, 1))
    mesh = None
    if getattr(args, "dp", 1) > 1:
        mesh = _dp_mesh(args.dp, nb)
    out = generate_cp(model, params, prompt,
                      jax.random.PRNGKey(args.seed), steps=args.steps,
                      max_len=rows.shape[0] + args.steps,
                      temperature=args.temperature or 1.0,
                      greedy=(args.temperature == 0.0), mesh=mesh)
    if nb > 1:
        import os as _os
        stem, ext = _os.path.splitext(args.output)
        for i in range(nb):
            all_rows = (np.concatenate([rows, out[i]])
                        if args.include_prime else out[i])
            path_i = f"{stem}-{i:03d}{ext or '.mid'}"
            cp_codec.write_midi(all_rows, path_i)
            print(f"wrote {path_i} ({len(all_rows)} compound rows)")
        return
    all_rows = np.concatenate([rows, out[0]]) if args.include_prime \
        else out[0]
    cp_codec.write_midi(all_rows, args.output)
    print(f"wrote {args.output} ({len(all_rows)} compound rows)")


def _generate_arrangement(model, params, cfg, args) -> None:
    """Melody MIDI -> multi-track arrangement MIDI (reference
    PoPMAG_RNN/generate.py:177 / network.py:366-417)."""
    import jax
    import jax.numpy as jnp

    from ..decode.popmag_generate import (
        flatten_arrangement,
        generate_arrangement,
    )
    from ..tokenizers.mumidi import MuMIDI_EventSeq

    try:
        src, src_len = _melody_compound_from_midi(
            args.prime, cfg.max_bars, cfg.max_bar_len)
    except ValueError as e:
        raise SystemExit(str(e))
    bars = list(range(src.shape[0]))     # bar count drives n_target_bar
    src, src_len = src[None], src_len[None]

    nb = max(args.batch, 1)
    if nb > 1:  # N stochastic arrangements: one latent per row
        src = np.tile(src, (nb, 1, 1, 1))
        src_len = np.tile(src_len, (nb, 1))
    init = jax.random.normal(jax.random.PRNGKey(args.seed),
                             (nb, model.init_dim))
    kwargs = dict(n_target_bar=len(bars),
                  greedy=(args.temperature == 0.0),
                  temperature=args.temperature or 1.0)
    if args.dp > 1:
        from ..decode.popmag_generate import generate_arrangement_dp
        mesh = _dp_mesh(args.dp, nb)
        tokens, valid = generate_arrangement_dp(
            model, params, init, jnp.asarray(src), jnp.asarray(src_len),
            jax.random.PRNGKey(args.seed + 1), mesh=mesh, **kwargs)
    else:
        tokens, valid = generate_arrangement(
            model, params, init, jnp.asarray(src), jnp.asarray(src_len),
            jax.random.PRNGKey(args.seed + 1), **kwargs)
    flats = flatten_arrangement(np.asarray(tokens), np.asarray(valid))
    if nb > 1:
        stem, ext = os.path.splitext(args.output)
        for i, flat in enumerate(flats):
            path_i = f"{stem}-{i:03d}{ext or '.mid'}"
            MuMIDI_EventSeq.write_midi(MuMIDI_EventSeq.from_array(flat),
                                       path_i)
            print(f"wrote {path_i} ({len(flat)} tokens, "
                  f"{len(bars)} bars)")
        return
    flat = flats[0]
    events = MuMIDI_EventSeq.from_array(flat)
    MuMIDI_EventSeq.write_midi(events, args.output)
    print(f"wrote {args.output} ({len(flat)} tokens, {len(bars)} bars)")


if __name__ == "__main__":
    sys.exit(main())
