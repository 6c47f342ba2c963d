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
    if scheme in ("midilike", "midilike_control"):
        from ..tokenizers import midilike
        midilike.write_midi(midilike.EventSeq.from_array(tokens), path)
    elif scheme == "remi":
        from ..tokenizers import remi
        remi.REMI_EventSeq.write_midi(
            remi.REMI_EventSeq.from_array(tokens), path)
    elif scheme == "pedal":
        from ..tokenizers import pedal_midilike
        pedal_midilike.decode_midi([int(t) for t in tokens], path)
    elif scheme == "melody":
        from ..tokenizers import melody
        melody.note_array_to_midi(tokens, path)
    else:
        raise ValueError(f"cannot write scheme {scheme!r}")


def main(argv=None) -> int:
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
    p.add_argument("--topp", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--beam", type=int, default=0,
                   help="beam size for the RNN LMs (reference "
                        "beam_search, Event_MelodyRNN/network.py:166-268)")
    p.add_argument("--stochastic-beam", action="store_true",
                   help="Gumbel-perturbed beam (reference "
                        "stochastic_beam_search)")
    p.add_argument("--include-prime", action="store_true",
                   help="write prompt + continuation instead of "
                        "continuation only")
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
    model, _tcfg, _apply, _loss, _adapter = build_session(
        cfg, scheme, dict(meta.get("model_kwargs", {})))
    params = payload["state"]["params"]
    print(f"restored {cfg.model} at step {payload['step']} "
          f"(scheme={scheme})")
    if cfg.model == "popmag":
        if args.prime is None:
            raise SystemExit("popmag needs --prime <melody midi> "
                             "(melody -> arrangement seq2seq)")
        _generate_arrangement(model, params, cfg, args)
        return 0

    prime = _prime_tokens(scheme, args.prime, args.prime_len)
    prompt = np.asarray(prime, np.int32)[None]
    sampling = SamplingParams(temperature=args.temperature,
                              top_k=args.topk, top_p=args.topp)
    if args.beam > 1:
        if cfg.model not in ("event_rnn", "performance_rnn"):
            raise SystemExit("--beam is for the RNN LMs "
                             "(event_rnn / performance_rnn)")
        out = _beam_decode(model, params, prompt, args)
    elif (cfg.model == "music_transformer"
          and len(prime) + args.steps > model.max_seq):
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
        max_len = len(prime) + args.steps
        if cfg.model == "music_transformer":
            max_len = min(max(cfg.seq_len, max_len), model.max_seq)
        dp = DecodeParams(max_len=max_len, steps=args.steps,
                          sampling=sampling)
        out = np.asarray(generate(model, params, prompt,
                                  jax.random.PRNGKey(args.seed), dp))[0]
    tokens = (np.concatenate([prompt[0], out]) if args.include_prime
              else out)
    _write_midi(scheme, tokens, args.output)
    print(f"wrote {args.output} ({len(tokens)} tokens)")
    return 0


def _beam_decode(model, params, prompt: np.ndarray, args) -> np.ndarray:
    """(Stochastic) beam search continuation for the GRU LMs."""
    import jax
    import jax.numpy as jnp

    from ..decode.beam import beam_search, replicate_for_beams
    from ..decode.engine import _prefill

    prompt_j = jnp.asarray(prompt, jnp.int32)  # [1, P]
    cache = model.apply({"params": params}, 1, 0,
                        method=model.init_cache)
    if prompt_j.shape[1] > 1:
        cache, _, _ = _prefill(model, params, prompt_j[:, :-1], cache,
                               jnp.int32(0))
    # RNN caches carry batch on axis 1 ([layers, B, hidden])
    cache = replicate_for_beams(cache, args.beam, batch_axis=1)

    def step_fn(tokens, state):
        return model.apply({"params": params}, tokens, state,
                           method=model.decode_step)

    seq = beam_search(
        step_fn, cache, prompt_j[:, -1], steps=args.steps,
        beam_size=args.beam, vocab_size=model.event_dim,
        rng=jax.random.PRNGKey(args.seed),
        temperature=args.temperature or 1.0,
        stochastic=args.stochastic_beam, state_batch_axis=1)
    return np.asarray(seq[0])


def _generate_arrangement(model, params, cfg, args) -> None:
    """Melody MIDI -> multi-track arrangement MIDI (reference
    PoPMAG_RNN/generate.py:177 / network.py:366-417)."""
    import jax
    import jax.numpy as jnp

    from ..data import mumidi_packing as mp
    from ..decode.popmag_generate import (
        flatten_arrangement,
        generate_arrangement,
    )
    from ..tokenizers.mumidi import MuMIDI_EventSeq

    melody_events, _ = MuMIDI_EventSeq.extract_split_events(args.prime)
    melody = MuMIDI_EventSeq.to_array(melody_events).astype(np.int64)
    bars = list(MuMIDI_EventSeq.segmentation(melody))[:cfg.max_bars]
    # truncate at the first overlong bar — clipping inside a bar would cut
    # compound token groups mid-way (same rule as the train-side batching)
    for k, bar in enumerate(bars):
        if len(bar) > cfg.max_bar_len:
            bars = bars[:k]
            break
    if not bars:
        raise SystemExit("prime melody has no usable bars after MuMIDI "
                         "encoding (first bar longer than max_bar_len?)")
    packed, lens = mp.pack_compound(bars, 0)
    s_len = max(len(a) for a in packed)
    src = np.zeros((1, len(packed), s_len, 7), np.int32)
    for gi, arr in enumerate(packed):
        src[0, gi, :len(arr)] = arr
    src_len = np.maximum(np.asarray(lens, np.int32), 1)[None]

    init = jax.random.normal(jax.random.PRNGKey(args.seed),
                             (1, model.init_dim))
    tokens, valid = generate_arrangement(
        model, params, init, jnp.asarray(src), jnp.asarray(src_len),
        jax.random.PRNGKey(args.seed + 1), n_target_bar=len(bars),
        greedy=(args.temperature == 0.0),
        temperature=args.temperature or 1.0)
    flat = flatten_arrangement(np.asarray(tokens), np.asarray(valid))[0]
    events = MuMIDI_EventSeq.from_array(flat)
    MuMIDI_EventSeq.write_midi(events, args.output)
    print(f"wrote {args.output} ({len(flat)} tokens, {len(bars)} bars)")


if __name__ == "__main__":
    sys.exit(main())
