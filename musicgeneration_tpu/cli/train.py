"""Train any registered model on a tokenized corpus.

One CLI replaces the reference's five per-model train.py scripts
(SURVEY.md §2.4/§3): the model zoo shares one jit train step
(train/trainer.py), one loop driver with auto-resume + JSONL metrics
(train/loop.py), and dotted config overrides (utils/config.py — the
reference's eval-based `params2dict` CLI, shared.py:73-81, done safely).

    python -m musicgeneration_tpu.cli.train <shard_dir> \
        --model music_transformer --steps 2000 --ckpt-dir runs/mt \
        model.num_layers=6 model.d_model=256

Model-specific wiring (vocab size, batch adapter, objective) is looked
up by model name; everything else is shared.
"""

from __future__ import annotations

import argparse
import ast
import dataclasses
import sys
from typing import Any, Dict, Iterator, Optional

import numpy as np

from ..utils.config import Config, apply_overrides


@dataclasses.dataclass
class TrainCLIConfig(Config):
    model: str = "music_transformer"
    steps: int = 1000
    batch_size: int = 8
    seq_len: int = 512            # LM crop length (reference max_seq)
    train_mode: str = "crop"      # crop (slide_seq2seq) | segment
                                  # (reference Event_MelodyRNN default:
                                  # strided window index list, train.py:311-314)
                                  # | window (fixed window/stride,
                                  # train.py:209-261) | sequence
                                  # (length-sorted padded full seqs,
                                  # train.py:263-309 + SeqBatchify)
    window_size: int = 200        # window mode (Event_MelodyRNN/config.py:20)
    stride_size: int = 10
    # window-mode scheduled sampling (train.py:231-232): probability a
    # step's next input is the ground-truth event instead of the
    # model's own greedy sample; 1.0 (the reference's shipped config,
    # config.py:22) = pure teacher forcing
    teacher_forcing_ratio: float = 1.0
    seq_pad_to: Optional[int] = None  # sequence-mode pad length
                                      # (default: longest corpus seq)
    # Draft distillation (music_transformer): train this model against
    # a frozen teacher checkpoint's token distributions —
    # loss = (1-alpha)*smoothCE + alpha*T^2*KL(teacher_T || student_T).
    # The speculative-decoding recipe: distill a small draft
    # (model.num_layers=2 model.d_model=128) from the serving target's
    # checkpoint on the target's own corpus, then decode with
    # cli.generate --spec <draft ckpt>. distill_temp=1 optimizes
    # exactly the T=1 distribution match that drives spec-decode
    # acceptance.
    distill_from: Optional[str] = None
    distill_alpha: float = 0.5
    distill_temp: float = 1.0
    accum_steps: int = 1
    label_smoothing: float = 0.1
    warmup_steps: int = 4000
    peak_lr: Optional[float] = None   # fixed LR (RNN trainers use 1e-3)
    max_grad_norm: float = 1.0
    seed: int = 42
    ckpt_dir: Optional[str] = None
    ckpt_every: int = 500
    log_every: int = 10
    eval_every: int = 0
    eval_dir: Optional[str] = None
    metrics_path: Optional[str] = None
    profile_dir: Optional[str] = None
    # PoPMAG bucketing (static shapes across batches)
    max_bars: int = 16
    max_bar_len: int = 96
    # CP per-head loss weights, in tokenizers/cp field order (family,
    # position, tempo_class, tempo_value, chord, pitch, duration,
    # velocity); normalized to mean 1. The Compound Word Transformer
    # paper up-weights the routing "family" head — pass e.g.
    # cp_head_weights=(2,1,1,1,1,1,1,1). None = equal.
    cp_head_weights: Optional[tuple] = None
    # -- multi-chip SPMD (music_transformer; parallel/mesh.py) ---------
    # Any of these != default builds a ('data','seq','model') mesh over
    # all visible devices: dp = data parallel (defaults to n/(tp*sp)),
    # tp = tensor parallel, sp = sequence parallel (switches attention to
    # the ring impl), fsdp = ZeRO-3-style parameter sharding over 'data'.
    dp: Optional[int] = None
    tp: int = 1
    sp: int = 1
    fsdp: bool = False
    # pp = pipeline parallel (parallel/pipeline.py): layer stages over a
    # 'pipe' mesh axis, GPipe microbatching. pp_microbatches = GPipe
    # microbatches per train(-accum) batch (0 -> pp); batch_size must
    # divide by it, and the microbatch by dp. Composes with dp only.
    pp: int = 1
    pp_microbatches: int = 0


def _default_vocab(scheme: str) -> int:
    """Vocab sizes the reference derives in each config.py
    (MusicTransformer/config.py:11-16: vocab = event_dim + 1 pad)."""
    if scheme in ("midilike", "midilike_control"):
        from ..tokenizers.midilike import EventSeq
        return EventSeq.dim() + 1
    if scheme == "remi":
        from ..tokenizers.remi import REMI_EventSeq
        return REMI_EventSeq.dim() + 1
    if scheme == "pedal":
        from ..tokenizers import pedal_midilike
        return pedal_midilike.VOCAB_SIZE + 2
    if scheme == "melody":
        from ..tokenizers.melody import MELODY_VOCAB
        return MELODY_VOCAB
    raise ValueError(f"no LM vocab for scheme {scheme!r}")


def _batch_rng(seed: int, idx: int, tag: int = 0) -> np.random.RandomState:
    """Counter-based per-batch RNG: batch `idx` is a PURE FUNCTION of
    (seed, idx), so a preempted-and-resumed run regenerates exactly the
    batch an uninterrupted run would consume at the same step —
    deterministic data-stream resume, which the reference only gestures
    at by resuming its epoch counter (MusicTransformer/train.py:146-153).
    `tag` separates independent sub-streams (epoch permutations vs
    per-batch draws) so they never alias."""
    ss = np.random.SeedSequence([int(seed), int(tag), int(idx)])
    return np.random.RandomState(ss.generate_state(4))


def _indexed_stream(batch_at, start: int = 0) -> Iterator:
    """Infinite stream yielding batch_at(start), batch_at(start+1), ...
    Training step s always consumes batch index s (the resume cursor is
    the step number itself — no side-channel state)."""
    import itertools
    return (batch_at(i) for i in itertools.count(start))


def _lm_batch_fn(corpus, cfg: TrainCLIConfig):
    """slide_seq2seq_batch stream (MusicTransformer/data.py:63-67),
    indexed by batch number."""
    from ..data.batching import slide_seq2seq_batch

    seqs = [np.asarray(corpus[i]) for i in range(len(corpus))]
    b = cfg.batch_size * cfg.accum_steps

    def batch_at(idx: int):
        return slide_seq2seq_batch(seqs, b, cfg.seq_len,
                                   _batch_rng(cfg.seed, idx))

    return batch_at


def _segment_batch_fn(corpus, cfg: TrainCLIConfig):
    """Reference Event_MelodyRNN segment mode (train.py:311-325):
    window = min(seq lens) (capped at seq_len+1), stride = window//3,
    the full (file, start) index list shuffled per epoch. Indexed form:
    batch idx maps to (epoch, position) analytically; the epoch's
    permutation is regenerated from (seed, epoch), so resume lands
    mid-epoch on exactly the window the uninterrupted run would see."""
    from ..data.batching import gather_windows, window_indices

    seqs = [np.asarray(corpus[i]) for i in range(len(corpus))]
    lens = [len(s) for s in seqs]
    window = min(min(lens), cfg.seq_len + 1)
    stride = max(window // 3, 1)
    indices = window_indices(lens, window, stride)
    b = cfg.batch_size * cfg.accum_steps
    if len(indices) < b:
        raise ValueError(
            f"segment mode: only {len(indices)} windows (window={window}, "
            f"stride={stride}) for batch {b} — corpus too small. NB the "
            "reference's indexing yields ZERO windows for the minimum-"
            "length file (data.py:77 exclusive stop, reproduced here)")
    # batches per epoch, matching range(0, len(order) - b + 1, b)
    per_epoch = (len(indices) - b) // b + 1

    def batch_at(idx: int):
        epoch, pos = divmod(idx, per_epoch)
        order = _batch_rng(cfg.seed, epoch, tag=1).permutation(
            len(indices))
        sel = indices[order[pos * b:pos * b + b]]
        batch = gather_windows(seqs, sel, window,
                               time_major=False).astype(np.int32)
        return batch[:, :-1], batch[:, 1:]

    return batch_at


def _window_batch_fn(corpus, cfg: TrainCLIConfig):
    """Reference Event_MelodyRNN window mode (train.py:209-218): FIXED
    window_size/stride_size (config.py:20-21, defaults 200/10) index
    list over every file, shuffled per epoch, drop_last. Differs from
    segment mode only in where the window geometry comes from (segment
    derives it from the shortest file). The batch is the FULL window —
    both the teacher inputs (the model drops the last internally) and
    the loss target (train.py:233: CE(outputs, events))."""
    from ..data.batching import gather_windows, window_indices

    seqs = [np.asarray(corpus[i]) for i in range(len(corpus))]
    w = cfg.window_size
    indices = window_indices([len(s) for s in seqs], w, cfg.stride_size)
    b = cfg.batch_size * cfg.accum_steps
    if len(indices) < b:
        raise ValueError(
            f"window mode: only {len(indices)} windows "
            f"(window_size={w}, stride_size={cfg.stride_size}) for "
            f"batch {b} — corpus too small (NB data.py:77's exclusive "
            "stop drops exactly-fitting tails, reproduced here)")
    per_epoch = (len(indices) - b) // b + 1

    def batch_at(idx: int):
        epoch, pos = divmod(idx, per_epoch)
        order = _batch_rng(cfg.seed, epoch, tag=1).permutation(
            len(indices))
        sel = indices[order[pos * b:pos * b + b]]
        batch = gather_windows(seqs, sel, w,
                               time_major=False).astype(np.int32)
        return batch, batch

    return batch_at


def _sequence_batch_fn(corpus, cfg: TrainCLIConfig):
    """Reference Event_MelodyRNN sequence mode (train.py:263-272):
    whole sequences, shuffled per epoch, drop_last; each batch is
    SeqBatchified (data.py:23-36 — length-sorted descending, padded,
    labels = the shifted unpadded tails) via pad_and_batch_sequences.
    Every batch pads to ONE static length (the longest corpus sequence,
    or seq_pad_to) so the train step compiles once."""
    from ..data.batching import pad_and_batch_sequences

    seqs = [np.asarray(corpus[i]) for i in range(len(corpus))]
    max_len = max(len(s) for s in seqs)
    pad_to = cfg.seq_pad_to or max_len
    if max_len > pad_to:
        raise ValueError(
            f"sequence mode: longest corpus sequence ({max_len}) "
            f"exceeds seq_pad_to={pad_to} — raise it (truncating full "
            "sequences would silently change the reference semantics)")
    b = cfg.batch_size * cfg.accum_steps
    if len(seqs) < b:
        raise ValueError(
            f"sequence mode: {len(seqs)} sequences < batch {b} "
            "(drop_last leaves no batch)")
    per_epoch = len(seqs) // b

    def batch_at(idx: int):
        epoch, pos = divmod(idx, per_epoch)
        order = _batch_rng(cfg.seed, epoch, tag=2).permutation(len(seqs))
        pick = order[pos * b:pos * b + b]
        sb = pad_and_batch_sequences([seqs[i] for i in pick],
                                     pad_to=pad_to)
        return ({"tokens": sb.tokens, "lengths": sb.lengths},
                np.zeros((b,), np.int32))

    return batch_at


def _control_batch_fn(corpus, cfg: TrainCLIConfig):
    """Aligned (tokens, controls) random crops for PerformanceRNN
    (the conditioning dataset the reference's broken
    Event_Control_Dataset import was meant to provide)."""
    from ..tokenizers.midilike import ControlSeq

    pairs = []
    for i in range(len(corpus)):
        toks = np.asarray(corpus[i])
        ctrl = np.asarray(corpus.pair(i, "controls"),
                          np.uint8).reshape(-1, 13)
        if len(toks) > cfg.seq_len:
            pairs.append((toks, ctrl))
    if not pairs:
        raise ValueError(f"no sequence longer than {cfg.seq_len}")
    b = cfg.batch_size * cfg.accum_steps

    def batch_at(idx: int):
        rng = _batch_rng(cfg.seed, idx)
        xs = np.zeros((b, cfg.seq_len), np.int32)
        cs = np.zeros((b, cfg.seq_len, ControlSeq.dim()), np.float32)
        for row in range(b):
            toks, ctrl = pairs[rng.randint(0, len(pairs))]
            start = rng.randint(0, len(toks) - cfg.seq_len)
            xs[row] = toks[start:start + cfg.seq_len]
            cs[row] = ControlSeq.recover_compressed_array(
                ctrl[start:start + cfg.seq_len])
        return xs, cs

    return batch_at


def _cp_batch_fn(corpus, cfg: TrainCLIConfig):
    """Random crops of seq_len+1 COMPOUND ROWS (shards store the [T, 8]
    arrays flattened; width 8 is fixed by the scheme)."""
    from ..tokenizers.cp import WIDTH

    seqs = [np.asarray(corpus[i]).reshape(-1, WIDTH)
            for i in range(len(corpus))]
    seqs = [s for s in seqs if len(s) > cfg.seq_len]
    if not seqs:
        raise ValueError(f"no CP sequence longer than {cfg.seq_len} rows")
    b = cfg.batch_size * cfg.accum_steps

    def batch_at(idx: int):
        rng = _batch_rng(cfg.seed, idx)
        xs = np.zeros((b, cfg.seq_len + 1, WIDTH), np.int32)
        for row in range(b):
            s = seqs[rng.randint(0, len(seqs))]
            start = rng.randint(0, len(s) - cfg.seq_len)
            xs[row] = s[start:start + cfg.seq_len + 1]
        return xs[:, :-1], xs[:, 1:]

    return batch_at


def _popmag_batch_fn(corpus, cfg: TrainCLIConfig):
    from ..data.mumidi_packing import pack_batch
    from ..tokenizers.mumidi import MuMIDI_EventSeq

    seg = MuMIDI_EventSeq.segmentation
    pairs = []
    for i in range(len(corpus)):
        mel = seg(np.asarray(corpus.pair(i, "melody"), np.int64))
        arr = seg(np.asarray(corpus.pair(i, "arrangement"), np.int64))
        n = min(len(mel), len(arr), cfg.max_bars)
        # truncate at the first overlong bar — clipping INSIDE a bar would
        # cut compound token groups mid-way and corrupt the label packing
        # (the trailing bar token pack_batch appends needs one slot)
        for k in range(n):
            if (len(mel[k]) > cfg.max_bar_len
                    or len(arr[k]) > cfg.max_bar_len - 1):
                n = k
                break
        if n == 0:
            continue
        pairs.append((list(mel[:n]), list(arr[:n])))
    if not pairs:
        raise ValueError("no usable melody/arrangement pairs in corpus")
    b = cfg.batch_size * cfg.accum_steps

    def batch_at(idx: int):
        picks = _batch_rng(cfg.seed, idx).randint(0, len(pairs), b)
        return pack_batch([pairs[p] for p in picks],
                          pad_bars_to=cfg.max_bars,
                          pad_len_to=cfg.max_bar_len)

    return batch_at


def _load_teacher(cfg: TrainCLIConfig, student):
    """Restore the distill_from checkpoint as a frozen teacher.

    The teacher must share the student's vocab (same scheme) and train
    sequence length (relative-attention E tables are sized by max_seq,
    so a teacher trained at another seq_len has incompatible position
    geometry)."""
    from ..utils.checkpoint import restore_checkpoint

    payload = restore_checkpoint(cfg.distill_from)
    meta = payload.get("config", {})
    if "cli" not in meta:
        raise SystemExit("distill_from checkpoint has no CLI config")
    tcfg_cli = TrainCLIConfig.from_dict(meta["cli"])
    if tcfg_cli.model != "music_transformer":
        raise SystemExit("distill_from must be a music_transformer "
                         "checkpoint")
    if tcfg_cli.seq_len != cfg.seq_len:
        raise SystemExit(
            f"teacher was trained at seq_len={tcfg_cli.seq_len}, "
            f"student at {cfg.seq_len} — they must match (relative "
            "attention position tables are max_seq-sized)")
    tkwargs = dict(meta.get("model_kwargs", {}))
    tscanned = bool(tkwargs.pop("scan_layers", False))
    t_model, _, _, _, _ = build_session(
        tcfg_cli, meta.get("scheme", "midilike"), tkwargs)
    t_params = payload["state"]["params"]
    if tscanned or "layers_scan" in t_params:
        from ..models.music_transformer import unstack_scanned_params
        t_params = unstack_scanned_params(dict(t_params),
                                          t_model.num_layers)
    if t_model.vocab_size != student.vocab_size:
        raise SystemExit(
            f"teacher vocab ({t_model.vocab_size}) != student vocab "
            f"({student.vocab_size}) — distill on the same scheme")
    return t_model, t_params


def _make_distill_loss(model, tcfg, t_model, t_params, *, alpha: float,
                       temp: float, apply_fn=None):
    """(1-alpha)*smoothCE(labels) + alpha*T^2*KL(teacher_T||student_T),
    KL averaged over non-pad positions — the standard distillation
    objective; at temp=1 the KL term directly optimizes the T=1
    distribution match that sets speculative-decoding acceptance."""
    import jax
    import jax.numpy as jnp

    from ..train.objective import smooth_cross_entropy, token_accuracy

    def loss_fn(params, x, y, rng):
        if apply_fn is not None:
            s_logits = apply_fn(params, x, rng)
        else:
            s_logits = model.apply({"params": params}, x,
                                   deterministic=False,
                                   rngs={"dropout": rng})
        t_logits = t_model.apply({"params": t_params}, x,
                                 deterministic=True)
        ce = smooth_cross_entropy(s_logits, y, tcfg.vocab_size,
                                  tcfg.label_smoothing, tcfg.pad_id)
        t_lp = jax.nn.log_softmax(
            t_logits.astype(jnp.float32) / temp, axis=-1)
        s_lp = jax.nn.log_softmax(
            s_logits.astype(jnp.float32) / temp, axis=-1)
        kl = (jnp.exp(t_lp) * (t_lp - s_lp)).sum(-1)
        mask = (y != tcfg.pad_id) if tcfg.pad_id is not None else (
            jnp.ones_like(y, jnp.bool_))
        kl = (kl * mask).sum() / jnp.maximum(mask.sum(), 1) * (temp ** 2)
        loss = (1.0 - alpha) * ce + alpha * kl
        return loss, token_accuracy(s_logits, y, tcfg.pad_id)

    return loss_fn


def build_session(cfg: TrainCLIConfig, scheme: str,
                  model_kwargs: Dict[str, Any], mesh=None,
                  distill: bool = False):
    """Construct (model, trainer_cfg, apply_fn, loss_fn, batch_adapter).

    batch_adapter maps a raw batch from the stream to the (x, y) pair the
    train step consumes. `mesh` (train-time only, never persisted): with
    sp>1 the MusicTransformer attention switches to the sequence-parallel
    ring impl over the mesh's 'seq' axis. `distill` (train-time only)
    activates the cfg.distill_from teacher objective — restore-time
    callers (serve/eval/export) rebuild sessions from persisted configs
    that may carry a stale teacher path, so the teacher only loads when
    cli.train asks for it.
    """
    import jax
    import jax.numpy as jnp

    from ..models import registry
    from ..train.trainer import TrainerConfig

    cls, defaults = registry.get_model(cfg.model)
    name = cfg.model
    model_kwargs = dict(model_kwargs)  # never mutate the caller's dict
    if isinstance(model_kwargs.get("dtype"), str):
        # model.dtype=bfloat16 from the CLI (params stay f32; this is the
        # compute dtype — bf16 is the right default on TPU)
        model_kwargs["dtype"] = jnp.dtype(model_kwargs["dtype"]).type

    if name == "music_transformer":
        default_vocab = _default_vocab(scheme)
        if scheme == "melody":
            # melody note-arrays use the full 130-id vocab (129 = the
            # meaningful no-event token, midi2note.py:6-11), so the
            # transformer's pad id must be a NEW id on top — covers the
            # reference's tran_transformer.py experiment (a transformer
            # LM over note arrays) without masking real tokens
            default_vocab += 1
        vocab = model_kwargs.pop("vocab_size", default_vocab)
        if mesh is not None and mesh.shape.get("seq", 1) > 1:
            model_kwargs = {**model_kwargs, "attention_impl": "ring",
                            "mesh": mesh}
        pipe = (mesh.shape.get("pipe", 1) if mesh is not None else 1)
        if pipe > 1:
            # pipeline stages consume the stacked scan_layers layout
            model_kwargs = {**model_kwargs, "scan_layers": True}
        # every batch mode feeds DENSE windows (lm crops need len >=
        # seq_len+1; segment windows are min-length-bounded), so the
        # train-time model skips pad masking — the Pallas kernels
        # compile their no-pad variant (bit-equal on pad-free batches).
        # Deliberately NOT merged into the persisted model_kwargs:
        # generate/eval rebuild with the default full masking.
        model = cls(**{**defaults(vocab_size=vocab, max_seq=cfg.seq_len),
                       "pad_in_input": False, **model_kwargs})
        apply_fn = None
        if pipe > 1:
            from ..parallel.pipeline import make_pipeline_apply
            n_micro = cfg.pp_microbatches or pipe
            if cfg.batch_size % n_micro:
                raise SystemExit(
                    f"batch_size={cfg.batch_size} must divide by "
                    f"pp_microbatches={n_micro}")
            pipe_apply = make_pipeline_apply(model, mesh, n_micro)

            def apply_fn(params, x, rng):
                return pipe_apply(params, x, rng=rng)

        tcfg = TrainerConfig(
            vocab_size=model.vocab_size, pad_id=model.vocab_size - 1,
            label_smoothing=cfg.label_smoothing, d_model=model.d_model,
            warmup_steps=cfg.warmup_steps, accum_steps=cfg.accum_steps,
            max_grad_norm=cfg.max_grad_norm, peak_lr=cfg.peak_lr)
        if distill and cfg.distill_from:
            if mesh is not None and (mesh.shape.get("seq", 1) > 1
                                     or mesh.shape.get("pipe", 1) > 1):
                raise SystemExit("distill_from composes with dp/fsdp "
                                 "meshes only (the teacher forward is "
                                 "an unsharded plain apply)")
            t_model, t_params = _load_teacher(cfg, model)
            loss_fn = _make_distill_loss(
                model, tcfg, t_model, t_params,
                alpha=cfg.distill_alpha, temp=cfg.distill_temp,
                apply_fn=apply_fn)
            return model, tcfg, None, loss_fn, lambda b: b
        return model, tcfg, apply_fn, None, lambda b: b

    if name == "melody_rnn":
        vocab = model_kwargs.pop("vocab_size", _default_vocab("melody"))
        model = cls(**{**{"vocab_size": vocab}, **model_kwargs})
        tcfg = TrainerConfig(
            vocab_size=vocab, pad_id=None, label_smoothing=0.0,
            accum_steps=cfg.accum_steps, max_grad_norm=cfg.max_grad_norm,
            peak_lr=cfg.peak_lr or 1e-3)

        def apply_fn(params, x, rng):
            # model is time-major; stream is [B, L]
            logits = model.apply({"params": params}, x.T,
                                 deterministic=False,
                                 rngs={"dropout": rng})
            return logits.transpose(1, 0, 2)

        return model, tcfg, apply_fn, None, lambda b: b

    if name == "performance_rnn" and scheme == "midilike_control":
        vocab = model_kwargs.pop("event_dim", _default_vocab(scheme) - 1)
        model = cls(**{**{"event_dim": vocab}, **model_kwargs})
        tcfg = TrainerConfig(
            vocab_size=vocab, pad_id=None, label_smoothing=0.0,
            accum_steps=cfg.accum_steps, max_grad_norm=cfg.max_grad_norm,
            peak_lr=cfg.peak_lr or 1e-3)

        def apply_fn(params, x, rng):
            init_rng, drop_rng = jax.random.split(rng)
            tokens, controls = x["tokens"], x["controls"]
            init = jax.random.normal(
                init_rng, (tokens.shape[0], model.init_dim))
            logits = model.apply({"params": params}, init, tokens.T,
                                 controls.transpose(1, 0, 2),
                                 deterministic=False,
                                 rngs={"dropout": drop_rng})
            return logits.transpose(1, 0, 2)

        def adapter(b):
            x, c = b
            return {"tokens": x, "controls": c}, x

        return model, tcfg, apply_fn, None, adapter

    if name in ("event_rnn", "performance_rnn"):
        vocab = model_kwargs.pop("event_dim", _default_vocab(scheme) - 1)
        model = cls(**{**{"event_dim": vocab}, **model_kwargs})
        tcfg = TrainerConfig(
            vocab_size=vocab, pad_id=None, label_smoothing=0.0,
            accum_steps=cfg.accum_steps, max_grad_norm=cfg.max_grad_norm,
            peak_lr=cfg.peak_lr or 1e-3)

        def adapter(b):
            x, _y = b
            return x, x

        if cfg.train_mode == "sequence":
            if name != "event_rnn":
                raise SystemExit(
                    "train_mode=sequence is the reference "
                    "Event_MelodyRNN path (train.py:263-309) — use "
                    "model=event_rnn")

            def seq_loss_fn(params, x, y, rng):
                # reference sequence mode (Event_MelodyRNN/train.py:
                # 285-295): Train(init, padded, lengths) through the
                # pack_padded path, CE(flattened valid rows, Y) where
                # Y = each sequence's tokens[1:len] (SeqBatchify,
                # data.py:32-35) — i.e. masked mean CE over positions
                # 1 <= t < len, logits row t predicting tokens[t]
                del y
                tokens, lengths = x["tokens"], x["lengths"]
                init_rng, drop_rng = jax.random.split(rng)
                init = jax.random.normal(
                    init_rng, (tokens.shape[0], model.init_dim))
                logits = model.apply({"params": params}, init, tokens.T,
                                     deterministic=False, lengths=lengths,
                                     rngs={"dropout": drop_rng})
                logits = logits[:-1].transpose(1, 0, 2)  # [B, L, V]
                t_pos = jnp.arange(tokens.shape[1])[None, :]
                mask = (t_pos >= 1) & (t_pos < lengths[:, None])
                logp = jax.nn.log_softmax(logits, axis=-1)
                tok_lp = jnp.take_along_axis(
                    logp, tokens[..., None].astype(jnp.int32),
                    axis=-1)[..., 0]
                n = jnp.maximum(mask.sum(), 1).astype(jnp.float32)
                loss = -(tok_lp * mask).sum() / n
                acc = ((jnp.argmax(logits, -1) == tokens)
                       * mask).sum() / n
                return loss, acc

            return model, tcfg, None, seq_loss_fn, lambda b: b

        if cfg.train_mode == "window" and cfg.teacher_forcing_ratio < 1.0:
            from ..models.event_rnn import scheduled_sampling_logits
            from ..train.objective import (smooth_cross_entropy,
                                           token_accuracy)
            ratio = float(cfg.teacher_forcing_ratio)

            def sched_loss_fn(params, x, y, rng):
                init_rng, tf_rng, drop_rng = jax.random.split(rng, 3)
                init = jax.random.normal(
                    init_rng, (x.shape[0], model.init_dim))
                # one scalar draw per step, shared by the batch
                # (network.py:160-162)
                draws = jax.random.bernoulli(
                    tf_rng, ratio, (x.shape[1] - 1,))
                logits = scheduled_sampling_logits(
                    model, params, init, x.T, draws, drop_rng)
                logits = logits.transpose(1, 0, 2)
                loss = smooth_cross_entropy(logits, y, vocab, 0.0, None)
                return loss, token_accuracy(logits, y, None)

            return model, tcfg, None, sched_loss_fn, adapter

        def apply_fn(params, x, rng):
            # reference draws a fresh latent per batch
            # (Event_MelodyRNN/train.py:334: init = randn(batch, 32))
            init_rng, drop_rng = jax.random.split(rng)
            init = jax.random.normal(
                init_rng, (x.shape[0], model.init_dim))
            # Training target = the full crop, like the reference's
            # CE(outputs, events) (Event_MelodyRNN/train.py:340).
            # EventMelodyRNN consumes [T, B] and returns T+1 rows (row
            # i predicts events[i], row 0 from the primary event
            # alone) — drop the last; PerformanceRNN already returns
            # exactly T aligned rows.
            logits = model.apply({"params": params}, init, x.T,
                                 deterministic=False,
                                 rngs={"dropout": drop_rng})
            if logits.shape[0] == x.shape[1] + 1:
                logits = logits[:-1]
            return logits.transpose(1, 0, 2)

        return model, tcfg, apply_fn, None, adapter

    if name == "cp_transformer":
        model = cls(**{**defaults(max_seq=cfg.seq_len), **model_kwargs})
        tcfg = TrainerConfig(
            vocab_size=0, label_smoothing=0.0, d_model=model.d_model,
            warmup_steps=cfg.warmup_steps, accum_steps=cfg.accum_steps,
            max_grad_norm=cfg.max_grad_norm, peak_lr=cfg.peak_lr)

        n_heads = len(model.field_dims)
        if cfg.cp_head_weights is not None:
            if len(cfg.cp_head_weights) != n_heads:
                raise ValueError(
                    f"cp_head_weights needs {n_heads} entries "
                    f"(got {len(cfg.cp_head_weights)})")
            w = np.asarray(cfg.cp_head_weights, np.float32)
            head_w = tuple(float(x) for x in (w / w.mean()))
        else:
            head_w = (1.0,) * n_heads

        def cp_loss_fn(params, x, y, rng):
            # weighted mean CE over the 8 field heads (Compound Word
            # Transformer recipe; cp_head_weights, mean-1 normalized so
            # the loss scale is comparable across weightings)
            logits = model.apply({"params": params}, x,
                                 deterministic=False,
                                 rngs={"dropout": rng})
            loss = 0.0
            acc = 0.0
            for i, lg in enumerate(logits):
                lp = jax.nn.log_softmax(lg, axis=-1)
                tgt = y[..., i]
                loss += head_w[i] * -jnp.take_along_axis(
                    lp, tgt[..., None], axis=-1).mean()
                acc += jnp.mean(
                    (jnp.argmax(lg, axis=-1) == tgt).astype(jnp.float32))
            n = len(logits)
            return loss / n, acc / n

        return model, tcfg, None, cp_loss_fn, lambda b: b

    if name == "popmag":
        from ..train.objective import popmag_masked_loss

        model = cls(**model_kwargs)
        tcfg = TrainerConfig(
            vocab_size=0, accum_steps=cfg.accum_steps,
            max_grad_norm=cfg.max_grad_norm, peak_lr=cfg.peak_lr or 1e-3)

        def loss_fn(params, x, y, rng):
            del y
            init_rng, drop_rng = jax.random.split(rng)
            init = jax.random.normal(
                init_rng, (x["src"].shape[0], model.init_dim))
            logits = model.apply(
                {"params": params}, init, x["src"], x["src_len"],
                x["tar"], x["tar_len"], deterministic=False,
                rngs={"dropout": drop_rng})
            return popmag_masked_loss(logits, x["labels"],
                                      x["label_mask"])

        def adapter(b):
            x = {k: jnp.asarray(v) for k, v in dataclasses.asdict(b).items()}
            return x, np.zeros((x["src"].shape[0],), np.int32)

        return model, tcfg, None, loss_fn, adapter

    raise ValueError(f"no CLI wiring for model {cfg.model!r}")


def main(argv=None) -> int:
    from ..utils import enable_persistent_compile_cache
    enable_persistent_compile_cache()  # MG_NO_COMPILE_CACHE=1 opts out
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("data_dir", help="tokenized shard directory "
                   "(from cli.tokenize)")
    p.add_argument("overrides", nargs="*", metavar="key=value",
                   help="dotted overrides; bare keys hit TrainCLIConfig, "
                        "'model.<field>' goes to the model constructor")
    args = p.parse_args(argv)

    cfg = TrainCLIConfig()
    model_kwargs: Dict[str, Any] = {}
    plain = []
    for item in args.overrides:
        key, _, value = item.partition("=")
        if key.startswith("model."):
            try:
                model_kwargs[key[6:]] = ast.literal_eval(value)
            except (ValueError, SyntaxError):
                model_kwargs[key[6:]] = value
        else:
            plain.append(item)
    cfg = apply_overrides(cfg, plain)

    import json
    import os

    import jax

    from ..data.pipeline import TokenCorpus
    from ..train.loop import LoopConfig, run_loop
    from ..train.trainer import (create_train_state, make_eval_step,
                                 make_optimizer, make_train_step)

    manifest = json.load(open(os.path.join(args.data_dir, "manifest.json")))
    scheme = manifest["scheme"]
    key = "melody" if scheme == "mumidi" else "tokens"
    if cfg.model == "popmag":
        limlen = 0
    elif cfg.model == "cp_transformer":
        # shards store flattened [T, 8] rows; limlen counts flat tokens
        limlen = (cfg.seq_len + 1) * 8
    elif cfg.train_mode == "segment":
        # segment mode shrinks its window to the SHORTEST sequence
        # (reference train.py:312) — don't pre-filter short files away
        limlen = 2
    elif cfg.train_mode == "window":
        # need at least one strided window: len > window_size
        # (data.py:77 exclusive stop)
        limlen = cfg.window_size + 1
    elif cfg.train_mode == "sequence":
        # whole sequences of any usable length (>= 1 label token)
        limlen = 2
    else:
        limlen = cfg.seq_len + 1
    corpus = TokenCorpus(args.data_dir, limlen=limlen, key=key)
    print(f"corpus: {len(corpus)} sequences (scheme={scheme})")

    mesh = None
    if (cfg.tp > 1 or cfg.sp > 1 or cfg.pp > 1 or cfg.fsdp
            or cfg.dp is not None):
        if cfg.model != "music_transformer":
            raise SystemExit("mesh training (dp/tp/sp/pp/fsdp) is wired "
                             "for model=music_transformer")
        if cfg.pp > 1 and (cfg.tp > 1 or cfg.sp > 1 or cfg.fsdp):
            raise SystemExit("pp composes with dp only (not tp/sp/fsdp)")
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(dp=cfg.dp, tp=cfg.tp, sp=cfg.sp, pp=cfg.pp)
        print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices"
              f"{' (fsdp)' if cfg.fsdp else ''}"
              f"{' ring attention' if cfg.sp > 1 else ''}"
              f"{' pipeline' if cfg.pp > 1 else ''}")
        if (cfg.batch_size * cfg.accum_steps) % mesh.shape["data"]:
            raise SystemExit("batch_size*accum_steps must divide dp")
        if cfg.seq_len % cfg.sp:
            raise SystemExit("seq_len must divide sp")

    model, tcfg, apply_fn, loss_fn, adapter = build_session(
        cfg, scheme, model_kwargs, mesh=mesh,
        distill=bool(cfg.distill_from))

    if cfg.train_mode in ("window", "sequence"):
        # reference Event_MelodyRNN train modes (train.py:209-309);
        # the RNN-shaped loss target (full window / shifted tails)
        # doesn't fit the transformer or conditioned streams
        if cfg.model not in ("event_rnn", "performance_rnn") or (
                scheme == "midilike_control"):
            raise SystemExit(
                f"train_mode={cfg.train_mode} is wired for the plain "
                "RNN families (model=event_rnn|performance_rnn on an "
                "unconditioned scheme)")

    if cfg.model == "popmag":
        batch_at = _popmag_batch_fn(corpus, cfg)
    elif cfg.model == "cp_transformer":
        batch_at = _cp_batch_fn(corpus, cfg)
    elif cfg.model == "performance_rnn" and scheme == "midilike_control":
        batch_at = _control_batch_fn(corpus, cfg)
    elif cfg.train_mode == "segment":
        batch_at = _segment_batch_fn(corpus, cfg)
    elif cfg.train_mode == "window":
        batch_at = _window_batch_fn(corpus, cfg)
    elif cfg.train_mode == "sequence":
        batch_at = _sequence_batch_fn(corpus, cfg)
    else:
        batch_at = _lm_batch_fn(corpus, cfg)
    from ..data.prefetch import prefetch_to_device

    # deterministic resume: training step s consumes batch index s (the
    # streams are counter-indexed), so starting the stream at the
    # checkpoint's next step replays EXACTLY the uninterrupted batch
    # sequence — no re-training on windows already seen. The saved
    # meta.json cursor/seed let us catch a seed change across restarts.
    start_step = 0
    if cfg.ckpt_dir:
        from ..utils.checkpoint import Checkpointer, list_checkpoints
        ckpts = list_checkpoints(cfg.ckpt_dir)
        if ckpts:
            start_step = ckpts[-1][0] + 1
            meta = Checkpointer(cfg.ckpt_dir).read_meta()
            if meta and meta.get("data_seed") not in (None, cfg.seed):
                print(f"WARNING: resuming with seed={cfg.seed} but the "
                      f"checkpoint was written with data_seed="
                      f"{meta['data_seed']} — the resumed batch stream "
                      "will NOT continue the original sequence")

    rng = jax.random.PRNGKey(cfg.seed)
    # the init example comes from a DIRECT batch_at call (not the
    # stream), so the prefetch thread and init never race — and the
    # stream still delivers batch start_step to the first train step
    example = adapter(batch_at(start_step))
    # host batch building overlaps device compute; 2 batches in flight
    input_sharding = None
    if mesh is not None:
        # [B, L] token batches: batch over 'data', sequence over 'seq'
        # (seq-sharded inputs make every layer's activations seq-sharded,
        # which is what the ring attention consumes)
        from jax.sharding import NamedSharding, PartitionSpec as P
        input_sharding = NamedSharding(
            mesh, P("data", "seq" if cfg.sp > 1 else None))
    stream = prefetch_to_device(
        (adapter(b) for b in _indexed_stream(batch_at, start_step)),
        size=2, sharding=input_sharding)
    tx = make_optimizer(tcfg)
    state = _init_state(model, tcfg, rng, example, cfg, mesh=mesh)
    train_step = make_train_step(model, tx, tcfg, apply_fn=apply_fn,
                                 loss_fn=loss_fn)

    eval_step = eval_batches = None
    if cfg.eval_dir and cfg.model == "music_transformer":
        eval_corpus = TokenCorpus(cfg.eval_dir, limlen=limlen)
        eval_seqs = [np.asarray(eval_corpus[i])
                     for i in range(len(eval_corpus))]

        def eval_batches():
            from ..data.batching import slide_seq2seq_batch
            r = np.random.RandomState(0)
            for _ in range(4):
                yield slide_seq2seq_batch(eval_seqs, cfg.batch_size,
                                          cfg.seq_len, r)

        eval_step = jax.jit(make_eval_step(model, tcfg))

    loop_cfg = LoopConfig(
        total_steps=cfg.steps, ckpt_dir=cfg.ckpt_dir,
        ckpt_every=cfg.ckpt_every, log_every=cfg.log_every,
        eval_every=cfg.eval_every, metrics_path=cfg.metrics_path,
        profile_dir=cfg.profile_dir,
        stream_meta={"data_seed": cfg.seed, "train_mode": cfg.train_mode,
                     "model": cfg.model})
    if cfg.train_mode == "window":
        tokens_per_batch = (cfg.batch_size * cfg.accum_steps
                            * cfg.window_size)
    elif cfg.train_mode == "sequence":
        # actual trained tokens vary per batch; report the mean
        tokens_per_batch = int(np.mean([len(corpus[i]) for i in
                                        range(len(corpus))])
                               * cfg.batch_size * cfg.accum_steps)
    else:
        tokens_per_batch = cfg.batch_size * cfg.accum_steps * cfg.seq_len
    run_loop(state, train_step, stream, loop_cfg, eval_step=eval_step,
             eval_batches=eval_batches, tokens_per_batch=tokens_per_batch,
             config_dict={"cli": cfg.to_dict(), "scheme": scheme,
                          "model_kwargs": model_kwargs})
    return 0


def _init_state(model, tcfg, rng, example, cfg: TrainCLIConfig,
                mesh=None):
    """Initialize params against one example batch, per model signature.

    With a mesh, parameters are placed by the name-rule shardings
    (parallel/mesh.py; fsdp=True adds ZeRO-3 storage sharding) BEFORE
    the optimizer state is created, so Adam moments inherit the same
    layout."""
    import jax

    from ..train.trainer import TrainState, make_optimizer

    x, _y = example
    init_rng, dropout_rng = jax.random.split(rng)
    if cfg.model in ("music_transformer", "cp_transformer"):
        variables = model.init(init_rng, x[:1])
    elif cfg.model == "melody_rnn":
        variables = model.init(init_rng, x[:1].T)
    elif isinstance(x, dict) and "controls" in x:  # conditioned perf_rnn
        import jax.numpy as jnp
        init = jnp.zeros((1, model.init_dim))
        variables = model.init(init_rng, init, x["tokens"][:1].T,
                               x["controls"][:1].transpose(1, 0, 2))
    elif isinstance(x, dict) and "lengths" in x:   # sequence mode
        import jax.numpy as jnp
        init = jnp.zeros((1, model.init_dim))
        variables = model.init(init_rng, init, x["tokens"][:1].T)
    elif cfg.model in ("event_rnn", "performance_rnn"):
        import jax.numpy as jnp
        init = jnp.zeros((1, model.init_dim))
        variables = model.init(init_rng, init, x[:1].T)
    else:  # popmag
        import jax.numpy as jnp
        init = jnp.zeros((1, model.init_dim))
        variables = model.init(init_rng, init, x["src"][:1],
                               x["src_len"][:1], x["tar"][:1],
                               x["tar_len"][:1])
    params = variables["params"]
    if mesh is not None:
        if mesh.shape.get("pipe", 1) > 1:
            from ..parallel.pipeline import pipeline_param_shardings
            params = jax.device_put(
                params, pipeline_param_shardings(mesh, params))
        else:
            from ..parallel.mesh import param_shardings
            params = jax.device_put(
                params, param_shardings(mesh, params, fsdp=cfg.fsdp))
    tx = make_optimizer(tcfg)
    import jax.numpy as jnp
    # tx.init under jit: the moments inherit the params' shardings
    opt_state = (jax.jit(tx.init)(params) if mesh is not None
                 else tx.init(params))
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, dropout_rng=dropout_rng)


if __name__ == "__main__":
    sys.exit(main())
