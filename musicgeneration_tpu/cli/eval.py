"""Standalone checkpoint evaluation — the reference's `save_test.py`
(``MusicTransformer/save_test.py:120-185``: load checkpoint, run the
MetricsSet {accuracy, smooth-CE loss, logits bucketting} over random
test windows) as a real CLI instead of a path-hardcoded script.

    python -m musicgeneration_tpu.cli.eval runs/mt tokenized_test_dir \
        --batches 16 --batch-size 8

Prints one JSON line: mean loss / token accuracy over N random windows
(seeded, so runs are reproducible), token count, and with --bucket the
argmax-token diversity stats the reference's LogitsBucketting histogram
feeds (unique predicted ids + their count histogram head).

Works for the LM checkpoints (music_transformer over any scheme's
shards); RNN/seq2seq families evaluate through their train-time eval
hooks instead (their batch layouts are model-specific)."""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None) -> int:
    from ..utils import enable_persistent_compile_cache
    enable_persistent_compile_cache()  # MG_NO_COMPILE_CACHE=1 opts out
    p = argparse.ArgumentParser(
        prog="python -m musicgeneration_tpu.cli.eval",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("checkpoint", help="checkpoint file or directory")
    p.add_argument("data_dir", help="tokenized shard dir (cli.tokenize) "
                   "holding the eval/test split")
    p.add_argument("--batches", type=int, default=16,
                   help="number of random windows batches (default 16)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seq-len", type=int, default=0,
                   help="window length (default: the checkpoint's "
                        "training seq_len)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bucket", action="store_true",
                   help="also report argmax-token diversity (the "
                        "reference's LogitsBucketting histogram)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..cli.train import TrainCLIConfig, build_session
    from ..data.batching import slide_seq2seq_batch
    from ..data.pipeline import TokenCorpus
    from ..train.objective import logits_bucketting
    from ..train.trainer import TrainerConfig, make_eval_step
    from ..utils.checkpoint import restore_checkpoint

    payload = restore_checkpoint(args.checkpoint)
    meta = payload.get("config", {})
    if "cli" not in meta:
        raise SystemExit("checkpoint has no CLI config; re-save with "
                         "cli.train")
    cfg = TrainCLIConfig.from_dict(meta["cli"])
    if cfg.model != "music_transformer":
        raise SystemExit("cli.eval evaluates music_transformer LM "
                         "checkpoints (the reference's save_test.py "
                         "scope); other families eval in-train via "
                         "eval_dir/eval_every")
    scheme = meta.get("scheme", "midilike")
    # pop scan_layers so the model is built UNROLLED to match the
    # unstacked params below (same handling as cli.generate)
    model_kwargs = dict(meta.get("model_kwargs", {}))
    scanned = bool(model_kwargs.pop("scan_layers", False))
    model, tcfg, _apply, _loss, _adapter = build_session(
        cfg, scheme, model_kwargs)
    params = payload["state"]["params"]
    if scanned or "layers_scan" in params:
        from ..models.music_transformer import unstack_scanned_params
        params = unstack_scanned_params(dict(params), model.num_layers)

    seq_len = args.seq_len or cfg.seq_len
    if seq_len + 1 > model.max_seq:
        seq_len = model.max_seq - 1
    corpus = TokenCorpus(args.data_dir, limlen=seq_len + 1)
    if not len(corpus):
        raise SystemExit(f"no sequences of length > {seq_len} in "
                         f"{args.data_dir!r}")
    seqs = [np.asarray(corpus[i]) for i in range(len(corpus))]

    eval_step = jax.jit(make_eval_step(model, tcfg))
    # one jitted program for the bucket histogram ids (an un-jitted
    # apply would re-run the forward op-by-op — ~25 ms tunnel RTT per
    # dispatch on the tunneled TPU)
    bucket_fwd = jax.jit(lambda p, xb: logits_bucketting(
        model.apply({"params": p}, xb)))
    rng = np.random.RandomState(args.seed)
    losses, accs = [], []
    bucket = np.zeros(model.vocab_size, np.int64)
    for _ in range(args.batches):
        x, y = slide_seq2seq_batch(seqs, args.batch_size, seq_len, rng)
        m = eval_step(params, jnp.asarray(x), jnp.asarray(y))
        losses.append(float(m["loss"]))
        accs.append(float(m["accuracy"]))
        if args.bucket:
            ids = np.asarray(bucket_fwd(params, jnp.asarray(x)))
            bucket += np.bincount(ids, minlength=model.vocab_size)

    out = {
        "checkpoint_step": int(payload.get("step", 0)),
        "scheme": scheme,
        "batches": args.batches,
        "tokens": args.batches * args.batch_size * seq_len,
        "loss": float(np.mean(losses)),
        "accuracy": float(np.mean(accs)),
    }
    if args.bucket:
        nz = np.nonzero(bucket)[0]
        top = nz[np.argsort(bucket[nz])[::-1][:10]]
        out["bucket"] = {
            "unique_predicted_ids": int(len(nz)),
            "vocab": int(model.vocab_size),
            "top10": {int(i): int(bucket[i]) for i in top},
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
