"""Import a reference (torch) checkpoint into this framework's format.

The reference saves THREE incompatible on-disk formats (SURVEY.md §5):

* ``{'net': state_dict, 'optimizer': ..., 'epoch': N}`` —
  MusicTransformer (``MusicTransformer/train.py:201-211``)
* ``{'model_config': ..., 'model_state': state_dict,
  'model_optimizer_state': ...}`` — PerformanceRNN session dicts
  (``PerformanceRNN/train.py:195-201``)
* bare ``state_dict`` — Event_MelodyRNN / PoPMAG_RNN
  (``Event_MelodyRNN/train.py:188-195``, ``PoPMAG_RNN/train.py:185``)

This CLI detects the format AND the model family from the tensor key
structure, infers every hyperparameter from the tensor shapes, converts
the weights with the same maps proven numerically correct in
``tests/test_reference_executable.py`` (weight-transplant logit/loss/
grad parity), and writes a ``step-<N>.ckpt`` + config that
``cli.generate`` consumes directly::

    python -m musicgeneration_tpu.cli.import_checkpoint \
        train-3049-0.6044921875.pth runs/imported [--scheme remi]
    python -m musicgeneration_tpu.cli.generate runs/imported out.mid

Imported checkpoints carry model params only (no optimizer state —
torch Adam moments don't map onto optax's tree layout): use them for
generation or as finetune initialization, not to resume the reference's
optimizer trajectory.
"""

from __future__ import annotations

import argparse
import sys
from typing import Any, Dict, Optional, Tuple

import numpy as np

# torch Linear stores [out, in]; flax Dense kernels are [in, out]
def _lin(sd: Dict[str, Any], key: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[f"{key}.weight"]).T,
            "bias": _np(sd[f"{key}.bias"])}


def _ln(sd: Dict[str, Any], key: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{key}.weight"]),
            "bias": _np(sd[f"{key}.bias"])}


def _np(t: Any) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t, np.float32)


def _gru(sd: Dict[str, Any], key: str, layers: int) -> Dict[str, Any]:
    """torch nn.GRU -> our GRUStack params (same r,z,n gate order;
    torch weights are [3H, in] -> transpose)."""
    p = {}
    for k in range(layers):
        p[f"l{k}_w_ih"] = _np(sd[f"{key}.weight_ih_l{k}"]).T
        p[f"l{k}_w_hh"] = _np(sd[f"{key}.weight_hh_l{k}"]).T
        p[f"l{k}_b_ih"] = _np(sd[f"{key}.bias_ih_l{k}"])
        p[f"l{k}_b_hh"] = _np(sd[f"{key}.bias_hh_l{k}"])
    return p


def _gru_layers(sd: Dict[str, Any], key: str) -> int:
    n = 0
    while f"{key}.weight_ih_l{n}" in sd:
        n += 1
    return n


# ==========================================================================
# Per-family converters: state_dict -> (flax params, model_kwargs, scheme)
# ==========================================================================

def convert_music_transformer(sd: Dict[str, Any]):
    """network.MusicTransformer state (Decoder = Encoder of EncoderLayers,
    layers.py:136-161 + 207-233, final fc network.py:33)."""
    n_layers = 0
    while f"Decoder.enc_layers.{n_layers}.rga.Wq.weight" in sd:
        n_layers += 1
    vocab, d_model = _np(sd["fc.weight"]).shape[0], \
        _np(sd["Decoder.embedding.weight"]).shape[1]
    max_seq = _np(sd["Decoder.enc_layers.0.rga.E"]).shape[0]
    params: Dict[str, Any] = {
        "embedding": {"embedding": _np(sd["Decoder.embedding.weight"])},
        "fc": _lin(sd, "fc"),
    }
    for i in range(n_layers):
        pre = f"Decoder.enc_layers.{i}"
        params[f"layer_{i}"] = {
            "rga": {"Wq": _lin(sd, f"{pre}.rga.Wq"),
                    "Wk": _lin(sd, f"{pre}.rga.Wk"),
                    "Wv": _lin(sd, f"{pre}.rga.Wv"),
                    "fc": _lin(sd, f"{pre}.rga.fc"),
                    "E": _np(sd[f"{pre}.rga.E"])},
            "ffn_pre": _lin(sd, f"{pre}.FFN_pre"),
            "ffn_suf": _lin(sd, f"{pre}.FFN_suf"),
            "ln1": _ln(sd, f"{pre}.layernorm1"),
            "ln2": _ln(sd, f"{pre}.layernorm2"),
        }
    kwargs = {"vocab_size": vocab, "num_layers": n_layers,
              "d_model": d_model, "max_seq": max_seq}
    # reference vocab = event_dim + pad(s) per scheme (config.py:11-16)
    scheme = {309: "midilike", 337: "remi", 390: "pedal",
              131: "melody"}.get(vocab)
    return params, kwargs, scheme


def convert_event_rnn(sd: Dict[str, Any]):
    """Event_Melody_RNN (Event_MelodyRNN/network.py:12-33)."""
    layers = _gru_layers(sd, "rnn")
    params = {
        "event_embedding": {
            "embedding": _np(sd["event_embedding.weight"])},
        "inithid_fc": _lin(sd, "inithid_fc"),
        "gru": _gru(sd, "rnn", layers),
        "output_fc": _lin(sd, "output_fc"),
    }
    kwargs = {
        "event_dim": _np(sd["event_embedding.weight"]).shape[0],
        "init_dim": _np(sd["inithid_fc.weight"]).shape[1],
        "hidden_dim": _np(sd["output_fc.weight"]).shape[1],
        "num_layers": layers,
    }
    return params, kwargs, "midilike"


def convert_performance_rnn(sd: Dict[str, Any]):
    """PerformanceRNN (PerformanceRNN/network.py:16-42): concat input =
    [event embed (event_dim) | default flag (1) | control (control_dim)]."""
    layers = _gru_layers(sd, "gru")
    event_dim = _np(sd["event_embedding.weight"]).shape[0]
    params = {
        "event_embedding": {
            "embedding": _np(sd["event_embedding.weight"])},
        "inithid_fc": _lin(sd, "inithid_fc"),
        "concat_input_fc": _lin(sd, "concat_input_fc"),
        "gru": _gru(sd, "gru", layers),
        "output_fc": _lin(sd, "output_fc"),
    }
    kwargs = {
        "event_dim": event_dim,
        "control_dim": _np(sd["concat_input_fc.weight"]).shape[1]
        - event_dim - 1,
        "init_dim": _np(sd["inithid_fc.weight"]).shape[1],
        "hidden_dim": _np(sd["gru.weight_hh_l0"]).shape[1],
        "num_layers": layers,
    }
    return params, kwargs, "midilike_control"


def convert_popmag(sd: Dict[str, Any]):
    """PoPMAG_RNN (PoPMAG_RNN/network.py:20-57): event_dim recovered from
    the head widths (out_len[0] = event_dim - 1 - note_on - note_duration,
    :50), bar_dim = embedding rows - event_dim."""
    layers = _gru_layers(sd, "encoder")
    head_widths = [_np(sd[f"output_fc.{i}.weight"]).shape[0]
                   for i in range(3)]
    event_dim = head_widths[0] + 1 + head_widths[1] + head_widths[2]
    emb = _np(sd["event_embedding.weight"])
    params = {
        "event_embedding": {"embedding": emb},
        "inithid_fc": _lin(sd, "inithid_fc"),
        "encoder": _gru(sd, "encoder", layers),
        "decoder": _gru(sd, "decoder", layers),
        "head_type": _lin(sd, "output_fc.0"),
        "head_pitch": _lin(sd, "output_fc.1"),
        "head_duration": _lin(sd, "output_fc.2"),
    }
    kwargs = {
        "event_dim": event_dim,
        "bar_dim": emb.shape[0] - event_dim,
        "init_dim": _np(sd["inithid_fc.weight"]).shape[1],
        "embed_dim": emb.shape[1],
        "hidden_dim": _np(sd["encoder.weight_hh_l0"]).shape[1],
        "num_layers": layers,
    }
    return params, kwargs, "mumidi"


_FAMILIES = {
    "music_transformer": convert_music_transformer,
    "event_rnn": convert_event_rnn,
    "performance_rnn": convert_performance_rnn,
    "popmag": convert_popmag,
}


def detect_format(ckpt: Any) -> Tuple[Dict[str, Any], int]:
    """-> (state_dict, step). Handles all three reference save formats."""
    if isinstance(ckpt, dict) and "net" in ckpt:
        # MusicTransformer {'net','optimizer','epoch'} (train.py:203)
        return dict(ckpt["net"]), int(ckpt.get("epoch", 0) or 0)
    if isinstance(ckpt, dict) and "model_state" in ckpt:
        # PerformanceRNN session dict (train.py:195-201)
        return dict(ckpt["model_state"]), 0
    if isinstance(ckpt, dict) and all(
            hasattr(v, "shape") for v in ckpt.values()):
        return dict(ckpt), 0  # bare state_dict
    raise SystemExit(
        "unrecognized checkpoint layout: expected the reference's "
        "{'net',...}, {'model_state',...} or a bare state_dict; got "
        f"keys {sorted(ckpt)[:8] if isinstance(ckpt, dict) else type(ckpt)}")


def detect_family(sd: Dict[str, Any]) -> str:
    if any(k.startswith("Decoder.enc_layers.") for k in sd):
        return "music_transformer"
    if "concat_input_fc.weight" in sd:
        return "performance_rnn"
    if "encoder.weight_ih_l0" in sd and "decoder.weight_ih_l0" in sd:
        return "popmag"
    if "rnn.weight_ih_l0" in sd:
        return "event_rnn"
    raise SystemExit(
        "cannot identify the model family from state_dict keys "
        f"(sample: {sorted(sd)[:6]}); pass --model explicitly")


def import_torch_checkpoint(path: str, out_dir: str,
                            model: Optional[str] = None,
                            scheme: Optional[str] = None,
                            step: Optional[int] = None) -> Dict[str, Any]:
    """Convert `path` (a reference .pth) into out_dir/step-N.ckpt and
    return the written config. Library entry point for the CLI below."""
    import torch

    from ..utils.checkpoint import save_checkpoint
    from .train import TrainCLIConfig

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except OSError:
        raise   # missing/unreadable file: full unpickling won't help
    except Exception:
        # session dicts can carry non-tensor config objects; the file is
        # user-supplied so the fallback matches torch<2.6 semantics
        print("NOTE: weights_only load failed, retrying with full "
              "unpickling (only import checkpoints you trust)",
              file=sys.stderr)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)

    sd, ckpt_step = detect_format(ckpt)
    family = model or detect_family(sd)
    if family not in _FAMILIES:
        raise SystemExit(f"unknown --model {family!r} "
                         f"(one of {sorted(_FAMILIES)})")
    params, kwargs, inferred_scheme = _FAMILIES[family](sd)
    scheme = scheme or inferred_scheme
    if scheme is None:
        raise SystemExit(
            f"cannot infer the token scheme from vocab "
            f"{kwargs.get('vocab_size')}; pass --scheme")

    cli = TrainCLIConfig(model=family)
    if "max_seq" in kwargs:
        cli.seq_len = kwargs["max_seq"]
    config = {"cli": cli.to_dict(), "scheme": scheme,
              "model_kwargs": kwargs,
              "imported_from": path}
    n = ckpt_step if step is None else step
    out = save_checkpoint(out_dir, n, {"params": params}, config=config)
    print(f"imported {family} ({scheme}) -> {out}")
    print(f"  model_kwargs: {kwargs}")
    return config


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m musicgeneration_tpu.cli.import_checkpoint",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("torch_ckpt", help="reference .pth file")
    p.add_argument("out_dir", help="output checkpoint directory")
    p.add_argument("--model", default=None,
                   help="model family override (auto-detected from the "
                        f"state_dict keys): one of {sorted(_FAMILIES)}")
    p.add_argument("--scheme", default=None,
                   help="token scheme override (auto-inferred from the "
                        "vocab size where unambiguous)")
    p.add_argument("--step", type=int, default=None,
                   help="step label for the written checkpoint "
                        "(default: the reference's saved epoch, or 0)")
    args = p.parse_args(argv)
    import_torch_checkpoint(args.torch_ckpt, args.out_dir,
                            model=args.model, scheme=args.scheme,
                            step=args.step)
    return 0


if __name__ == "__main__":
    sys.exit(main())
