"""Export one of this framework's checkpoints to the reference's torch
format — the inverse of cli.import_checkpoint, completing checkpoint
interop in BOTH directions (a user can train here and hand the weights
back to the reference's scripts, or round-trip for A/B comparison).

Formats written, matching what each reference trainer saves:

* music_transformer -> ``{'net': state_dict, 'optimizer': {},
  'epoch': step}`` (``MusicTransformer/train.py:201-211``; the
  optimizer entry is empty — optax Adam moments don't map onto torch's
  layout, so exported checkpoints are for generation/finetune-init, not
  for resuming the torch optimizer trajectory)
* performance_rnn -> ``{'model_config', 'model_state',
  'model_optimizer_state'}`` session dict
  (``PerformanceRNN/train.py:195-201``; model_config mirrors
  ``PerformanceRNN/config.py:6-13``)
* event_rnn / popmag -> bare ``state_dict``
  (``Event_MelodyRNN/train.py:188-195``, ``PoPMAG_RNN/train.py:185``)

The weight maps are the exact inverses of cli.import_checkpoint's
(which are numerically locked against the executing reference in
tests/test_reference_executable.py); the export itself is locked by
tests/test_export_checkpoint.py loading each exported file into the
in-process reference with ``load_state_dict(strict=True)`` and
comparing forward logits.

    python -m musicgeneration_tpu.cli.export_checkpoint runs/mt out.pth
"""

from __future__ import annotations

import argparse
import sys
from typing import Any, Dict

import numpy as np


def _t(a):
    import torch

    return torch.from_numpy(np.asarray(a, np.float32).copy())


def _lin(params: Dict[str, Any], prefix: str, out: Dict[str, Any]):
    """flax Dense {kernel [in,out], bias} -> torch Linear
    {weight [out,in], bias}."""
    out[f"{prefix}.weight"] = _t(params["kernel"]).T.contiguous()
    out[f"{prefix}.bias"] = _t(params["bias"])


def _ln(params: Dict[str, Any], prefix: str, out: Dict[str, Any]):
    out[f"{prefix}.weight"] = _t(params["scale"])
    out[f"{prefix}.bias"] = _t(params["bias"])


def _gru(params: Dict[str, Any], prefix: str, out: Dict[str, Any]):
    """our GRUStack l{k}_* ([in, 3H] layout) -> torch nn.GRU keys."""
    k = 0
    while f"l{k}_w_ih" in params:
        out[f"{prefix}.weight_ih_l{k}"] = \
            _t(params[f"l{k}_w_ih"]).T.contiguous()
        out[f"{prefix}.weight_hh_l{k}"] = \
            _t(params[f"l{k}_w_hh"]).T.contiguous()
        out[f"{prefix}.bias_ih_l{k}"] = _t(params[f"l{k}_b_ih"])
        out[f"{prefix}.bias_hh_l{k}"] = _t(params[f"l{k}_b_hh"])
        k += 1


def export_music_transformer(params: Dict[str, Any],
                             kwargs: Dict[str, Any], step: int):
    dh = int(params["layer_0"]["rga"]["E"].shape[-1])
    if dh != 64:
        raise ValueError(
            f"head_dim={dh} has no reference analogue: the reference "
            "hard-codes h = d_model // 64 (MusicTransformer/layers.py:"
            "45-60), so its E table is [max_seq, 64] — only "
            "head_dim=64 checkpoints can round-trip")
    sd: Dict[str, Any] = {}
    sd["Decoder.embedding.weight"] = _t(
        params["embedding"]["embedding"])
    _lin(params["fc"], "fc", sd)
    i = 0
    while f"layer_{i}" in params:
        lp = params[f"layer_{i}"]
        pre = f"Decoder.enc_layers.{i}"
        for name in ("Wq", "Wk", "Wv", "fc"):
            _lin(lp["rga"][name], f"{pre}.rga.{name}", sd)
        sd[f"{pre}.rga.E"] = _t(lp["rga"]["E"])
        _lin(lp["ffn_pre"], f"{pre}.FFN_pre", sd)
        _lin(lp["ffn_suf"], f"{pre}.FFN_suf", sd)
        _ln(lp["ln1"], f"{pre}.layernorm1", sd)
        _ln(lp["ln2"], f"{pre}.layernorm2", sd)
        i += 1
    return {"net": sd, "optimizer": {}, "epoch": int(step)}


def export_event_rnn(params, kwargs, step):
    sd: Dict[str, Any] = {}
    sd["event_embedding.weight"] = _t(
        params["event_embedding"]["embedding"])
    _lin(params["inithid_fc"], "inithid_fc", sd)
    _gru(params["gru"], "rnn", sd)
    _lin(params["output_fc"], "output_fc", sd)
    return sd


def export_performance_rnn(params, kwargs, step):
    sd: Dict[str, Any] = {}
    sd["event_embedding.weight"] = _t(
        params["event_embedding"]["embedding"])
    _lin(params["inithid_fc"], "inithid_fc", sd)
    _lin(params["concat_input_fc"], "concat_input_fc", sd)
    _gru(params["gru"], "gru", sd)
    _lin(params["output_fc"], "output_fc", sd)
    # PerformanceRNN/config.py:6-13 field names — every shape-derivable
    # field comes from the state dict itself (the ground truth the
    # reference's strict load will check), not kwargs
    event_dim = sd["event_embedding.weight"].shape[0]
    gru_layers = 0
    while f"gru.weight_ih_l{gru_layers}" in sd:
        gru_layers += 1
    model_config = {
        "init_dim": sd["inithid_fc.weight"].shape[1],
        "event_dim": event_dim,
        "control_dim": (sd["concat_input_fc.weight"].shape[1]
                        - event_dim - 1),
        "hidden_dim": sd["gru.weight_hh_l0"].shape[1],
        "gru_layers": gru_layers,
        "gru_dropout": kwargs.get("dropout_rate", 0.3),
    }
    return {"model_config": model_config, "model_state": sd,
            "model_optimizer_state": {}}


def export_popmag(params, kwargs, step):
    sd: Dict[str, Any] = {}
    sd["event_embedding.weight"] = _t(
        params["event_embedding"]["embedding"])
    _lin(params["inithid_fc"], "inithid_fc", sd)
    _gru(params["encoder"], "encoder", sd)
    _gru(params["decoder"], "decoder", sd)
    _lin(params["head_type"], "output_fc.0", sd)
    _lin(params["head_pitch"], "output_fc.1", sd)
    _lin(params["head_duration"], "output_fc.2", sd)
    return sd


_FAMILIES = {
    "music_transformer": export_music_transformer,
    "event_rnn": export_event_rnn,
    "performance_rnn": export_performance_rnn,
    "popmag": export_popmag,
}


def export_torch_checkpoint(ckpt_dir: str, out_path: str) -> str:
    """Convert the latest checkpoint in `ckpt_dir` to the reference's
    torch format at `out_path`. Library entry point for the CLI."""
    import torch

    from ..utils.checkpoint import restore_checkpoint

    payload = restore_checkpoint(ckpt_dir)
    meta = payload.get("config", {})
    if "cli" not in meta:
        raise SystemExit("checkpoint has no CLI config; re-save with "
                         "cli.train (or import_checkpoint) first")
    family = meta["cli"].get("model", "music_transformer")
    if family not in _FAMILIES:
        raise SystemExit(
            f"model {family!r} has no reference torch format "
            f"(exportable: {sorted(_FAMILIES)})")
    params = dict(payload["state"]["params"])
    if "layers_scan" in params:
        from ..models.music_transformer import unstack_scanned_params

        n = 0
        probe = params["layers_scan"]
        while isinstance(probe, dict):
            probe = next(iter(probe.values()))
        n = int(probe.shape[0])
        params = unstack_scanned_params(params, n)
    obj = _FAMILIES[family](params, dict(meta.get("model_kwargs", {})),
                            payload.get("step", 0))
    torch.save(obj, out_path)
    print(f"exported {family} step {payload.get('step', 0)} -> "
          f"{out_path}")
    return out_path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m musicgeneration_tpu.cli.export_checkpoint",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("ckpt_dir", help="checkpoint file or directory "
                   "(latest step is used)")
    p.add_argument("output", help="output .pth path")
    args = p.parse_args(argv)
    export_torch_checkpoint(args.ckpt_dir, args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
