"""Mesh construction and name-rule parameter sharding (t5x-style).

Axes:
    data  — batch (data parallel; XLA all-reduces grads over ICI, the
            compiler-generated analogue of the reference's
            parallel.py:34-66 AllReduce)
    model — tensor parallel (attention heads / FFN hidden / vocab)

`param_shardings` maps a params pytree to NamedShardings by parameter-path
rules: attention/FFN input projections split their output dim over 'model',
output projections split their input dim, embeddings split d_model, biases
and layernorms replicate. With inputs batch-sharded over 'data' and these
constraints on parameters, XLA's SPMD partitioner propagates everything
else (the scaling-book recipe: pick a mesh, annotate, let XLA insert
collectives)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    sp: int = 1,
    pp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'seq', 'model') mesh; dp defaults to n // (tp * sp * pp).

    'seq' is the sequence-parallel axis (SURVEY.md §5 long-context row):
    size 1 for every current model config — the reference's contexts are
    bounded at max_seq 2048 — but the axis exists so blockwise/ring
    attention over ICI can shard activations along L without remapping
    the mesh. With sp == 1 the mesh behaves exactly like ('data',
    'model').

    pp > 1 appends a 'pipe' axis (pipeline parallelism over layer
    stages, parallel/pipeline.py); with pp == 1 the mesh is the plain
    3-axis form so existing shardings are byte-identical."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // (tp * sp * pp)
    if dp * tp * sp * pp != n:
        raise ValueError(
            f"dp*sp*tp*pp = {dp}*{sp}*{tp}*{pp} != {n} devices")
    if pp == 1:
        arr = np.asarray(devices).reshape(dp, sp, tp)
        return Mesh(arr, ("data", "seq", "model"))
    arr = np.asarray(devices).reshape(dp, sp, tp, pp)
    return Mesh(arr, ("data", "seq", "model", "pipe"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the batch axis split over 'data'."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch)


def multihost_shard_batch(mesh: Mesh, local_batch):
    """Assemble a GLOBAL batch from per-process local data (multi-host
    input pipeline, SURVEY.md §5: each host reads its own shard of the
    corpus and contributes its slice of the global batch; the returned
    arrays are addressable only where they live). On a single process
    this equals shard_batch; real 2-process assembly + a dp train step
    over one global mesh is locked in tests/test_multihost.py (gloo
    CPU "cluster")."""
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            batch_sharding(mesh, np.ndim(x)), np.asarray(x)),
        local_batch)


# -- parameter sharding rules -------------------------------------------------

# (path-substring match, partition spec builder). First match wins.
# Specs are expressed per-ndim so biases fall through to replication.
_COL = object()  # split last (output) dim
_ROW = object()  # split first-of-last-two (input) dim


def _spec_for(path: str, ndim: int):
    """Rules keyed on flax param path names (models/*.py)."""
    if ndim < 2:
        return P()  # biases, layernorm scales
    # attention input projections + FFN up: split output dim
    if any(s in path for s in ("Wq", "Wk", "Wv", "ffn_pre")):
        return P(None, "model")
    # attention output + FFN down: split input dim
    if any(s in path for s in ("fc", "ffn_suf")):
        return P("model", None)
    # token embedding [vocab, d_model]: split d_model
    if "embedding" in path or "Embed" in path:
        return P(None, "model")
    # relative table E [max_seq, dh] lives per-head-slice; replicate
    if path.endswith("/E"):
        return P()
    # GRU/LSTM kernels etc.: split output dim by default
    return P(None, "model")


def param_shardings(mesh: Mesh, params, fsdp: bool = False):
    """Pytree of NamedShardings matching `params`.

    fsdp=True additionally shards each >=2-D parameter's remaining
    (non-'model') dim over 'data' — ZeRO-3-style fully-sharded storage;
    under jit XLA inserts the all-gathers before use and reduce-scatters
    the grads (the scaling-book FSDP recipe: same mesh, extra
    annotation)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)

    specs = {path_str(kp): _spec_for(path_str(kp), np.ndim(v))
             for kp, v in flat}

    def lookup(kp, v):
        spec = specs[path_str(kp)]
        shape = np.shape(v)
        if fsdp and len(shape) >= 2:
            names = list(spec) + [None] * (len(shape) - len(spec))
            for i, name in enumerate(names):
                if name is None and shape[i] % mesh.shape["data"] == 0:
                    names[i] = "data"
                    break
            spec = P(*names)
        # guard: axis size must divide the dimension, else drop that axis
        sizes = {"model": mesh.shape["model"], "data": mesh.shape["data"]}
        names = list(spec) + [None] * (len(shape) - len(spec))
        for i, name in enumerate(names):
            if name is not None and shape[i] % sizes[name] != 0:
                names[i] = None
        if not any(names):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(*names))

    return jax.tree_util.tree_map_with_path(lookup, params)
