"""Pipeline parallelism over the 'pipe' mesh axis (GPipe schedule).

The MusicTransformer trunk is split into `pp` contiguous layer stages,
one per device along the 'pipe' axis; a batch is split into `n_micro`
microbatches that flow through the stages in the classic GPipe
fill/steady/drain schedule. Activations hop stage->stage with
`jax.lax.ppermute` (one ICI neighbor transfer per tick), so the
schedule is a single `lax.scan` of n_micro + pp - 1 ticks inside one
`shard_map` — no host round-trips, and `jax.grad` through the scan +
ppermute yields the reverse pipeline schedule automatically (the
scaling-book recipe: express the schedule as data flow, let XLA/AD
produce the collectives and the backward ordering).

Composition:
  * dp x pp — the microbatch axis shards over 'data' inside the same
    shard_map; parameter cotangents psum over 'data' via shard_map's
    replicated-input transpose (no hand-rolled all-reduce).
  * Stage-local layer math is the REAL `EncoderLayer` (`.apply` per
    layer inside a lax.scan over the stage's stacked params), so the
    Pallas attention kernels, dropout semantics and post-LN layout are
    byte-identical to the plain model — forward equality is locked in
    tests/test_pipeline_parallel.py.

Parameter layout: the scan_layers stacked tree ('layers_scan' subtree,
leading [num_layers, ...] axis on every leaf; models/music_transformer
stack_layer_params converts the unrolled layout). `pipeline_param_
shardings` shards that leading axis over 'pipe' — each device stores
only its own stage's layers (the pp analogue of the reference's
single-process DataParallel replica set, mg/model/MusicTransformer/
parallel.py, which has no model-partitioning story at all).

Reference anchor: the reference has NO pipeline parallelism; this is
the TPU-native scaling rung for models whose layer stack exceeds one
chip's HBM (SURVEY.md §5 distributed-comm row).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.music_transformer import EncoderLayer
from ..ops.relative_attention import (
    causal_pad_mask,
    sinusoid_position_encoding,
)


def pipeline_param_shardings(mesh: Mesh, params):
    """NamedShardings for a stacked ('layers_scan') param tree: the
    leading layer axis of every stage leaf shards over 'pipe', all
    other parameters (embedding, head, non-transformer leaves)
    replicate. num_layers must divide by the pipe axis size."""
    ppn = mesh.shape["pipe"]

    def rule(kp, v):
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        if "layers_scan" in path and jnp.ndim(v) >= 1 \
                and v.shape[0] % ppn == 0:
            return NamedSharding(mesh, P("pipe"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def _flax_dropout(x, rate: float, rng):
    """flax.linen.Dropout semantics (keep-prob scaling, lax.select)."""
    if rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jax.lax.select(mask, x / keep, jnp.zeros_like(x))


def make_pipeline_apply(model, mesh: Mesh, n_micro: int):
    """apply_fn(params, x, rng=None) -> logits [B, L, vocab] running the
    trunk as a pp-stage GPipe pipeline over `mesh`'s 'pipe' axis.

    * model: a MusicTransformer (its EncoderLayer config is reused
      verbatim; attention_impl resolves per backend inside the layer).
    * params: stacked layout — 'layers_scan' subtree with a leading
      [num_layers, ...] axis (scan_layers init or stack_layer_params).
    * x: [B, L] int tokens, B % n_micro == 0 and the microbatch must
      divide the 'data' axis. rng=None -> deterministic (no dropout);
      a key activates the model's dropout sites (independent stream
      per (data shard, tick, stage, layer) — a different but equally-
      distributed stream than the unpipelined model, like any remesh).

    Drop-in as make_train_step(..., apply_fn=...). Embedding/positional
    head stay outside the shard_map (replicated compute, ~1% of trunk
    FLOPs at reference shapes); stage weights live only on their pipe
    shard."""
    ppn = int(mesh.shape["pipe"])
    if model.num_layers % ppn:
        raise ValueError(f"num_layers={model.num_layers} not divisible "
                         f"by pipe={ppn}")
    lp = model.num_layers // ppn
    layer_mod = EncoderLayer(
        model.d_model, model.num_heads, model.max_seq,
        model.dropout_rate, dtype=model.dtype,
        attention_impl=model.attention_impl, ffn_dim=model.ffn_dim)
    pos_table = sinusoid_position_encoding(model.max_seq, model.d_model)
    perm = [(i, (i + 1) % ppn) for i in range(ppn)]

    def _body(staged, hm, maskm, kpm, key, *, deterministic: bool):
        """Per-device GPipe schedule. staged: [1, lp, ...] local stage
        params; hm: [M, mb, L, d] microbatched embeddings; maskm:
        [M, mb, 1, L, L]; kpm: [M, mb, L]; key: dropout base key."""
        stage = jax.lax.axis_index("pipe")
        local = jax.tree.map(lambda a: a[0], staged)
        m = hm.shape[0]
        # carries become device-varying over (data, pipe) after the
        # ppermute/axis_index ops; mark the zero inits accordingly so
        # the scan carry types match (jax >= 0.9 vma check)
        vary = ("data", "pipe")
        buf = jax.lax.pcast(jnp.zeros(hm.shape[1:], hm.dtype),
                            vary, to="varying")
        out = jax.lax.pcast(jnp.zeros(hm.shape, hm.dtype),
                            vary, to="varying")

        def tick(carry, t):
            buf, out = carry
            mi = jnp.clip(t - stage, 0, m - 1)
            x_in = jnp.where(stage == 0, hm[mi], buf)
            mask = maskm[mi]
            # pad_in_input=False (cli.train's dense-window setting):
            # layers get key_pad=None so the Pallas kernels compile
            # their no-pad variant; the unused kpm input is DCE'd
            kp = kpm[mi] if model.pad_in_input else None

            def one_layer(h, xs):
                if deterministic:
                    lparams = xs
                    h = layer_mod.apply({"params": lparams}, h, mask,
                                        True, kp)
                else:
                    lparams, kk = xs
                    h = layer_mod.apply({"params": lparams}, h, mask,
                                        False, kp,
                                        rngs={"dropout": kk})
                return h, None

            if deterministic:
                xs = local
            else:
                # fold in the DATA shard index too: the key enters the
                # shard_map replicated (P() in-spec), so without it
                # every data shard would draw bit-identical dropout
                # masks for different examples (correlated dropout)
                kd = jax.random.fold_in(key, jax.lax.axis_index("data"))
                keys = jax.random.split(
                    jax.random.fold_in(jax.random.fold_in(kd, t),
                                       stage), lp)
                xs = (local, keys)
            y, _ = jax.lax.scan(one_layer, x_in, xs)
            buf_next = jax.lax.ppermute(y, "pipe", perm)
            # collect finished microbatches on the last stage; other
            # ticks/stages write the existing slice back (identity)
            oi = jnp.clip(t - (ppn - 1), 0, m - 1)
            is_out = (stage == ppn - 1) & (t >= ppn - 1)
            cur = jax.lax.dynamic_index_in_dim(out, oi, 0,
                                               keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(is_out, y, cur), oi, 0)
            return (buf_next, out), None

        (buf, out), _ = jax.lax.scan(tick, (buf, out),
                                     jnp.arange(m + ppn - 1))
        # only the last stage wrote non-zeros: psum == broadcast
        return jax.lax.psum(out, "pipe")

    act_spec = P(None, "data")
    stage_spec = P("pipe")

    @functools.lru_cache(maxsize=2)
    def _sharded(deterministic: bool):
        body = functools.partial(_body, deterministic=deterministic)
        if deterministic:
            def run(staged, hm, maskm, kpm):
                return body(staged, hm, maskm, kpm, None)
            return jax.shard_map(
                run, mesh=mesh,
                in_specs=(stage_spec, act_spec, act_spec, act_spec),
                out_specs=act_spec)
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(stage_spec, act_spec, act_spec, act_spec, P()),
            out_specs=act_spec)

    dt = model.dtype

    def apply_fn(params, x, rng=None):
        if "layers_scan" not in params:
            raise ValueError(
                "pipeline apply needs the stacked param layout "
                "('layers_scan'); convert with models.music_transformer"
                ".stack_layer_params")
        b, seq_len = x.shape
        if b % n_micro:
            raise ValueError(f"batch {b} not divisible by "
                             f"n_micro={n_micro}")
        mb = b // n_micro
        if mb % mesh.shape["data"]:
            raise ValueError(f"microbatch {mb} not divisible by "
                             f"data={mesh.shape['data']}")
        if model.pad_in_input:
            mask = causal_pad_mask(x, model.pad_id)
        else:
            # dense windows: causal-only (broadcast view, no B copies)
            tri = jnp.triu(jnp.ones((seq_len, seq_len), jnp.bool_),
                           k=1).astype(jnp.float32)
            mask = jnp.broadcast_to(tri[None, None], (b, 1, seq_len,
                                                      seq_len))
        key_pad = (x == model.pad_id).astype(jnp.float32)
        # embedding + reference sinusoid + embedding dropout — the exact
        # math of MusicTransformer.__call__ (models/music_transformer.py)
        tbl = params["embedding"]["embedding"]
        h = jnp.take(tbl.astype(dt), x, axis=0)
        h = h * jnp.sqrt(jnp.float32(model.d_model)).astype(dt)
        h = h + jnp.asarray(pos_table[:seq_len], dt)[None]
        if rng is not None and model.dropout_rate > 0.0:
            h = _flax_dropout(h, model.dropout_rate,
                              jax.random.fold_in(rng, 0x7EED))
        d = model.d_model
        hm = h.reshape(n_micro, mb, seq_len, d)
        maskm = mask.reshape(n_micro, mb, *mask.shape[1:])
        kpm = key_pad.reshape(n_micro, mb, seq_len)
        staged = jax.tree.map(
            lambda a: a.reshape(ppn, lp, *a.shape[1:]),
            params["layers_scan"])
        if rng is None:
            out = _sharded(True)(staged, hm, maskm, kpm)
        else:
            out = _sharded(False)(staged, hm, maskm, kpm, rng)
        h = out.reshape(b, seq_len, d)
        fck = params["fc"]["kernel"].astype(dt)
        fcb = params["fc"]["bias"].astype(dt)
        logits = h @ fck + fcb
        return logits.astype(model.logits_dtype)

    return apply_fn
