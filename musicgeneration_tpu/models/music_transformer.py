"""MusicTransformer: decoder-only transformer with relative global attention.

Architecture parity with the reference (mg/model/MusicTransformer/
{network.py:14-40, layers.py:42-233}):

* embedding * sqrt(d_model) + the reference's idiosyncratic sinusoid,
* N x [RGA -> dropout -> post-LN -> FFN(relu, d_model//2) -> dropout ->
  post-LN], heads = d_model // 64, LayerNorm eps 1e-6,
* final Dense to vocab; look-ahead | pad mask built from the input
  (utils.py:58-83), pad id = vocab_size - 1 by convention
  (config.py:13-16: vocab = event_dim + 1).

What the reference does NOT have and this module adds (TPU-first):

* `init_cache` / `decode_step`: O(L) KV-cached incremental decoding with an
  exact relative-bias gather (see ops.relative_attention), replacing the
  reference's per-token full re-forward (network.py:52-78, O(L^2) per
  token),
* configurable compute dtype (bfloat16 on TPU; params stay f32),
* static shapes throughout so the whole model jits into one XLA program.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.relative_attention import (
    causal_pad_mask,
    relative_chunk_bias,
    relative_decode_bias,
    relative_global_attention,
    sinusoid_position_encoding,
)
from .registry import register_model

Cache = Dict[str, jnp.ndarray]


class RelativeGlobalAttentionBlock(nn.Module):
    """Multi-head self-attention with learned relative embeddings
    (layers.py:42-133)."""

    d_model: int
    num_heads: int
    max_seq: int
    dtype: Any = jnp.float32
    attention_impl: str = "auto"  # "auto" | "xla" | "pallas" | "ring"
    mesh: Any = None  # jax Mesh, required for the "ring" impl

    def setup(self):
        dh = self.d_model // self.num_heads
        self.wq = nn.Dense(self.d_model, dtype=self.dtype, name="Wq")
        self.wk = nn.Dense(self.d_model, dtype=self.dtype, name="Wk")
        self.wv = nn.Dense(self.d_model, dtype=self.dtype, name="Wv")
        self.fc = nn.Dense(self.d_model, dtype=self.dtype, name="fc")
        # reference: torch.randn -> stddev 1.0 (layers.py:60)
        self.e = self.param("E", nn.initializers.normal(1.0),
                            (self.max_seq, dh), jnp.float32)

    def _heads(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, _ = x.shape
        return x.reshape(b, l, self.num_heads, -1).transpose(0, 2, 1, 3)

    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                 key_pad: Optional[jnp.ndarray] = None,
                 return_kv: bool = False):
        q = self._heads(self.wq(x))
        k = self._heads(self.wk(x))
        v = self._heads(self.wv(x))
        l = q.shape[2]
        impl = self.attention_impl
        if impl == "auto":
            # the fused kernel wins on TPU (2x train step at L=2048);
            # interpret mode on CPU would be pure overhead
            impl = ("pallas" if jax.default_backend() == "tpu"
                    and l % 128 == 0 else "xla")
        if impl in ("ring", "ring_pallas"):
            # sequence-parallel path: activations sharded over the 'seq'
            # mesh axis; "ring" rotates KV with XLA ppermutes
            # (parallel/ring_attention.py), "ring_pallas" with in-kernel
            # RDMA overlapped with the tile compute
            # (parallel/ring_attention_pallas.py; backward = XLA ring)
            if self.mesh is None:
                raise ValueError(f'attention_impl="{impl}" needs mesh=')
            if impl == "ring_pallas":
                from ..parallel.ring_attention_pallas import (
                    ring_relative_attention_pallas as ring_fn,
                )
            else:
                from ..parallel.ring_attention import (
                    ring_relative_attention as ring_fn,
                )
            out = ring_fn(
                q, k, v, self.e.astype(jnp.float32), self.mesh,
                axis_name="seq", causal=True, key_pad=key_pad)
        elif impl == "pallas" and l % 128 == 0:
            from ..ops.pallas_attention import (
                autotuned_fwd_blocks, fused_relative_attention,
            )
            bq, bk = autotuned_fwd_blocks(l, q.shape[-1])
            out = fused_relative_attention(
                q, k, v, self.e.astype(jnp.float32), key_pad,
                block_q=bq, block_k=bk, causal=True,
                interpret=jax.default_backend() != "tpu")
        else:
            out = relative_global_attention(
                q, k, v, self.e.astype(jnp.float32), mask)
        b, h, l, dh = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, h * dh)
        if return_kv:
            return self.fc(out), k, v  # k/v: [B, H, L, dh]
        return self.fc(out)

    def decode(self, x: jnp.ndarray, k_all: jnp.ndarray,
               v_all: jnp.ndarray, li: int, t: jnp.ndarray,
               start: Optional[jnp.ndarray] = None):
        """One-token step. x: [B, d_model]; k_all/v_all are the FULL
        stacked caches [L, B, H, S, dh] updated in place at (li, ..., t)
        — a single one-row dynamic-update-slice per layer, never a
        restack, so under scan-with-donation XLA keeps the cache
        in-place instead of copying ~MBs per generated token.
        Returns (out [B, d_model], k_all, v_all).

        start: optional [B] int32 ragged lower bound — row b attends
        only to cache rows s >= start[b] (continuous batching)."""
        b = x.shape[0]
        dh = self.d_model // self.num_heads
        q = self.wq(x).reshape(b, self.num_heads, dh)
        k_new = self.wk(x).reshape(1, b, self.num_heads, 1, dh)
        v_new = self.wv(x).reshape(1, b, self.num_heads, 1, dh)
        k_all = jax.lax.dynamic_update_slice(
            k_all, k_new.astype(k_all.dtype), (li, 0, 0, t, 0))
        v_all = jax.lax.dynamic_update_slice(
            v_all, v_new.astype(v_all.dtype), (li, 0, 0, t, 0))
        k_cache = k_all[li]
        v_cache = v_all[li]
        s = k_cache.shape[2]
        qk = jnp.einsum("bhd,bhsd->bhs", q, k_cache,
                        preferred_element_type=jnp.float32)
        bias = relative_decode_bias(q, self.e.astype(jnp.float32), t, s)
        logits = (qk + bias) / jnp.sqrt(jnp.float32(dh))
        future = jnp.arange(s)[None, None, :] > t
        logits = jnp.where(future, -1e9, logits)
        if start is not None:
            past = jnp.arange(s)[None, None, :] < start[:, None, None]
            logits = jnp.where(past, -1e9, logits)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhs,bhsd->bhd", w.astype(v_cache.dtype), v_cache,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, self.d_model).astype(self.dtype)
        return self.fc(out), k_all, v_all


    def decode_chunk(self, x: jnp.ndarray, k_all: jnp.ndarray,
                     v_all: jnp.ndarray, li: int, t: jnp.ndarray,
                     fused_layout: bool):
        """C-token verify step (speculative decoding): the C queries at
        absolute positions t..t+C-1 attend jointly against the cache —
        one forward instead of C sequential ``decode`` calls, exactly
        equal to them position by position (causal within the chunk).

        x: [B, C, d_model]; k_all/v_all: full stacked caches in either
        layout ([L, B, S, d] fused / [L, B, H, S, dh] XLA), updated in
        place at rows t..t+C-1 of layer li."""
        b, c, _ = x.shape
        dh = self.d_model // self.num_heads
        q = self._heads(self.wq(x))             # [B, H, C, dh]
        k_new = self.wk(x)
        v_new = self.wv(x)                       # [B, C, d_model]
        if fused_layout:
            k_all = jax.lax.dynamic_update_slice(
                k_all, k_new[None].astype(k_all.dtype), (li, 0, t, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, v_new[None].astype(v_all.dtype), (li, 0, t, 0))
            # einsum consumes the [B, S, H, dh] VIEW of the [B, S, d]
            # cache directly — a bhsd form would materialize two full
            # cache transposes per layer per verify
            s = k_all.shape[2]
            k_cache = k_all[li].reshape(b, s, self.num_heads, dh)
            v_cache = v_all[li].reshape(b, s, self.num_heads, dh)
            kv_eq, out_eq = "bhcd,bshd->bhcs", "bhcs,bshd->bchd"
        else:
            k_all = jax.lax.dynamic_update_slice(
                k_all, self._heads(k_new)[None].astype(k_all.dtype),
                (li, 0, 0, t, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, self._heads(v_new)[None].astype(v_all.dtype),
                (li, 0, 0, t, 0))
            k_cache, v_cache = k_all[li], v_all[li]  # [B, H, S, dh]
            s = k_cache.shape[2]
            kv_eq, out_eq = "bhcd,bhsd->bhcs", "bhcs,bhsd->bchd"
        qk = jnp.einsum(kv_eq, q, k_cache,
                        preferred_element_type=jnp.float32)
        bias = relative_chunk_bias(q, self.e.astype(jnp.float32), t, s)
        logits = (qk + bias) / jnp.sqrt(jnp.float32(dh))
        future = (jnp.arange(s)[None, None, None, :]
                  > (t + jnp.arange(c))[None, None, :, None])
        logits = jnp.where(future, -1e9, logits)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(out_eq, w.astype(v_cache.dtype),
                         v_cache, preferred_element_type=jnp.float32)
        out = out.reshape(b, c, self.d_model).astype(self.dtype)
        return self.fc(out), k_all, v_all


class EncoderLayer(nn.Module):
    """RGA + FFN with post-LN (layers.py:136-161).

    ffn_dim defaults to the reference's d_model // 2 (layers.py:147);
    a production-shape variant (e.g. 4*d_model) is configurable for
    the MFU study in BASELINE.md."""

    d_model: int
    num_heads: int
    max_seq: int
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    mesh: Any = None
    ffn_dim: int = 0  # 0 -> reference default d_model // 2

    def setup(self):
        self.rga = RelativeGlobalAttentionBlock(
            self.d_model, self.num_heads, self.max_seq, dtype=self.dtype,
            attention_impl=self.attention_impl, mesh=self.mesh)
        self.ffn_pre = nn.Dense(self.ffn_dim or self.d_model // 2,
                                dtype=self.dtype)
        self.ffn_suf = nn.Dense(self.d_model, dtype=self.dtype)
        self.ln1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.ln2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.drop1 = nn.Dropout(self.dropout_rate)
        self.drop2 = nn.Dropout(self.dropout_rate)

    def __call__(self, x, mask, deterministic: bool = True,
                 key_pad=None):
        attn = self.rga(x, mask, key_pad)
        attn = self.drop1(attn, deterministic=deterministic)
        out1 = self.ln1(attn + x)
        ffn = self.ffn_suf(nn.relu(self.ffn_pre(out1)))
        ffn = self.drop2(ffn, deterministic=deterministic)
        return self.ln2(out1 + ffn)

    def decode(self, x, k_all, v_all, li: int, t, start=None):
        attn, k_all, v_all = self.rga.decode(x, k_all, v_all, li, t,
                                             start=start)
        out1 = self.ln1(attn + x)
        ffn = self.ffn_suf(nn.relu(self.ffn_pre(out1)))
        return self.ln2(out1 + ffn), k_all, v_all

    def decode_chunk(self, x, k_all, v_all, li: int, t, fused_layout):
        attn, k_all, v_all = self.rga.decode_chunk(
            x, k_all, v_all, li, t, fused_layout)
        out1 = self.ln1(attn + x)
        ffn = self.ffn_suf(nn.relu(self.ffn_pre(out1)))
        return self.ln2(out1 + ffn), k_all, v_all

    def forward_kv(self, x, mask, key_pad=None):
        """Full-sequence forward that also returns this layer's K/V
        (for one-pass cache prefill)."""
        attn, k, v = self.rga(x, mask, key_pad, return_kv=True)
        out1 = self.ln1(attn + x)
        ffn = self.ffn_suf(nn.relu(self.ffn_pre(out1)))
        return self.ln2(out1 + ffn), k, v


class _ScanEncoderLayer(EncoderLayer):
    """EncoderLayer with the (carry, out) signature nn.scan expects;
    mask / deterministic / key_pad broadcast across the layer axis."""

    def __call__(self, h, mask, deterministic, key_pad):  # noqa: D401
        h = EncoderLayer.__call__(self, h, mask,
                                  deterministic=deterministic,
                                  key_pad=key_pad)
        return h, None


def unstack_scanned_params(params, num_layers: int):
    """Convert a scan_layers=True param tree (one 'layers_scan'
    subtree with a leading [L, ...] axis on every leaf) to the unrolled
    'layer_i' layout the decode paths and existing checkpoints use.
    Leaves outside 'layers_scan' pass through unchanged."""
    import jax as _jax

    if "layers_scan" not in params:
        return params
    out = {k: v for k, v in params.items() if k != "layers_scan"}
    stacked = params["layers_scan"]
    for i in range(num_layers):
        out[f"layer_{i}"] = _jax.tree.map(lambda x: x[i], stacked)
    return out


def stack_layer_params(params, num_layers: int):
    """Inverse of unstack_scanned_params: 'layer_i' subtrees ->
    one stacked 'layers_scan' subtree."""
    import jax as _jax

    if "layer_0" not in params:
        return params
    out = {k: v for k, v in params.items()
           if not k.startswith("layer_")}
    out["layers_scan"] = _jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[params[f"layer_{i}"] for i in range(num_layers)])
    return out


@register_model("music_transformer")
class MusicTransformer(nn.Module):
    """Reference defaults: vocab 388+2, d_model 256, 6 layers, max_seq 2048
    (network.py:15-16); the MIDI-like trainer uses vocab = 308+1
    (config.py:11-16)."""

    vocab_size: int = 390
    num_layers: int = 6
    d_model: int = 256
    max_seq: int = 2048
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32
    attention_impl: str = "auto"  # auto: pallas on TPU, xla elsewhere;
    #                               "ring" = sequence-parallel over the
    #                               mesh's 'seq' axis (needs mesh=)
    mesh: Any = None  # jax Mesh for attention_impl="ring"
    decode_impl: str = "auto"  # "auto" | "fused" | "xla": fused = whole
    #                            layer per decode step in one Pallas
    #                            kernel (auto on TPU)
    decode_quant: str = "none"  # "int8": weight-only int8 STREAMING
    #   decode (d_model >= 1024 rung): halves the per-step weight HBM
    #   traffic (+9% B8 on v5e) and weight memory; ~1e-2 weight-only
    #   logit error (opt-in; cli.generate --quant int8)
    remat: bool = False  # jax.checkpoint each layer: trade recompute
    #                      FLOPs for activation memory (HBM headroom for
    #                      bigger batches/longer sequences)
    head_dim: int = 64  # reference: heads fixed at dh=64
    #   (layers.py:42-43, h = d_model // 64); 128 fills the MXU
    #   contraction on TPU — the production-shape MFU study knob
    ffn_dim: int = 0  # 0 -> reference default d_model // 2
    logits_dtype: Any = jnp.float32  # dtype the [B, L, vocab] logits
    #   materialize in. f32 default (reference numerics); bf16 halves
    #   the logits/dlogits HBM traffic at large vocabs — the loss still
    #   upcasts per-element and reduces in f32 (train/objective.py)
    pad_in_input: bool = True  # False asserts __call__'s inputs never
    #   contain pad_id (true for every dense-window batch mode — the
    #   reference's slide_seq2seq/SegBatchify crops are full windows):
    #   the causal mask drops its pad term and the Pallas kernels
    #   compile their no-pad variant (the key-pad add leaves every
    #   tile). Bit-equal to the default on pad-free batches; an input
    #   that DOES contain pad_id under this flag attends to pad keys
    #   like the reference would without its mask. Training-time only —
    #   prefill/decode always keep pad masking (bucketed prompts pad).
    scan_layers: bool = False  # run the trunk as ONE lax.scan over a
    #   stacked [L, ...] layer-param axis instead of L unrolled layers.
    #   The compiled program shrinks ~L-fold — first compiles on this
    #   tunneled backend take minutes and the remote helper caps
    #   program size (CLAUDE.md: L=4096 models trip it), so scan mode
    #   is the big-model/compile-time lever. TRAIN/forward only; the
    #   checkpoint's stacked tree converts to the unrolled layout with
    #   models.music_transformer.unstack_scanned_params (cli.generate
    #   does this automatically).

    @property
    def num_heads(self) -> int:
        return self.d_model // self.head_dim

    @property
    def pad_id(self) -> int:
        return self.vocab_size - 1

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.d_model,
                                  dtype=self.dtype)
        self.pos_table = sinusoid_position_encoding(self.max_seq,
                                                    self.d_model)
        if self.scan_layers:
            body = _ScanEncoderLayer
            if self.remat:
                # remat composes with scan: each scan step recomputes
                # its activations in the backward sweep
                body = nn.remat(body, static_argnums=(3,))
            scan_cls = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_layers,
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            )
            self.scanned = scan_cls(
                self.d_model, self.num_heads, self.max_seq,
                self.dropout_rate, dtype=self.dtype,
                attention_impl=self.attention_impl, mesh=self.mesh,
                ffn_dim=self.ffn_dim, name="layers_scan")
            self.layers = []
        else:
            self.layers = [
                EncoderLayer(self.d_model, self.num_heads, self.max_seq,
                             self.dropout_rate, dtype=self.dtype,
                             attention_impl=self.attention_impl,
                             mesh=self.mesh, ffn_dim=self.ffn_dim,
                             name=f"layer_{i}")
                for i in range(self.num_layers)
            ]
        self.fc = nn.Dense(self.vocab_size, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """x: [B, L] int tokens -> logits [B, L, vocab] (f32)."""
        if self.pad_in_input:
            mask = causal_pad_mask(x, self.pad_id)
            key_pad = (x == self.pad_id).astype(jnp.float32)  # pallas
        else:
            # dense windows: causal-only mask, no-pad kernel variant
            l = x.shape[1]
            mask = jnp.triu(jnp.ones((l, l), jnp.bool_),
                            k=1)[None, None].astype(jnp.float32)
            key_pad = None
        h = self.embedding(x) * jnp.sqrt(jnp.float32(self.d_model)).astype(
            self.dtype)
        h = h + jnp.asarray(self.pos_table[: x.shape[1]], self.dtype)[None]
        h = self.dropout(h, deterministic=deterministic)
        if self.scan_layers:
            h, _ = self.scanned(h, mask, deterministic, key_pad)
            return self.fc(h).astype(self.logits_dtype)
        for layer in self.layers:
            if self.remat:
                h = nn.remat(type(layer).__call__,
                             static_argnums=(3,))(
                    layer, h, mask, deterministic, key_pad)
            else:
                h = layer(h, mask, deterministic=deterministic,
                          key_pad=key_pad)
        return self.fc(h).astype(self.logits_dtype)

    # -- incremental decoding -------------------------------------------------

    def _decode_fused(self) -> bool:
        impl = self.decode_impl
        if impl == "auto":
            if jax.default_backend() != "tpu":
                return False
            from ..ops.pallas_decode import (
                decode_grid_vmem_bytes,
                decode_stream_vmem_bytes,
                decode_vmem_bytes,
            )
            est = decode_vmem_bytes(self.num_layers, self.d_model,
                                    self.vocab_size, self.max_seq, 64)
            if est < 10 * 1024 * 1024:  # stacked weights fit VMEM
                return True
            # layer-grid variant pipelines per-layer weight blocks
            # (d_model=512); past that the STREAMING grid variant pulls
            # weight column tiles from HBM (d_model>=1024) — the kernel
            # itself picks the cheapest fitting mode, this gate only
            # answers "is any fused mode viable"
            if decode_grid_vmem_bytes(
                    self.d_model, self.max_seq, 64) < 13 * 1024 * 1024:
                return True
            return (self.d_model % 256 == 0
                    and decode_stream_vmem_bytes(
                        self.d_model, self.max_seq, 64)
                    < 14 * 1024 * 1024)
        return impl == "fused"

    def init_cache(self, batch: int, cache_len: int) -> Cache:
        if self._decode_fused():
            # fused layout [L, B, S, d]: head dim merged into d so the
            # kernel's DMA slices stay 128-aligned (ops/pallas_decode.py)
            shape = (self.num_layers, batch, cache_len, self.d_model)
        else:
            dh = self.d_model // self.num_heads
            shape = (self.num_layers, batch, self.num_heads, cache_len,
                     dh)
        return {
            "k": jnp.zeros(shape, self.dtype),
            "v": jnp.zeros(shape, self.dtype),
        }

    def decode_step(self, token: jnp.ndarray, cache: Cache,
                    t: jnp.ndarray, start: Optional[jnp.ndarray] = None,
                    start_min: Optional[jnp.ndarray] = None):
        """token: [B] int; t: scalar absolute position. Returns
        (logits [B, vocab] f32, new cache).

        decode_impl="fused" (auto on TPU) runs each layer's whole step
        as ONE Pallas kernel (ops/pallas_decode.py) — the XLA path's
        ~20 tiny ops per layer are latency-bound at decode shapes.

        start: optional [B] int32 — RAGGED continuous-batching step
        (decode/serving.py): row b's sequence occupies cache rows
        [start[b], t], i.e. its own position is t - start[b]. The
        positional row is gathered per row and attention masks cache
        rows below start[b]; the relative bias needs no change (it
        depends only on the shared distance t - s).

        start_min: optional scalar <= min(start) — live-window floor
        forwarded to the fused kernels, which then skip the KV blocks
        below it entirely (they are start-masked for every row). Pure
        perf hint; ignored by the XLA path."""
        h = self.embedding(token) * jnp.sqrt(
            jnp.float32(self.d_model)).astype(self.dtype)
        if start is None:
            pos = jax.lax.dynamic_slice_in_dim(
                jnp.asarray(self.pos_table, self.dtype), t, 1, axis=0)
        else:
            pos = jnp.asarray(self.pos_table, self.dtype)[t - start]
        h = h + pos
        k_all, v_all = cache["k"], cache["v"]
        if self._decode_fused():
            h, k_all, v_all = fused_layer_stack_step(
                self.layers, h, t, k_all, v_all, self.num_heads,
                self.dtype, quant=getattr(self, "decode_quant", "none"),
                start=start, start_min=start_min)
        else:
            for i, layer in enumerate(self.layers):
                h, k_all, v_all = layer.decode(h, k_all, v_all, i, t,
                                               start=start)
        logits = self.fc(h).astype(jnp.float32)
        return logits, {"k": k_all, "v": v_all}

    def decode_chunk(self, tokens: jnp.ndarray, cache: Cache,
                     t: jnp.ndarray, use_kernel=None):
        """Verify forward for speculative decoding: process C tokens at
        absolute positions t..t+C-1 against the existing cache in ONE
        joint forward — position-by-position equal to C sequential
        ``decode_step`` calls (causal inside the chunk), but one weight
        pass instead of C. At B=1 the step is weight-bandwidth-bound,
        so the chunk costs ~one step; the accepted-token count is the
        speedup (decode/speculative.py).

        When the fused decode kernels are active, the whole chunk runs
        as ONE Pallas kernel (ops/pallas_decode.fused_decode_chunk —
        the XLA chunk pays the same ~20-tiny-ops-per-layer latency tax
        the step kernel was built to remove); use_kernel=False forces
        the XLA path (None = auto: fused impl + power-of-two C >= 8 +
        max_seq >= 128).

        tokens: [B, C] int32 -> (logits [B, C, vocab] f32, new cache):
        logits[:, i] is the next-token distribution AFTER tokens[:, i].
        Requires t + C <= max_seq (position/E-table rows in range)."""
        b, c = tokens.shape
        h = self.embedding(tokens) * jnp.sqrt(
            jnp.float32(self.d_model)).astype(self.dtype)
        pos = jax.lax.dynamic_slice(
            jnp.asarray(self.pos_table, self.dtype), (t, 0),
            (c, self.d_model))
        h = h + pos[None]
        k_all, v_all = cache["k"], cache["v"]
        fused = self._decode_fused()
        if use_kernel is None:
            use_kernel = (fused and c & (c - 1) == 0 and 8 <= c <= 128
                          and self.max_seq >= 128)
        if use_kernel:
            if not fused:
                raise ValueError("decode_chunk(use_kernel=True) needs "
                                 "the fused cache layout (decode_impl)")
            from ..ops.pallas_decode import (
                fused_decode_chunk,
                quantize_stream_weights,
            )

            w_all, e_all = _stacked_decode_weights(self.layers,
                                                   self.dtype)
            scales = None
            quant = getattr(self, "decode_quant", "none")
            if quant == "int8":
                w_all, scales = quantize_stream_weights(w_all)
            h, k_all, v_all = fused_decode_chunk(
                h, t, e_all, w_all, k_all, v_all, self.num_heads,
                chunk_c=c, interpret=jax.default_backend() != "tpu",
                scales=scales)
        else:
            for i, layer in enumerate(self.layers):
                h, k_all, v_all = layer.decode_chunk(h, k_all, v_all,
                                                     i, t, fused)
        logits = self.fc(h).astype(jnp.float32)
        return logits, {"k": k_all, "v": v_all}

    def decode_loop(self, last_logits: jnp.ndarray, t: jnp.ndarray,
                    rng, cache: Cache, steps: int,
                    temperature: float = 1.0, greedy: bool = False,
                    top_k: int = 0, top_p: float = 1.0,
                    chunk: int = 32, bulk=None):
        """Generate `steps` tokens in ceil(steps/chunk) Pallas
        megakernel launches (ops/pallas_decode_loop.py): each launch
        runs `chunk` whole sampling steps on-core with weights/tables
        VMEM-resident — per-token launch and weight-copy overhead drops
        by the chunk factor. Only plain temperature/greedy sampling;
        the decode engine auto-selects it when eligible.
        Returns (tokens [B, steps] int32, cache)."""
        from ..ops.pallas_decode_loop import fused_decode_chunk

        w_all, e_all = _stacked_decode_weights(self.layers, self.dtype)
        embed = self.embedding.embedding.astype(self.dtype)
        pos = jnp.asarray(self.pos_table, self.dtype)
        fc_w = self.fc.variables["params"]["kernel"].astype(self.dtype)
        fc_b = self.fc.variables["params"]["bias"]
        interpret = jax.default_backend() != "tpu"
        k_all, v_all = cache["k"], cache["v"]
        t = jnp.asarray(t, jnp.int32)
        logits = last_logits
        outs = []
        done = 0
        chunk_idx = 0
        while done < steps:
            c = min(chunk, steps - done)
            # per-chunk seed for the on-core PRNG: fold_in gives a
            # deterministic, collision-free map from the caller's key
            # (chunk i always sees the same seed for a given rng) —
            # still a DIFFERENT stream than the scan path's
            # jax.random.categorical (see DecodeParams.use_loop_kernel)
            sub = jax.random.fold_in(rng, chunk_idx)
            seed = jax.random.randint(sub, (), 0,
                                      jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)
            chunk_idx += 1
            toks, ck, cv, logits = fused_decode_chunk(
                logits, t, seed, embed, pos, e_all, w_all, fc_w, fc_b,
                k_all, v_all, self.num_heads, c,
                temperature=temperature, greedy=greedy,
                top_k=top_k, top_p=top_p,
                interpret=interpret, bulk=bulk)
            k_all = jax.lax.dynamic_update_slice(
                k_all, ck.astype(k_all.dtype), (0, 0, t, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, cv.astype(v_all.dtype), (0, 0, t, 0))
            t = t + c
            done += c
            outs.append(toks)
        tokens = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 1)
        return tokens, {"k": k_all, "v": v_all}

    def prefill(self, x: jnp.ndarray, cache_len: int, last_idx=None):
        """One-pass prompt ingestion: a single (pallas-accelerated)
        parallel forward fills the KV cache — O(1) forwards for a
        P-token prompt instead of the scan's P sequential decode steps.
        x: [B, P] -> (last-position logits [B, vocab], cache).

        last_idx: optional DYNAMIC position whose logits to return
        (bucketed-prompt decoding: x is padded to a static bucket length
        and the true prompt ends at last_idx; causal masking keeps the
        trailing pad tokens from influencing any position <= last_idx,
        and generation overwrites their cache rows)."""
        b, p = x.shape
        mask = causal_pad_mask(x, self.pad_id)
        key_pad = (x == self.pad_id).astype(jnp.float32)
        h = self.embedding(x) * jnp.sqrt(jnp.float32(self.d_model)).astype(
            self.dtype)
        h = h + jnp.asarray(self.pos_table[:p], self.dtype)[None]
        dh = self.d_model // self.num_heads
        fused = self._decode_fused()
        if fused:
            shape = (self.num_layers, b, cache_len, self.d_model)
        else:
            shape = (self.num_layers, b, self.num_heads, cache_len, dh)
        k_all = jnp.zeros(shape, self.dtype)
        v_all = jnp.zeros(shape, self.dtype)
        for i, layer in enumerate(self.layers):
            h, k_i, v_i = layer.forward_kv(h, mask, key_pad)
            if fused:
                # [B, H, P, dh] -> fused layout rows [B, P, d]
                k_i = k_i.transpose(0, 2, 1, 3).reshape(b, p, self.d_model)
                v_i = v_i.transpose(0, 2, 1, 3).reshape(b, p, self.d_model)
                k_all = jax.lax.dynamic_update_slice(
                    k_all, k_i[None].astype(self.dtype), (i, 0, 0, 0))
                v_all = jax.lax.dynamic_update_slice(
                    v_all, v_i[None].astype(self.dtype), (i, 0, 0, 0))
            else:
                k_all = jax.lax.dynamic_update_slice(
                    k_all, k_i[None].astype(self.dtype), (i, 0, 0, 0, 0))
                v_all = jax.lax.dynamic_update_slice(
                    v_all, v_i[None].astype(self.dtype), (i, 0, 0, 0, 0))
        if last_idx is None:
            h_last = h[:, -1]
        else:
            h_last = jax.lax.dynamic_index_in_dim(
                h, last_idx, axis=1, keepdims=False)
        logits = self.fc(h_last).astype(jnp.float32)
        return logits, {"k": k_all, "v": v_all}


def _stacked_decode_weights(layers, dtype):
    """Stacked [L, ...] weight dict + E tables for the fused decode
    kernels. Loop-invariant, so XLA hoists the stacking out of decode
    scans; weights ride in the model dtype (what the XLA path's Dense
    computes in; bf16 halves their VMEM so batch-32/64 decode fits the
    16 MB scoped-vmem budget)."""
    w_all = {
        k: jnp.stack([_layer_decode_weights(layer)[k]
                      for layer in layers]).astype(dtype)
        for k in _layer_decode_weights(layers[0])
    }
    e_all = jnp.stack([layer.rga.e for layer in layers]).astype(
        jnp.float32)
    return w_all, e_all


def fused_layer_stack_step(layers, h, t, k_all, v_all, num_heads: int,
                           dtype, quant: str = "none", start=None,
                           start_min=None):
    """Run one fused decode step over a stack of EncoderLayers
    (ops/pallas_decode.py) — shared by MusicTransformer and
    CPTransformer.

    quant="int8": weight-only int8 streaming (d_model >= 1024 rung;
    ops/pallas_decode.quantize_stream_weights) — halves the per-step
    weight HBM traffic (+9% B8 decode on v5e) and the weight memory,
    at the usual ~1e-2 weight-only logit error. Quantization happens
    here per call; under the decode scan it is loop-invariant and XLA
    hoists it (same as the stacking itself)."""
    from ..ops.pallas_decode import (
        fused_decode_step,
        quantize_stream_weights,
    )

    w_all, e_all = _stacked_decode_weights(layers, dtype)
    scales = None
    if quant == "int8":
        w_all, scales = quantize_stream_weights(w_all)
    elif quant not in ("none", None):
        raise ValueError(f"unknown decode_quant {quant!r}")
    return fused_decode_step(h, t, e_all, w_all, k_all, v_all, num_heads,
                             interpret=jax.default_backend() != "tpu",
                             scales=scales, start=start,
                             start_min=start_min)


def _layer_decode_weights(layer) -> Dict[str, jnp.ndarray]:
    """Raw parameter arrays of one EncoderLayer for the fused decode
    kernel (bound-module variable access)."""
    def p(mod, name):
        return mod.variables["params"][name]

    return {
        "wq": p(layer.rga.wq, "kernel"), "bq": p(layer.rga.wq, "bias"),
        "wk": p(layer.rga.wk, "kernel"), "bk": p(layer.rga.wk, "bias"),
        "wv": p(layer.rga.wv, "kernel"), "bv": p(layer.rga.wv, "bias"),
        "wfc": p(layer.rga.fc, "kernel"), "bfc": p(layer.rga.fc, "bias"),
        "ln1_scale": p(layer.ln1, "scale"),
        "ln1_bias": p(layer.ln1, "bias"),
        "ffn1_w": p(layer.ffn_pre, "kernel"),
        "ffn1_b": p(layer.ffn_pre, "bias"),
        "ffn2_w": p(layer.ffn_suf, "kernel"),
        "ffn2_b": p(layer.ffn_suf, "bias"),
        "ln2_scale": p(layer.ln2, "scale"),
        "ln2_bias": p(layer.ln2, "bias"),
    }


def music_transformer_defaults(**overrides) -> dict:
    cfg = dict(vocab_size=309, num_layers=6, d_model=256, max_seq=2048,
               dropout_rate=0.1)
    cfg.update(overrides)
    return cfg
