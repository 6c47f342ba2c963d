"""CPTransformer: transformer LM over Compound Word rows.

The CP scheme (tokenizers/cp.py — the reference README's "CP(to do)",
never built there) packs one musical event into an 8-field row; this
model follows the Compound Word Transformer recipe (Hsiao et al., AAAI
2021): per-field embeddings are SUMMED into one d_model vector per row
(the same compound-embedding idea PoPMAG's `compression` uses,
reference PoPMAG_RNN/network.py:141-149), a decoder-only trunk with
relative global attention processes the row sequence, and 8 output
heads predict the next row's fields. The trunk reuses MusicTransformer's
EncoderLayer (Pallas-fused attention on TPU, KV-cached decode_step).

Sequences are ~2-4x shorter than REMI for the same music, so a fixed
max_seq window covers proportionally more bars.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.relative_attention import sinusoid_position_encoding
from ..tokenizers import cp
from .music_transformer import EncoderLayer
from .registry import register_model

Cache = Dict[str, jnp.ndarray]


@register_model("cp_transformer")
class CPTransformer(nn.Module):
    field_dims: Tuple[int, ...] = tuple(cp.field_dims())
    num_layers: int = 4
    d_model: int = 256
    max_seq: int = 1024
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    mesh: Any = None
    decode_impl: str = "auto"  # "auto" | "fused" | "xla": the same
    #                            whole-stack Pallas decode-step kernel
    #                            MusicTransformer uses (auto on TPU)
    decode_quant: str = "none"  # "int8" weight-only streaming decode
    #                             (see music_transformer.decode_quant)
    scan_layers: bool = False  # lax.scan trunk (31x faster compiles at
    #                            step parity — see MusicTransformer);
    #                            train/forward only, cli.generate
    #                            unstacks the checkpoint

    @property
    def num_heads(self) -> int:
        return self.d_model // 64

    def setup(self):
        self.embeds = [nn.Embed(fd, self.d_model, dtype=self.dtype,
                                name=f"embed_{name}")
                       for fd, name in zip(self.field_dims,
                                           cp.field_names())]
        self.pos_table = sinusoid_position_encoding(self.max_seq,
                                                    self.d_model)
        if self.scan_layers:
            from .music_transformer import _ScanEncoderLayer
            scan_cls = nn.scan(
                _ScanEncoderLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_layers,
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            )
            self.scanned = scan_cls(
                self.d_model, self.num_heads, self.max_seq,
                self.dropout_rate, dtype=self.dtype,
                attention_impl=self.attention_impl, mesh=self.mesh,
                name="layers_scan")
            self.layers = []
        else:
            self.layers = [
                EncoderLayer(self.d_model, self.num_heads, self.max_seq,
                             self.dropout_rate, dtype=self.dtype,
                             attention_impl=self.attention_impl,
                             mesh=self.mesh, name=f"layer_{i}")
                for i in range(self.num_layers)
            ]
        self.heads = [nn.Dense(fd, dtype=self.dtype,
                               name=f"head_{name}")
                      for fd, name in zip(self.field_dims,
                                          cp.field_names())]

    def _embed(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [..., 8] int rows -> summed field embeddings [..., d]."""
        h = self.embeds[0](x[..., 0])
        for i in range(1, len(self.embeds)):
            h = h + self.embeds[i](x[..., i])
        return h * jnp.sqrt(jnp.float32(self.d_model)).astype(self.dtype)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        """x: [B, T, 8] -> list of per-field logits [B, T, fd] (f32)."""
        b, t, _ = x.shape
        h = self._embed(x)
        h = h + jnp.asarray(self.pos_table[:t], self.dtype)[None]
        # causal-only mask (CP crops carry no pad rows)
        tt = jnp.arange(t)
        mask = (tt[None, :] > tt[:, None])[None, None].astype(jnp.float32)
        if self.scan_layers:
            h, _ = self.scanned(h, mask, deterministic, None)
        else:
            for layer in self.layers:
                h = layer(h, mask, deterministic=deterministic)
        return [head(h).astype(jnp.float32) for head in self.heads]

    # -- incremental decoding ----------------------------------------------

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
                                    sum(self.field_dims), self.max_seq,
                                    64)
            if est < 10 * 1024 * 1024:
                return True
            if decode_grid_vmem_bytes(
                    self.d_model, self.max_seq, 64) < 13 * 1024 * 1024:
                return True
            # d_model >= 1024: weight-streaming grid kernel
            return (self.d_model % 256 == 0
                    and decode_stream_vmem_bytes(
                        self.d_model, self.max_seq, 64)
                    < 14 * 1024 * 1024)
        return impl == "fused"

    def init_cache(self, batch: int, cache_len: int) -> Cache:
        if self._decode_fused():
            # fused layout [L, B, S, d] (heads merged — see
            # ops/pallas_decode.py on Mosaic's 128-aligned DMA slices)
            shape = (self.num_layers, batch, cache_len, self.d_model)
        else:
            dh = self.d_model // self.num_heads
            shape = (self.num_layers, batch, self.num_heads, cache_len,
                     dh)
        return {"k": jnp.zeros(shape, self.dtype),
                "v": jnp.zeros(shape, self.dtype)}

    def prefill(self, rows: jnp.ndarray, cache_len: int):
        """One-pass prompt ingestion (same idea as MusicTransformer
        .prefill): a single parallel forward fills the KV cache instead
        of P sequential decode steps. rows: [B, P, 8] -> (list of
        last-position per-field logits [B, fd], cache)."""
        b, p, _ = rows.shape
        h = self._embed(rows)
        h = h + jnp.asarray(self.pos_table[:p], self.dtype)[None]
        tt = jnp.arange(p)
        mask = (tt[None, :] > tt[:, None])[None, None].astype(jnp.float32)
        fused = self._decode_fused()
        dh = self.d_model // self.num_heads
        if fused:
            shape = (self.num_layers, b, cache_len, self.d_model)
        else:
            shape = (self.num_layers, b, self.num_heads, cache_len, dh)
        k_all = jnp.zeros(shape, self.dtype)
        v_all = jnp.zeros(shape, self.dtype)
        for i, layer in enumerate(self.layers):
            h, k_i, v_i = layer.forward_kv(h, mask)
            if fused:
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
        h_last = h[:, -1]
        logits = [head(h_last).astype(jnp.float32) for head in self.heads]
        return logits, {"k": k_all, "v": v_all}

    def decode_step(self, row: jnp.ndarray, cache: Cache, t: jnp.ndarray,
                    start: Optional[jnp.ndarray] = None,
                    start_min: Optional[jnp.ndarray] = None):
        """row: [B, 8] int; t: absolute position. Returns (list of
        per-field logits [B, fd], new cache).

        start / start_min: optional RAGGED continuous-batching bounds,
        exactly as MusicTransformer.decode_step — row b occupies cache
        rows [start[b], t], its position is t - start[b], and the fused
        kernels skip KV blocks below the start_min floor
        (decode/serving_cp.py)."""
        from .music_transformer import fused_layer_stack_step

        h = self._embed(row)
        if start is None:
            pos = jax.lax.dynamic_slice_in_dim(
                jnp.asarray(self.pos_table, self.dtype), t, 1, axis=0)
            h = h + pos[0]
        else:
            h = h + jnp.asarray(self.pos_table, self.dtype)[t - start]
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
        logits = [head(h).astype(jnp.float32) for head in self.heads]
        return logits, {"k": k_all, "v": v_all}


def cp_transformer_defaults(**overrides) -> dict:
    cfg = dict(num_layers=4, d_model=256, max_seq=1024, dropout_rate=0.1)
    cfg.update(overrides)
    return cfg
