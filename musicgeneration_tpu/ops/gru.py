"""Multi-layer GRU as fused matmuls under lax.scan.

Gate semantics match torch.nn.GRU (what the reference RNNs use —
Event_MelodyRNN/network.py:27-29, PerformanceRNN/network.py:38-39):

    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh   (x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h

TPU shaping: the three gates are ONE [in, 3H] matmul per layer per step
(MXU-friendly), the whole sequence is one lax.scan (single compiled
program), and all layers advance inside the same scan body so XLA can
pipeline them. Inter-layer dropout (torch GRU `dropout=` semantics: applied
to the outputs of every layer except the last) is supported for training.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def gru_cell_step(x, h, w_ih, w_hh, b_ih, b_hh):
    """One GRU cell step. x: [B, in], h: [B, H] -> h': [B, H]."""
    gi = x @ w_ih + b_ih   # [B, 3H]
    gh = h @ w_hh + b_hh   # [B, 3H]
    H = h.shape[-1]
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


class GRUStack(nn.Module):
    """num_layers GRU. Methods:

    __call__(xs, h0, deterministic) — full sequence, xs: [T, B, in]
        (time-major like torch), h0: [L, B, H]; returns (outputs
        [T, B, H] = top layer, h_T [L, B, H]).
    step(x, h) — one step, x: [B, in], h: [L, B, H]; returns
        (top output [B, H], all-layer hidden [L, B, H]).
    """

    hidden_dim: int
    num_layers: int = 1
    dropout_rate: float = 0.0
    # torch nn.GRU(dropout=) samples a FRESH mask at every timestep; set
    # variational=True for the per-sequence frozen mask (Gal & Ghahramani)
    variational: bool = False
    dtype: Any = jnp.float32

    def _params(self, layer: int, in_dim: int):
        # torch GRU init: U(-1/sqrt(H), 1/sqrt(H)) on every weight/bias
        H = self.hidden_dim
        scale = 1.0 / H ** 0.5

        def init(key, shape):
            return jax.random.uniform(key, shape, jnp.float32,
                                      -scale, scale)

        w_ih = self.param(f"l{layer}_w_ih", init, (in_dim, 3 * H))
        w_hh = self.param(f"l{layer}_w_hh", init, (H, 3 * H))
        b_ih = self.param(f"l{layer}_b_ih", init, (3 * H,))
        b_hh = self.param(f"l{layer}_b_hh", init, (3 * H,))
        return (w_ih.astype(self.dtype), w_hh.astype(self.dtype),
                b_ih.astype(self.dtype), b_hh.astype(self.dtype))

    @nn.compact
    def __call__(self, xs: jnp.ndarray, h0: jnp.ndarray,
                 deterministic: bool = True,
                 return_all_hiddens: bool = False,
                 lengths: Optional[jnp.ndarray] = None):
        """lengths: optional [B] int — packed-sequence semantics (torch
        pack_padded_sequence parity): positions t >= lengths[b] neither
        advance the hidden state nor produce output (outputs are zeroed),
        so the returned h_T is each element's hidden at ITS OWN length."""
        H = self.hidden_dim
        layer_params = []
        in_dim = xs.shape[-1]
        for layer in range(self.num_layers):
            layer_params.append(self._params(layer, in_dim))
            in_dim = H

        dropout_rng = (None if deterministic or self.dropout_rate == 0.0
                       else self.make_rng("dropout"))

        def body(h_all, inputs):
            x_t, t = inputs
            valid = (None if lengths is None
                     else (t < lengths)[:, None])  # [B, 1]
            new_h = []
            inp = x_t
            for layer, (w_ih, w_hh, b_ih, b_hh) in enumerate(layer_params):
                h_next = gru_cell_step(inp, h_all[layer], w_ih, w_hh,
                                       b_ih, b_hh)
                if valid is not None:
                    h_next = jnp.where(valid, h_next, h_all[layer])
                new_h.append(h_next)
                inp = h_next
                if (layer < self.num_layers - 1 and dropout_rng is not None):
                    rng = jax.random.fold_in(dropout_rng, layer)
                    if not self.variational:
                        # torch parity: a fresh mask per timestep
                        rng = jax.random.fold_in(rng, t)
                    keep = jax.random.bernoulli(
                        rng, 1.0 - self.dropout_rate, inp.shape)
                    inp = jnp.where(keep, inp / (1.0 - self.dropout_rate),
                                    0.0)
            if valid is not None:
                inp = jnp.where(valid, inp, 0.0)  # pad_packed zero-fill
            h_stack = jnp.stack(new_h)
            # inp == top-layer (possibly dropped) output
            ys = (inp, h_stack) if return_all_hiddens else inp
            return h_stack, ys

        ts = jnp.arange(xs.shape[0])
        h_t, outputs = jax.lax.scan(body, h0.astype(self.dtype),
                                    (xs.astype(self.dtype), ts))
        if return_all_hiddens:
            return outputs[0], h_t, outputs[1]  # [T,B,H], [L,B,H], [T,L,B,H]
        return outputs, h_t

    def step(self, x: jnp.ndarray, h: jnp.ndarray):
        """One inference step (no dropout).

        A fused all-layers Pallas step kernel exists
        (ops/pallas_gru_decode.py, MG_GRU_FUSED=1) but MEASURED SLOWER
        than this XLA lowering on v5e (bf16 104k vs 128k tok/s, f32 70k
        vs 93k at B8 H512 L3) in BOTH the layer-grid and grid-free
        variants: the decode scan's XLA step already keeps the whole
        GRU's weights streaming efficiently, and the kernel re-pays the
        weight HBM->VMEM copy without saving enough dispatch latency.
        Kept off by default as a documented negative result (numerics
        match: f32 exact, bf16 to bf16 tolerance — tests)."""
        if self._fused_ok(x.shape[-1]):
            return self._step_fused(x, h)
        outputs, h_t = self.__call__(x[None], h, deterministic=True)
        return outputs[0], h_t

    def _fused_ok(self, in_dim: int) -> bool:
        import os
        flag = os.environ.get("MG_GRU_FUSED", "0")
        if flag == "0":
            return False
        if jax.default_backend() != "tpu" and flag != "force":
            # "force" runs the kernel in interpret mode off-TPU (tests)
            return False
        if self.hidden_dim % 128:
            return False
        from .pallas_gru_decode import gru_fused_vmem_bytes
        bytes_per = jnp.dtype(self.dtype).itemsize
        return gru_fused_vmem_bytes(
            in_dim, self.hidden_dim, bytes_per,
            num_layers=self.num_layers) < 13 * 1024 * 1024

    def _step_fused(self, x: jnp.ndarray, h: jnp.ndarray):
        from .pallas_gru_decode import _round_up, fused_gru_step
        H = self.hidden_dim
        in_dim = x.shape[-1]
        p = _round_up(max(in_dim, H), 128)
        params = self.variables["params"]

        def pad_rows(w):
            return jnp.pad(w, ((0, p - w.shape[0]), (0, 0)))

        # loop-invariant stacking: XLA hoists this out of the decode scan
        w_ih = jnp.stack([pad_rows(params[f"l{i}_w_ih"])
                          for i in range(self.num_layers)])
        w_hh = jnp.stack([params[f"l{i}_w_hh"]
                          for i in range(self.num_layers)])
        b_ih = jnp.stack([params[f"l{i}_b_ih"]
                          for i in range(self.num_layers)])
        b_hh = jnp.stack([params[f"l{i}_b_hh"]
                          for i in range(self.num_layers)])
        out, h_new = fused_gru_step(
            x.astype(self.dtype), h.astype(self.dtype),
            w_ih, w_hh, b_ih, b_hh,
            interpret=jax.default_backend() != "tpu")
        return out, h_new
