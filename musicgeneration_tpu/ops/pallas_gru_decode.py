"""Fused GRU decode step — the whole stacked-GRU step in one Pallas
kernel per generated token.

Why: RNN decode is LATENCY-bound. The XLA path (ops/gru.py step) lowers
one step of a 3x512 GRU to ~12 small ops per layer (two [B<=64, 512] x
[512, 1536] matmuls plus gate elementwise), each paying the
few-microsecond dispatch floor — measured ~70 us/step at B8 H512 L3 on
v5e while the pure weight-bandwidth cost is <10 us. This kernel runs the
whole stack's step in ONE program with a grid over layers, so Mosaic
auto-pipelines each layer's weight block HBM->VMEM (double-buffered)
while the previous layer computes:

    per layer l:  gi = x @ W_ih[l] + b_ih[l]
                  gh = h[l] @ W_hh[l] + b_hh[l]
                  r/z/n gates -> h'[l]; x <- h'[l] (VMEM carry)

Gate semantics match ops/gru.py gru_cell_step (torch nn.GRU). Layer 0's
input is zero-padded to the lane-aligned carry width P (its padded
W_ih rows are zero, so the pad contributes nothing).

Numerics: matmuls accumulate in f32; matmul outputs quantize to the
model dtype at the same points as the XLA path. bf16 models agree with
ops/gru.py to bf16 tolerance, f32 to ~1e-5 (tests/test_pallas_gru.py).

VMEM: the pipelined weight blocks are 2 x (P + H) x 3H x bytes — ~6.3 MB
for bf16 at H=512, ~12.6 MB for f32 (tight but within v5e VMEM); the
auto path in GRUStack.step only takes this kernel when the estimate
fits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(x_ref, h_ref, wih_ref, whh_ref, bih_ref, bhh_ref,
            out_ref, hout_ref, *, num_layers: int, hidden: int,
            compute_dtype):
    H = hidden
    b, p = x_ref.shape
    x = x_ref[...].astype(jnp.float32)                    # [B, P]

    def mm(a, w, bias):
        y = jax.lax.dot_general(
            a, w.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bias
        # the XLA path's matmul emits the model dtype here
        return y.astype(compute_dtype).astype(jnp.float32)

    for li in range(num_layers):
        gi = mm(x[:, :wih_ref.shape[1]], wih_ref[li], bih_ref[li])
        h_prev = h_ref[li].astype(jnp.float32)            # [B, H]
        gh = mm(h_prev, whh_ref[li], bhh_ref[li])
        r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
        h_new = (1.0 - z) * n + z * h_prev                # [B, H]
        hout_ref[li] = h_new.astype(hout_ref.dtype)
        # carry quantized like the XLA path's inter-layer activations,
        # zero-padded back to P (layers >0 weight rows past H are zero)
        x = h_new.astype(hout_ref.dtype).astype(jnp.float32)
        if p > H:
            x = jnp.pad(x, ((0, 0), (0, p - H)))
    out_ref[...] = x[:, :H].astype(out_ref.dtype)


def gru_fused_vmem_bytes(in_dim: int, hidden: int,
                         bytes_per: int = 4, batch: int = 8,
                         num_layers: int = 3) -> int:
    """Rough VMEM footprint: ALL stacked weights resident (grid-free
    kernel) + activations. The auto path falls back to XLA above ~13 MB
    — f32 at H=512 L=3 (18.9 MB) falls back, bf16 (9.4 MB) fuses."""
    p = _round_up(max(in_dim, hidden), 128)
    weights = num_layers * (p + hidden) * 3 * hidden * bytes_per
    act = batch * (2 * p + 8 * hidden) * 4
    return weights + act


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_gru_step(x, h, w_ih, w_hh, b_ih, b_hh, interpret: bool = False):
    """One fused step of a stacked GRU.

    x: [B, in_dim] layer-0 input; h: [L, B, H]; w_ih: [L, P, 3H] with
    layer 0's rows beyond in_dim and layers >0 beyond H zero-padded
    (P = lane-aligned max(in_dim, H)); w_hh: [L, H, 3H]; b_*: [L, 3H].
    Returns (top output [B, H], new hidden [L, B, H]) — identical to
    looping ops/gru.py gru_cell_step over layers.
    """
    b, in_dim = x.shape
    num_layers, _, hidden = h.shape
    p = w_ih.shape[1]
    if in_dim < p:
        x = jnp.pad(x, ((0, 0), (0, p - in_dim)))
    dtype = h.dtype

    kernel = functools.partial(_kernel, num_layers=num_layers,
                               hidden=hidden, compute_dtype=dtype)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    out, h_new = pl.pallas_call(
        kernel,
        in_specs=[vmem()] * 6,
        out_specs=(vmem(), vmem()),
        out_shape=(
            jax.ShapeDtypeStruct((b, hidden), dtype),
            jax.ShapeDtypeStruct((num_layers, b, hidden), dtype),
        ),
        interpret=interpret,
    )(x.astype(dtype), h, w_ih.astype(dtype), w_hh.astype(dtype),
      b_ih.astype(jnp.float32), b_hh.astype(jnp.float32))
    return out, h_new
