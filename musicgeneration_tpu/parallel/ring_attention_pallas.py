"""Ring attention with Pallas RDMA — KV shards rotate between devices
via `make_async_remote_copy` while each device computes its attention
tile, the rung above the shard_map+ppermute implementation
(parallel/ring_attention.py): the XLA version serializes
[collective -> compute] per round, here the NEXT round's KV transfer
flies during THIS round's tile compute.

One pallas_call per device runs the whole ring (n_shards rounds,
double-buffered KV+pad slots). The relative bias uses the same
shear trick as the training kernel (ops/pallas_attention.py): srel for
tile (t0, s0) is a per-row shift of qe = q . E[base : base + W],
base = max_seq - Lq - t0 + s0 — no [L, L] gather ever exists.

Differentiation: the kernel is forward-only; a custom_vjp routes the
backward through the exact XLA ring implementation, so training through
this path stays correct (the backward's collectives are XLA ppermutes).

Tested for exactness against the single-device path and the XLA ring on
the 8-virtual-device CPU mesh (interpret mode emulates the remote DMAs);
the same kernel code targets real ICI on multi-chip hardware.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from .ring_attention import ring_relative_attention

NEG_INF = -1e9


def _shear(qe: jnp.ndarray, block_q: int, block_k: int) -> jnp.ndarray:
    """srel[t, s] = qe[t, (block_q - 1 - t) + s] (ops/pallas_attention)."""
    w = qe.shape[-1]
    pshift = (block_q - 1) - jax.lax.broadcasted_iota(jnp.int32,
                                                      qe.shape, 0)
    b = 1
    while b < block_q:
        rolled = pltpu.roll(qe, w - b, 1)
        qe = jnp.where((pshift & b) != 0, rolled, qe)
        b *= 2
    return qe[:, :block_k]


def _kernel(q_ref, k_ref, v_ref, pad_ref, e_ref,
            out_ref,
            kbuf, vbuf, pbuf, send_sems, recv_sems, copy_sem,
            credit_sem, *,
            axis_name: str, mesh_axis_names: tuple, n_shards: int,
            num_heads: int, l_loc: int, max_seq: int, causal: bool,
            handshake: bool):
    b, _, d = q_ref.shape
    dh = d // num_heads
    my = jax.lax.axis_index(axis_name)
    t0 = my * l_loc
    scale = 1.0 / math.sqrt(dh)
    w = 2 * l_loc

    # stage the local KV (+pad) into ring slot 0
    local = pltpu.make_async_copy(k_ref, kbuf.at[0], copy_sem)
    local.start()
    local.wait()
    local = pltpu.make_async_copy(v_ref, vbuf.at[0], copy_sem)
    local.start()
    local.wait()
    local = pltpu.make_async_copy(pad_ref, pbuf.at[0], copy_sem)
    local.start()
    local.wait()

    nxt = jax.lax.rem(my + 1, n_shards)
    if len(mesh_axis_names) == 1:
        # 1-axis mesh: plain logical neighbor id (what the interpret-
        # mode emulator supports)
        nxt_coord, id_type = nxt, pltpu.DeviceIdType.LOGICAL
    else:
        # MESH addressing: a coordinate per mesh axis, rotating only the
        # ring axis (the mesh also carries data/model axes)
        nxt_coord = tuple(
            nxt if name == axis_name else jax.lax.axis_index(name)
            for name in mesh_axis_names)
        id_type = pltpu.DeviceIdType.MESH

    m = jnp.full((b, num_heads, l_loc, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((b, num_heads, l_loc, 1), jnp.float32)
    acc = jnp.zeros((b, num_heads, l_loc, dh), jnp.float32)

    prev_coord = None
    if handshake and len(mesh_axis_names) == 1:
        prev_coord = jax.lax.rem(my - 1 + n_shards, n_shards)
    elif handshake:
        prev = jax.lax.rem(my - 1 + n_shards, n_shards)
        prev_coord = tuple(
            prev if name == axis_name else jax.lax.axis_index(name)
            for name in mesh_axis_names)

    for r in range(n_shards):
        slot = r % 2
        if r + 1 < n_shards:
            # flow control: the send at round r writes the receiver's
            # 1-slot, which the receiver last READ at round r-1 — wait
            # for its "slot consumed" credit first so a fast sender
            # cannot overwrite data still being read (the interpret
            # emulator is lockstep, so the handshake only runs on real
            # hardware; remote signals aren't emulated)
            if handshake and r >= 1:
                pltpu.semaphore_wait(credit_sem, 1)
            # rotate: my current slot -> next device's other slot, while
            # the tile below computes (RDMA/compute overlap)
            for buf, si in ((kbuf, 0), (vbuf, 1), (pbuf, 2)):
                pltpu.make_async_remote_copy(
                    src_ref=buf.at[slot], dst_ref=buf.at[1 - slot],
                    send_sem=send_sems.at[si], recv_sem=recv_sems.at[si],
                    device_id=nxt_coord,
                    device_id_type=id_type).start()

        # after r rotations this device holds the shard that started on
        # device (my - r) mod n
        src = jax.lax.rem(my - r + n_shards, n_shards)
        s0 = src * l_loc
        base = max_seq - l_loc - t0 + s0
        e_blk = e_ref[pl.ds(base, w), :].astype(jnp.float32)  # [W, dh]
        t_ids = t0 + jax.lax.broadcasted_iota(jnp.int32,
                                              (l_loc, l_loc), 0)
        s_ids = s0 + jax.lax.broadcasted_iota(jnp.int32,
                                              (l_loc, l_loc), 1)
        k_all = kbuf[slot].astype(jnp.float32)     # [B, Lloc, d]
        v_all = vbuf[slot].astype(jnp.float32)
        pad_row = pbuf[slot].astype(jnp.float32)   # [B, Lloc]

        new_m, new_l, new_acc = [], [], []
        for bi in range(b):
            for h in range(num_heads):
                qh = q_ref[bi, :, h * dh:(h + 1) * dh].astype(
                    jnp.float32)                   # [Lq, dh]
                kh = k_all[bi, :, h * dh:(h + 1) * dh]
                vh = v_all[bi, :, h * dh:(h + 1) * dh]
                qk = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [Lq, Ls]
                qe = jax.lax.dot_general(
                    qh, e_blk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [Lq, W]
                srel = _shear(qe, l_loc, l_loc)
                srel = jnp.where(s_ids <= t_ids, srel, 0.0)
                logits = (qk + srel) * scale
                if causal:
                    logits = logits + jnp.where(s_ids > t_ids,
                                                NEG_INF, 0.0)
                logits = logits + pad_row[bi][None, :] * NEG_INF
                mo = m[bi, h]
                m_new = jnp.maximum(
                    mo, jnp.max(logits, axis=-1, keepdims=True))
                alpha = jnp.exp(mo - m_new)
                p = jnp.exp(logits - m_new)
                l_new = (l[bi, h] * alpha
                         + jnp.sum(p, axis=-1, keepdims=True))
                acc_new = (acc[bi, h] * alpha + jax.lax.dot_general(
                    p, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
                new_m.append(m_new)
                new_l.append(l_new)
                new_acc.append(acc_new)
        m = jnp.stack(new_m).reshape(b, num_heads, l_loc, 1)
        l = jnp.stack(new_l).reshape(b, num_heads, l_loc, 1)
        acc = jnp.stack(new_acc).reshape(b, num_heads, l_loc, dh)

        if handshake and r + 1 < n_shards:
            # tell the PREV device its round-(r+1) send target (my slot
            # r%2, just consumed above) is free
            pltpu.semaphore_signal(credit_sem, inc=1,
                                   device_id=prev_coord,
                                   device_id_type=id_type)

        if r + 1 < n_shards:
            # transfers must land before the next round reads the slot
            for buf, si in ((kbuf, 0), (vbuf, 1), (pbuf, 2)):
                desc = pltpu.make_async_remote_copy(
                    src_ref=buf.at[slot], dst_ref=buf.at[1 - slot],
                    send_sem=send_sems.at[si], recv_sem=recv_sems.at[si],
                    device_id=nxt_coord,
                    device_id_type=id_type)
                desc.wait()

    out = acc / jnp.maximum(l, 1e-30)              # [B, H, Lq, dh]
    outs = [out[:, h] for h in range(num_heads)]
    out_ref[...] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def ring_relative_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    e: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "seq",
    causal: bool = True,
    batch_axis: Optional[str] = "data",
    key_pad: Optional[jnp.ndarray] = None,
):
    """Pallas-RDMA sequence-parallel relative attention.

    Same contract as parallel.ring_attention.ring_relative_attention
    (GLOBAL [B, H, L, dh] inputs sharded over `axis_name` dim 2);
    forward runs the RDMA kernel, backward the exact XLA ring.
    """
    return _fwd_impl(q, k, v, e, mesh, axis_name, causal, batch_axis,
                     key_pad)


def _fwd_impl(q, k, v, e, mesh, axis_name, causal, batch_axis, key_pad):
    n = mesh.shape[axis_name]
    b_, h_, l_, dh = q.shape
    if l_ % n:
        raise ValueError(f"L={l_} not divisible by {axis_name}={n}")
    if l_ > e.shape[0]:
        raise ValueError(f"L={l_} exceeds the relative table "
                         f"({e.shape[0]})")
    # gate interpret on the MESH's devices, not the process default
    # backend: a CPU virtual-device mesh inside a TPU-default process
    # (e.g. dryrun after a TPU compile in the same process) must still
    # take the interpret emulator
    interpret = mesh.devices.flat[0].platform != "tpu"
    others = [sz for name, sz in mesh.shape.items() if name != axis_name]
    if all(sz == 1 for sz in others):
        # collapse to a 1-axis mesh: the interpret-mode DMA emulator
        # only handles single-named-axis meshes, and it loses nothing
        mesh = Mesh(np.asarray(mesh.devices).reshape(-1), (axis_name,))
        batch_axis = None
    elif interpret:
        # multi-axis RDMA emulation is unimplemented in interpret mode;
        # fall back to the exact XLA ring (same math) so CPU tests and
        # virtual-device dryruns still run this code path end to end
        return ring_relative_attention(q, k, v, e, mesh,
                                       axis_name=axis_name,
                                       causal=causal,
                                       batch_axis=batch_axis,
                                       key_pad=key_pad)
    l_loc = l_ // n
    max_seq = e.shape[0]
    if key_pad is None:
        key_pad = jnp.zeros((b_, l_), jnp.float32)
    b_ax = batch_axis if (batch_axis and batch_axis in mesh.shape
                          and b_ % mesh.shape[batch_axis] == 0) else None
    # [B, L, d] merged-head layout (DMA-friendly minor dim)
    d = h_ * dh
    qm = q.transpose(0, 2, 1, 3).reshape(b_, l_, d)
    km = k.transpose(0, 2, 1, 3).reshape(b_, l_, d)
    vm = v.transpose(0, 2, 1, 3).reshape(b_, l_, d)
    e_pad = jnp.pad(e.astype(jnp.float32), ((0, l_loc), (0, 0)))
    b_local = b_ // mesh.shape[batch_axis] if b_ax else b_

    kernel = functools.partial(
        _kernel, axis_name=axis_name,
        mesh_axis_names=tuple(mesh.axis_names), n_shards=n,
        num_heads=h_, l_loc=l_loc, max_seq=max_seq, causal=causal,
        handshake=not interpret)

    def per_shard(qs, ks, vs, ps, es):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(qs.shape, qs.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, b_local, l_loc, d), ks.dtype),
                pltpu.VMEM((2, b_local, l_loc, d), vs.dtype),
                pltpu.VMEM((2, b_local, l_loc), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.REGULAR,
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(collective_id=0),
        )(qs, ks, vs, ps, es)

    spec = P(b_ax, axis_name, None)
    fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(spec, spec, spec, P(b_ax, axis_name), P()),
        out_specs=spec,
        check_vma=False,
    )
    out = fn(qm, km, vm, key_pad.astype(jnp.float32), e_pad)
    return out.reshape(b_, l_, h_, dh).transpose(0, 2, 1, 3)


def _fwd(q, k, v, e, mesh, axis_name, causal, batch_axis, key_pad):
    out = _fwd_impl(q, k, v, e, mesh, axis_name, causal, batch_axis,
                    key_pad)
    return out, (q, k, v, e, key_pad)


def _bwd(mesh, axis_name, causal, batch_axis, res, g):
    """Exact backward via the differentiable XLA ring."""
    q, k, v, e, key_pad = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, e_: ring_relative_attention(
            q_, k_, v_, e_, mesh, axis_name=axis_name, causal=causal,
            batch_axis=batch_axis, key_pad=key_pad),
        q, k, v, e)
    dq, dk, dv, de = vjp(g)
    return dq, dk, dv, de, None


ring_relative_attention_pallas.defvjp(_fwd, _bwd)
