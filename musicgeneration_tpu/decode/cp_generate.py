"""Compound-word generation: one lax.scan over CP rows.

Follows the Compound Word Transformer's type-first sampling (Hsiao et
al. 2021): sample the FAMILY field, then the remaining fields, then
force the fields the sampled family does not own to their ignore ids —
so a metric row never carries pitch/duration/velocity and a note row
never carries position/tempo/chord, no matter what the heads said.
Whole continuation = one compiled program (KV-cached decode_step), like
decode/engine.py for flat-token models.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..tokenizers import cp

# field index -> owning family (None = family field itself)
_METRIC_FIELDS = (1, 2, 3, 4)
_NOTE_FIELDS = (5, 6, 7)


def _mask_row(row: jnp.ndarray) -> jnp.ndarray:
    """Force ignore ids on fields not owned by the sampled family."""
    ign = jnp.asarray(cp.ignore_ids(), jnp.int32)
    fam = row[:, 0:1]
    is_note = fam == cp.FAMILY_NOTE
    out = row
    for f in _METRIC_FIELDS:
        out = out.at[:, f].set(
            jnp.where(is_note[:, 0], ign[f], out[:, f]))
    for f in _NOTE_FIELDS:
        out = out.at[:, f].set(
            jnp.where(~is_note[:, 0], ign[f], out[:, f]))
    return out


def generate_cp(model, params, prompt_rows: jnp.ndarray, rng: jax.Array,
                steps: int, max_len: Optional[int] = None,
                temperature: float = 1.0,
                greedy: bool = False, mesh=None) -> np.ndarray:
    """prompt_rows: [B, P, 8] int32 -> generated rows [B, steps, 8].

    The prompt is ingested with the scan prefill; each generated step
    samples all 8 heads (family first in masking priority) and feeds the
    masked row back through the KV-cached decode_step. The jit is
    module-level with static (model, steps, ...) so repeat calls with
    the same shapes reuse one compilation (a per-call closure would
    recompile every time).

    mesh: optional — shard the batch over the mesh's 'data' axis
    (data-parallel serving like decode/engine.py generate_dp); greedy
    rows are identical to mesh=None, sampled rows use per-shard
    streams."""
    b, p, _ = prompt_rows.shape
    max_len = max_len or (p + steps)
    if p + steps > max_len:
        raise ValueError("prompt + steps exceeds max_len")
    # block-align the KV cache for the fused kernels (shared policy —
    # found at B32: an odd p+steps=520 forced one whole-cache block)
    from .engine import align_cache_len
    max_len = align_cache_len(model, max_len)
    # temperature is a TRACED operand: new --temperature values must not
    # trigger a full decode-scan recompile (minutes on this backend)
    temp = jnp.float32(max(temperature, 1e-6))
    if mesh is None:
        return np.asarray(_run(model, steps, max_len, bool(greedy),
                               params, prompt_rows, rng, temp))
    if b % mesh.shape["data"]:
        raise ValueError(f"batch {b} not divisible by the data axis "
                         f"({mesh.shape['data']})")
    fn = _run_dp(model, steps, max_len, bool(greedy), mesh)
    return np.asarray(fn(params, prompt_rows, rng, temp))


@functools.lru_cache(maxsize=32)
def _run_dp(model, steps, max_len, greedy, mesh):
    from jax.sharding import PartitionSpec as P

    def shard_fn(params, prompt_rows, rng, temperature):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        return _run(model, steps, max_len, greedy, params, prompt_rows,
                    rng, temperature)

    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("data"), P(), P()),
        out_specs=P("data"), check_vma=False))


@functools.partial(jax.jit, static_argnames=(
    "model", "steps", "max_len", "greedy"))
def _run(model, steps, max_len, greedy,
         params, prompt_rows, rng, temperature):
    # one-pass prompt ingestion: a single parallel forward fills the
    # cache (CPTransformer.prefill) — O(1) forwards for a P-row prompt
    # instead of P sequential decode steps
    last, cache = model.apply({"params": params}, prompt_rows, max_len,
                              method=model.prefill)
    t = jnp.int32(prompt_rows.shape[1])

    def sample_row(rng_i, logits):
        keys = jax.random.split(rng_i, len(logits))
        cols = []
        for k, lg in zip(keys, logits):
            if greedy:
                cols.append(jnp.argmax(lg, axis=-1).astype(jnp.int32))
            else:
                cols.append(jax.random.categorical(
                    k, lg / temperature,
                    axis=-1).astype(jnp.int32))
        return _mask_row(jnp.stack(cols, axis=-1))

    def body(carry, rng_i):
        cache, t, logits = carry
        row = sample_row(rng_i, logits)
        new_logits, cache = model.apply({"params": params}, row, cache,
                                        t, method=model.decode_step)
        return (cache, t + 1, new_logits), row

    rngs = jax.random.split(rng, steps)
    _, rows = jax.lax.scan(body, (cache, t, last), rngs)
    return rows.transpose(1, 0, 2)  # [B, steps, 8]
