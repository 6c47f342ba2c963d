"""PoPMAG arrangement generation: typed per-token decode inside fixed-length
scans.

Reference behaviour (PoPMAG_RNN/network.py:216-301 `decoder_one_step` +
:366-417 `generate_arrangement`):

* per target bar, decoding starts from the compound row
  (bar_id(k), pos_id(0), 0,0, BAR_TOKEN, 0,0) and runs until the model
  emits a bar token or 200 steps pass,
* the sampled event-type id (head 0 + shift 289) drives typed state
  updates: position sets the position slot; tempo_class/value set theirs;
  chord/track go in the "velocity" slot (network.py:264-281 — the
  reference reuses that slot for them; slot order is irrelevant because
  compound embeddings are SUMMED); a note_velocity event additionally
  samples pitch (head 1, +128 if the current track is drum, +shift 1) and
  duration (head 2, +shift 257), emitting three tokens,
* the next compound input carries (bar, pos, tempo_cls, tempo_val,
  velocity, pitch, duration); the per-bar output streams start with a bar
  token,
* across bars the hidden carries as enc_h(bar k) -> decode bar k, then
  hidden = enc_h + dec_h (network.py:407-417).

Here the data-dependent while-loop becomes a fixed `max_steps` lax.scan
with a per-element done mask (everything on device, one compiled program);
the ragged outputs come back as (tokens [B, bars, steps, 3],
valid [B, bars, steps, 3]) and `flatten_arrangement` rebuilds the token
lists on host.

Hidden-carry semantics at bar end: the reference's loop BREAKS at the
bar token (network.py:246-301: `output, state = self.decoder(...)`
then `if flag == batch: break`), so the dec_h entering
`hidden = enc_h + dec_h` is the state OF the bar-emitting step. As
committed the reference then CRASHES before returning — after the
break it still calls `get_next_mask(batch, seq)` (utils/data.py:
435-441) which indexes the now-short `seq` list (empty at batch=1),
an IndexError on EVERY bar that terminates via a bar token
(machine-pinned in tests/test_reference_executable.py). We implement
the evident intent per row: each row's h freezes once its bar is done
(`freeze_done_hidden=True`, the default), which also makes results
independent of `max_steps` once a bar has ended and independent of
the batch composition (the reference's batch>1 loop instead couples
rows through the shared GRU state — and crashes whenever any row
finishes before the rest). Greedy B=1 token parity vs the executing
reference, with ONLY the post-break crash patched, is locked in
test_reference_executable.py::test_popmag_generate_arrangement_
executable_parity. `freeze_done_hidden=False` restores our old
run-to-max_steps variant of the coupled behaviour for A/Bs.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import mumidi_packing as mp

_R = mp.SPEC.feat_ranges()


def _rng_bounds(name: str) -> Tuple[int, int]:
    r = _R[name]
    return r.start, r.stop


def _sample_head(rng, logits, greedy: bool, temperature: float):
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(
        rng, logits / jnp.maximum(temperature, 1e-6), axis=-1
    ).astype(jnp.int32)


def decode_bar_steps(model, params, enc_h, bar_embed, rng_bar, *,
                     max_steps: int, greedy: bool, temperature,
                     freeze_done_hidden: bool = True):
    """One target bar's typed decode loop (the body shared by
    generate_arrangement and the PoPMAG serving engine,
    decode/serving_popmag.py). enc_h: [L, B, H] encoder hidden entering
    the bar; bar_embed: [B] int32 bar-position token ids (a broadcast
    scalar in the dedicated generator, per-row bar cursors in the
    serving pool). Returns (tokens [B, max_steps, 3] int32,
    valid [B, max_steps, 3] bool, dec_h [L, B, H])."""
    b = enc_h.shape[1]
    va = {"params": params}

    drum_id = _R["track"].start + 5  # MUMIDI_TRACKS.index('drum') == 5
    pos_lo, pos_hi = _rng_bounds("position")
    cls_lo, cls_hi = _rng_bounds("tempo_class")
    val_lo, val_hi = _rng_bounds("tempo_value")
    chd_lo, chd_hi = _rng_bounds("chord")
    trk_lo, trk_hi = _rng_bounds("track")
    vel_lo, vel_hi = _rng_bounds("note_velocity")
    bar_lo, bar_hi = _rng_bounds("bar")

    start = jnp.stack([
        bar_embed.astype(jnp.int32),
        jnp.full((b,), mp.POS0, jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.full((b,), mp.BAR_TOKEN, jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32),
    ], axis=-1)  # [B, 7]

    state0 = dict(
        compound=start,
        pos=jnp.zeros((b,), jnp.int32),
        cls=jnp.zeros((b,), jnp.int32),
        val=jnp.zeros((b,), jnp.int32),
        vel=jnp.zeros((b,), jnp.int32),
        track=jnp.full((b,), -1, jnp.int32),
        done=jnp.zeros((b,), jnp.bool_),
        h=enc_h,
    )

    def step(st, rng_t):
        logits, h = model.apply(va, st["compound"], st["h"],
                                method=model.decode_compound_step)
        r1, r2, r3 = jax.random.split(rng_t, 3)
        etype = _sample_head(r1, logits[:, 0], greedy, temperature)
        etype = etype + mp.SHIFT[0]  # token id space

        is_bar = (etype >= bar_lo) & (etype < bar_hi)
        is_pos = (etype >= pos_lo) & (etype < pos_hi)
        is_cls = (etype >= cls_lo) & (etype < cls_hi)
        is_val = (etype >= val_lo) & (etype < val_hi)
        is_chd = (etype >= chd_lo) & (etype < chd_hi)
        is_trk = (etype >= trk_lo) & (etype < trk_hi)
        is_vel = (etype >= vel_lo) & (etype < vel_hi)

        pitch = _sample_head(r2, logits[:, 1], greedy, temperature)
        pitch = pitch + jnp.where(st["track"] == drum_id, 128, 0)
        pitch = pitch + mp.SHIFT[1]
        dur = _sample_head(r3, logits[:, 2], greedy, temperature)
        dur = dur + mp.SHIFT[2]

        newly_done = st["done"] | is_bar
        active = ~st["done"]

        pos = jnp.where(is_pos & active, etype, st["pos"])
        cls_ = jnp.where(is_cls & active, etype, st["cls"])
        val = jnp.where(is_val & active, etype, st["val"])
        # chord/track land in the velocity slot (network.py:271-281)
        vel = jnp.where((is_chd | is_trk | is_vel) & active, etype,
                        st["vel"])
        track = jnp.where(is_trk & active, etype, st["track"])
        note_pitch = jnp.where(is_vel & active, pitch, 0)
        note_dur = jnp.where(is_vel & active, dur, 0)

        compound = jnp.stack([
            bar_embed.astype(jnp.int32), pos, cls_, val,
            vel, note_pitch, note_dur], axis=-1)

        emit1 = active & ~is_bar
        emit23 = emit1 & is_vel
        tokens = jnp.stack([etype, pitch, dur], axis=-1)  # [B, 3]
        valid = jnp.stack([emit1, emit23, emit23], axis=-1)

        if freeze_done_hidden:
            # rows already done keep their bar-end h (the bar-token
            # step's own update IS kept: done was False entering it)
            h = jnp.where(st["done"][None, :, None], st["h"], h)
        new_st = dict(compound=compound, pos=pos, cls=cls_, val=val,
                      vel=vel, track=track, done=newly_done, h=h)
        return new_st, (tokens, valid)

    rngs = jax.random.split(rng_bar, max_steps)
    st_final, (tokens, valid) = jax.lax.scan(step, state0, rngs)
    # tokens: [steps, B, 3] -> [B, steps, 3]
    return (tokens.transpose(1, 0, 2), valid.transpose(1, 0, 2),
            st_final["h"])


@functools.partial(
    jax.jit,
    static_argnames=("model", "n_target_bar", "max_steps", "greedy",
                     "freeze_done_hidden"))
def generate_arrangement(
    model,
    params,
    init: jnp.ndarray,          # [B, init_dim]
    src: jnp.ndarray,           # [B, bars, S, 7] compound melody
    src_len: jnp.ndarray,       # [B, bars]
    rng: jax.Array,
    n_target_bar: int,
    max_steps: int = 200,
    greedy: bool = True,
    temperature: float = 1.0,
    freeze_done_hidden: bool = True,
):
    """Returns (tokens [B, n_target_bar, max_steps, 3] int32,
    valid [B, n_target_bar, max_steps, 3] bool)."""
    b = init.shape[0]
    va = {"params": params}
    hidden0 = model.apply(va, init, method=model.init_to_hidden)
    src_e = model.apply(va, src, method=model.compression)

    def decode_bar(carry, inputs):
        hidden, = carry
        k, rng_bar = inputs
        enc_h = model.apply(
            va,
            jax.lax.dynamic_index_in_dim(src_e, k, axis=1, keepdims=False),
            hidden,
            jax.lax.dynamic_index_in_dim(src_len, k, axis=1,
                                         keepdims=False),
            method=model.encode_bar)

        bar_embed = jnp.full(
            (b,), jnp.minimum(k, model.bar_dim - 1) + mp.EVENT_DIM,
            jnp.int32)
        tokens, valid, dec_h = decode_bar_steps(
            model, params, enc_h, bar_embed, rng_bar,
            max_steps=max_steps, greedy=greedy, temperature=temperature,
            freeze_done_hidden=freeze_done_hidden)
        hidden = enc_h + dec_h  # network.py:414
        return (hidden,), (tokens, valid)

    ks = jnp.arange(n_target_bar)
    rngs = jax.random.split(rng, n_target_bar)
    (_,), (tokens, valid) = jax.lax.scan(decode_bar, (hidden0,),
                                         (ks, rngs))
    # [bars, B, steps, 3] -> [B, bars, steps, 3]
    return tokens.transpose(1, 0, 2, 3), valid.transpose(1, 0, 2, 3)


def flatten_arrangement(tokens: np.ndarray, valid: np.ndarray
                        ) -> List[np.ndarray]:
    """(tokens, valid) [B, bars, steps, 3] -> per-batch 1D token arrays;
    each bar stream starts with a bar token (network.py:226-228)."""
    tokens = np.asarray(tokens)
    valid = np.asarray(valid)
    out = []
    for bi in range(tokens.shape[0]):
        seq = []
        for k in range(tokens.shape[1]):
            seq.append(mp.BAR_TOKEN)
            t = tokens[bi, k]     # [steps, 3]
            v = valid[bi, k]
            for s in range(t.shape[0]):
                for j in range(3):
                    if v[s, j]:
                        seq.append(int(t[s, j]))
        out.append(np.asarray(seq, np.int64))
    return out


@functools.lru_cache(maxsize=16)
def _arrangement_dp_fn(model, n_target_bar, max_steps, greedy, mesh):
    from jax.sharding import PartitionSpec as P

    def shard_fn(params, init, src, src_len, rng, temperature):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        return generate_arrangement(
            model, params, init, src, src_len, rng,
            n_target_bar=n_target_bar, max_steps=max_steps,
            greedy=greedy, temperature=temperature)

    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P(), P()),
        out_specs=(P("data"), P("data")), check_vma=False))


def generate_arrangement_dp(model, params, init, src, src_len, rng,
                            n_target_bar: int, mesh,
                            max_steps: int = 200, greedy: bool = True,
                            temperature: float = 1.0):
    """Data-parallel arrangement generation: batch rows (independent
    latents/melodies) sharded over the mesh 'data' axis, like
    decode/engine.py generate_dp. Greedy rows are identical to the
    unsharded call; sampled rows use per-shard rng streams."""
    if init.shape[0] % mesh.shape["data"]:
        raise ValueError(
            f"batch {init.shape[0]} not divisible by the data axis "
            f"({mesh.shape['data']})")
    fn = _arrangement_dp_fn(model, int(n_target_bar), int(max_steps),
                            bool(greedy), mesh)
    return fn(params, init, src, src_len, rng,
              jnp.float32(max(temperature, 1e-6)))
