"""Jit-compiled train/eval steps for autoregressive LMs.

Replaces the reference's per-model Python train loops
(MusicTransformer/train.py:252-327 etc.) with one fused XLA program per
step: forward, label-smoothed CE, backward, Noam-scheduled Adam update and
metrics all inside a single jit. Gradient accumulation (reference
accum_grad=12, MusicTransformer/config.py:37) is a `lax.scan` over
micro-batches, so it also compiles to one program.

Multi-chip: pass a mesh and the step runs under SPMD — batch sharded over
'data', params sharded by parallel.mesh.param_shardings. XLA inserts the
grad all-reduce the reference hand-rolled in parallel.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from .objective import smooth_cross_entropy, token_accuracy
from .schedule import noam_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    dropout_rng: jnp.ndarray


@dataclasses.dataclass
class TrainerConfig:
    vocab_size: int
    label_smoothing: float = 0.1
    pad_id: Optional[int] = None
    warmup_steps: int = 4000
    d_model: int = 256
    accum_steps: int = 1
    max_grad_norm: Optional[float] = 1.0
    adam_b1: float = 0.9
    adam_b2: float = 0.98  # reference train.py:143
    adam_eps: float = 1e-9
    peak_lr: Optional[float] = None  # fixed-lr override (RNN trainers)
    # PRNG for the in-step dropout masks. "rbg" rides the TPU hardware
    # generator: measured 132.3 -> 128.0 ms/step on the production-shape
    # study (threefry bit-gen is ~4 ms of VPU per step at 13 mask sites;
    # BASELINE.md round 4). The checkpointed dropout_rng stays a raw
    # threefry key either way — the impl only changes how the per-step
    # fold is expanded to bits, so old checkpoints resume unchanged
    # (with a different forward dropout stream, like any jax upgrade).
    # "threefry2x32" restores bit-identical legacy masks.
    dropout_rng_impl: str = "rbg"


def make_optimizer(cfg: TrainerConfig) -> optax.GradientTransformation:
    if cfg.peak_lr is not None:
        sched = cfg.peak_lr
    else:
        sched = noam_schedule(cfg.d_model, cfg.warmup_steps)
    chain = []
    if cfg.max_grad_norm:
        chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    chain.append(optax.adam(sched, b1=cfg.adam_b1, b2=cfg.adam_b2,
                            eps=cfg.adam_eps))
    return optax.chain(*chain)


def create_train_state(model, cfg: TrainerConfig, rng,
                       example_input) -> Tuple[TrainState, Any]:
    tx = make_optimizer(cfg)
    init_rng, dropout_rng = jax.random.split(rng)
    variables = model.init(init_rng, example_input)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        dropout_rng=dropout_rng,
    ), tx


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    cfg: TrainerConfig,
    apply_fn: Optional[Callable] = None,
    loss_fn: Optional[Callable] = None,
) -> Callable:
    """Returns train_step(state, x, y) -> (state, metrics).

    x, y: [accum * B, L] int32 (split into `accum_steps` micro-batches
    inside the step), or arbitrary batch pytrees with a leading
    [accum * B] axis. For seq2seq models pass a custom apply_fn
    (params, batch, rng) -> logits, or take over the whole objective
    with loss_fn(params, x, y, rng) -> (loss, accuracy).
    """

    def default_apply(params, x, rng):
        return model.apply({"params": params}, x, deterministic=False,
                           rngs={"dropout": rng})

    apply = apply_fn or default_apply

    def default_loss(params, x, y, rng):
        logits = apply(params, x, rng)
        loss = smooth_cross_entropy(logits, y, cfg.vocab_size,
                                    cfg.label_smoothing, cfg.pad_id)
        acc = token_accuracy(logits, y, cfg.pad_id)
        return loss, acc

    grad_fn = jax.value_and_grad(loss_fn or default_loss, has_aux=True)

    def to_impl(rng):
        if cfg.dropout_rng_impl in ("threefry2x32", None):
            return rng
        # raw uint32[2] legacy keys pass through; typed keys unwrap
        data = (rng if jnp.issubdtype(rng.dtype, jnp.uint32)
                else jax.random.key_data(rng))
        # rbg/unsafe_rbg keys are uint32[4]; duplicating the folded
        # words keeps one independent stream per (seed, step)
        return jax.random.wrap_key_data(
            jnp.concatenate([data, data]), impl=cfg.dropout_rng_impl)

    def train_step(state: TrainState, x, y):
        rng = to_impl(jax.random.fold_in(state.dropout_rng, state.step))
        if cfg.accum_steps == 1:
            (loss, acc), grads = grad_fn(state.params, x, y, rng)
        else:
            a = cfg.accum_steps
            xs = jax.tree.map(
                lambda t: t.reshape(a, t.shape[0] // a, *t.shape[1:]), x)
            ys = ys_r = y.reshape(a, y.shape[0] // a, *y.shape[1:])

            def micro(carry, xy):
                g_acc, l_acc, a_acc, i = carry
                mx, my = xy
                (l, ac), g = grad_fn(state.params, mx, my,
                                     jax.random.fold_in(rng, i))
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                return (g_acc, l_acc + l, a_acc + ac, i + 1), None

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss, acc, _), _ = jax.lax.scan(
                micro, (zero, 0.0, 0.0, 0), (xs, ys_r))
            grads = jax.tree.map(lambda g: g / a, grads)
            loss, acc = loss / a, acc / a

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt)
        metrics = {"loss": loss, "accuracy": acc, "grad_norm": gnorm}
        return new_state, metrics

    return train_step


def make_eval_step(model, cfg: TrainerConfig,
                   apply_fn: Optional[Callable] = None) -> Callable:
    def default_apply(params, x):
        return model.apply({"params": params}, x, deterministic=True)

    apply = apply_fn or default_apply

    def eval_step(params, x, y) -> Dict[str, jnp.ndarray]:
        logits = apply(params, x)
        return {
            "loss": smooth_cross_entropy(logits, y, cfg.vocab_size,
                                         cfg.label_smoothing, cfg.pad_id),
            "accuracy": token_accuracy(logits, y, cfg.pad_id),
        }

    return eval_step
