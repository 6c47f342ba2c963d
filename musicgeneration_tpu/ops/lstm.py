"""Multi-layer LSTM as fused matmuls under lax.scan.

Gate semantics match torch.nn.LSTM (what the reference MelodyRNN uses —
mg/model/MelodyRNN/train_basic_rnn.py:193-197), gate order [i, f, g, o]:

    i = sigmoid(x W_ii + b_ii + h W_hi + b_hi)
    f = sigmoid(x W_if + b_if + h W_hf + b_hf)
    g = tanh   (x W_ig + b_ig + h W_hg + b_hg)
    o = sigmoid(x W_io + b_io + h W_ho + b_ho)
    c' = f * c + i * g ;  h' = o * tanh(c')

Same TPU shaping as ops/gru.py: one [in, 4H] matmul per layer per step,
one lax.scan for the whole sequence, packed-sequence masking via
`lengths`.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def lstm_cell_step(x, h, c, w_ih, w_hh, b_ih, b_hh):
    """One LSTM cell step. x: [B, in], h/c: [B, H] -> (h', c')."""
    gates = x @ w_ih + b_ih + h @ w_hh + b_hh  # [B, 4H]
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[..., :H])
    f = jax.nn.sigmoid(gates[..., H:2 * H])
    g = jnp.tanh(gates[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H:])
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new


class LSTMStack(nn.Module):
    """num_layers LSTM with torch-compatible gates.

    __call__(xs, state, deterministic) — xs: [T, B, in] time-major;
        state = (h0, c0) each [L, B, H]; returns (outputs [T, B, H],
        (h_T, c_T)).
    step(x, state) — one step, x: [B, in].
    """

    hidden_dim: int
    num_layers: int = 1
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    def _params(self, layer: int, in_dim: int):
        H = self.hidden_dim
        scale = 1.0 / H ** 0.5

        def init(key, shape):
            return jax.random.uniform(key, shape, jnp.float32,
                                      -scale, scale)

        w_ih = self.param(f"l{layer}_w_ih", init, (in_dim, 4 * H))
        w_hh = self.param(f"l{layer}_w_hh", init, (H, 4 * H))
        b_ih = self.param(f"l{layer}_b_ih", init, (4 * H,))
        b_hh = self.param(f"l{layer}_b_hh", init, (4 * H,))
        return (w_ih.astype(self.dtype), w_hh.astype(self.dtype),
                b_ih.astype(self.dtype), b_hh.astype(self.dtype))

    @nn.compact
    def __call__(self, xs: jnp.ndarray,
                 state: Tuple[jnp.ndarray, jnp.ndarray],
                 deterministic: bool = True,
                 lengths: Optional[jnp.ndarray] = None):
        H = self.hidden_dim
        layer_params = []
        in_dim = xs.shape[-1]
        for layer in range(self.num_layers):
            layer_params.append(self._params(layer, in_dim))
            in_dim = H

        dropout_rng = (None if deterministic or self.dropout_rate == 0.0
                       else self.make_rng("dropout"))

        def body(carry, inputs):
            h_all, c_all = carry
            x_t, t = inputs
            valid = (None if lengths is None
                     else (t < lengths)[:, None])
            new_h, new_c = [], []
            inp = x_t
            for layer, (w_ih, w_hh, b_ih, b_hh) in enumerate(layer_params):
                h_next, c_next = lstm_cell_step(
                    inp, h_all[layer], c_all[layer], w_ih, w_hh, b_ih, b_hh)
                if valid is not None:
                    h_next = jnp.where(valid, h_next, h_all[layer])
                    c_next = jnp.where(valid, c_next, c_all[layer])
                new_h.append(h_next)
                new_c.append(c_next)
                inp = h_next
                if layer < self.num_layers - 1 and dropout_rng is not None:
                    rng = jax.random.fold_in(dropout_rng, layer)
                    keep = jax.random.bernoulli(
                        rng, 1.0 - self.dropout_rate, inp.shape)
                    inp = jnp.where(keep, inp / (1.0 - self.dropout_rate),
                                    0.0)
            if valid is not None:
                inp = jnp.where(valid, inp, 0.0)
            return (jnp.stack(new_h), jnp.stack(new_c)), inp

        h0, c0 = state
        ts = jnp.arange(xs.shape[0])
        (h_t, c_t), outputs = jax.lax.scan(
            body, (h0.astype(self.dtype), c0.astype(self.dtype)),
            (xs.astype(self.dtype), ts))
        return outputs, (h_t, c_t)

    def step(self, x: jnp.ndarray, state):
        outputs, state_t = self.__call__(x[None], state, deterministic=True)
        return outputs[0], state_t

    def zero_state(self, batch: int):
        shape = (self.num_layers, batch, self.hidden_dim)
        return jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype)
