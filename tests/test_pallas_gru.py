"""Fused GRU decode-step kernel (ops/pallas_gru_decode.py) vs the
lax.scan GRU (ops/gru.py), interpret mode on CPU.

The kernel must reproduce gru_cell_step layer-by-layer: f32 exactly,
bf16 to bf16 tolerance — and the model-integrated path
(GRUStack.step with MG_GRU_FUSED=force) must match the XLA step."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.ops.gru import GRUStack, gru_cell_step
from musicgeneration_tpu.ops.pallas_gru_decode import (
    _round_up,
    fused_gru_step,
)


def _oracle(x, h, layers):
    inp = x
    new_h = []
    for (w_ih, w_hh, b_ih, b_hh), h_l in zip(layers, h):
        h_n = gru_cell_step(inp, h_l, w_ih, w_hh, b_ih, b_hh)
        new_h.append(h_n)
        inp = h_n
    return inp, jnp.stack(new_h)


@pytest.mark.parametrize("b,in_dim,hidden,layers,dtype,tol", [
    (8, 308, 512, 3, jnp.float32, 2e-5),
    (8, 308, 512, 3, jnp.bfloat16, 3e-2),
    (4, 128, 256, 2, jnp.float32, 2e-5),
    (8, 640, 512, 3, jnp.float32, 2e-5),  # in_dim > hidden
])
def test_fused_gru_step_matches_cell_loop(b, in_dim, hidden, layers,
                                          dtype, tol):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, in_dim) * 0.5, dtype)
    h = jnp.asarray(rng.randn(layers, b, hidden) * 0.5, dtype)
    params, d_in = [], in_dim
    for _ in range(layers):
        params.append((
            jnp.asarray(rng.randn(d_in, 3 * hidden) * 0.04, dtype),
            jnp.asarray(rng.randn(hidden, 3 * hidden) * 0.04, dtype),
            jnp.asarray(rng.randn(3 * hidden) * 0.04, dtype),
            jnp.asarray(rng.randn(3 * hidden) * 0.04, dtype)))
        d_in = hidden
    o_out, o_h = _oracle(x, h, params)

    p = _round_up(max(in_dim, hidden), 128)
    w_ih = jnp.stack([jnp.pad(w, ((0, p - w.shape[0]), (0, 0)))
                      for w, _, _, _ in params])
    w_hh = jnp.stack([w for _, w, _, _ in params])
    b_ih = jnp.stack([bi for _, _, bi, _ in params])
    b_hh = jnp.stack([bh for _, _, _, bh in params])
    k_out, k_h = fused_gru_step(x, h, w_ih, w_hh, b_ih, b_hh,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(k_out, np.float32),
                               np.asarray(o_out, np.float32), atol=tol)
    np.testing.assert_allclose(np.asarray(k_h, np.float32),
                               np.asarray(o_h, np.float32), atol=tol)


def test_grustack_step_fused_integration(monkeypatch):
    """GRUStack.step with MG_GRU_FUSED=force (interpret off-TPU) matches
    the lax.scan step, covering the weight stacking/padding path."""
    gru = GRUStack(hidden_dim=256, num_layers=3)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 308))
    h = jax.random.normal(jax.random.PRNGKey(2), (3, 8, 256))
    params = gru.init(rng, x[None], h)["params"]

    def step(xx, hh):
        return gru.apply({"params": params}, xx, hh, method=GRUStack.step)

    monkeypatch.setenv("MG_GRU_FUSED", "0")
    out_xla, h_xla = step(x, h)
    monkeypatch.setenv("MG_GRU_FUSED", "force")
    out_fused, h_fused = step(x, h)
    np.testing.assert_allclose(np.asarray(out_fused),
                               np.asarray(out_xla), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_fused),
                               np.asarray(h_xla), atol=2e-5)


def test_event_rnn_decode_step_fused_matches(monkeypatch):
    """EventMelodyRNN.decode_step under the fused GRU kernel produces
    the same logits as the XLA path."""
    from musicgeneration_tpu.models.event_rnn import EventMelodyRNN

    model = EventMelodyRNN(hidden_dim=256, num_layers=2)
    b = 4
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((b, 32)),
                        jnp.zeros((4, b), jnp.int32))["params"]
    token = jnp.array([1, 2, 3, 4], jnp.int32)

    def step(flag):
        monkeypatch.setenv("MG_GRU_FUSED", flag)
        cache = model.apply({"params": params}, b, 0,
                            method=EventMelodyRNN.init_cache)
        logits, cache = model.apply({"params": params}, token, cache,
                                    method=EventMelodyRNN.decode_step)
        return np.asarray(logits), np.asarray(cache["h"])

    lx, hx = step("0")
    lf, hf = step("force")
    np.testing.assert_allclose(lf, lx, atol=2e-5)
    np.testing.assert_allclose(hf, hx, atol=2e-5)
