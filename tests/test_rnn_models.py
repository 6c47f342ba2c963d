"""GRU ops + RNN model family + beam search tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.decode.beam import beam_search, replicate_for_beams
from musicgeneration_tpu.models import EventMelodyRNN, PerformanceRNN
from musicgeneration_tpu.ops.gru import GRUStack, gru_cell_step


def test_gru_cell_matches_torch_semantics():
    """Cross-check one GRU step against torch.nn.GRUCell (cpu torch is in
    the image; used as an oracle only, never at runtime)."""
    import torch

    B, IN, H = 3, 5, 7
    rng = np.random.RandomState(0)
    x = rng.randn(B, IN).astype(np.float32)
    h = rng.randn(B, H).astype(np.float32)
    cell = torch.nn.GRUCell(IN, H)
    with torch.no_grad():
        out_t = cell(torch.from_numpy(x), torch.from_numpy(h)).numpy()
    # torch stores weight_ih [3H, IN] in gate order r,z,n
    w_ih = cell.weight_ih.detach().numpy().T
    w_hh = cell.weight_hh.detach().numpy().T
    b_ih = cell.bias_ih.detach().numpy()
    b_hh = cell.bias_hh.detach().numpy()
    out_j = gru_cell_step(jnp.asarray(x), jnp.asarray(h),
                          jnp.asarray(w_ih), jnp.asarray(w_hh),
                          jnp.asarray(b_ih), jnp.asarray(b_hh))
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=1e-5)


def test_gru_stack_step_matches_full_scan():
    stack = GRUStack(hidden_dim=16, num_layers=2)
    xs = jax.random.normal(jax.random.PRNGKey(0), (5, 3, 8))
    h0 = jnp.zeros((2, 3, 16))
    params = stack.init(jax.random.PRNGKey(1), xs, h0)

    @jax.jit
    def full(params, xs, h0):
        return stack.apply(params, xs, h0)

    @jax.jit
    def stepped(params, xs, h0):
        def body(h, x):
            out, h = stack.apply(params, x, h, method=stack.step)
            return h, out
        h_t, outs = jax.lax.scan(body, h0, xs)
        return outs, h_t

    out_full, h_full = full(params, xs, h0)
    out_step, h_step = stepped(params, xs, h0)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_step),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_full), np.asarray(h_step),
                               atol=1e-6)


def _transparent_dropout_params(H):
    """Params making layer-1 output expose the inter-layer dropout mask:
    layer 0 holds its hidden constant (z=1), so its output is the same
    vector c every step; layer 1 computes tanh(dropout(c)) memorylessly
    (r=1, z=0, w_hh=0, w_ih = I on the n gate)."""
    z3 = jnp.zeros((3 * H,))
    p = {
        "l0_w_ih": jnp.zeros((H, 3 * H)),
        "l0_w_hh": jnp.zeros((H, 3 * H)),
        # z gate bias +20 -> z ~= 1 -> h' = h (constant layer-0 output)
        "l0_b_ih": z3.at[H:2 * H].set(20.0),
        "l0_b_hh": jnp.zeros((3 * H,)),
        # layer 1: r=1 (bias +20), z=0 (bias -20), n = tanh(x @ I)
        "l1_w_ih": jnp.zeros((H, 3 * H)).at[:, 2 * H:].set(jnp.eye(H)),
        "l1_w_hh": jnp.zeros((H, 3 * H)),
        "l1_b_ih": z3.at[:H].set(20.0).at[H:2 * H].set(-20.0),
        "l1_b_hh": jnp.zeros((3 * H,)),
    }
    return {"params": p}


def test_gru_dropout_fresh_mask_per_timestep():
    """torch nn.GRU(dropout=) samples a FRESH mask every timestep (the
    round-1 implementation froze it per sequence). With the transparent
    params, top output at step t = tanh(mask_t * c / keep): fresh masks
    make steps differ; variational=True keeps them identical."""
    H, T, B = 16, 6, 2
    xs = jnp.zeros((T, B, H))
    c = jnp.linspace(0.5, 1.5, H)
    h0 = jnp.stack([jnp.tile(c, (B, 1)), jnp.zeros((B, H))])
    params = _transparent_dropout_params(H)
    rngs = {"dropout": jax.random.PRNGKey(3)}

    fresh = GRUStack(hidden_dim=H, num_layers=2, dropout_rate=0.5)
    out_f, _ = fresh.apply(params, xs, h0, deterministic=False, rngs=rngs)
    out_f = np.asarray(out_f)  # [T, B, H]
    assert any(not np.allclose(out_f[t], out_f[0]) for t in range(1, T)), \
        "dropout mask is frozen across timesteps (torch samples fresh)"

    frozen = GRUStack(hidden_dim=H, num_layers=2, dropout_rate=0.5,
                      variational=True)
    out_v, _ = frozen.apply(params, xs, h0, deterministic=False, rngs=rngs)
    out_v = np.asarray(out_v)
    for t in range(1, T):
        np.testing.assert_allclose(out_v[t], out_v[0], atol=1e-6)

    # deterministic mode: no dropout, output = tanh(c) each step
    out_d, _ = fresh.apply(params, xs, h0, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_d)[0, 0], np.tanh(c),
                               atol=1e-4)


class TestEventMelodyRNN:
    @pytest.fixture(scope="class")
    def setup(self):
        model = EventMelodyRNN(event_dim=40, init_dim=8, hidden_dim=32,
                               num_layers=2, dropout_rate=0.0)
        init = jnp.zeros((2, 8))
        events = jnp.zeros((5, 2), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), init, events)
        return model, params

    def test_train_forward_shape(self, setup):
        model, params = setup
        init = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
        events = jax.random.randint(jax.random.PRNGKey(2), (5, 2), 0, 39)
        logits = jax.jit(model.apply)(params, init, events)
        # primary-event priming: T+1 predictions (SeqForward, :63-88)
        assert logits.shape == (6, 2, 40)

    def test_decode_matches_teacher_forced(self, setup):
        """Step-by-step decode must reproduce the training forward's
        logits when fed the same tokens."""
        model, params = setup
        init = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
        events = jax.random.randint(jax.random.PRNGKey(2), (5, 2), 0, 39)
        full = jax.jit(model.apply)(params, init, events)

        @jax.jit
        def stepped(params, init, events):
            cache = model.apply(params, 2, 0, init,
                                method=model.init_cache)
            primary = jnp.full((2,), model.primary_event, jnp.int32)
            seq = jnp.concatenate([primary[None], events], axis=0)

            def body(cache, tok):
                logits, cache = model.apply(params, tok, cache,
                                            method=model.decode_step)
                return cache, logits

            _, logits = jax.lax.scan(body, cache, seq)
            return logits

        step_logits = stepped(params, init, events)
        np.testing.assert_allclose(np.asarray(full),
                                   np.asarray(step_logits), atol=1e-5)


class TestPerformanceRNN:
    @pytest.fixture(scope="class")
    def setup(self):
        model = PerformanceRNN(event_dim=40, control_dim=6, init_dim=8,
                               hidden_dim=32, num_layers=2,
                               dropout_rate=0.0)
        init = jnp.zeros((2, 8))
        events = jnp.zeros((5, 2), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), init, events)
        return model, params

    def test_forward_with_and_without_controls(self, setup):
        model, params = setup
        init = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
        events = jax.random.randint(jax.random.PRNGKey(2), (5, 2), 0, 39)
        l1 = jax.jit(model.apply)(params, init, events)
        assert l1.shape == (5, 2, 40)
        controls = jax.random.uniform(jax.random.PRNGKey(3), (5, 2, 6))
        l2 = model.apply(params, init, events, controls)
        assert l2.shape == (5, 2, 40)
        # control conditioning must change the logits
        assert float(jnp.max(jnp.abs(l1 - l2))) > 1e-4

    def test_decode_matches_teacher_forced(self, setup):
        model, params = setup
        init = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
        events = jax.random.randint(jax.random.PRNGKey(2), (5, 2), 0, 39)
        full = jax.jit(model.apply)(params, init, events)

        @jax.jit
        def stepped(params, init, events):
            cache = model.apply(params, 2, 0, init,
                                method=model.init_cache)
            primary = jnp.full((2,), model.primary_event, jnp.int32)
            seq = jnp.concatenate([primary[None], events[:-1]], axis=0)

            def body(cache, tok):
                logits, cache = model.apply(params, tok, cache,
                                            method=model.decode_step)
                return cache, logits

            _, logits = jax.lax.scan(body, cache, seq)
            return logits

        step_logits = stepped(params, init, events)
        np.testing.assert_allclose(np.asarray(full),
                                   np.asarray(step_logits), atol=1e-5)


class TestBeamSearch:
    def test_beam_finds_highest_prob_path_in_toy_chain(self):
        """Deterministic toy LM: token t+1 = (token_t + 1) % V has the
        highest logit; beam must follow the chain."""
        V = 6

        def step_fn(tokens, state):
            logits = jax.nn.one_hot((tokens + 1) % V, V) * 5.0
            return logits, state

        first = jnp.asarray([0, 3], jnp.int32)
        out = beam_search(step_fn, {}, first, steps=4, beam_size=3,
                          vocab_size=V, normalize=True)
        np.testing.assert_array_equal(np.asarray(out),
                                      [[1, 2, 3, 4], [4, 5, 0, 1]])

    def test_beam_state_tracks_parent(self):
        """State must be re-gathered to the winning beam's lineage: a
        counter state that only increments when the sampled token is even
        must match the winning sequence, not another beam's."""
        V = 4

        def step_fn(tokens, state):
            # favor staying on token 2 for beam-0 lineage, but give
            # every beam a distinct continuation
            logits = jnp.where(
                (state["cnt"] % 2 == 0)[:, None],
                jax.nn.one_hot(jnp.full_like(tokens, 2), V),
                jax.nn.one_hot(jnp.full_like(tokens, 1), V)) * 3.0
            return logits, {"cnt": state["cnt"] + 1}

        first = jnp.zeros((1,), jnp.int32)
        state = {"cnt": jnp.zeros((3,), jnp.int32)}  # batch*beam = 3
        out = beam_search(step_fn, state, first, steps=3, beam_size=3,
                          vocab_size=V, normalize=True)
        np.testing.assert_array_equal(np.asarray(out), [[2, 1, 2]])

    def test_stochastic_beam_varies_with_rng(self):
        V = 8

        def step_fn(tokens, state):
            return jnp.zeros((tokens.shape[0], V)), state  # uniform

        first = jnp.zeros((1,), jnp.int32)
        outs = set()
        for seed in range(4):
            out = beam_search(step_fn, {}, first, steps=4, beam_size=2,
                              vocab_size=V, rng=jax.random.PRNGKey(seed),
                              stochastic=True)
            outs.add(tuple(np.asarray(out[0]).tolist()))
        assert len(outs) > 1

    def test_rnn_beam_end_to_end(self):
        model = EventMelodyRNN(event_dim=20, init_dim=4, hidden_dim=16,
                               num_layers=2, dropout_rate=0.0)
        init = jax.random.normal(jax.random.PRNGKey(0), (2, 4))
        params = model.init(jax.random.PRNGKey(1), init,
                            jnp.zeros((3, 2), jnp.int32))
        beam = 4
        cache = model.apply(params, 2, 0,
                            jnp.repeat(init, beam, axis=0),
                            method=model.init_cache)

        def step_fn(tokens, cache):
            return model.apply(params, tokens, cache,
                               method=model.decode_step)

        first = jnp.full((2,), model.primary_event, jnp.int32)
        out = jax.jit(lambda c: beam_search(
            step_fn, c, first, steps=6, beam_size=beam, vocab_size=20,
            state_batch_axis=1))(cache)
        assert out.shape == (2, 6)
        assert int(out.min()) >= 0 and int(out.max()) < 20
