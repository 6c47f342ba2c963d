"""Control-conditioned PerformanceRNN generation (VERDICT round-1 #1).

Reference semantics: PerformanceRNN/generate.py:103-131 accepts a control
spec 'p1,...,p12;density' or a processed control file and conditions EVERY
decode step on it via expand_controls (network.py:97-104). Tests cover the
expansion rule, end-to-end engine threading, the CLI flag, and a
statistical check that training a model on control-correlated data then
conditioning generation actually shifts the output distribution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from musicgeneration_tpu.decode import DecodeParams, expand_controls, generate
from musicgeneration_tpu.decode.sampling import SamplingParams
from musicgeneration_tpu.models import PerformanceRNN
from musicgeneration_tpu.tokenizers.midilike import Control, ControlSeq


def test_expand_controls_repeats_single():
    c = jnp.arange(24, dtype=jnp.float32).reshape(1, 1, 24)
    out = expand_controls(c, 5)
    assert out.shape == (5, 1, 24)
    np.testing.assert_array_equal(np.asarray(out[3]), np.asarray(c[0]))


def test_expand_controls_truncates_and_edge_repeats():
    c = jnp.arange(4 * 24, dtype=jnp.float32).reshape(4, 1, 24)
    out = expand_controls(c, 3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(c[:3]))
    # one short: the engine consumes p+steps rows; the tail edge-repeats
    out6 = expand_controls(c, 6)
    np.testing.assert_array_equal(np.asarray(out6[4]), np.asarray(c[3]))
    np.testing.assert_array_equal(np.asarray(out6[5]), np.asarray(c[3]))


def _tiny_model():
    return PerformanceRNN(event_dim=64, control_dim=24, init_dim=8,
                          hidden_dim=16, num_layers=1, dropout_rate=0.0)


def test_generate_threads_controls_through_engine():
    """Different controls must change the generated tokens (control feeds
    concat_input_fc every step, network.py:61-84)."""
    model = _tiny_model()
    prompt = jnp.full((1, 1), model.primary_event, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)),
                        jnp.zeros((3, 1), jnp.int32))["params"]
    dp = DecodeParams(max_len=33, steps=32,
                      sampling=SamplingParams(temperature=1.0))
    rng = jax.random.PRNGKey(1)
    c1 = jnp.zeros((1, 1, 24)).at[0, 0, 3].set(5.0)
    c2 = jnp.zeros((1, 1, 24)).at[0, 0, 17].set(-5.0)
    out0 = np.asarray(generate(model, params, prompt, rng, dp))
    out1 = np.asarray(generate(model, params, prompt, rng, dp, c1))
    out2 = np.asarray(generate(model, params, prompt, rng, dp, c2))
    assert out0.shape == out1.shape == (1, 32)
    assert not np.array_equal(out1, out2)
    # per-step sequence path compiles and runs too
    seq = jnp.tile(c1, (33, 1, 1))
    out3 = np.asarray(generate(model, params, prompt, rng, dp, seq))
    assert out3.shape == (1, 32)


def test_generate_matches_manual_loop_with_controls_and_cache0():
    """The engine with (controls, cache0) must reproduce a hand-rolled
    greedy decode loop that starts from init_to_hidden(z) and feeds
    controls[t] into every decode_step — i.e. the reference generate()
    schedule (network.py:106-154) done step-by-step on the host."""
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)),
                        jnp.zeros((3, 1), jnp.int32))["params"]
    steps, p = 12, 1
    z = 3.0 * jax.random.normal(jax.random.PRNGKey(9), (1, 8))
    cache0 = model.apply({"params": params}, 1, 0, z,
                         method=model.init_cache)
    ctrl = jax.random.uniform(jax.random.PRNGKey(4),
                              (p + steps, 1, 24))
    prompt = jnp.full((1, p), model.primary_event, jnp.int32)
    dp = DecodeParams(max_len=p + steps, steps=steps,
                      sampling=SamplingParams(greedy=True))
    out = np.asarray(generate(model, params, prompt,
                              jax.random.PRNGKey(1), dp, ctrl,
                              cache0))[0]

    # manual loop: same schedule, host-side
    cache = cache0
    tok = prompt[:, 0]
    manual = []
    for t in range(p + steps):
        logits, cache = model.apply({"params": params}, tok, cache,
                                    jnp.int32(t), ctrl[t],
                                    method=model.decode_step)
        if t >= p - 1 and len(manual) < steps:
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            manual.append(int(tok[0]))
    np.testing.assert_array_equal(out, np.asarray(manual))

    # and cache0/controls actually matter: zero-hidden, no-control greedy
    # decode diverges from the conditioned one
    out_plain = np.asarray(generate(model, params, prompt,
                                    jax.random.PRNGKey(1), dp))[0]
    assert not np.array_equal(out, out_plain)


# --------------------------------------------------------------------------
# Statistical conditioning test (VERDICT done-criterion: a C-major histogram
# control shifts the generated pitch-class distribution)
# --------------------------------------------------------------------------

_SET_A = (0, 4, 7)    # C major triad pitch classes
_SET_B = (1, 6, 10)   # disjoint classes

def _tokens_for(classes, rng, n):
    """note_on tokens (id = pitch-21, sequence.py:19) whose pitch class
    (pitch-24)%12 = (id-3)%12 lies in `classes`."""
    ids = np.arange(88)
    ok = ids[np.isin((ids - 3) % 12, classes)]
    return rng.choice(ok, size=n)


def _control_for(classes) -> np.ndarray:
    hist = np.zeros(12)
    hist[list(classes)] = 1.0 / len(classes)
    return Control(hist.tolist(), 5).to_array()  # [24]


@pytest.mark.slow
def test_control_conditioning_shifts_pitch_distribution():
    """Train on data whose pitch-class set SWITCHES PER STEP with the
    control (so the hidden state cannot predict it — only the control
    can), then check conditioned generation follows the control. Loss
    target: log(44)=3.78 ignoring the control vs log(22)=3.09 using it."""
    model = PerformanceRNN(event_dim=308, control_dim=24, init_dim=8,
                           hidden_dim=64, num_layers=1, dropout_rate=0.0)
    T, B = 16, 32
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)),
                        jnp.zeros((T, 1), jnp.int32))["params"]
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    ctrl_a, ctrl_b = _control_for(_SET_A), _control_for(_SET_B)
    styles = {0: (_SET_A, ctrl_a), 1: (_SET_B, ctrl_b)}

    @jax.jit
    def step(params, opt_state, events, controls, init):
        def loss_fn(p):
            logits = model.apply({"params": p}, init, events, controls)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, events[..., None],
                                       axis=-1).mean()
            return nll
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    host = np.random.RandomState(0)
    loss = None
    for i in range(800):
        events = np.zeros((T, B), np.int32)
        controls = np.zeros((T, B, 24), np.float32)
        for t in range(T):
            for b in range(B):
                classes, cv = styles[host.randint(0, 2)]
                events[t, b] = _tokens_for(classes, host, 1)[0]
                controls[t, b] = cv
        init = host.randn(B, 8).astype(np.float32)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(events),
                                       jnp.asarray(controls),
                                       jnp.asarray(init))
    assert float(loss) < 3.4, f"model failed to use the control ({loss})"

    def fraction_in(classes, control_vec, seed):
        prompt = jnp.full((1, 1), model.primary_event, jnp.int32)
        dp = DecodeParams(max_len=257, steps=256,
                          sampling=SamplingParams(temperature=1.0))
        c = jnp.asarray(control_vec, jnp.float32)[None, None, :]
        cache0 = model.apply({"params": params}, 1, 0,
                             jnp.zeros((1, 8)), method=model.init_cache)
        out = np.asarray(generate(model, params, prompt,
                                  jax.random.PRNGKey(seed), dp, c,
                                  cache0))[0]
        ons = out[out < 88]
        assert len(ons) > 50  # the model learned to emit note_ons
        return np.mean(np.isin((ons - 3) % 12, classes))

    frac_a = fraction_in(_SET_A, ctrl_a, seed=11)
    frac_b = fraction_in(_SET_A, ctrl_b, seed=11)  # same rng, other control
    # conditioned on the C-major histogram the C-major mass dominates;
    # conditioned on the disjoint histogram it collapses (measured
    # 0.988 vs 0.020 at this recipe)
    assert frac_a > 0.8, f"A-conditioned C-major fraction {frac_a}"
    assert frac_b < 0.3, f"B-conditioned C-major fraction {frac_b}"
