"""PoPMAG continuous-batching serving (decode/serving_popmag.py).

Greedy parity anchor: a full pool admitted together is token-identical
to generate_arrangement + flatten_arrangement at the same width (the
segment kernel runs the same typed bar loop via decode_bar_steps, with
per-row bar cursors instead of the generator's shared scalar)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.data import mumidi_packing as mp
from musicgeneration_tpu.decode.popmag_generate import (
    flatten_arrangement, generate_arrangement)
from musicgeneration_tpu.decode.sampling import SamplingParams
from musicgeneration_tpu.decode.serving_popmag import (
    PopMAGContinuousBatcher)
from musicgeneration_tpu.models.popmag import PoPMAGRNN

from . import fixtures
from musicgeneration_tpu.tokenizers import MuMIDI_EventSeq

GREEDY = SamplingParams(greedy=True)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("popmag_serve")
    path = str(tmp / "m.mid")
    fixtures.multitrack_midi(path, n_bars=4)
    mel, arr = MuMIDI_EventSeq.extract_split_events(path)
    mel_bars = MuMIDI_EventSeq.segmentation(MuMIDI_EventSeq.to_array(mel))
    arr_bars = MuMIDI_EventSeq.segmentation(MuMIDI_EventSeq.to_array(arr))
    batch = mp.pack_batch([(mel_bars, arr_bars), (mel_bars[:2],
                                                  arr_bars[:2])])
    model = PoPMAGRNN(embed_dim=32, hidden_dim=32, num_layers=2,
                      dropout_rate=0.0)
    init = jnp.zeros((2, model.init_dim))
    variables = model.init(
        jax.random.PRNGKey(0), init,
        jnp.asarray(batch.src), jnp.asarray(batch.src_len),
        jnp.asarray(batch.tar), jnp.asarray(batch.tar_len))
    params = variables["params"]
    return model, params, batch


def _reference_flat(model, params, batch, n_bars, max_steps, rows=None,
                    inits=None):
    src = np.asarray(batch.src)
    src_len = np.asarray(batch.src_len)
    if rows is not None:
        src, src_len = src[rows], src_len[rows]
    b = src.shape[0]
    init = (jnp.zeros((b, model.init_dim)) if inits is None
            else jnp.asarray(inits))
    tokens, valid = generate_arrangement(
        model, params, init, jnp.asarray(src), jnp.asarray(src_len),
        jax.random.PRNGKey(0), n_target_bar=n_bars, max_steps=max_steps,
        greedy=True)
    return flatten_arrangement(tokens, valid)


def _mk_cb(model, params, batch, slots, **kw):
    bars_max = batch.src.shape[1]
    blen = batch.src.shape[2]
    kw.setdefault("max_steps", 24)
    kw.setdefault("seg_len", 1)
    return PopMAGContinuousBatcher(
        model, params, slots=slots, sampling=GREEDY,
        max_bars=max(8, bars_max), max_bar_len=blen, prompt_bucket=4,
        min_slots=slots, **kw)


def test_greedy_parity_full_pool(setup):
    """Both requests admitted into a width-2 pool: flat streams equal
    the dedicated width-2 generate_arrangement run."""
    model, params, batch = setup
    n_bars = batch.src.shape[1]
    cb = _mk_cb(model, params, batch, slots=2)
    rids = [cb.submit(batch.src[i, :, :, :], n_bars,
                      src_len=batch.src_len[i])
            for i in range(2)]
    outs = cb.run()
    refs = _reference_flat(model, params, batch, n_bars, 24)
    for rid, ref in zip(rids, refs):
        np.testing.assert_array_equal(outs[rid], ref)
    st = cb.stats()
    # boost may fuse several bars per dispatch; slot-steps count bars
    assert st["slot_steps"] >= n_bars and st["admitted"] == 2


def test_seg_len_and_overcommit_equivalence(setup):
    """seg_len=2 with max_new below the scheduled bar multiple trims to
    exactly max_new bars (the count-retirement path)."""
    model, params, batch = setup
    cb = _mk_cb(model, params, batch, slots=2, seg_len=2)
    rid = cb.submit(batch.src[0], 3, src_len=batch.src_len[0])
    outs = cb.run()
    ref = _reference_flat(model, params, batch, 3, 24, rows=[0, 0])[0]
    np.testing.assert_array_equal(outs[rid], ref)
    assert int(np.sum(outs[rid] == mp.BAR_TOKEN)) >= 3


def test_staggered_admission_and_latents(setup):
    """A second request admits after the first is mid-flight (per-row
    bar cursors); per-request latents flow through init_to_hidden."""
    model, params, batch = setup
    rng = np.random.RandomState(3)
    inits = rng.normal(size=(2, model.init_dim)).astype(np.float32)
    cb = _mk_cb(model, params, batch, slots=1)
    r0 = cb.submit(batch.src[0], 2, src_len=batch.src_len[0],
                   init=inits[0])
    cb.step()
    cb.step()
    r1 = cb.submit(batch.src[1], 2, src_len=batch.src_len[1],
                   init=inits[1])
    outs = cb.run()
    refs0 = _reference_flat(model, params, batch, 2, 24, rows=[0],
                            inits=inits[:1])
    refs1 = _reference_flat(model, params, batch, 2, 24, rows=[1],
                            inits=inits[1:])
    np.testing.assert_array_equal(outs[r0], refs0[0])
    np.testing.assert_array_equal(outs[r1], refs1[0])


def test_validation(setup):
    model, params, batch = setup
    cb = _mk_cb(model, params, batch, slots=2)
    with pytest.raises(ValueError, match="compound melodies"):
        cb.submit(np.zeros((4, 8), np.int32), 2)
    with pytest.raises(ValueError, match="max_bars"):
        cb.submit(np.zeros((64, 4, 7), np.int32), 2)
    with pytest.raises(ValueError, match="eos_id"):
        cb.submit(batch.src[0], 2, eos_id=3)
    with pytest.raises(ValueError, match="src_len"):
        cb.submit(batch.src[0], 2, src_len=np.ones(2, np.int32))
    with pytest.raises(TypeError):
        cb.submit(batch.src[0], 2, bogus=1)
    with pytest.raises(ValueError, match="top-k"):
        PopMAGContinuousBatcher(model, params,
                                sampling=SamplingParams(top_k=4))


def test_warm_and_cancel(setup):
    model, params, batch = setup
    cb = _mk_cb(model, params, batch, slots=2)
    cb.warm()
    assert not cb.pending and not any(s.active for s in cb.slots)
    rid = cb.submit(batch.src[0], 12, src_len=batch.src_len[0])
    cb.step()
    assert cb.cancel(rid)
    outs = cb.run()
    # partial bars delivered as a flat stream
    assert outs[rid].ndim == 1
