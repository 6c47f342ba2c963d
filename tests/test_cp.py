"""CP (Compound Word) tokenizer + CPTransformer tests.

Beyond-parity: the reference README lists CP as 'to do'
(/root/reference/README.md:10) and never built it. The CP scheme here
follows the Compound Word Transformer (Hsiao et al. 2021) over the same
REMI item semantics this repo already locks to the reference.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.models import CPTransformer
from musicgeneration_tpu.tokenizers import cp, remi

from .fixtures import simple_piano_midi


@pytest.fixture(scope="module")
def fixture_midi(tmp_path_factory):
    d = tmp_path_factory.mktemp("cp")
    path = str(d / "a.mid")
    simple_piano_midi(path, seed=1, n_notes=60)
    return path


def test_spec_shapes():
    assert cp.WIDTH == 8
    dims = cp.field_dims()
    assert len(dims) == 8
    # every field's ignore id is its last slot
    for ig, fd in zip(cp.ignore_ids(), dims):
        assert ig == fd - 1
    assert cp.dim() == sum(dims)


def test_extract_rows_well_formed(fixture_midi):
    rows = cp.extract_events(fixture_midi)
    assert rows.ndim == 2 and rows.shape[1] == 8
    dims = np.asarray(cp.field_dims())
    assert (rows < dims[None, :]).all()
    fam = rows[:, 0]
    ign = cp.ignore_ids()
    # metric rows carry no note fields; note rows no metric fields
    metric = rows[fam == cp.FAMILY_METRIC]
    note = rows[fam == cp.FAMILY_NOTE]
    assert len(metric) and len(note)
    assert (metric[:, 5:] == [ign[5], ign[6], ign[7]]).all()
    assert (note[:, 1:5] == [ign[1], ign[2], ign[3], ign[4]]).all()
    # first row is a bar marker
    assert rows[0, 0] == cp.FAMILY_METRIC and rows[0, 1] == 0


def test_shorter_than_remi(fixture_midi):
    rows = cp.extract_events(fixture_midi)
    remi_tokens = remi.REMI_EventSeq.extract_events(fixture_midi)
    assert len(rows) < len(remi_tokens) * 0.6  # compounding pays


def test_array_roundtrip(fixture_midi):
    rows = cp.extract_events(fixture_midi)
    flat = cp.to_array(rows).reshape(-1)
    back = cp.from_array(flat)
    np.testing.assert_array_equal(back, rows.astype(np.int64))


def test_write_midi_roundtrip(fixture_midi, tmp_path):
    """Decode reproduces the quantized notes: every encoded note row
    lands at its REMI-grid tick with its binned duration/velocity."""
    rows = cp.extract_events(fixture_midi)
    out = str(tmp_path / "rt.mid")
    m = cp.write_midi(rows, out)
    notes = m.instruments[0].notes
    n_note_rows = int((rows[:, 0] == cp.FAMILY_NOTE).sum())
    assert len(notes) == n_note_rows
    # starts on the 120-tick grid, durations from the bin table
    for n in notes:
        assert n.start % 120 == 0
        assert (n.end - n.start) in set(
            int(x) for x in np.asarray(
                cp.vocab.REMI_DURATION_BINS))
    # re-extract: stable note count modulo the downbeat double-count
    rows2 = cp.extract_events(out)
    n2 = int((rows2[:, 0] == cp.FAMILY_NOTE).sum())
    assert abs(n2 - n_note_rows) <= max(4, n_note_rows // 10)


def test_write_midi_skips_malformed_rows():
    ign = cp.ignore_ids()
    rows = np.array([
        cp._row(cp.FAMILY_METRIC, position=0),
        cp._row(cp.FAMILY_METRIC, position=1),
        cp._row(cp.FAMILY_NOTE, pitch=60, duration=1, velocity=2),
        # note row with all-ignore note fields (a sampler can emit this)
        [cp.FAMILY_NOTE, ign[1], ign[2], ign[3], ign[4],
         ign[5], ign[6], ign[7]],
        # EOS terminates decoding
        cp._row(cp.FAMILY_EOS),
        cp._row(cp.FAMILY_NOTE, pitch=70, duration=1, velocity=2),
    ])
    m = cp.write_midi(rows)
    assert len(m.instruments[0].notes) == 1  # only the valid pre-EOS note


class TestCPTransformer:
    @pytest.fixture(scope="class")
    def setup(self):
        model = CPTransformer(num_layers=1, d_model=64, max_seq=64,
                              dropout_rate=0.0)
        x = jnp.zeros((2, 8, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        return model, params

    def test_forward_shapes(self, setup):
        model, params = setup
        x = jnp.zeros((2, 12, 8), jnp.int32)
        logits = model.apply({"params": params}, x)
        assert len(logits) == 8
        for lg, fd in zip(logits, cp.field_dims()):
            assert lg.shape == (2, 12, fd)

    def test_decode_matches_forward(self, setup):
        """KV-cached decode_step logits == the parallel forward's."""
        model, params = setup
        rows = jax.random.randint(jax.random.PRNGKey(1), (1, 6, 8), 0, 2)
        full = model.apply({"params": params}, rows)
        cache = model.apply({"params": params}, 1, 8,
                            method=model.init_cache)
        for t in range(6):
            step_logits, cache = model.apply(
                {"params": params}, rows[:, t], cache, jnp.int32(t),
                method=model.decode_step)
            for sl, fl in zip(step_logits, full):
                np.testing.assert_allclose(np.asarray(sl[0]),
                                           np.asarray(fl[0, t]),
                                           rtol=2e-4, atol=2e-4)

    def test_generate_cp_masks_families(self, setup):
        from musicgeneration_tpu.decode.cp_generate import generate_cp

        model, params = setup
        prompt = jnp.asarray(
            [cp._row(cp.FAMILY_METRIC, position=0)], jnp.int32)[None]
        out = generate_cp(model, params, prompt, jax.random.PRNGKey(2),
                          steps=16, temperature=1.0)
        assert out.shape == (1, 16, 8)
        ign = cp.ignore_ids()
        for row in out[0]:
            if row[0] == cp.FAMILY_NOTE:
                assert list(row[1:5]) == [ign[1], ign[2], ign[3], ign[4]]
            elif row[0] == cp.FAMILY_METRIC:
                assert list(row[5:]) == [ign[5], ign[6], ign[7]]


@pytest.mark.slow
def test_cli_cp_end_to_end(tmp_path):
    """tokenize --scheme cp -> train model=cp_transformer -> generate."""
    import json

    from musicgeneration_tpu.cli.generate import main as gen_main
    from musicgeneration_tpu.cli.tokenize import main as tokenize_main
    from musicgeneration_tpu.cli.train import main as train_main
    from musicgeneration_tpu.midi import MidiFile

    midi_dir = tmp_path / "m"
    midi_dir.mkdir()
    for i in range(3):
        simple_piano_midi(str(midi_dir / f"f{i}.mid"), seed=i, n_notes=80)
    tok = str(tmp_path / "tok_cp")
    assert tokenize_main([str(midi_dir), tok, "--scheme", "cp",
                          "--workers", "1"]) == 0
    ckpt = str(tmp_path / "ckpt_cp")
    metrics = str(tmp_path / "m_cp.jsonl")
    assert train_main([tok, "model=cp_transformer", "steps=4",
                       "batch_size=2", "seq_len=24", "ckpt_every=4",
                       "log_every=1", f"ckpt_dir={ckpt}",
                       f"metrics_path={metrics}",
                       "model.num_layers=1", "model.d_model=64"]) == 0
    lines = [json.loads(l) for l in open(metrics)]
    assert np.isfinite(lines[-1]["loss"])
    out_mid = str(tmp_path / "cp_gen.mid")
    assert gen_main([ckpt, out_mid, "--steps", "32",
                     "--prime", str(midi_dir / "f0.mid"),
                     "--prime-len", "16"]) == 0
    assert os.path.getsize(out_mid) > 0
    MidiFile(out_mid)


def test_cp_head_loss_weighting():
    """cp_head_weights reweights per-head CE (mean-1 normalized): the
    weighted loss equals sum(w_i * ce_i) / n for the same params/batch,
    and a wrong-length tuple is rejected."""
    from musicgeneration_tpu.cli.train import TrainCLIConfig, build_session

    kwargs = dict(num_layers=1, d_model=64, max_seq=16)
    cfg_eq = TrainCLIConfig(model="cp_transformer", seq_len=16)
    cfg_w = TrainCLIConfig(model="cp_transformer", seq_len=16,
                           cp_head_weights=(2, 1, 1, 1, 1, 1, 1, 1))
    model, _, _, loss_eq, _ = build_session(cfg_eq, "cp", dict(kwargs))
    _, _, _, loss_w, _ = build_session(cfg_w, "cp", dict(kwargs))

    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (2, 8, cp.WIDTH), 0, 3)
    y = jax.random.randint(jax.random.PRNGKey(1), (2, 8, cp.WIDTH), 0, 3)
    params = model.init({"params": rng, "dropout": rng}, x,
                        deterministic=True)["params"]

    # per-head CE at these params (deterministic apply for the oracle;
    # loss fns use dropout, so compare them to each other on one rng)
    drop = jax.random.PRNGKey(2)
    l_eq, acc_eq = loss_eq(params, x, y, drop)
    l_w, acc_w = loss_w(params, x, y, drop)
    assert np.isfinite(l_eq) and np.isfinite(l_w)
    assert acc_eq == acc_w  # weights change the loss, not accuracy
    assert not np.isclose(float(l_eq), float(l_w))

    # oracle: recompute from the logits with the normalized weights
    logits = model.apply({"params": params}, x, deterministic=False,
                         rngs={"dropout": drop})
    w = np.asarray(cfg_w.cp_head_weights, np.float32)
    w = w / w.mean()
    ce = []
    for i, lg in enumerate(logits):
        lp = jax.nn.log_softmax(lg, axis=-1)
        ce.append(float(-jnp.take_along_axis(
            lp, y[..., i][..., None], axis=-1).mean()))
    np.testing.assert_allclose(float(l_w), np.dot(w, ce) / len(ce),
                               rtol=1e-5)
    np.testing.assert_allclose(float(l_eq), np.mean(ce), rtol=1e-5)

    with pytest.raises(ValueError):
        build_session(
            TrainCLIConfig(model="cp_transformer",
                           cp_head_weights=(1, 2)), "cp", dict(kwargs))


def test_cp_prefill_matches_sequential_ingestion():
    """One-pass prefill must produce the same last-position logits and
    the same downstream decode_step logits as feeding the prompt row by
    row through decode_step."""
    model = CPTransformer(num_layers=2, d_model=128, max_seq=32)
    b, p = 2, 6
    rng = np.random.RandomState(0)
    fdims = list(model.field_dims)
    rows = jnp.asarray(
        np.stack([rng.randint(0, fd, (b, p)) for fd in fdims], axis=-1),
        jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        rows)["params"]

    cache_seq = model.apply({"params": params}, b, 16,
                            method=model.init_cache)
    logits_seq = None
    for t in range(p):
        logits_seq, cache_seq = model.apply(
            {"params": params}, rows[:, t], cache_seq, jnp.int32(t),
            method=model.decode_step)

    logits_pre, cache_pre = model.apply({"params": params}, rows, 16,
                                        method=model.prefill)
    for i, (a, c) in enumerate(zip(logits_seq, logits_pre)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-4, err_msg=f"head {i}")
    # next decode step from both caches agrees too
    nxt = jnp.asarray(
        np.stack([rng.randint(0, fd, b) for fd in fdims], axis=1),
        jnp.int32)
    l1, _ = model.apply({"params": params}, nxt, cache_seq,
                        jnp.int32(p), method=model.decode_step)
    l2, _ = model.apply({"params": params}, nxt, cache_pre,
                        jnp.int32(p), method=model.decode_step)
    for i, (a, c) in enumerate(zip(l1, l2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-4, err_msg=f"next head {i}")


def test_cp_scan_layers_bit_equal():
    """CPTransformer scan_layers trunk == unrolled under transplanted
    stacked params (see MusicTransformer TestScanLayers)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from musicgeneration_tpu.models.cp_transformer import CPTransformer
    from musicgeneration_tpu.models.music_transformer import (
        stack_layer_params,
    )

    kw = dict(num_layers=2, d_model=64, max_seq=32, dropout_rate=0.0,
              attention_impl="xla")
    x = jnp.zeros((2, 8, 8), jnp.int32)
    m_u = CPTransformer(**kw)
    p_u = m_u.init(jax.random.PRNGKey(0), x)["params"]
    m_s = CPTransformer(scan_layers=True, **kw)
    p_s = stack_layer_params(dict(p_u), 2)
    for a, b in zip(m_u.apply({"params": p_u}, x),
                    m_s.apply({"params": p_s}, x)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
