"""Reference Event_MelodyRNN 'window' and 'sequence' train modes
(train.py:209-309) wired through cli.train.

The objective parity locks live in tests/test_reference_executable.py
(SeqBatchify equality, sequence-mode loss, scheduled-sampling logits);
these tests cover the CLI streams: geometry, drop_last, deterministic
counter-indexed resume, and e2e training for both modes.
"""

import json

import numpy as np
import pytest

from musicgeneration_tpu.cli.train import (TrainCLIConfig,
                                           _sequence_batch_fn,
                                           _window_batch_fn)


class _FakeCorpus(list):
    pass


def _corpus(lens, seed=0, vocab=40):
    rng = np.random.RandomState(seed)
    return _FakeCorpus(rng.randint(0, vocab, size=n).astype(np.int64)
                       for n in lens)


def test_window_stream_geometry_and_determinism():
    cfg = TrainCLIConfig(batch_size=3, window_size=10, stride_size=4,
                        train_mode="window", seed=5)
    corpus = _corpus([30, 11, 10, 25])
    batch_at = _window_batch_fn(corpus, cfg)
    x, y = batch_at(0)
    assert x.shape == (3, 10) and x.dtype == np.int32
    np.testing.assert_array_equal(x, y)      # full window is the target
    # counter-indexed: same idx -> same batch (resume determinism)
    x2, _ = _window_batch_fn(corpus, cfg)(0)
    np.testing.assert_array_equal(x, x2)
    # windows per file: range(0, n-10, 4) -> 5 + 1 + 0 + 4 = 10
    # (len-10 exclusive: the exactly-fitting file contributes nothing);
    # drop_last: floor(10/3) = 3 batches/epoch, epoch 2 reshuffles
    assert batch_at(3)[0].shape == (3, 10)
    # epoch 2 reshuffles: the two epochs' full batch SEQUENCES differ
    # (a 10-window permutation coinciding across seeds is ~1/10!)
    e1 = np.stack([batch_at(i)[0] for i in range(3)])
    e2 = np.stack([batch_at(3 + i)[0] for i in range(3)])
    assert not np.array_equal(e1, e2)


def test_window_stream_too_small_raises():
    cfg = TrainCLIConfig(batch_size=8, window_size=100, stride_size=10,
                        train_mode="window")
    with pytest.raises(ValueError, match="window mode"):
        _window_batch_fn(_corpus([50, 60]), cfg)


def test_sequence_stream_static_shape_and_epochs():
    cfg = TrainCLIConfig(batch_size=2, train_mode="sequence", seed=3)
    corpus = _corpus([7, 19, 12, 4, 9])
    batch_at = _sequence_batch_fn(corpus, cfg)
    seen = set()
    for idx in range(4):   # two epochs of floor(5/2)=2 batches
        x, y = batch_at(idx)
        toks, lens = x["tokens"], x["lengths"]
        assert toks.shape == (2, 19)          # static pad: corpus max
        assert np.all(np.diff(lens) <= 0)     # SeqBatchify sort desc
        for row, n in zip(toks, lens):
            assert np.all(row[n:] == 0)       # zero padding
            seen.add(n)
    assert len(seen) >= 3                     # shuffling reaches the pool
    x2, _ = _sequence_batch_fn(corpus, cfg)(2)
    np.testing.assert_array_equal(x2["tokens"], batch_at(2)[0]["tokens"])


def test_sequence_pad_to_too_small_raises():
    cfg = TrainCLIConfig(batch_size=2, train_mode="sequence",
                        seq_pad_to=10)
    with pytest.raises(ValueError, match="seq_pad_to"):
        _sequence_batch_fn(_corpus([7, 19]), cfg)


# ---------------------------------------------------------------- e2e

def _tokenize(tmp_path, n=4, n_notes=120):
    from .fixtures import simple_piano_midi
    from musicgeneration_tpu.cli.tokenize import main as tokenize_main

    midi_dir = tmp_path / "midis"
    midi_dir.mkdir()
    for i in range(n):
        simple_piano_midi(str(midi_dir / f"f{i}.mid"), seed=i,
                          n_notes=n_notes)
    out = str(tmp_path / "tok")
    assert tokenize_main([str(midi_dir), out, "--scheme", "midilike",
                          "--workers", "1"]) == 0
    return out


def _train(tok, tmp_path, tag, extra):
    from musicgeneration_tpu.cli.train import main as train_main
    metrics = str(tmp_path / f"m_{tag}.jsonl")
    argv = [tok, "model=event_rnn", "steps=3", "batch_size=2",
            "model.hidden_dim=16", "model.num_layers=2", "log_every=1",
            f"metrics_path={metrics}", *extra]
    assert train_main(argv) == 0
    lines = [json.loads(l) for l in open(metrics)]
    assert lines and np.isfinite(lines[-1]["loss"])
    return lines


@pytest.mark.slow
def test_train_window_mode_e2e(tmp_path):
    _train(_tokenize(tmp_path), tmp_path, "win",
           ["train_mode=window", "window_size=24", "stride_size=8"])


@pytest.mark.slow
def test_train_window_mode_scheduled_e2e(tmp_path):
    _train(_tokenize(tmp_path), tmp_path, "sched",
           ["train_mode=window", "window_size=24", "stride_size=8",
            "teacher_forcing_ratio=0.5"])


@pytest.mark.slow
def test_train_sequence_mode_e2e(tmp_path):
    _train(_tokenize(tmp_path), tmp_path, "seq",
           ["train_mode=sequence"])


def test_mode_validation(tmp_path):
    from musicgeneration_tpu.cli.train import main as train_main
    tok = _tokenize(tmp_path, n=2, n_notes=40)
    with pytest.raises(SystemExit, match="RNN families"):
        train_main([tok, "model=music_transformer",
                    "train_mode=window", "steps=1"])


# ------------------------------------------------------- distillation

def test_distill_loss_zero_when_student_is_teacher(tmp_path):
    """alpha=1, temp=1: KL(teacher || student) vanishes when the
    student IS the teacher — the objective's fixed point."""
    import jax
    import jax.numpy as jnp

    from musicgeneration_tpu.cli.train import _make_distill_loss
    from musicgeneration_tpu.models import MusicTransformer
    from musicgeneration_tpu.train.trainer import TrainerConfig

    m = MusicTransformer(vocab_size=40, num_layers=1, d_model=64,
                         max_seq=16, dropout_rate=0.0)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 16), jnp.int32))["params"]
    tcfg = TrainerConfig(vocab_size=40, pad_id=39, label_smoothing=0.0)
    loss_fn = _make_distill_loss(m, tcfg, m, params, alpha=1.0,
                                 temp=1.0)
    x = jnp.asarray(np.random.RandomState(0).randint(0, 38, (2, 16)))
    loss, _acc = loss_fn(params, x, x, jax.random.PRNGKey(1))
    assert abs(float(loss)) < 1e-5


@pytest.mark.slow
def test_train_distill_draft_e2e(tmp_path):
    """The spec-decode draft recipe: teacher ckpt -> distilled small
    student trains e2e; mismatched seq_len is rejected."""
    from musicgeneration_tpu.cli.tokenize import main as tokenize_main
    from musicgeneration_tpu.cli.train import main as train_main
    from .fixtures import simple_piano_midi

    midi_dir = tmp_path / "midis"
    midi_dir.mkdir()
    for i in range(3):
        simple_piano_midi(str(midi_dir / f"f{i}.mid"), seed=i,
                          n_notes=120)
    tok = str(tmp_path / "tok")
    assert tokenize_main([str(midi_dir), tok, "--scheme", "midilike",
                          "--workers", "1"]) == 0
    tdir = str(tmp_path / "teacher")
    assert train_main([tok, "model=music_transformer", "steps=3",
                       "batch_size=2", "seq_len=32", "ckpt_every=2",
                       f"ckpt_dir={tdir}", "model.num_layers=1",
                       "model.d_model=64"]) == 0
    metrics = str(tmp_path / "draft.jsonl")
    assert train_main([tok, "model=music_transformer", "steps=3",
                       "batch_size=2", "seq_len=32", "log_every=1",
                       f"metrics_path={metrics}",
                       f"distill_from={tdir}", "distill_alpha=0.5",
                       "model.num_layers=1", "model.d_model=64"]) == 0
    lines = [json.loads(l) for l in open(metrics)]
    assert lines and np.isfinite(lines[-1]["loss"])
    with pytest.raises(SystemExit, match="seq_len"):
        train_main([tok, "model=music_transformer", "steps=1",
                    "batch_size=2", "seq_len=64",
                    f"distill_from={tdir}", "model.num_layers=1",
                    "model.d_model=64"])
