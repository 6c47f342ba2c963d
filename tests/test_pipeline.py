"""Preprocessing pipeline tests: shard writer/loader, quarantine,
track extraction, splitters (reference preprocess_*.py / extract_tracks.py
/ maestro_generate.py parity)."""

import json
import os

import numpy as np
import pytest

from musicgeneration_tpu.data.pipeline import (
    TokenCorpus,
    find_midi_files,
    split_maestro,
    split_ratio,
    tokenize_corpus,
)
from musicgeneration_tpu.data.track_extraction import (
    classify_role,
    extract_merge,
    extract_tracks_under,
    merge_notes,
)
from musicgeneration_tpu.midi import Instrument, MidiFile, Note, TempoChange

from .fixtures import multitrack_midi, simple_piano_midi


@pytest.fixture()
def corpus_dir(tmp_path):
    d = tmp_path / "midis"
    d.mkdir()
    for i in range(5):
        simple_piano_midi(str(d / f"f{i}.mid"), seed=i, n_notes=24)
    # one garbage file for the quarantine path
    (d / "broken.mid").write_bytes(b"not a midi at all")
    return str(d)


def test_tokenize_corpus_shards_and_quarantine(tmp_path, corpus_dir):
    out = str(tmp_path / "tok")
    stats = tokenize_corpus(corpus_dir, out, scheme="midilike",
                            num_workers=1, shard_size=2)
    assert stats.n_ok == 5 and stats.n_failed == 1
    assert len(stats.shards) == 3  # 5 files, 2 per shard
    q = [json.loads(l) for l in open(os.path.join(out, "quarantine.jsonl"))]
    assert len(q) == 1 and "broken.mid" in q[0]["path"]
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["scheme"] == "midilike" and manifest["n_ok"] == 5


def test_token_corpus_loader_roundtrip(tmp_path, corpus_dir):
    from musicgeneration_tpu.tokenizers import midilike

    out = str(tmp_path / "tok")
    tokenize_corpus(corpus_dir, out, scheme="midilike", num_workers=1,
                    shard_size=2)
    corpus = TokenCorpus(out)
    assert len(corpus) == 5
    names = sorted(corpus.name(i) for i in range(len(corpus)))
    # per-file arrays match direct tokenization
    by_name = {corpus.name(i): np.asarray(corpus[i])
               for i in range(len(corpus))}
    for name, arr in by_name.items():
        direct = midilike.extract_events(
            os.path.join(corpus_dir, name)).to_array()
        np.testing.assert_array_equal(arr, direct)
    # limlen filter
    minlen = min(len(v) for v in by_name.values())
    filtered = TokenCorpus(out, limlen=minlen + 1)
    assert len(filtered) < 5
    assert corpus.count(minlen + 1) > 0


def test_tokenize_corpus_mumidi_pairs(tmp_path):
    d = tmp_path / "mt"
    d.mkdir()
    multitrack_midi(str(d / "a.mid"))
    out = str(tmp_path / "tok")
    stats = tokenize_corpus(str(d), out, scheme="mumidi", num_workers=1)
    assert stats.n_ok == 1
    corpus = TokenCorpus(out, key="melody")
    mel = corpus[0]
    arr = corpus.pair(0, "arrangement")
    assert len(mel) > 0 and len(arr) > 0


@pytest.mark.slow
def test_parallel_pool_matches_serial(tmp_path, corpus_dir):
    out1 = str(tmp_path / "t1")
    out2 = str(tmp_path / "t2")
    tokenize_corpus(corpus_dir, out1, num_workers=1, shard_size=100)
    tokenize_corpus(corpus_dir, out2, num_workers=2, shard_size=100)
    c1, c2 = TokenCorpus(out1), TokenCorpus(out2)
    assert len(c1) == len(c2)
    for i in range(len(c1)):
        np.testing.assert_array_equal(c1[i], c2[i])


# ------------------------------------------------------------- extraction

def _track(name, program, pitches, is_drum=False, tpb=480, n=30):
    inst = Instrument(program=program, is_drum=is_drum, name=name)
    for k in range(n):
        inst.notes.append(Note(80, pitches[k % len(pitches)],
                               k * tpb // 2, k * tpb // 2 + tpb // 4))
    return inst


def test_classify_roles():
    assert classify_role(_track("Lead Melody", 50, [70])) == "melody"
    assert classify_role(_track("flute solo", 73, [70])) == "melody"
    assert classify_role(_track("x", 2, [60])) == "piano"
    assert classify_role(_track("x", 34, [40])) == "bass"
    assert classify_role(_track("x", 27, [50])) == "guitar"
    assert classify_role(_track("x", 115, [40])) == "drum"
    assert classify_role(_track("x", 50, [60])) == "string"
    # drum channel flag wins regardless of program
    assert classify_role(_track("x", 2, [40], is_drum=True)) == "drum"


def test_merge_notes_interval_union():
    a = _track("x", 1, [60], n=1)
    b = _track("x", 1, [60], n=1)
    b.notes[0].start, b.notes[0].end = a.notes[0].end - 10, 1000
    merged = merge_notes([a, b])
    assert len(merged) == 1
    assert merged[0].start == a.notes[0].start and merged[0].end == 1000


def test_extract_merge_role_threshold():
    m = MidiFile(ticks_per_beat=480)
    m.tempo_changes = [TempoChange(120, 0)]
    m._tempo_raw = [(0, 500000)]
    # only two non-melody roles -> rejected
    m.instruments = [_track("x", 2, [60]), _track("x", 34, [40])]
    assert extract_merge(m) is None
    # two roles with melody -> accepted
    m.instruments = [_track("melody one", 73, [70]), _track("x", 2, [60])]
    out = extract_merge(m)
    assert out is not None
    assert [i.name for i in out.instruments] == ["melody", "piano"]


def test_extract_tracks_under(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    multitrack_midi(str(d / "a.mid"))
    out = str(tmp_path / "out")
    summary = extract_tracks_under(str(d), out, num_workers=1)
    assert summary["ok"] + summary["rejected"] == 1
    if summary["ok"]:
        files = os.listdir(out)
        assert len(files) == 1
        merged = MidiFile(os.path.join(out, files[0]))
        assert all(i.name in ("melody", "piano", "bass", "guitar", "drum",
                              "string") for i in merged.instruments)


# -------------------------------------------------------------- splitters

def test_split_ratio(tmp_path, corpus_dir):
    paths = find_midi_files(corpus_dir)
    out = str(tmp_path / "split")
    splits = split_ratio(paths, out)
    n = len(paths)
    assert len(splits["train"]) == int(n * 0.8)
    assert sum(len(v) for v in splits.values()) == n
    assert os.path.isdir(os.path.join(out, "train"))


def test_split_maestro(tmp_path, corpus_dir):
    paths = sorted(os.listdir(corpus_dir))
    csv_path = str(tmp_path / "maestro.csv")
    rows = ["split,midi_filename"]
    for i, name in enumerate(paths):
        split = ["train", "validation", "test"][i % 3]
        rows.append(f"{split},{name}")
    open(csv_path, "w").write("\n".join(rows))
    out = str(tmp_path / "ms")
    splits = split_maestro(csv_path, corpus_dir, out)
    assert sum(len(v) for v in splits.values()) == len(paths)
    for split in ("train", "validation", "test"):
        assert os.path.isdir(os.path.join(out, split))


# ------------------------------------------------------------------- CLI

def test_cli_tokenize(tmp_path, corpus_dir, capsys):
    from musicgeneration_tpu.cli.tokenize import main

    out = str(tmp_path / "cli_tok")
    rc = main([corpus_dir, out, "--scheme", "midilike", "--workers", "1"])
    assert rc == 0
    assert "tokenized 5/6" in capsys.readouterr().out


# --------------------------------------------------------------- prefetch

def test_prefetch_to_device_order_and_completeness():
    import jax.numpy as jnp

    from musicgeneration_tpu.data import prefetch_to_device, sliding_prefetch

    batches = [np.full((2, 2), i) for i in range(7)]
    out = list(prefetch_to_device(iter(batches), size=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert isinstance(b, jnp.ndarray) or hasattr(b, "devices")
        assert int(np.asarray(b)[0, 0]) == i
    out2 = list(sliding_prefetch(iter(batches), size=2))
    assert [int(np.asarray(b)[0, 0]) for b in out2] == list(range(7))


def test_prefetch_propagates_pipeline_errors():
    from musicgeneration_tpu.data import prefetch_to_device

    def bad():
        yield np.zeros((2,))
        raise RuntimeError("corrupt shard")

    it = prefetch_to_device(bad(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="corrupt shard"):
        list(it)


def test_quarantine_resets_between_runs(tmp_path, corpus_dir):
    out = str(tmp_path / "qq")
    for _ in range(2):
        tokenize_corpus(corpus_dir, out, num_workers=1)
    q = [json.loads(l) for l in open(os.path.join(out, "quarantine.jsonl"))]
    assert len(q) == 1  # not duplicated across reruns
