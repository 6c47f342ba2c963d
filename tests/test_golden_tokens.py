"""Golden-token lock: every tokenizer's exact output on the fixture
corpus, pinned by length + sha256 prefix (the BASELINE.json fidelity
gate made executable — SURVEY.md §4 test #1).

If an intentional behavior change moves these, regenerate
golden_tokens.json and justify the change in the commit message; an
UNINTENTIONAL change here means a tokenizer regression.
"""

import hashlib
import json
import os

import numpy as np
import pytest

from musicgeneration_tpu.tokenizers import (
    melody,
    midilike,
    mumidi,
    pedal_midilike,
    remi,
)

from .fixtures import (
    multitrack_midi,
    polyphonic_midi,
    simple_piano_midi,
    tempo_change_midi,
)

BUILDERS = {
    "simple": simple_piano_midi,
    "poly": polyphonic_midi,
    "multi": multitrack_midi,
    "tempo": tempo_change_midi,
}
GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__),
                                     "golden_tokens.json")))


def _h(arr) -> list:
    arr = np.ascontiguousarray(arr)
    return [int(len(arr)), hashlib.sha256(arr.tobytes()).hexdigest()[:16]]


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_golden_tokens(name, tmp_path):
    path = str(tmp_path / f"{name}.mid")
    BUILDERS[name](path)
    want = GOLDEN[name]

    assert _h(midilike.extract_events(path).to_array()) == want["midilike"]
    assert _h(remi.REMI_EventSeq.to_array(
        remi.REMI_EventSeq.extract_events(path)).astype(np.uint16)
    ) == want["remi"]
    assert _h(np.asarray(pedal_midilike.encode_midi(path), np.uint16)
              ) == want["pedal"]
    assert _h(melody.midi_to_note_array(path).astype(np.int16)
              ) == want["melody"]
    if "mumidi_melody" in want:
        mel, arrg = mumidi.MuMIDI_EventSeq.extract_split_events(path)
        assert _h(mumidi.MuMIDI_EventSeq.to_array(mel).astype(np.uint16)
                  ) == want["mumidi_melody"]
        assert _h(mumidi.MuMIDI_EventSeq.to_array(arrg).astype(np.uint16)
                  ) == want["mumidi_arr"]


@pytest.mark.parametrize("scheme", ["midilike", "remi", "pedal", "melody"])
def test_fuzz_decode_random_tokens(scheme, tmp_path):
    """Untrained-model output (random valid token ids) must decode to a
    writable MIDI without crashing (the generate CLI's worst case)."""
    from musicgeneration_tpu.cli.generate import _write_midi

    rng = np.random.RandomState(0)
    dims = {"midilike": 308, "remi": 336, "pedal": 388, "melody": 130}
    for seed in range(3):
        tokens = np.random.RandomState(seed).randint(
            0, dims[scheme], size=256)
        out = str(tmp_path / f"f_{scheme}_{seed}.mid")
        _write_midi(scheme, tokens, out)
        assert os.path.getsize(out) > 0
