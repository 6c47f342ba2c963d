"""Native (C++) CP encoder vs the Python oracle.

`mg_encode_cp` (native/smf_scan.cc) emits Compound Word rows straight
from the file bytes; `cp.extract_events` (the Event/Item path over the
REMI pipeline) is the semantics reference. Row-for-row equality on
fixtures and adversarial fuzz."""

import numpy as np
import pytest

from musicgeneration_tpu import native
from musicgeneration_tpu.tokenizers import cp

from .fixtures import (
    multitrack_midi,
    polyphonic_midi,
    simple_piano_midi,
    tempo_change_midi,
)
from .test_native_remi import _rand_midi

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


@pytest.mark.parametrize("builder", [simple_piano_midi, polyphonic_midi,
                                     multitrack_midi, tempo_change_midi])
def test_native_cp_matches_python(builder, tmp_path):
    path = str(tmp_path / "f.mid")
    builder(path)
    nat = cp.encode_rows(path)
    py = cp.extract_events(path)
    assert nat.dtype == py.dtype and nat.shape == py.shape
    np.testing.assert_array_equal(nat, py)


def test_native_cp_fuzz(tmp_path):
    rng = np.random.RandomState(5)
    for i in range(50):
        path = str(tmp_path / f"fz{i % 2}.mid")
        _rand_midi(path, rng)
        nat = cp.encode_rows(path)
        py = cp.extract_events(path)
        np.testing.assert_array_equal(nat, py, err_msg=f"fuzz iter {i}")
