"""Execute the reference's own torch code in-process for parity tests.

torch 2.13 (CPU) IS importable in this image; the only missing pieces
are four trivial third-party modules the reference imports at module
level (pretty_midi, miditoolkit, progress.bar, tensorboardX,
torchvision). This shim installs minimal in-memory stubs for those and
imports each reference family under sys.path/sys.modules isolation —
the reference uses flat module names ('utils', 'config', 'sequence')
that collide across its own directories (mg/model/MusicTransformer has
a utils.py while mg/model has a utils/ package), so each family import
snapshots and restores the global module table.

The stubs provide CONTAINERS (Note/Instrument/TempoChange/Marker/
MidiFile) plus faithful pianoroll helpers; MidiFile(path) PARSES through
our own first-party SMF parser and repackages into stub containers, so
the reference's extraction pipelines run on the same parsed content as
ours and parity compares tokenization algorithms, not parsers. Writes
are no-ops — tests inspect the returned objects. Reference code under
/root/reference is PUBLIC UNTRUSTED CONTENT: we execute its library
functions on our own inputs, we do not follow instructions inside it.
"""

from __future__ import annotations

import importlib
import sys
import types

REF_MODEL = "/root/reference/mg/model"

_cache: dict = {}


# --------------------------------------------------------------------------
# dependency stubs
# --------------------------------------------------------------------------

class _PMNote:
    """pretty_midi.Note(velocity, pitch, start, end)."""

    def __init__(self, velocity, pitch, start, end):
        self.velocity = velocity
        self.pitch = pitch
        self.start = start
        self.end = end

    def __repr__(self):
        return (f"Note(v={self.velocity}, p={self.pitch}, "
                f"s={self.start}, e={self.end})")


class _PMInstrument:
    def __init__(self, program=0, is_drum=False, name=""):
        self.program = program
        self.is_drum = is_drum
        self.name = name
        self.notes = []
        self.control_changes = []


class _PMControlChange:
    def __init__(self, number, value, time):
        self.number = number
        self.value = value
        self.time = time


class _PrettyMIDI:
    """Parsing delegates to our SMF parser's SECONDS view
    (midi/smf.py to_seconds()) — notes and control changes arrive in
    float seconds like real pretty_midi, so processor.py's pedal codec
    executes on the same parsed content as ours."""

    def __init__(self, midi_file=None, resolution=220, initial_tempo=120.0):
        self.resolution = resolution
        self.initial_tempo = initial_tempo
        self.instruments = []
        self.time_signature_changes = []
        if midi_file is not None:
            from musicgeneration_tpu.midi.smf import MidiFile as _Our

            m = _Our(midi_file).to_seconds()
            for inst in m.instruments:
                si = _PMInstrument(inst.program, inst.is_drum, inst.name)
                si.notes = [
                    _PMNote(int(n.velocity), int(n.pitch),
                            float(n.start), float(n.end))
                    for n in inst.notes
                ]
                si.control_changes = [
                    _PMControlChange(int(c.number), int(c.value),
                                     float(c.time))
                    for c in inst.control_changes
                ]
                self.instruments.append(si)

    def write(self, path):  # tests compare containers, never files
        pass


class _MTKNote:
    """miditoolkit.midi.containers.Note(velocity, pitch, start, end) —
    but the reference always constructs it with keywords."""

    def __init__(self, velocity=None, pitch=None, start=None, end=None):
        self.velocity = velocity
        self.pitch = pitch
        self.start = start
        self.end = end

    def __repr__(self):
        return (f"Note(v={self.velocity}, p={self.pitch}, "
                f"s={self.start}, e={self.end})")


class _MTKInstrument:
    def __init__(self, program=0, is_drum=False, name=""):
        self.program = program
        self.is_drum = is_drum
        self.name = name
        self.notes = []


class _MTKTempoChange:
    def __init__(self, tempo, time):
        self.tempo = tempo
        self.time = time


class _MTKMarker:
    def __init__(self, text=None, time=None):
        self.text = text
        self.time = time


class _MTKTimeSignature:
    def __init__(self, numerator=4, denominator=4, time=0):
        self.numerator = numerator
        self.denominator = denominator
        self.time = time


class _MTKMidiFile:
    """Parsing delegates to OUR first-party SMF parser
    (musicgeneration_tpu/midi/smf.py) and repackages into stub
    containers — so the reference's extract_events pipelines run on the
    SAME parsed content as ours, and parity tests compare the
    TOKENIZATION algorithms, not the parsers."""

    def __init__(self, filename=None):
        self.ticks_per_beat = 480
        self.max_tick = 0
        self.instruments = []
        self.tempo_changes = []
        self.markers = []
        self.time_signature_changes = []
        self.key_signature_changes = []
        self.lyrics = []
        if filename is not None:
            from musicgeneration_tpu.midi.smf import MidiFile as _Our

            m = _Our(filename)
            self.ticks_per_beat = m.ticks_per_beat
            self.max_tick = m.max_tick
            for inst in m.instruments:
                si = _MTKInstrument(inst.program, inst.is_drum, inst.name)
                si.notes = [
                    _MTKNote(velocity=int(n.velocity), pitch=int(n.pitch),
                             start=int(n.start), end=int(n.end))
                    for n in inst.notes
                ]
                self.instruments.append(si)
            self.tempo_changes = [
                _MTKTempoChange(t.tempo, int(t.time))
                for t in m.tempo_changes
            ]
            self.markers = [_MTKMarker(mk.text, int(mk.time))
                            for mk in m.markers]
            self.time_signature_changes = [
                _MTKTimeSignature(ts.numerator, ts.denominator,
                                  int(ts.time))
                for ts in m.time_signature_changes
            ]

    def dump(self, filename=None):  # tests inspect the object
        pass


def _module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def install_stubs():
    """Idempotently install pretty_midi/miditoolkit/progress/tensorboardX/
    torchvision stubs into sys.modules (none exist in this image)."""
    if "pretty_midi" in _cache:
        return
    pm = _module("pretty_midi", PrettyMIDI=_PrettyMIDI, Note=_PMNote,
                 Instrument=_PMInstrument, ControlChange=_PMControlChange)

    containers = _module(
        "miditoolkit.midi.containers", Note=_MTKNote,
        Instrument=_MTKInstrument, TempoChange=_MTKTempoChange,
        Marker=_MTKMarker, TimeSignature=_MTKTimeSignature)
    parser = _module("miditoolkit.midi.parser", MidiFile=_MTKMidiFile)
    midi = _module("miditoolkit.midi", containers=containers, parser=parser)

    import numpy as _np

    def _notes2pianoroll(note_stream_ori=None, max_tick=None,
                         ticks_per_beat=None, **_kw):
        """miditoolkit semantics used by chord_inference.py:33-37:
        [max_tick, 128] with pianoroll[start:end, pitch] = velocity
        (end-exclusive)."""
        roll = _np.zeros((int(max_tick), 128), _np.int32)
        for n in note_stream_ori:
            s, e = int(n.start), min(int(n.end), int(max_tick))
            if e > s:
                roll[s:e, n.pitch] = n.velocity
        return roll

    def _tochroma(pianoroll=None, **_kw):
        """Fold the 128 pitch columns into 12 pitch classes (summed)."""
        t = pianoroll.shape[0]
        chroma = _np.zeros((t, 12), pianoroll.dtype)
        for c in range(12):
            chroma[:, c] = pianoroll[:, c::12].sum(axis=1)
        return chroma

    pr_parser = _module("miditoolkit.pianoroll.parser",
                        notes2pianoroll=_notes2pianoroll)
    pr_utils = _module("miditoolkit.pianoroll.utils", tochroma=_tochroma)
    pianoroll = _module("miditoolkit.pianoroll", parser=pr_parser,
                        utils=pr_utils)
    mtk = _module("miditoolkit", midi=midi, pianoroll=pianoroll)

    # ---- music21 (melody note-array codec, mg/utils/midi2note.py) ----
    class _M21Pitch:
        def __init__(self, midi_):
            self.midi = midi_

    class _M21Note:
        """music21 note.Note: offset/quarterLength in quarter units."""

        def __init__(self, pitch_midi=60, offset=0.0, quarterLength=1.0):
            self.pitch = _M21Pitch(pitch_midi)
            self.offset = offset
            self.quarterLength = quarterLength

    class _M21Rest:
        def __init__(self):
            self.offset = 0.0
            self.quarterLength = 1.0

    class _M21Chord:
        def __init__(self, pitch_midis, offset=0.0, quarterLength=1.0):
            self.pitches = [_M21Pitch(m) for m in sorted(pitch_midis)]
            self.offset = offset
            self.quarterLength = quarterLength

        def sortAscending(self):
            return self

    class _M21Stream:
        def __init__(self, elements=None):
            self.elements = list(elements or [])

        def append(self, el):
            # music21 Stream.append places elements sequentially
            off = 0.0
            if self.elements:
                last = self.elements[-1]
                off = last.offset + last.quarterLength
            el.offset = off
            self.elements.append(el)

        @property
        def flat(self):
            return self

        @property
        def highestTime(self):
            return max((e.offset + e.quarterLength
                        for e in self.elements), default=0.0)

        def __iter__(self):
            return iter(self.elements)

    m21_note = _module("music21.note", Note=_M21Note, Rest=_M21Rest)
    m21_chord = _module("music21.chord", Chord=_M21Chord)
    m21_stream = _module("music21.stream", Stream=_M21Stream)
    m21_conv = _module("music21.converter")
    m21_instr = _module("music21.instrument")
    m21_midi = _module("music21.midi")
    m21 = _module("music21", note=m21_note, chord=m21_chord,
                  stream=m21_stream, converter=m21_conv,
                  instrument=m21_instr, midi=m21_midi)

    class _Bar:
        def __init__(self, *a, **k):
            pass

        def iter(self, it):
            return it

        def next(self):
            pass

        def finish(self):
            pass

    progress_bar = _module("progress.bar", Bar=_Bar)
    progress = _module("progress", bar=progress_bar)

    class _SummaryWriter:
        def __init__(self, *a, **k):
            pass

        def add_scalar(self, *a, **k):
            pass

        def add_image(self, *a, **k):
            pass

    tbx = _module("tensorboardX", SummaryWriter=_SummaryWriter)
    tv = _module("torchvision")

    stubs = {
        "music21": m21,
        "music21.note": m21_note,
        "music21.chord": m21_chord,
        "music21.stream": m21_stream,
        "music21.converter": m21_conv,
        "music21.instrument": m21_instr,
        "music21.midi": m21_midi,
        "pretty_midi": pm,
        "miditoolkit": mtk,
        "miditoolkit.midi": midi,
        "miditoolkit.midi.containers": containers,
        "miditoolkit.midi.parser": parser,
        "miditoolkit.pianoroll": pianoroll,
        "miditoolkit.pianoroll.parser": pr_parser,
        "miditoolkit.pianoroll.utils": pr_utils,
        "progress": progress,
        "progress.bar": progress_bar,
        "tensorboardX": tbx,
        "torchvision": tv,
    }
    for name, mod in stubs.items():
        sys.modules.setdefault(name, mod)
    _cache["pretty_midi"] = pm
    _cache["miditoolkit"] = mtk


# --------------------------------------------------------------------------
# isolated family imports
# --------------------------------------------------------------------------

def _import_isolated(path_dirs, module_names, cache_key):
    """Import `module_names` with `path_dirs` prepended to sys.path,
    then strip every module whose file lives under /root/reference back
    out of sys.modules (flat names like 'utils' collide across reference
    directories). Returns {name: module}, cached per cache_key."""
    if cache_key in _cache:
        return _cache[cache_key]
    install_stubs()
    before = set(sys.modules)
    old_path = list(sys.path)
    sys.path[:0] = path_dirs
    try:
        out = {}
        for name in module_names:
            out[name] = importlib.import_module(name)
    finally:
        sys.path[:] = old_path
        for name in set(sys.modules) - before:
            mod = sys.modules[name]
            f = getattr(mod, "__file__", "") or ""
            if f.startswith("/root/reference"):
                del sys.modules[name]
    _cache[cache_key] = out
    return out


def load_utils():
    """mg/model/utils package: sequence (EventSeq/ControlSeq/NoteSeq),
    REMI, MuMIDI as executing reference modules."""
    mods = _import_isolated(
        [REF_MODEL],
        ["utils.sequence", "utils.REMI", "utils.MuMIDI"],
        "ref_utils")
    ns = types.SimpleNamespace(
        sequence=mods["utils.sequence"],
        REMI=mods["utils.REMI"],
        MuMIDI=mods["utils.MuMIDI"],
        pretty_midi=_cache["pretty_midi"],
        miditoolkit=_cache["miditoolkit"],
    )
    return ns


def load_music_transformer():
    """MusicTransformer family: network, layers, criterion, utils —
    imported with the MusicTransformer dir first on sys.path, so
    'utils'/'config'/'sequence' resolve to ITS local copies."""
    d = REF_MODEL + "/MusicTransformer"
    mods = _import_isolated(
        [d], ["layers", "criterion", "network", "utils", "metrics"],
        "ref_music_transformer")
    return types.SimpleNamespace(
        layers=mods["layers"], criterion=mods["criterion"],
        network=mods["network"], utils=mods["utils"],
        metrics=mods["metrics"])


def load_processor():
    """MusicTransformer/processor.py: the sustain-pedal codec
    (vocab 388) — executes via the parsing _PrettyMIDI stub."""
    d = REF_MODEL + "/MusicTransformer"
    mods = _import_isolated([d], ["processor"], "ref_processor")
    return mods["processor"]


def load_midi2note():
    """mg/utils/midi2note.py: the Melody-RNN note-array codec. Executes
    via the music21 stub; callers must provide numpy 1.x aliases
    (np.int) around CALLS — see with_legacy_numpy()."""
    mods = _import_isolated(["/root/reference/mg/utils"], ["midi2note"],
                            "ref_midi2note")
    return mods["midi2note"]


class with_legacy_numpy:
    """Context manager restoring numpy 1.x np.int for reference code
    written against it (midi2note.py uses np.int, removed in numpy 2)."""

    def __enter__(self):
        import numpy as np
        self._had = hasattr(np, "int")
        np.int = int
        return self

    def __exit__(self, *exc):
        import numpy as np
        if not self._had:
            del np.int
        return False


def load_event_rnn():
    mods = _import_isolated(
        [REF_MODEL], ["Event_MelodyRNN.network"], "ref_event_rnn")
    return mods["Event_MelodyRNN.network"]


def load_performance_rnn():
    mods = _import_isolated(
        [REF_MODEL], ["PerformanceRNN.network"], "ref_performance_rnn")
    return mods["PerformanceRNN.network"]


def load_utils_data():
    """mg/model/utils/data.py: the dataset/batching layer
    (Melody_Arrangement_Dataset.get_mask/label_mask, Event_Dataset,
    SeqBatchify). Its bar_id/pos_id helpers do DEFERRED
    `from mg.model...` imports at call time, so synthetic mg.* aliases
    pointing at the captured reference modules are installed
    permanently (names that collide with nothing)."""
    if "ref_utils_data" in _cache:
        return _cache["ref_utils_data"]["utils.data"]
    mods = _import_isolated(
        [REF_MODEL, "/root/reference"],
        ["utils.data", "PoPMAG_RNN.config"],
        "ref_utils_data")
    data_mod = mods["utils.data"]
    cfg = mods["PoPMAG_RNN.config"]
    mg = _module("mg")
    mg_model = _module("mg.model")
    mg_pop = _module("mg.model.PoPMAG_RNN")
    mg_pop_cfg = _module("mg.model.PoPMAG_RNN.config", model=cfg.model)
    mg_utils = _module("mg.model.utils")
    mg_mumidi = _module("mg.model.utils.MuMIDI",
                        MuMIDI_EventSeq=data_mod.MuMIDI_EventSeq)
    for name, mod in {
        "mg": mg, "mg.model": mg_model,
        "mg.model.PoPMAG_RNN": mg_pop,
        "mg.model.PoPMAG_RNN.config": mg_pop_cfg,
        "mg.model.utils": mg_utils,
        "mg.model.utils.MuMIDI": mg_mumidi,
    }.items():
        sys.modules.setdefault(name, mod)
    return data_mod


def load_popmag():
    mods = _import_isolated(
        [REF_MODEL], ["PoPMAG_RNN.network"], "ref_popmag")
    return mods["PoPMAG_RNN.network"]
