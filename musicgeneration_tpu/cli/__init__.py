"""Command-line entry points.

The reference ships per-model script trios (`config.py` / `train.py` /
`generate.py`) that must be run from their own directory due to
hard-coded sys.path hacks (SURVEY.md §1 warts).  Here: proper
`python -m musicgeneration_tpu.cli.<tool>` modules over the library —

    tokenize        — MIDI corpus -> packed token shards (all schemes)
    extract_tracks  — Lakh-MIDI multi-track cleanup for MuMIDI
    split           — maestro-CSV / ratio dataset splits
    train           — train any registered model on a tokenized corpus
    generate        — sample continuations from a checkpoint to MIDI
"""
