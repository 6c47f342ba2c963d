"""musicgeneration_tpu — TPU-native symbolic music generation framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the reference
`mg` package (SJTMusicTeam/MusicGeneration): three MIDI token schemes
(MIDI-like / REMI / MuMIDI), a model zoo (MusicTransformer with relative
attention, event/performance GRU LMs, PoPMAG melody->arrangement seq2seq),
offline tokenization pipelines, and train/decode engines — redesigned for
TPU: static shapes, lax.scan decoding with KV caches, Pallas kernels for the
attention hot path, and jax.sharding meshes for scale-out.
"""

__version__ = "0.1.0"
