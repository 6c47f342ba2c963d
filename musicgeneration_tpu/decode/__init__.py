"""Decode engine: KV-cached autoregressive generation under lax.scan with
on-device sampling, plus beam / stochastic-beam search for the RNN family.

The reference generates by re-forwarding the whole prefix for every token
with no cache (MusicTransformer/network.py:52-78) — O(L^2) per token. This
engine is the 10x-win replacement (BASELINE.md)."""

from .beam import beam_search, replicate_for_beams
from .engine import DecodeParams, expand_controls, generate, generate_sliding
from .sampling import sample_logits
from .serving import ContinuousBatcher
from .serving_cp import CPContinuousBatcher
from .serving_rnn import RNNContinuousBatcher
from .speculative import SpecParams, generate_speculative

__all__ = ["generate", "generate_sliding", "DecodeParams",
           "expand_controls", "sample_logits", "beam_search",
           "replicate_for_beams", "SpecParams", "generate_speculative",
           "ContinuousBatcher", "RNNContinuousBatcher",
           "CPContinuousBatcher"]
