"""PoPMAG: melody -> arrangement seq2seq over MuMIDI compound tokens.

Parity with the reference PoPMAG_RNN (mg/model/PoPMAG_RNN/network.py:19-417):

* one shared embedding table of size event_dim + bar_dim (bar-position ids
  live above the event vocab, network.py:38,60-66),
* compound input = SUM of the 7 slot embeddings (`compression`,
  network.py:141-149) — slot id 0 is the MuMIDI 'empty' token and
  contributes its embedding (reference quirk, kept),
* encoder GRU over melody bar k and decoder GRU over arrangement bar k,
  with packed-sequence semantics (per-bar true lengths) and the carried
  state hidden_{k+1} = enc_hidden_k + dec_hidden_k (network.py:323-363,
  esp. :354),
* 3 output heads — event-type (196) / pitch (256) / duration (32) —
  padded to [.., 3, mx_dim=256] with -1e10 (final_predict,
  network.py:303-319). NB the reference softmaxes each head and then
  trains with CrossEntropyLoss on those probabilities (a double-softmax
  bug, train.py:252-256); we emit raw logits — same argmax, proper loss,
* defaults: embed 256, hidden 256, 2 layers, bar_dim 188
  (PoPMAG_RNN/config.py:8-26). PoPMAG_RNN_2 is a byte-identical copy of
  PoPMAG_RNN in the reference and is covered by this same class.

TPU-first: the ragged per-bar Python loops become a lax.scan over a
padded [batch, bars, bar_len, 7] tensor (the reference already pads to
exactly this shape in data.py:301-312); packed-sequence "stop at each
element's own length" is a masked carry inside the GRU scan (ops/gru.py).
Bar-level generation is a fixed-length masked scan — no data-dependent
Python control flow (network.py:246-301's while-loop equivalent).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data import mumidi_packing as mp
from ..ops.gru import GRUStack
from .registry import register_model


@register_model("popmag")
class PoPMAGRNN(nn.Module):
    event_dim: int = mp.EVENT_DIM          # 485
    bar_dim: int = mp.DEFAULT_BAR_DIM      # 188
    init_dim: int = 32
    embed_dim: int = 256
    hidden_dim: int = 256
    num_layers: int = 2
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32

    def setup(self):
        self.event_embedding = nn.Embed(self.event_dim + self.bar_dim,
                                        self.embed_dim, dtype=self.dtype)
        self.inithid_fc = nn.Dense(self.num_layers * self.hidden_dim,
                                   dtype=self.dtype)
        self.encoder = GRUStack(self.hidden_dim, self.num_layers,
                                self.dropout_rate, dtype=self.dtype,
                                name="encoder")
        self.decoder = GRUStack(self.hidden_dim, self.num_layers,
                                self.dropout_rate, dtype=self.dtype,
                                name="decoder")
        self.head_type = nn.Dense(mp.OUT_LEN[0], dtype=self.dtype)
        self.head_pitch = nn.Dense(mp.OUT_LEN[1], dtype=self.dtype)
        self.head_duration = nn.Dense(mp.OUT_LEN[2], dtype=self.dtype)

    def init_to_hidden(self, init: jnp.ndarray) -> jnp.ndarray:
        b = init.shape[0]
        out = jnp.tanh(self.inithid_fc(init.astype(self.dtype)))
        return out.reshape(b, self.num_layers, self.hidden_dim).transpose(
            1, 0, 2)

    def compression(self, compound: jnp.ndarray) -> jnp.ndarray:
        """[..., 7] compound ids -> [..., embed_dim] summed embedding
        (network.py:141-149)."""
        return self.event_embedding(compound.astype(jnp.int32)).sum(-2)

    def final_predict(self, outputs: jnp.ndarray) -> jnp.ndarray:
        """[..., H] -> [..., 3, mx_dim] logits, -1e10 in the padding."""
        heads = [self.head_type(outputs), self.head_pitch(outputs),
                 self.head_duration(outputs)]
        padded = []
        for h in heads:
            pad = mp.MX_DIM - h.shape[-1]
            h32 = h.astype(jnp.float32)
            padded.append(jnp.pad(h32, [(0, 0)] * (h.ndim - 1) + [(0, pad)],
                                  constant_values=-1e10))
        return jnp.stack(padded, axis=-2)

    def __call__(self, init: jnp.ndarray, src: jnp.ndarray,
                 src_len: jnp.ndarray, tar: jnp.ndarray,
                 tar_len: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """Training forward (reference `Train`, network.py:323-363).

        init: [B, init_dim]; src/tar: [B, bars, bar_len, 7] compound ids
        with src/tar truncated or padded to the SAME bar count; *_len:
        [B, bars]. Returns logits [B, bars, tar_len, 3, mx_dim] (f32).
        """
        hidden0 = self.init_to_hidden(init)
        src_e = self.compression(src)   # [B, bars, S, E]
        tar_e = self.compression(tar)   # [B, bars, T, E]

        # single lax.scan over the bar axis; params broadcast, hidden
        # carried (hidden_{k+1} = enc_h_k + dec_h_k, network.py:354)
        def bar_step(mdl, hidden, xs):
            src_bar_e, src_len_k, tar_bar_e, tar_len_k = xs
            _, enc_h = mdl.encoder(src_bar_e.transpose(1, 0, 2), hidden,
                                   deterministic=deterministic,
                                   lengths=src_len_k)
            dec_out, dec_h = mdl.decoder(tar_bar_e.transpose(1, 0, 2),
                                         enc_h,
                                         deterministic=deterministic,
                                         lengths=tar_len_k)
            return enc_h + dec_h, dec_out.transpose(1, 0, 2)

        bar_scan = nn.scan(
            bar_step,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1,
            out_axes=1,
        )
        _, dec_outs = bar_scan(self, hidden0,
                               (src_e, src_len, tar_e, tar_len))
        # dec_outs: [B, bars, T, H]
        return self.final_predict(dec_outs)

    # -- generation -------------------------------------------------------------

    def encode_bar(self, src_bar_e: jnp.ndarray, hidden: jnp.ndarray,
                   lengths: jnp.ndarray) -> jnp.ndarray:
        """One melody bar -> encoder hidden. src_bar_e: [B, S, E]."""
        _, enc_h = self.encoder(src_bar_e.transpose(1, 0, 2), hidden,
                                deterministic=True, lengths=lengths)
        return enc_h

    def decode_compound_step(self, compound: jnp.ndarray,
                             hidden: jnp.ndarray):
        """One decoder step. compound: [B, 7] -> (logits [B, 3, mx_dim],
        hidden)."""
        x = self.compression(compound)
        out, hidden = self.decoder.step(x, hidden)
        return self.final_predict(out), hidden
