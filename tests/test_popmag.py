"""PoPMAG: MuMIDI compound packing, model forward, bar-level generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu import vocab
from musicgeneration_tpu.data import mumidi_packing as mp
from musicgeneration_tpu.decode.popmag_generate import (
    flatten_arrangement,
    generate_arrangement,
)
from musicgeneration_tpu.models import PoPMAGRNN
from musicgeneration_tpu.tokenizers import MuMIDI_EventSeq
from tests import fixtures

R = vocab.MUMIDI.feat_ranges()


def _bars_from_fixture(tmp_path, which="melody"):
    path = str(tmp_path / "m.mid")
    fixtures.multitrack_midi(path, n_bars=4)
    mel, arr = MuMIDI_EventSeq.extract_split_events(path)
    seq = MuMIDI_EventSeq.to_array(mel if which == "melody" else arr)
    return MuMIDI_EventSeq.segmentation(seq)


class TestPacking:
    def test_head_layout_constants(self):
        # network.py:48-53
        assert mp.SHIFT == (289, 1, 257)
        assert mp.OUT_LEN == (196, 256, 32)
        assert mp.MX_DIM == 256
        assert mp.compound_vocab_size() == 485 + 188

    def test_compound_rows_reconstruct_tokens(self, tmp_path):
        """Every note triple collapses to one row whose slots hold the
        original ids; positions/tempo keep their running values."""
        bars = _bars_from_fixture(tmp_path)
        packed, lens = mp.pack_compound(bars)
        assert len(packed) == len(bars)
        for bar_tokens, rows in zip(bars, packed):
            toks = [int(t) for t in bar_tokens]
            # collect note triples from the raw stream
            triples = [
                (toks[i], toks[i + 1], toks[i + 2])
                for i in range(len(toks) - 2)
                if toks[i] in R["note_velocity"]
                and toks[i + 1] in R["note_on"]
                and toks[i + 2] in R["note_duration"]
            ]
            note_rows = [tuple(r[[6, 4, 5]]) for r in rows
                         if r[4] in R["note_on"]]
            assert [(v, p, d) for v, p, d in triples] == [
                (int(v), int(p), int(d)) for v, p, d in note_rows]

    def test_labels_align_with_decoder_input(self, tmp_path):
        """tar (delta=-1) and labels must have the same per-bar length
        (tar[t] predicts label[t], FastBatchify data.py:442-463)."""
        bars = _bars_from_fixture(tmp_path, "arrangement")
        bars = [np.append(b, mp.BAR_TOKEN) for b in bars]
        tar, tar_lens = mp.pack_compound(bars, delta=-1)
        labels, masks = mp.pack_labels(bars)
        for t, l, m in zip(tar, labels, masks):
            assert len(t) == len(l) == len(m)

    def test_label_ids_in_head_ranges(self, tmp_path):
        bars = _bars_from_fixture(tmp_path, "arrangement")
        bars = [np.append(b, mp.BAR_TOKEN) for b in bars]
        labels, masks = mp.pack_labels(bars)
        for lab, msk in zip(labels, masks):
            head0 = lab[:, 0][msk[:, 0] == 1]
            assert head0.min() >= 0 and head0.max() < mp.OUT_LEN[0]
            head1 = lab[:, 1][msk[:, 1] == 1]
            if head1.size:
                assert head1.min() >= 0 and head1.max() < mp.OUT_LEN[1]
            head2 = lab[:, 2][msk[:, 2] == 1]
            if head2.size:
                assert head2.min() >= 0 and head2.max() < mp.OUT_LEN[2]

    def test_pack_batch_shapes(self, tmp_path):
        mel = _bars_from_fixture(tmp_path, "melody")
        arr = _bars_from_fixture(tmp_path, "arrangement")
        batch = mp.pack_batch([(mel, arr), (mel[:2], arr[:2])])
        b, bars, blen, w = batch.src.shape
        assert b == 2 and w == 7
        assert batch.labels.shape[:3] == batch.tar.shape[:3]
        assert batch.label_mask.shape == batch.labels.shape
        assert (batch.src_len >= 1).all() and (batch.tar_len >= 1).all()


class TestPoPMAGModel:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("popmag")
        mel = _bars_from_fixture(tmp, "melody")
        arr = _bars_from_fixture(tmp, "arrangement")
        batch = mp.pack_batch([(mel, arr), (mel, arr)])
        model = PoPMAGRNN(embed_dim=32, hidden_dim=32, num_layers=2,
                          dropout_rate=0.0)
        init = jnp.zeros((2, model.init_dim))
        params = model.init(
            jax.random.PRNGKey(0), init,
            jnp.asarray(batch.src), jnp.asarray(batch.src_len),
            jnp.asarray(batch.tar), jnp.asarray(batch.tar_len))
        return model, params, batch

    def test_train_forward_shapes_and_masked_loss(self, setup):
        model, params, batch = setup
        init = jnp.zeros((2, model.init_dim))
        logits = jax.jit(model.apply)(
            params, init,
            jnp.asarray(batch.src), jnp.asarray(batch.src_len),
            jnp.asarray(batch.tar), jnp.asarray(batch.tar_len))
        b, bars, blen, _ = batch.tar.shape
        assert logits.shape == (b, bars, blen, 3, mp.MX_DIM)
        # masked CE like the reference train loop (train.py:252-256)
        labels = jnp.asarray(batch.labels)
        mask = jnp.asarray(batch.label_mask, jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None],
                                   axis=-1)[..., 0]
        loss = (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        assert np.isfinite(float(loss))

    def test_head_padding_is_masked(self, setup):
        model, params, batch = setup
        init = jnp.zeros((2, model.init_dim))
        logits = model.apply(
            params, init,
            jnp.asarray(batch.src), jnp.asarray(batch.src_len),
            jnp.asarray(batch.tar), jnp.asarray(batch.tar_len))
        # head 0 pads beyond 196, head 2 beyond 32 with -1e10
        assert float(logits[..., 0, mp.OUT_LEN[0]:].max()) <= -1e9
        assert float(logits[..., 2, mp.OUT_LEN[2]:].max()) <= -1e9

    def test_generate_arrangement(self, setup):
        model, params, batch = setup
        init = jnp.zeros((2, model.init_dim))
        tokens, valid = generate_arrangement(
            model, params["params"] if "params" in params else params,
            init, jnp.asarray(batch.src), jnp.asarray(batch.src_len),
            jax.random.PRNGKey(0), n_target_bar=2, max_steps=24,
            greedy=False, temperature=1.0)
        assert tokens.shape == (2, 2, 24, 3)
        seqs = flatten_arrangement(tokens, valid)
        assert len(seqs) == 2
        for s in seqs:
            assert s[0] == mp.BAR_TOKEN
            # every emitted token is a valid event id
            assert (s >= 0).all() and (s < mp.EVENT_DIM).all()
        # emitted event types exclude note_on/duration in slot 1
        t0 = np.asarray(tokens[0, 0, :, 0])
        v0 = np.asarray(valid[0, 0, :, 0])
        for tok in t0[v0]:
            assert tok >= mp.SHIFT[0]
