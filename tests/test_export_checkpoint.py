"""Checkpoint EXPORT to the reference's torch formats
(cli.export_checkpoint — the inverse of cli.import_checkpoint,
completing two-way interop).

Locks: (1) exact export->import ROUND TRIP for all four families (the
re-imported param tree is bit-equal to the original); (2) each exported
file loads into the EXECUTING reference with load_state_dict(strict=
True) and the reference's forward matches our model's logits — proving
the on-disk format is genuinely the reference's, not merely our
inverse's."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from musicgeneration_tpu.cli.export_checkpoint import (  # noqa: E402
    export_torch_checkpoint,
)
from musicgeneration_tpu.cli.import_checkpoint import (  # noqa: E402
    import_torch_checkpoint,
)
from musicgeneration_tpu.cli.train import TrainCLIConfig  # noqa: E402
from musicgeneration_tpu.utils.checkpoint import (  # noqa: E402
    restore_checkpoint,
    save_checkpoint,
)

from . import reference_shim as rs  # noqa: E402


def _save_ours(tmp_path, model_name, params, model_kwargs, step=5):
    ckpt = tmp_path / f"ckpt_{model_name}"
    cfg = TrainCLIConfig(model=model_name)
    save_checkpoint(str(ckpt), step, {"params": params},
                    config={"cli": cfg.to_dict(), "scheme": "midilike",
                            "model_kwargs": model_kwargs})
    return str(ckpt)


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: keys {set(a)} != {set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k], np.float32), np.asarray(b[k]),
                err_msg=f"{path}/{k}")


def _roundtrip(tmp_path, model_name, params, model_kwargs):
    ckpt = _save_ours(tmp_path, model_name, params, model_kwargs)
    pth = str(tmp_path / "exported.pth")
    export_torch_checkpoint(ckpt, pth)
    back = str(tmp_path / "reimported")
    import_torch_checkpoint(pth, back, model=model_name,
                            scheme="midilike")
    got = restore_checkpoint(back)["state"]["params"]
    _tree_equal(params, got)
    return pth


def test_roundtrip_music_transformer(tmp_path):
    from musicgeneration_tpu.models import MusicTransformer

    model = MusicTransformer(vocab_size=309, num_layers=2, d_model=64,
                             max_seq=64, dropout_rate=0.0)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    kwargs = dict(vocab_size=309, num_layers=2, d_model=64, max_seq=64)
    pth = _roundtrip(tmp_path, "music_transformer", params, kwargs)

    # and the exported file drives the EXECUTING reference: strict
    # state_dict load + logit parity on a padded batch
    mt_mod = rs.load_music_transformer()
    ref = mt_mod.network.MusicTransformer(
        embedding_dim=64, vocab_size=309, num_layer=2, max_seq=64,
        dropout=0.0)
    obj = torch.load(pth, map_location="cpu", weights_only=True)
    assert obj["epoch"] == 5
    ref.load_state_dict(obj["net"], strict=True)
    ref.eval()
    rng = np.random.default_rng(0)
    x = rng.integers(0, 308, size=(2, 64))
    x[0, -5:] = 308
    with torch.no_grad():
        out = ref(torch.from_numpy(x).to(torch.long))
    ref_logits = out[0].numpy() if isinstance(out, tuple) else out.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref_logits, rtol=2e-4, atol=2e-4)


def test_roundtrip_event_rnn(tmp_path):
    from musicgeneration_tpu.models.event_rnn import EventMelodyRNN

    model = EventMelodyRNN(event_dim=32, init_dim=4, hidden_dim=16,
                           num_layers=2, dropout_rate=0.0)
    init = jnp.zeros((2, 4))
    params = model.init(jax.random.PRNGKey(1), init,
                        jnp.zeros((3, 2), jnp.int32))["params"]
    kwargs = dict(event_dim=32, init_dim=4, hidden_dim=16, num_layers=2)
    pth = _roundtrip(tmp_path, "event_rnn", params, kwargs)

    er = rs.load_event_rnn()
    ref = er.Event_Melody_RNN(
        event_dim=32, init_dim=4, hidden_dim=16, rnn_layers=2,
        dropout=0.0)
    sd = torch.load(pth, map_location="cpu", weights_only=True)
    ref.load_state_dict(sd, strict=True)
    ref.eval()


def test_roundtrip_performance_rnn(tmp_path):
    from musicgeneration_tpu.models.performance_rnn import (
        PerformanceRNN,
    )

    model = PerformanceRNN(event_dim=24, control_dim=8, init_dim=4,
                           hidden_dim=16, num_layers=2,
                           dropout_rate=0.0)
    init = jnp.zeros((2, 4))
    ev = jnp.zeros((3, 2), jnp.int32)
    ctrl = jnp.zeros((3, 2, 8))
    params = model.init(jax.random.PRNGKey(2), init, ev, ctrl)["params"]
    kwargs = dict(event_dim=24, control_dim=8, init_dim=4,
                  hidden_dim=16, num_layers=2, dropout_rate=0.0)
    pth = _roundtrip(tmp_path, "performance_rnn", params, kwargs)

    prnn = rs.load_performance_rnn()
    obj = torch.load(pth, map_location="cpu", weights_only=True)
    assert obj["model_config"]["control_dim"] == 8
    assert obj["model_config"]["gru_layers"] == 2
    ref = prnn.PerformanceRNN(
        event_dim=24, control_dim=8, init_dim=4, hidden_dim=16,
        gru_layers=2, gru_dropout=0.0)
    ref.load_state_dict(obj["model_state"], strict=True)
    ref.eval()


def test_roundtrip_popmag(tmp_path):
    from musicgeneration_tpu.models.popmag import PoPMAGRNN

    model = PoPMAGRNN(embed_dim=16, hidden_dim=16, num_layers=1,
                      init_dim=4, dropout_rate=0.0)
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.integers(0, 485, size=(2, 2, 6, 7)))
    src_len = jnp.asarray(rng.integers(1, 7, size=(2, 2)))
    init = jnp.zeros((2, 4))
    params = model.init(jax.random.PRNGKey(3), init, src, src_len,
                        src, src_len)["params"]
    kwargs = dict(embed_dim=16, hidden_dim=16, num_layers=1, init_dim=4)
    _roundtrip(tmp_path, "popmag", params, kwargs)


def test_export_rejects_unexportable(tmp_path):
    ckpt = _save_ours(tmp_path, "cp_transformer", {"x": np.zeros(3)},
                      {})
    with pytest.raises(SystemExit, match="torch format"):
        export_torch_checkpoint(ckpt, str(tmp_path / "no.pth"))


def test_export_rejects_nonreference_head_dim():
    """head_dim != 64 has no reference analogue (the reference
    hard-codes h = d_model//64, E = [max_seq, 64]); exporting must
    refuse instead of writing a .pth strict-load will reject."""
    from musicgeneration_tpu.cli.export_checkpoint import (
        export_music_transformer,
    )
    params = {"layer_0": {"rga": {"E": np.zeros((8, 128), np.float32)}}}
    with pytest.raises(ValueError, match="head_dim=128"):
        export_music_transformer(params, {}, 0)
