"""Aux-subsystem tests: checkpoint/resume, config overrides, metrics,
train-loop NaN guard (SURVEY.md §5 parity items)."""

import dataclasses
import io
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgeneration_tpu.utils import (
    Checkpointer,
    MetricsLogger,
    apply_overrides,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from musicgeneration_tpu.utils.config import Config


# ---------------------------------------------------------------- checkpoint

def _tree():
    return {
        "params": {"w": jnp.arange(6.0).reshape(2, 3),
                   "b": jnp.zeros(3)},
        "step": jnp.asarray(7, jnp.int32),
    }


def test_checkpoint_roundtrip(tmp_path):
    d = str(tmp_path / "ckpt")
    state = _tree()
    save_checkpoint(d, 7, state, config={"d_model": 256})
    payload = restore_checkpoint(d)
    assert payload["step"] == 7
    assert payload["config"]["d_model"] == 256
    np.testing.assert_array_equal(payload["state"]["params"]["w"],
                                  np.arange(6.0).reshape(2, 3))


def test_checkpoint_latest_and_gc(tmp_path):
    d = str(tmp_path / "ckpt")
    for s in [1, 2, 3, 4, 5]:
        save_checkpoint(d, s, _tree(), keep=2)
    names = sorted(os.listdir(d))
    assert names == ["step-4.ckpt", "step-5.ckpt"]
    assert latest_checkpoint(d).endswith("step-5.ckpt")


def test_checkpoint_atomicity_no_tmp_left(tmp_path):
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 1, _tree())
    assert not any(n.endswith(".tmp") for n in os.listdir(d))


def test_checkpointer_restore_or(tmp_path):
    d = str(tmp_path / "ckpt")
    ckpt = Checkpointer(d, every=2)
    init = _tree()
    state, start = ckpt.restore_or(init)
    assert start == 0
    # steps 0..3: saves at step 1 and 3 ((step+1) % 2 == 0)
    for step in range(4):
        state = dict(state, step=jnp.asarray(step, jnp.int32))
        ckpt.maybe_save(step, state)
    state2, start2 = Checkpointer(d, every=2).restore_or(init)
    assert start2 == 4
    assert int(state2["step"]) == 3


def test_checkpointer_meta(tmp_path):
    ckpt = Checkpointer(str(tmp_path / "c"))
    ckpt.write_meta(cursor=123, shard="part-0")
    assert ckpt.read_meta() == {"cursor": 123, "shard": "part-0"}


# ------------------------------------------------------------------- config

@dataclasses.dataclass
class _Inner(Config):
    d_model: int = 256
    dropout: float = 0.1


@dataclasses.dataclass
class _Outer(Config):
    model: _Inner = dataclasses.field(default_factory=_Inner)
    batch_size: int = 8
    name: str = "mt"
    lr: float = 1.0
    use_remat: bool = False


def test_override_scalar_and_nested():
    cfg = apply_overrides(_Outer(), ["batch_size=32", "model.d_model=512",
                                     "use_remat=true", "name=remi"])
    assert cfg.batch_size == 32 and cfg.model.d_model == 512
    assert cfg.use_remat is True and cfg.name == "remi"
    # original untouched (functional update)
    assert _Outer().batch_size == 8


def test_override_rejects_unknown_and_no_eval():
    with pytest.raises(KeyError):
        apply_overrides(_Outer(), ["nope=1"])
    # an eval-style payload must come back as a plain string, not execute
    cfg = apply_overrides(_Outer(), ["name=__import__('os').getcwd()"])
    assert cfg.name == "__import__('os').getcwd()"


def test_config_dict_roundtrip():
    cfg = _Outer(batch_size=4, model=_Inner(d_model=128))
    back = _Outer.from_dict(cfg.to_dict())
    assert back == cfg


# ------------------------------------------------------------------ metrics

def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    buf = io.StringIO()
    log = MetricsLogger(path=path, stream=buf, every=2)
    for step in range(4):
        log.write(step, {"loss": jnp.asarray(1.5)}, tokens=100)
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert [r["step"] for r in lines] == [0, 2]
    assert lines[0]["loss"] == 1.5
    assert "steps_per_sec" in lines[1]
    assert lines[1]["tokens_per_sec"] > 0


# --------------------------------------------------------------- train loop

def test_run_loop_nan_guard_and_resume(tmp_path):
    from musicgeneration_tpu.train.loop import LoopConfig, run_loop
    from musicgeneration_tpu.train.trainer import TrainState

    # a fake train step whose loss is NaN on step 2: params must not move
    def train_step(state, x, y):
        loss = jnp.where(state.step == 2, jnp.nan, 1.0)
        new_params = jax.tree.map(lambda p: p + 1.0, state.params)
        new_state = state.replace(step=state.step + 1, params=new_params)
        return new_state, {"loss": loss, "accuracy": jnp.asarray(0.5)}

    state = TrainState(step=jnp.asarray(0, jnp.int32),
                       params={"w": jnp.zeros(())},
                       opt_state=(), dropout_rng=jax.random.PRNGKey(0))

    def batches():
        while True:
            yield (jnp.zeros((1,)), jnp.zeros((1,)))

    cfg = LoopConfig(total_steps=5, ckpt_dir=str(tmp_path / "ck"),
                     ckpt_every=2, log_every=100, eval_every=0,
                     metrics_path=str(tmp_path / "m.jsonl"))
    out = run_loop(state, train_step, batches(), cfg)
    # 5 steps, one skipped -> params advanced 4 times
    assert float(out.params["w"]) == 4.0
    assert int(out.step) == 5

    # resume picks up after the final forced save at step 4
    out2 = run_loop(state, train_step, batches(),
                    dataclasses.replace(cfg, total_steps=5))
    assert int(out2.step) == 5  # nothing to do, state restored


def test_restore_keeps_target_shardings(tmp_path):
    """Mesh-training resume: restored leaves must come back under the
    TARGET's shardings (FSDP/TP layout), not as unplaced host arrays."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from musicgeneration_tpu.parallel.mesh import make_mesh
    from musicgeneration_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    mesh = make_mesh(dp=4, tp=2)
    sh = NamedSharding(mesh, P("data", "model"))
    w = jax.device_put(jnp.arange(64.0).reshape(8, 8), sh)
    state = {"w": w, "b": jnp.zeros(3)}
    save_checkpoint(str(tmp_path), 0, state)
    restored = restore_checkpoint(str(tmp_path), target=state)["state"]
    assert restored["w"].sharding == sh
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(w))


def test_run_loop_interrupt_labels_last_completed_step(tmp_path):
    """A KeyboardInterrupt that fires AFTER the batch fetch but BEFORE
    step_fn completes must checkpoint the (previous-step) state with the
    previous step's label, so resume re-runs the interrupted step rather
    than skipping it (ADVICE round 1)."""
    from musicgeneration_tpu.train.loop import LoopConfig, run_loop
    from musicgeneration_tpu.train.trainer import TrainState
    from musicgeneration_tpu.utils.checkpoint import list_checkpoints

    def train_step(state, x, y):
        new_params = jax.tree.map(lambda p: p + 1.0, state.params)
        return (state.replace(step=state.step + 1, params=new_params),
                {"loss": jnp.asarray(1.0)})

    state = TrainState(step=jnp.asarray(0, jnp.int32),
                       params={"w": jnp.zeros(())},
                       opt_state=(), dropout_rng=jax.random.PRNGKey(0))

    def batches():
        # steps 0..2 run; fetching the batch for step 3 interrupts,
        # mimicking ^C while step 3 is in flight
        for _ in range(3):
            yield (jnp.zeros((1,)), jnp.zeros((1,)))
        raise KeyboardInterrupt

    cfg = LoopConfig(total_steps=10, ckpt_dir=str(tmp_path / "ck"),
                     ckpt_every=100, log_every=100, eval_every=0,
                     metrics_path=str(tmp_path / "m.jsonl"))
    out = run_loop(state, train_step, batches(), cfg)
    assert float(out.params["w"]) == 3.0
    # forced save must be labeled 2 (last COMPLETED step), not 3
    label, _ = list_checkpoints(str(tmp_path / "ck"))[-1]
    assert label == 2
    # resume: restore_or gives start=3 -> steps 3..9 run, params reach 10
    def more():
        while True:
            yield (jnp.zeros((1,)), jnp.zeros((1,)))
    out2 = run_loop(state, train_step, more(), cfg)
    assert float(out2.params["w"]) == 10.0


# ---------------------------------------------------------------- profiling

def test_timed_block_and_annotate():
    from musicgeneration_tpu.utils.profiling import annotate, timed_block

    sink = {}
    x = jnp.ones((64, 64))
    with timed_block("mm", sink, result=None):
        with annotate("matmul"):
            y = x @ x
    jax.block_until_ready(y)
    assert sink["mm"] > 0


def test_profile_trace_writes_files(tmp_path):
    from musicgeneration_tpu.utils.profiling import profile_trace

    d = str(tmp_path / "trace")
    with profile_trace(d):
        jax.block_until_ready(jnp.ones((32, 32)) @ jnp.ones((32, 32)))
    found = [f for root, _, files in os.walk(d) for f in files]
    assert found, "no trace files written"


def test_atomic_compile_cache_put(tmp_path):
    """enable_persistent_compile_cache patches jax's LRUCache.put to
    write entries atomically (tmp + os.replace): an entry round-trips,
    no .tmp remnants stay behind, and existing entries are not
    rewritten (jax's documented put semantics)."""
    from musicgeneration_tpu.utils.compile_cache import (
        _patch_atomic_cache_writes,
    )

    _patch_atomic_cache_writes()
    from jax._src import lru_cache as _lru

    assert _lru.LRUCache.put.__name__ == "atomic_put"
    cache = _lru.LRUCache(str(tmp_path), max_size=-1)
    cache.put("k1", b"payload")
    assert cache.get("k1") == b"payload"
    cache.put("k1", b"other")  # existing key: no rewrite
    assert cache.get("k1") == b"payload"
    leftovers = [p for p in os.listdir(tmp_path) if p.endswith(".tmp")]
    assert leftovers == []
