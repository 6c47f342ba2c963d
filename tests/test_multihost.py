"""REAL multi-process exercise of the multihost input path.

`multihost_shard_batch` (parallel/mesh.py) wraps
jax.make_array_from_process_local_data — the multi-host input-pipeline
primitive (SURVEY.md §5 distributed-comm row). Until round 4 it had
only ever run on a single process, where it degenerates to
shard_batch. This test launches TWO OS processes, each owning 4
virtual CPU devices of one shared 8-device "cluster" (gloo-backed
jax.distributed, the CPU stand-in for a 2-host ICI/DCN pod), has each
contribute its local half of the global batch, runs one jitted dp=8
train step, and locks:

* both processes observe the SAME loss and post-update parameter
  checksum (the step really ran on one global mesh), and
* that loss equals the single-process 8-device reference for the same
  global batch to float tolerance (gloo vs single-process reduction
  order may legally differ in the last ulps).
"""
import os
import re
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_driver.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_multihost_shard_batch_two_processes():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)  # the driver forces cpu via config
    env.pop("MG_TPU_TESTS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, DRIVER, str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    results = {}
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, f"pid {pid}:\n{out[-3000:]}"
        m = re.search(r"MHRESULT pid=(\d+) loss=([\d.eE+-]+) "
                      r"csum=([\d.eE+-]+)", out)
        assert m, f"pid {pid} produced no MHRESULT:\n{out[-3000:]}"
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))

    # both processes computed on ONE global mesh -> identical outcomes
    assert results[0] == results[1], results

    # single-process 8-device reference on the same global batch
    from musicgeneration_tpu.models import MusicTransformer
    from musicgeneration_tpu.parallel.mesh import make_mesh, shard_batch
    from musicgeneration_tpu.train.trainer import (
        TrainerConfig,
        create_train_state,
        make_train_step,
    )

    vocab, seq = 37, 32
    mesh = make_mesh(dp=8)
    model = MusicTransformer(vocab_size=vocab, num_layers=1, d_model=64,
                             max_seq=seq, dropout_rate=0.0)
    cfg = TrainerConfig(vocab_size=vocab, pad_id=vocab - 1, d_model=64)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 8), jnp.int32))
    r = np.random.RandomState(7)
    gx = r.randint(0, vocab - 1, size=(8, seq)).astype(np.int32)
    gy = np.roll(gx, -1, axis=1)
    batch = shard_batch(mesh, {"x": gx, "y": gy})
    step = jax.jit(make_train_step(model, tx, cfg))
    _, metrics = step(state, batch["x"], batch["y"])
    ref_loss = float(jax.device_get(metrics["loss"]))
    np.testing.assert_allclose(results[0][0], ref_loss, rtol=1e-6)
