"""Subprocess driver for the REAL multi-process multihost test.

Run as: python multihost_driver.py <process_id> <num_processes> <port>
with XLA_FLAGS=--xla_force_host_platform_device_count=<n_local>.

Each process contributes its LOCAL half of a global dp batch via
multihost_shard_batch (jax.make_array_from_process_local_data under a
2-process gloo-backed CPU "cluster"), runs ONE jitted data-parallel
train step over the global 8-device mesh, and prints the resulting
loss + a parameter checksum. The parent test compares these across
processes and against the single-process 8-device reference
(tests/test_multihost.py).
"""
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

import jax  # noqa: E402

# the axon sitecustomize pins JAX_PLATFORMS; the config API still wins
# as long as no backend has been initialized (tests/conftest.py does
# the same)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from musicgeneration_tpu.models import MusicTransformer  # noqa: E402
from musicgeneration_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    multihost_shard_batch,
)
from musicgeneration_tpu.train.trainer import (  # noqa: E402
    TrainerConfig,
    create_train_state,
    make_train_step,
)

GLOBAL_BATCH, SEQ, VOCAB = 8, 32, 37

assert len(jax.devices()) == 8, jax.devices()
mesh = make_mesh(dp=8)

model = MusicTransformer(vocab_size=VOCAB, num_layers=1, d_model=64,
                         max_seq=SEQ, dropout_rate=0.0)
cfg = TrainerConfig(vocab_size=VOCAB, pad_id=VOCAB - 1, d_model=64)
state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((1, 8), jnp.int32))

# deterministic GLOBAL batch; each process contributes its own rows
r = np.random.RandomState(7)
gx = r.randint(0, VOCAB - 1, size=(GLOBAL_BATCH, SEQ)).astype(np.int32)
gy = np.roll(gx, -1, axis=1)
rows = GLOBAL_BATCH // nproc
lo = pid * rows
batch = multihost_shard_batch(mesh, {"x": gx[lo:lo + rows],
                                     "y": gy[lo:lo + rows]})

step = jax.jit(make_train_step(model, tx, cfg))
state, metrics = step(state, batch["x"], batch["y"])
loss = float(jax.device_get(metrics["loss"]))
# param checksum over the updated tree (replicated -> identical
# everywhere if the multihost step is correct)
leaves = jax.tree.leaves(state.params)
csum = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float64))) for l in leaves))
print(f"MHRESULT pid={pid} loss={loss:.10f} csum={csum:.6f}", flush=True)
