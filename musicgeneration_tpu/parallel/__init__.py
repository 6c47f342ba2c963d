"""Parallelism: device meshes and sharding rules.

The reference's only multi-device machinery is a vendored single-process
DataParallel built on manual AllReduce autograd functions
(mg/model/MusicTransformer/parallel.py). The TPU-native equivalent is
compiler-driven SPMD: build a `jax.sharding.Mesh` over ('data', 'model'),
annotate batch and parameter shardings, and let XLA insert the ICI
collectives that parallel.py hand-rolled (SURVEY.md §5)."""

from .mesh import (
    batch_sharding,
    make_mesh,
    multihost_shard_batch,
    param_shardings,
    replicated,
    shard_batch,
)
from .pipeline import make_pipeline_apply, pipeline_param_shardings
from .ring_attention import ring_relative_attention
from .ring_attention_pallas import ring_relative_attention_pallas

__all__ = [
    "make_pipeline_apply",
    "pipeline_param_shardings",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_shardings",
    "shard_batch",
    "multihost_shard_batch",
    "ring_relative_attention",
    "ring_relative_attention_pallas",
]
