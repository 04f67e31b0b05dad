"""Stream-parallel device mesh: shard decode batches over TPU chips.

The Opus decode math has no cross-stream reductions (SURVEY.md §2.7): the
only distributed pattern is sharding the streams axis of every per-frame
tensor and of the device state pytree over the mesh. XLA then partitions
the jitted synthesis step with zero collectives on the hot path; ICI is
used only if streams migrate (elastic reassignment).

Mesh axes:
  streams — data parallelism over concurrent Opus streams (primary axis)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_stream_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), axis_names=("streams",))


def stream_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (streams) axis; replicate everything else."""
    return NamedSharding(mesh, P("streams"))


def shard_tree(tree, mesh: Mesh):
    """Place every leaf with its leading axis sharded over the mesh."""
    sh = stream_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
