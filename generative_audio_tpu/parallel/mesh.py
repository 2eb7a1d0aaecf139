"""Mesh construction and sharding policy.

The reference's only parallelism is single-host DDP (SURVEY.md §2.9:
tools/train.py:117-120 mp.spawn + gloo + DistributedSampler). The TPU-native
equivalent is a jax.sharding.Mesh with two axes:

  * "data"  — batch data parallelism over ICI/DCN. Gradients are averaged by
    the psum XLA inserts under jit; no user-level collectives.
  * "band"  — sub-band (frequency) parallelism: FullSubNet's hot sub-band
    LSTM runs over a fused B*F batch of independent per-frequency sequences,
    so that axis shards embarrassingly across chips. This is the honest
    TPU analogue of the reference's drop_band decimation and stands in for
    tensor/sequence parallelism in a model this size (8.7M params).

Params are replicated (tiny model); batches are sharded ("data", on axis 0);
inside the model the [B*F, ...] sub-band batch carries a
with_sharding_constraint over ("data", "band").
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "subband_sharding", "place_batch", "replicate_state"]


def make_mesh(data: Optional[int] = None, band: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("data", "band") mesh over the available devices.

    Defaults to all devices on the data axis. `band` > 1 splits chips
    between batch- and frequency-parallelism.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % band == 0, f"{n} devices not divisible by band={band}"
        data = n // band
    assert data * band == n, (
        f"mesh {data}x{band} != {n} available devices")
    dev_array = np.asarray(devices).reshape(data, band)
    return Mesh(dev_array, axis_names=("data", "band"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 over "data", replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def subband_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for the fused [B*F, C, T] sub-band batch: spread over BOTH
    mesh axes — every chip works on a slice of the (batch x frequency) grid."""
    return NamedSharding(mesh, P(("data", "band"), None, None))


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with axis-0 "data" sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch)


def _mesh_spans_processes(mesh: Mesh) -> bool:
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def place_batch(batch, mesh: Optional[Mesh]):
    """Data-shard a host batch pytree over the mesh (no-op without one).

    The uniform batch-placement entry all trainers use:
      * mesh None            -> pass through (single-device trainer)
      * already a jax.Array  -> pass through (e.g. DistributedBatches
                                 output, already globally sharded)
      * local mesh           -> device_put with axis-0 "data" sharding
      * multi-process mesh   -> every host holds the SAME full batch
                                 (deterministic loader order); each
                                 contributes its contiguous local rows via
                                 make_array_from_process_local_data — no
                                 host-to-host batch traffic
    """
    if mesh is None:
        return batch
    spans = _mesh_spans_processes(mesh)

    def put(x):
        if isinstance(x, jax.Array) and not isinstance(x, np.ndarray):
            return x
        x = np.asarray(x)
        n_data = mesh.shape.get("data", 1)
        if x.ndim == 0 or x.shape[0] % n_data != 0:
            # ragged tail (e.g. the last eval chunk): replicate — every
            # device computes the same full batch, result unchanged
            if not spans:
                return jax.device_put(x, replicated(mesh))
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P()), x)
        sharding = data_sharding(mesh, x.ndim)
        if not spans:
            return jax.device_put(x, sharding)
        n = jax.process_count()
        assert x.shape[0] % n == 0, (
            f"global batch {x.shape[0]} not divisible by {n} processes")
        per = x.shape[0] // n
        start = jax.process_index() * per
        return jax.make_array_from_process_local_data(
            sharding, x[start:start + per])

    return jax.tree.map(put, batch)


def replicate_state(state, mesh: Optional[Mesh]):
    """Replicate a TrainState (or any pytree) over a LOCAL mesh; no-op
    without one. Multi-process meshes cannot be addressed by device_put —
    callers there lift state with distributed.replicate_from_coordinator
    (the cli.train `_dist_state` path)."""
    if mesh is None or _mesh_spans_processes(mesh):
        return state
    return jax.device_put(state, replicated(mesh))
