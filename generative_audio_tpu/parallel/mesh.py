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
           "subband_sharding"]


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
