"""Multi-process (multi-host) runtime — the TPU-native equivalent of the
reference's single-host DDP launcher.

Reference: tools/train.py:22-120 (mp.spawn one process per GPU,
dist.init_process_group("gloo"), DistributedSampler per-rank data shard) and
nppc/auxil.py:212-252 (DDPManager rank/size helpers).

On a TPU pod every host runs the SAME program. `initialize()` wires the
processes together (jax.distributed), after which `jax.devices()` is the
GLOBAL device set and a `make_mesh()` over it spans hosts; XLA inserts the
cross-host collectives (gradient psum rides ICI/DCN — no user-level
backend, the gloo/NCCL analogue is compiled in). Data stays per-host: each
process loads its slice of the global batch (the DistributedSampler
analogue) and `global_batch_from_local` assembles the sharded global array
without gathering onto any single host.

For development without a pod, `cli/launch.py` spawns N local processes on
the CPU backend (the mp.spawn analogue) and the helpers here read its
environment contract:

    GAT_COORDINATOR   host:port of process 0's coordinator service
    GAT_NUM_PROCESSES world size
    GAT_PROCESS_ID    this process's rank
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

__all__ = [
    "initialize", "is_initialized", "process_index", "process_count",
    "is_coordinator", "local_slice", "global_batch_from_local",
    "per_process_batch_size", "DistributedBatches", "replicate_global",
    "replicate_from_coordinator",
]

_ENV_COORD = "GAT_COORDINATOR"
_ENV_NPROC = "GAT_NUM_PROCESSES"
_ENV_PID = "GAT_PROCESS_ID"

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               auto: bool = False) -> bool:
    """Connect this process to the job (jax.distributed.initialize).

    Arguments default to the GAT_* env contract written by cli/launch.py.
    On a real multi-host TPU pod there is no env contract — pass
    `auto=True` (cli/train.py `--distributed`) and jax autodetects the
    slice topology from the TPU runtime. A single-process job (no env, no
    args, no auto) is a no-op — the entry points call this
    unconditionally, mirroring the reference's always-on
    init_process_group (tools/train.py:33).

    Returns True when a multi-process runtime was started.
    """
    global _initialized
    if _initialized:
        return process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(_ENV_COORD)
    if num_processes is None and _ENV_NPROC in os.environ:
        num_processes = int(os.environ[_ENV_NPROC])
    if process_id is None and _ENV_PID in os.environ:
        process_id = int(os.environ[_ENV_PID])

    if coordinator_address is None and (num_processes is None
                                        or num_processes <= 1):
        if not auto:
            return False  # single-process run
        # pod autodetection (cloud TPU runtime env)
        jax.distributed.initialize()
        _initialized = True
        return jax.process_count() > 1

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True
    return True


def is_initialized() -> bool:
    return _initialized


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    """Rank-0 check — gates checkpoint writes/logging like the reference's
    `rank == 0` guards (base_trainer.py:160, tools/train.py:58)."""
    return jax.process_index() == 0


def per_process_batch_size(global_batch_size: int) -> int:
    """This process's share of the global batch (DistributedSampler
    analogue: equal contiguous shards, so global_batch_size must divide)."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} not divisible by "
        f"{n} processes")
    return global_batch_size // n


def local_slice(global_batch_size: int) -> Tuple[int, int]:
    """[start, stop) of this process's rows in the global batch — feed these
    indices to the host-side dataset (the DistributedSampler contract)."""
    per = per_process_batch_size(global_batch_size)
    start = jax.process_index() * per
    return start, start + per


def global_batch_from_local(mesh, local_batch):
    """Assemble the global data-sharded batch from per-process host arrays.

    local_batch is a pytree of np arrays holding THIS process's rows
    (axis 0). The result is a pytree of global jax.Arrays sharded over the
    mesh's "data" axis; no host ever materializes the full batch.

    Non-numeric / scalar leaves (e.g. collate_inpainting's metadata dict of
    paths, transcriptions, mask indices) stay PROCESS-LOCAL, matching torch
    DDP semantics where each rank's loader yields its own metadata — only
    model tensors become global arrays.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0 or not (np.issubdtype(x.dtype, np.number)
                               or x.dtype == np.bool_):
            return x[()] if x.ndim == 0 else x
        sharding = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, local_batch)


def replicate_global(mesh, tree):
    """Lift a per-process pytree (already IDENTICAL on every process, e.g.
    deterministic seed-0 init) into globally-replicated jax.Arrays over the
    mesh — the multi-process analogue of device_put(tree, replicated(mesh)),
    which cannot address remote devices."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def put(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return jax.tree.map(put, tree)


def replicate_from_coordinator(mesh, tree):
    """replicate_global, but forcing every process to carry PROCESS 0's
    values. Use for state that is only guaranteed consistent on rank 0 —
    e.g. a checkpoint resume where the checkpoint directory might not be
    on a shared filesystem, so non-coordinator ranks may have restored
    nothing (fresh init) while rank 0 restored step N. replicate_global
    would silently lift those divergent values into one "replicated"
    array; this broadcasts rank 0's first."""
    from jax.experimental import multihost_utils

    tree = multihost_utils.broadcast_one_to_all(tree)
    return replicate_global(mesh, tree)


class DistributedBatches:
    """Wrap a per-process BatchLoader (host_id/num_hosts sharded) so each
    yielded batch is the GLOBAL data-sharded jax.Array pytree — trainers
    consume it unchanged (`for noisy, clean in loader`)."""

    def __init__(self, loader, mesh):
        self.loader = loader
        self.mesh = mesh

    def __len__(self) -> int:
        return len(self.loader)

    def __iter__(self):
        for batch in self.loader:
            yield global_batch_from_local(self.mesh, batch)
