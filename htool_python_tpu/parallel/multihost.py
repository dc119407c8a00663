"""Multi-host execution groundwork.

The reference scales across nodes with MPI (SURVEY.md §2.3); the TPU-native
story is `jax.distributed` + a mesh laid out so the partition axis crosses
hosts over DCN while everything inside a host rides ICI.  One process per
host; every process executes the same SPMD program; arrays placed with
`jax.device_put(host_value, NamedSharding(mesh, spec))` — each process
materializes only its addressable shards.

BASELINE.md north star: >= 70% scaling efficiency to N >= 2 hosts — the
enabler is that ShardedDistributedOperator's product is one all_gather of
the source vector (DCN-crossing, overlapped by XLA) per apply, while the
heavy block-row data never moves.
"""

from __future__ import annotations

import os

import numpy as np


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Initialize `jax.distributed` for multi-host execution.

    Arguments default to the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); on TPU
    pods all three are auto-detected by jax and may be omitted entirely.
    No-op (returns False) when neither arguments nor env are present —
    single-process runs stay untouched.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    auto_tpu = os.environ.get("TPU_WORKER_HOSTNAMES") is not None
    if coordinator_address is None and not auto_tpu:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_global_mesh(n_partitions: int | None = None, axis: str = "p"):
    """1-D partition mesh over ALL devices (all hosts).

    Devices are ordered host-major (every process's jax.devices() returns
    the same global list ordered by process), so consecutive partitions
    land on the same host: the partition axis crosses DCN only at host
    boundaries and the all_gather's intra-host hops ride ICI.
    """
    import jax
    from jax.sharding import Mesh

    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = n_partitions or len(devs)
    if n > len(devs):
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))


def make_hybrid_mesh(per_host: int | None = None, axis_dcn: str = "host",
                     axis_ici: str = "p"):
    """2-D (hosts x per-host-devices) mesh via mesh_utils'
    hybrid layout — the shape to use when a computation wants explicit
    control over which collectives cross DCN (e.g. hierarchical
    reductions for the coarse operator E = Z^H A Z)."""
    import jax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    n_hosts = max(d.process_index for d in jax.devices()) + 1
    per_host = per_host or (len(jax.devices()) // n_hosts)
    if n_hosts == 1:
        devs = np.array(jax.devices()[:per_host]).reshape(1, per_host)
    else:
        try:
            # TPU pods: topology-aware layout (needs slice metadata)
            devs = mesh_utils.create_hybrid_device_mesh(
                (1, per_host), (n_hosts, 1))
        except ValueError:
            # CPU multi-process (the dryrun) and hosts without slice
            # metadata: process-major reshape gives the same host-contiguous
            # layout
            devs = np.array(sorted(jax.devices(),
                                   key=lambda d: (d.process_index, d.id)))
            devs = devs.reshape(n_hosts, per_host)
    return Mesh(devs, (axis_dcn, axis_ici))


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    """True on the process that should print/plot (the reference's
    'rank 0 prints' convention)."""
    import jax

    return jax.process_index() == 0
