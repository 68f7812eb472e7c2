"""Device mesh construction + multi-host bootstrap.

TPU-native replacement for the communication-backend role NCCL/MPI would play
in a GPU system (the reference had none, SURVEY.md §2.2/§5): XLA collectives
over ICI within a slice, DCN across hosts.
"""

from __future__ import annotations

import logging

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

logger = logging.getLogger(__name__)

SHARD_AXIS = "shard"


REPLICA_AXIS = "replica"


def make_serving_mesh(replicas: int, shards: int,
                      replica_axis: str = REPLICA_AXIS,
                      shard_axis: str = SHARD_AXIS) -> Mesh:
    """2-D serving mesh: the store replicates across `replica` groups (each
    serving its own slice of the query batch — throughput scaling) and
    shards rows across `shard` within a group (capacity scaling). The
    reference could do neither (workers pinned to 1, main.py:395)."""
    if replicas * shards > len(jax.devices()):
        raise ValueError(
            f"mesh {replicas}x{shards} exceeds {len(jax.devices())} devices")
    return jax.make_mesh((replicas, shards), (replica_axis, shard_axis),
                         devices=jax.devices()[: replicas * shards])


def make_device_mesh(n_devices: int | None = None,
                     axis_name: str = SHARD_AXIS) -> Mesh:
    """1-D mesh over the store's row dimension.

    A vector DB scales along one axis — corpus rows — so the mesh is 1-D; the
    batch dimension is replicated (every chip sees every query, each scans
    its own rows). On a v5e-8 this lays the all-gather of k·P candidates on
    the ICI ring.
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (axis_name,), devices=devices)


def row_sharding(mesh: Mesh, axis_name: str = SHARD_AXIS) -> NamedSharding:
    """Rows split across the mesh, features contiguous per chip."""
    return NamedSharding(mesh, PartitionSpec(axis_name, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def bootstrap_distributed(coordinator_address: str | None = None,
                          num_processes: int | None = None,
                          process_id: int | None = None) -> None:
    """Multi-host process bootstrap (DCN). No-op if already initialized or
    single-process; safe to call unconditionally at server startup."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        logger.info("jax.distributed initialized: process %d/%d",
                    jax.process_index(), jax.process_count())
    except (RuntimeError, ValueError) as e:
        logger.debug("jax.distributed not initialized (%s); single-host mode", e)
