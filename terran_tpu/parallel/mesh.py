"""Device mesh + sharding layer: the framework's scale-out story.

The reference is strictly single-device (no torch.distributed anywhere; see
SURVEY §2). The TPU-native equivalent is data parallelism over the
frame/batch axis on a 1-D ``data`` mesh: models here are tiny (<=65M
params), so weights are replicated and batches are sharded; XLA inserts
the (trivially few) collectives and the work rides ICI within a slice.
Multi-host deployments initialise ``jax.distributed`` and feed per-host
shards from per-host readers; this module only ever sees the local mesh.

Every jitted step in ``terran_tpu.pipeline`` accepts an optional mesh and
becomes multi-chip without further change; batches are padded up to a
multiple of the mesh size host-side.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(num_devices=None, axis_name=DATA_AXIS, devices=None):
    """A 1-D mesh over the first ``num_devices`` local devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh, axis_name=DATA_AXIS):
    """Shard the leading (batch/frame) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    """Full replication (used for model parameters)."""
    return NamedSharding(mesh, P())


def pad_batch_to_multiple(batch, multiple):
    """Pad the leading axis up to a multiple (repeating the last element so
    padded work is realistic); returns (padded, valid_count)."""
    n = batch.shape[0]
    remainder = n % multiple
    if remainder == 0:
        return batch, n
    pad = multiple - remainder
    filler = np.repeat(batch[-1:], pad, axis=0)
    return np.concatenate([batch, filler], axis=0), n


def shard_params(params, mesh):
    """Replicate a parameter pytree across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(params, sharding)


def shard_batch(batch, mesh):
    """Place a host batch with the leading axis split across the mesh."""
    return jax.device_put(batch, batch_sharding(mesh))


def initialize_multi_host(coordinator_address=None, num_processes=None,
                          process_id=None, initialization_timeout=None):
    """Initialise JAX's multi-host runtime (DCN side of the scale-out
    story). Each host then feeds its local shard from its own readers;
    collectives within the jitted programs ride ICI inside the slice.

    With explicit arguments this is strict: a failure to reach the
    coordinator propagates, because silently proceeding single-process
    would shard a job the operator asked to distribute. With all-None
    arguments it is best-effort: it no-ops when already initialised or
    when the environment carries no coordinator configuration (the
    common single-process case).
    """
    explicit = any(
        a is not None
        for a in (coordinator_address, num_processes, process_id)
    )
    kwargs = {}
    if initialization_timeout is not None:
        kwargs["initialization_timeout"] = initialization_timeout
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except (RuntimeError, ValueError):
        if explicit:
            raise
        # Already initialised, or single-process environment without
        # coordinator configuration — both fine.


def global_batch_from_local(local_batch, mesh, axis_name=DATA_AXIS):
    """Assemble a global device array from this process's local shard.

    Multi-host input path: each host's readers decode its own slice of the
    frame stream into ``local_batch`` (shape ``(global_n / num_processes,
    ...)``); the returned global array has leading axis ``global_n`` sharded
    over the full mesh without any cross-host host-side gather — data moves
    host→local-HBM only, and the jitted programs' collectives do the rest
    over ICI/DCN.

    Single-process meshes degenerate to :func:`shard_batch`.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_batch))


def local_results(global_array):
    """This process's slice of a computation result, as one host array.

    The inverse of :func:`global_batch_from_local` for outputs: concatenates
    the addressable shards in index order so each host post-processes (and
    e.g. writes video for) exactly the frames it fed in. Fully-replicated
    results come back whole on every host.
    """
    shards = sorted(global_array.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    for s in shards:
        for sl in s.index[1:]:
            if (sl.start, sl.stop) != (None, None):
                raise NotImplementedError(
                    "local_results only supports arrays sharded on the "
                    "leading axis (or replicated); got shard index "
                    f"{s.index}"
                )
    parts = [np.asarray(s.data) for s in shards]
    seen = set()
    unique = []
    for shard, part in zip(shards, parts):
        key = tuple((sl.start, sl.stop) for sl in shard.index)
        if key not in seen:   # replicated arrays repeat the same slice
            seen.add(key)
            unique.append(part)
    return np.concatenate(unique, axis=0)
