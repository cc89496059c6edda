"""Multi-chip execution: data-parallel MS scan over a device mesh with the
reference index replicated, followed by collective head/tail accounting
(SURVEY.md §2 parallelism checklist, §7.7).

Sharding layout:

* collection lanes (chunk cursors) are sharded over the ``data`` mesh axis —
  the "sequence parallelism" axis of this framework (each device scans its
  contiguous slice of the collection);
* the reference index (text, SA, ISA, PLCP, sparse table) is replicated —
  the small-reference regime (the large regime shards the index; round 2);
* per-device partial bucket counts are reduced with ``psum``; head records
  are exchanged with ``all_gather`` — the distributed form of the
  reference's ``(pos, idx)`` head sort (ref CMS-BWT-functions.cpp:588-593).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.device import DeviceIndex
from ..ops.ms_device import ms_scan_kernel


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_ms_step(mesh: Mesh, index: DeviceIndex, sx_padded: jnp.ndarray,
                    chunk_starts: jnp.ndarray, *, sn: int, chunk_len: int,
                    window: int):
    """One data-parallel MS scan + collective accounting step.

    Returns (pos, length, smaller) sharded over lanes and the psum-reduced
    global per-reference-position occupancy counts.
    """
    n = index.n

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P("data")),
        out_specs=(P("data"), P("data"), P("data"), P()),
        check_vma=False)
    def step(x_padded, sa, isa, plcp, jump, sxp, starts):
        pos, length, smaller = ms_scan_kernel(
            x_padded, sa, isa, plcp, jump, sxp, starts,
            n=n, sn=sn, chunk_len=chunk_len, window=window)
        flat = pos.reshape(-1)
        local_counts = jnp.zeros(n, jnp.int32).at[flat].add(
            1, mode="drop")
        counts = jax.lax.psum(local_counts, "data")
        return pos, length, smaller, counts

    return step(index.x_padded, index.sa, index.isa, index.plcp, index.jump,
                sx_padded, chunk_starts)


def sharded_training_step(mesh: Mesh, index: DeviceIndex,
                          sx: np.ndarray, lanes_per_device: int = 2,
                          window: int = 16):
    """The full jitted multi-chip step used by the driver dry-run: shard the
    collection over the mesh, scan, reduce counts, and gather head flags."""
    n_dev = mesh.devices.size
    lanes = n_dev * lanes_per_device
    sn = int(len(sx))
    chunk_len = -(-sn // lanes)
    chunk_starts = jnp.asarray(
        (np.arange(lanes) * chunk_len).astype(np.int32))
    sxp = jnp.concatenate([jnp.asarray(sx), jnp.zeros(window, jnp.uint8)])

    # place sharded/replicated operands explicitly
    lane_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    chunk_starts = jax.device_put(chunk_starts, lane_sharding)
    sxp = jax.device_put(sxp, repl)

    pos, length, smaller, counts = sharded_ms_step(
        mesh, index, sxp, chunk_starts, sn=sn, chunk_len=chunk_len,
        window=window)
    jax.block_until_ready(counts)
    return pos, length, smaller, counts
