"""Multi-host (pod-slice) execution.

The reference is single-node only (CUDA peer access across local GPUs,
SURVEY.md §2.7).  This module extends the mesh path across hosts: each
process initialises the JAX distributed runtime, builds one global 1-D mesh
over every chip in the slice, and the DB-sharded scan from
parallel/sharding.py runs unchanged — the per-shard top-k all_gather rides
ICI within a host and DCN across hosts, moving only k scores+ids per chip.

Every process must load/pack the same database (deterministic packing makes
shards consistent) and call scans in the same order; results are replicated
so every host prints identical output.

Usage (one process per host):
    from cudasw4_tpu.parallel.multihost import initialize, global_mesh
    initialize(coordinator="host0:1234", num_processes=N, process_id=i)
    engine = SearchEngine(mesh=global_mesh(), ...)
"""

from __future__ import annotations

import jax

from .sharding import make_mesh


def initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialise the JAX distributed runtime (no-op if single-process or
    already initialised).  With TPU metadata available (GCE/GKE), all
    arguments are discovered automatically."""
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def global_mesh():
    """1-D mesh over every addressable chip in the slice (all hosts)."""
    return make_mesh(jax.devices())


def is_primary() -> bool:
    return jax.process_index() == 0
