"""Multi-host (multi-process) initialization.

The reference is a single-process shared-memory library (SURVEY.md §2.5);
its TPU-native equivalent scales across hosts with `jax.distributed`: each
host owns its local chips, `make_mesh` spans the global device list, and the
EM's psum reductions ride ICI within a pod slice (DCN only carries the data
loading).  This module is the thin, standard glue — nothing framework-
specific is needed beyond sharding the dataset with `shard_dataset`, because
the sufficient statistics the EM exchanges are tiny (D x k, D x k^2 per-shard
partials; see ops/masked_linalg.EMStats).

Typical multi-host driver::

    from ppca_rs_tpu.parallel import distributed, make_mesh, shard_dataset

    distributed.initialize()                  # env-driven (TPU pods auto-detect)
    mesh = make_mesh()                        # global ('data', 'model') mesh
    dataset = shard_dataset(local_dataset, mesh)
    model = PPCATrainer(dataset).train(state_size=..., n_iters=...)

Each process should construct its dataset from its local slice of samples;
`jax.make_array_from_process_local_data` is the escape hatch for fully
host-local loading.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Initialize `jax.distributed`.  On TPU pods all arguments are
    auto-detected from the environment; on other platforms pass the
    coordinator address and process layout explicitly."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def is_initialized() -> bool:
    try:
        return jax.process_count() > 1 or jax._src.distributed.global_state.client is not None
    except Exception:
        return False
