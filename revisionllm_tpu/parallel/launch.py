"""Multi-host SPMD launch helpers.

The reference scales across hosts with SLURM job arrays + deepspeed rank
forking (SURVEY.md §2.6); on TPU pods the equivalent is one
`jax.distributed.initialize()` per host followed by the same single-program
code path — GSPMD handles cross-host collectives over DCN.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-ops on single-host. Honors the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars and
    TPU pod auto-detection when no arguments are given."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        # TPU pod slices auto-detect; plain single host needs nothing
        try:
            jax.distributed.initialize()
        except Exception:
            pass
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def host_shard_indices(n_items: int) -> range:
    """Static split of a work list across hosts (the eval --split/--total_split
    pattern, derived from the process grid instead of CLI flags)."""
    p = jax.process_index()
    n = jax.process_count()
    binsize = n_items // n
    start = p * binsize
    end = n_items if p == n - 1 else start + binsize
    return range(start, end)
