"""Multi-host bring-up and work partitioning.

The reference has no multi-node story (SURVEY.md §2.11: its batch
extractor is a serial loop with file-existence resume).  Here:
  - `init_distributed` wraps jax.distributed.initialize (one process per
    host; ICI collectives inside a host/slice, DCN across hosts).
  - `shard_list` partitions a work list across processes; combined with
    the extractor's skip-if-exists resume this gives elastic restart
    semantics (a replacement host re-runs only missing outputs).
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize jax.distributed when running multi-process; no-op for
    single-process.  Returns (process_id, num_processes)."""
    import jax
    coordinator = coordinator or os.environ.get("MODS_TPU_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("MODS_TPU_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("MODS_TPU_PROCESS_ID", "0"))
    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return process_id, num_processes


def shard_list(items: Sequence, process_id: int, num_processes: int) -> List:
    """Strided partition (deterministic, balanced for sorted-by-size
    lists)."""
    return list(items[process_id::num_processes])
