"""Multi-host batch coordination (jax.distributed over DCN).

The reference tops out at one machine (threads over local GPUs,
/root/reference/video_upscaler.py:453-505). Directory jobs bigger than
one host shard here at the *video* level: every process runs the same
batch command, `jax.distributed` forms the global runtime, and each
process takes the videos whose index is congruent to its process id —
deterministic, no coordinator state, no work queue to lose. Within a
process the normal frame-level mesh sharding applies, so an N-host v5e
pod runs N x 8-way frame parallelism.

DCN traffic is two collectives per job (the init barrier and the final
per-process success counts via allgather); everything else rides ICI or
stays host-local, per the scaling-book layering.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

from video_restore_tpu.utils.logging import get_logger

log = get_logger()


def init_multihost(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> Tuple[int, int]:
    """Join (or form) the multi-host runtime; returns (pid, nprocs).

    Arguments fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), and
    on TPU pods `jax.distributed.initialize()` can discover everything
    from the metadata server — so all three may be None.
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    pid, n = jax.process_index(), jax.process_count()
    log.info("multihost: process %d/%d (coordinator %s)", pid, n,
             coordinator or "auto")
    return pid, n


def shard_items(items: Sequence, pid: int | None = None,
                nprocs: int | None = None) -> List:
    """Deterministic round-robin shard of a work list for this process.

    Items must be identically ordered on every process (callers sort);
    round-robin (not contiguous blocks) keeps per-process wall-clock even
    when file sizes trend through the listing.
    """
    import jax

    pid = jax.process_index() if pid is None else pid
    nprocs = jax.process_count() if nprocs is None else nprocs
    return [it for i, it in enumerate(items) if i % nprocs == pid]


def allgather_counts(local: Sequence[int]) -> List[List[int]]:
    """Gather a small vector of ints from every process (one DCN
    collective); returns [nprocs][len(local)]."""
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return [list(local)]
    from jax.experimental import multihost_utils

    out = multihost_utils.process_allgather(
        np.asarray(local, np.int64), tiled=False
    )
    return [list(map(int, row)) for row in np.asarray(out)]
