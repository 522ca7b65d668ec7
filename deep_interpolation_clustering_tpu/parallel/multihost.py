"""Multi-host (multi-process) data parallelism via `jax.distributed`.

The reference's only parallelism is single-process `torch.nn.DataParallel`
(SURVEY §2.2); the single-process TPU equivalent here is the 1-D data mesh
in `parallel/mesh.py`. This module extends that same design across
processes/hosts — multiple TPU hosts of one slice (collectives ride ICI)
or CPU processes in tests (Gloo over TCP) — with NO changes to the step
functions: the mesh simply spans `jax.devices()` of every process, GSPMD
partitions the same jitted programs, and XLA inserts the cross-host
collectives.

Design (and why the trainer needs so little):
  * Every process loads the SAME cohort arrays and seeds the SAME host RNG
    (`Config.seed`), so host-side control flow — shuffle orders, LR
    schedule, early stopping — is replicated deterministically and needs
    no coordination. `jax.device_put` with a global sharding accepts the
    identical host value on every process (verified on jax 0.9).
  * Train-path fetches are of fully-REPLICATED values (losses come out of
    global-batch reductions), which `jax.device_get` serves locally.
  * Only eval DUMPS are batch-sharded device arrays; `device_fetch` below
    all-gathers those so every process sees the full cohort (and the
    p1-p4 filesystem contract stays byte-identical, written by process 0).

Initialization must happen before the backend is first used:

    from deep_interpolation_clustering_tpu.parallel import multihost
    multihost.initialize("10.0.0.1:8476", num_processes=4, process_id=i)

or pass `--coordinator_address/--num_processes/--process_id` to any CLI
stage. On TPU pods, `jax.distributed.initialize()` with no arguments
auto-discovers the topology; `initialize(None, ...)` forwards that.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str],
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """`jax.distributed.initialize` wrapper; call before any device use.

    With `coordinator_address=None` every argument is auto-discovered
    (TPU-pod metadata); on CPU/GPU all three must be given.
    """
    import jax

    if coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def process_count() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    """True on the process that owns filesystem writes (checkpoints,
    feature dumps, TensorBoard). Always True single-process."""
    import jax

    return jax.process_index() == 0


def device_fetch(tree: Any) -> Any:
    """`jax.device_get` that works across processes.

    Fully-replicated leaves (losses, params) fetch locally; batch-sharded
    leaves (eval dumps) are all-gathered so every process receives the
    full global value — the multi-host generalization of single-process
    `device_get`, at the cost of one collective per sharded leaf (eval
    boundaries only; the train path fetches nothing sharded).
    """
    import jax

    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def fetch(x):
        if not isinstance(x, jax.Array):
            return x
        if x.is_fully_replicated:
            return np.asarray(jax.device_get(x))
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    return jax.tree_util.tree_map(fetch, tree)


def barrier(name: str) -> None:
    """Block until every process reaches this point (no-op single-process).

    Writes on any process before its barrier happen-before reads on any
    process after it — the synchronization that makes process-0-only
    checkpoint writes safe to read back on every process (e.g. restoring
    the best checkpoint for feature dumps right after training).
    """
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
