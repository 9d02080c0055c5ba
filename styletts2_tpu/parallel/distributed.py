"""Multi-host (multi-process) runtime: initialization, host-0 gating, and
cross-host host-metadata consensus.

The reference scales with ``accelerate launch`` spawning DDP ranks
(ref: train_first.py:254-270, train_second.py:347-359).  The TPU-native
equivalent is one JAX process per host joined through
``jax.distributed.initialize``; the device mesh then spans all hosts and
GSPMD handles every collective (gradient psum rides ICI within a slice and
DCN across slices).  What remains host-side is exactly three things:

1. process bring-up (this module's :func:`initialize_distributed`),
2. per-host data loading (``data/dataset.py::build_dataloader`` shards the
   file list by ``jax.process_index()`` — the ``split_batches=True``
   semantics of ref train_first.py:127-135), and
3. host-metadata consensus: the static clip-length bucket is derived from
   batch lengths each host sees locally, so hosts must agree before
   compiling/selecting a step variant (:func:`host_global_min` replaces the
   reference's ``accelerator.gather(...).min()``, ref: train_first.py:348).

Checkpoint/metric writes are gated to host 0 (:func:`is_main_process`),
mirroring ``accelerator.is_main_process``.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host job.  No-op when single-process.

    Arguments default to the ``STYLETTS2_COORDINATOR`` /
    ``STYLETTS2_NUM_PROCESSES`` / ``STYLETTS2_PROCESS_ID`` environment
    variables; on Cloud TPU pods all three may be omitted entirely and JAX
    discovers them from the TPU metadata server.
    """
    coordinator_address = coordinator_address or os.environ.get("STYLETTS2_COORDINATOR")
    if num_processes is None and "STYLETTS2_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["STYLETTS2_NUM_PROCESSES"])
    if process_id is None and "STYLETTS2_PROCESS_ID" in os.environ:
        process_id = int(os.environ["STYLETTS2_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info("joined distributed job: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def is_main_process() -> bool:
    return jax.process_index() == 0


def host_global_min(value: int) -> int:
    """Global min of a per-host integer (static-bucket consensus).

    Replaces the reference's ``accelerator.gather(mel_input_length).min()``
    (ref: train_first.py:348) for values that must be *host metadata* (they
    pick the compiled step variant, so they cannot stay on device).
    """
    if jax.process_count() == 1:
        return int(value)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.int64(value))
    return int(np.min(gathered))


def host_broadcast_scalar(value: float) -> float:
    """Host-0's value on every host (e.g. a resumed sigma_data)."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    return float(multihost_utils.broadcast_one_to_all(np.float64(value)))
