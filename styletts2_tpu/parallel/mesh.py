"""Mesh + sharding utilities.

The reference scales with HF Accelerate DDP (ref: train_first.py:122-135,
§2.7 of SURVEY.md).  The TPU-native equivalent is a single
``jax.sharding.Mesh`` with a ``data`` axis (and an optional ``model`` axis
for sharding the widest vocoder channels): batches are sharded along
``data``, params are replicated, and XLA's GSPMD inserts the gradient
all-reduce (the explicit ``accelerator.gather``/DDP machinery disappears
into the partitioner).

Collective census mapping (SURVEY.md §2.7):
- DDP grad all-reduce      -> psum inserted by GSPMD under jit
- gather for min-length    -> host-side min over the global batch (lengths
                              are host metadata before the step)
- gather skip-consensus    -> masked uniform computation (no skips needed:
                              every replica executes the same program)
- barriers                 -> implicit in SPMD
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Mapping, mesh: Mesh) -> Dict:
    """Place every batch array with its leading axis split over ``data``."""
    sh = data_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_params(params, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), params)
