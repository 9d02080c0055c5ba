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
              devices: Optional[Sequence] = None,
              n_hosts: Optional[int] = None) -> Mesh:
    """(dcn ×) data × model mesh over the *global* device list.

    Multi-host (``n_hosts`` > 1, defaulting to ``jax.process_count()``):
    the leading mesh axis is ``dcn`` with one slice per host, so the host
    boundary is explicit to the partitioner — batch specs use
    ``P(("dcn", "data"))`` and GSPMD lowers the gradient all-reduce
    hierarchically: reduce-scatter/all-gather over ICI within each slice,
    a single cross-host all-reduce over DCN.  The global device list is
    ordered process-major, so the reshape puts each host's local devices in
    its own ``dcn`` slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_hosts is None:
        n_hosts = jax.process_count() if devices == list(jax.devices()) else 1
    if n_data is None:
        n_data = len(devices) // (n_model * n_hosts)
    devs = np.asarray(devices[: n_hosts * n_data * n_model])
    if n_hosts > 1:
        return Mesh(devs.reshape(n_hosts, n_data, n_model),
                    axis_names=("dcn", "data", "model"))
    return Mesh(devs.reshape(n_data, n_model), axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    if "dcn" in mesh.axis_names:
        return NamedSharding(mesh, P(("dcn", "data")))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Mapping, mesh: Mesh) -> Dict:
    """Place every batch array with its leading axis split over ``data``.

    Single-process: a plain ``device_put``.  Multi-process: each host holds
    only its shard of the global batch (the per-host loader of
    ``build_dataloader``), and the global array is assembled from the
    process-local pieces — the ``split_batches=True`` semantics of the
    reference's Accelerate dataloaders (ref: train_first.py:127-135).
    """
    sh = data_sharding(mesh)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sh) for k, v in batch.items()}
    return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in batch.items()}


def replicate_params(params, mesh: Mesh):
    """Replicate a pytree onto the mesh.

    Multi-process: every host holds identical values (same init seed or the
    same checkpoint), so the fully-replicated global array is assembled from
    each process's local copy.
    """
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), params)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x), global_shape=np.shape(x)), params)
