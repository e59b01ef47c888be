"""Multi-host (DCN) initialization and hybrid ICI x DCN mesh construction.

The reference's multi-node story is torch.distributed + NCCL process groups
(reference: modelopt/torch/utils/distributed.py). The TPU-native answer:
``jax.distributed.initialize`` once per host process, then ONE global mesh
whose outer axes span hosts (DCN) and inner axes span each host's chips
(ICI). All collectives are still inserted by XLA from shardings — the only
multi-host-specific decision is which mesh axes ride which fabric:

  * dp / pp on DCN axes — per-step traffic is one gradient reduction or one
    stage-boundary activation hop.
  * tp / sp / ep on ICI axes — per-layer collectives need ICI bandwidth.

Launch (one command per host)::

    MODELOPT_COORD=host0:8476 MODELOPT_NUM_PROCS=2 MODELOPT_PROC_ID=$RANK \
        python your_script.py

or rely on the TPU-pod metadata auto-detection (no env needed on Cloud TPU:
``jax.distributed.initialize()`` discovers everything).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the multi-host runtime. Arguments fall back to
    MODELOPT_COORD / MODELOPT_NUM_PROCS / MODELOPT_PROC_ID env vars, then to
    JAX's own auto-detection (TPU pod metadata). Idempotent.

    Must run before anything touches the XLA backend (so do NOT probe
    jax.devices()/process_count() here — that would initialize it)."""
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get("MODELOPT_COORD")
    if num_processes is None and "MODELOPT_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["MODELOPT_NUM_PROCS"])
    if process_id is None and "MODELOPT_PROC_ID" in os.environ:
        process_id = int(os.environ["MODELOPT_PROC_ID"])
    kwargs = {}
    if coordinator_address:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def hybrid_mesh(ici_axes: dict, dcn_axes: dict) -> Mesh:
    """Build a mesh whose ``dcn_axes`` (outer) split across hosts/slices and
    ``ici_axes`` (inner) split within a host. Axis-name order in the mesh is
    dcn axes first, then ici axes — sharding rules stay fabric-aware by
    construction.

    Example: 2 hosts x 4 chips, tp within host, dp across::

        mesh = hybrid_mesh({"tp": 4}, {"dp": 2})
    """
    devices = jax.devices()
    n_proc = jax.process_count()
    n_dcn = int(np.prod(list(dcn_axes.values()))) if dcn_axes else 1
    n_ici = int(np.prod(list(ici_axes.values()))) if ici_axes else 1
    if n_dcn * n_ici != len(devices):
        raise ValueError(
            f"mesh {dcn_axes} x {ici_axes} needs {n_dcn * n_ici} devices, "
            f"have {len(devices)}"
        )
    if n_proc > 1:
        if n_dcn % n_proc != 0 and n_proc % n_dcn != 0:
            raise ValueError(
                f"DCN axes ({n_dcn}) must align with process count {n_proc}"
            )
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=tuple(ici_axes.values()),
                dcn_mesh_shape=tuple(dcn_axes.values()),
                devices=devices,
            )
            return Mesh(arr, tuple(dcn_axes.keys()) + tuple(ici_axes.keys()))
        except Exception:
            pass  # e.g. CPU devices without slice_index — group manually
        # order devices so each process's devices are contiguous: the outer
        # (DCN) reshape dims then split across processes
        by_proc = sorted(devices, key=lambda d: (d.process_index, d.id))
        arr = np.asarray(by_proc).reshape(
            tuple(dcn_axes.values()) + tuple(ici_axes.values())
        )
        return Mesh(arr, tuple(dcn_axes.keys()) + tuple(ici_axes.keys()))
    arr = np.asarray(devices).reshape(
        tuple(dcn_axes.values()) + tuple(ici_axes.values())
    )
    return Mesh(arr, tuple(dcn_axes.keys()) + tuple(ici_axes.keys()))
