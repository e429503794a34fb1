"""Multi-host initialization + mesh construction over ICI and DCN.

Single-host meshes (parallel/mesh.py) cover one pod slice's chips; this module
is the multi-host tier (SURVEY.md §2.7 "Communication backend" row): call
``init_distributed()`` once per host process (jax.distributed handshake over
DCN), then ``build_multihost_mesh`` lays the 'data' axis across hosts (DCN)
and the 'model' axis within each host's chips (ICI), the layout where TP
collectives ride ICI and only batch-level traffic crosses hosts — the
scaling-efficiency recipe from the north star.

Not exercisable on single-host CI (the virtual CPU mesh stands in for
multi-chip; see tests/test_parallel.py); the API matches what a v5e-16
two-host launch needs:

    # on every host:
    init_distributed()                       # env-driven coordinator discovery
    mesh = build_multihost_mesh(tp=8)        # 'model'=8 intra-host, 'data'=hosts
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from specdec_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """jax.distributed.initialize with env fallbacks (COORDINATOR_ADDRESS,
    NUM_PROCESSES, PROCESS_ID; TPU pods usually need no args at all).
    Returns False (no-op) for single-process runs."""
    coordinator_address = coordinator_address or os.getenv("COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.getenv("NUM_PROCESSES", "0")) or None
    process_id = (process_id if process_id is not None
                  else (int(os.environ["PROCESS_ID"])
                        if os.getenv("PROCESS_ID") else None))
    if coordinator_address is None and num_processes is None:
        if os.getenv("TPU_WORKER_HOSTNAMES", "localhost") in ("", "localhost"):
            return False  # single host
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def build_multihost_mesh(tp: Optional[int] = None) -> Mesh:
    """('data' across hosts x 'model' within host). tp defaults to
    local_device_count so the model axis never crosses DCN."""
    tp = tp or jax.local_device_count()
    devices = jax.devices()
    n = len(devices)
    assert n % tp == 0, f"devices ({n}) not divisible by tp ({tp})"
    dp = n // tp
    # order devices host-major so each 'model' row stays on one host's ICI
    arr = np.empty((dp, tp), dtype=object)
    by_process: dict = {}
    for d in devices:
        by_process.setdefault(d.process_index, []).append(d)
    flat = [d for pid in sorted(by_process) for d in by_process[pid]]
    for i, d in enumerate(flat):
        arr[i // tp, i % tp] = d
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
