"""Params checkpointing: persist trained drafters (EAGLE heads, distilled
drafters) as orbax pytree checkpoints.

The reference only ever LOADS weights (HF checkpoints via from_pretrained,
ref: engine/model_loader.py:104-111) because it has no training. This repo
trains drafters (engine/distill.py, engine/eagle_train.py), so round-trip
persistence is required: train once, serve many. Orbax is the idiomatic JAX
checkpointer (async-capable, sharding-aware); params here are plain pytrees
of arrays, so the PyTree checkpointer round-trips them exactly (dtypes
included — bf16 verified in tests/test_checkpoint_loading.py).

Paths are DIRECTORIES (orbax layout). ``save_params`` refuses to overwrite
unless ``overwrite=True``.
"""
from __future__ import annotations

import os
from typing import Any


def save_params(path: str, params: Any, overwrite: bool = False) -> str:
    """Save a params pytree to directory ``path``; returns the path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, params, force=overwrite)
    return path


def load_params(path: str) -> Any:
    """Restore a params pytree saved by ``save_params``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"no checkpoint directory at {path}")
    ckpt = ocp.PyTreeCheckpointer()
    return ckpt.restore(path)
