"""Checkpoint / resume.

Reference: --checkpoint_training saves ``run{r}_model_checkpoint{epoch}.pth``
and optimizer state each log step (sgrl_link_pred.py:1411-1417);
--continue_from reloads both and offsets epochs (:1328-1338).

TPU equivalent: flax serialization of {params, batch_stats, opt_state} to
msgpack files with the same naming scheme.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

from flax import serialization


def checkpoint_paths(res_dir: str, run: int, epoch: int) -> Tuple[str, str]:
    model = os.path.join(res_dir, f"run{run}_model_checkpoint{epoch}.msgpack")
    opt = os.path.join(res_dir, f"run{run}_optimizer_checkpoint{epoch}.msgpack")
    return model, opt


def save_checkpoint(
    res_dir: str, run: int, epoch: int, params, batch_stats, opt_state
) -> None:
    os.makedirs(res_dir, exist_ok=True)
    model_path, opt_path = checkpoint_paths(res_dir, run, epoch)
    with open(model_path, "wb") as f:
        f.write(
            serialization.to_bytes({"params": params, "batch_stats": batch_stats})
        )
    with open(opt_path, "wb") as f:
        f.write(serialization.to_bytes(opt_state))


def load_checkpoint(
    res_dir: str, run: int, epoch: int, params_like, batch_stats_like, opt_state_like
):
    """Restore (params, batch_stats, opt_state) from templates of same shape."""
    model_path, opt_path = checkpoint_paths(res_dir, run, epoch)
    with open(model_path, "rb") as f:
        state = serialization.from_bytes(
            {"params": params_like, "batch_stats": batch_stats_like}, f.read()
        )
    with open(opt_path, "rb") as f:
        opt_state = serialization.from_bytes(opt_state_like, f.read())
    return state["params"], state["batch_stats"], opt_state
