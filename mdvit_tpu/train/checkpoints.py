"""Checkpointing via orbax: best-by-IoU (reference parity) plus FULL
train-state save/resume — the reference keeps only ``best.pth`` with no
optimizer/epoch state and no mid-run resume (SURVEY.md §5); we add resume as a
first-class capability.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_pytree(path: str, tree: Any) -> None:
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(_abs(path), tree, force=True)


def restore_pytree(path: str, like: Any | None = None) -> Any:
    ckptr = ocp.PyTreeCheckpointer()
    if like is not None:
        return ckptr.restore(
            _abs(path), args=ocp.args.PyTreeRestore(item=like)
        )
    return ckptr.restore(_abs(path))


def save_best(exp_dir: str, params: Any, batch_stats: Any) -> None:
    save_pytree(os.path.join(exp_dir, "best"), {
        "params": params, "batch_stats": batch_stats,
    })


def load_best(exp_dir: str, like: Any | None = None) -> Any:
    return restore_pytree(os.path.join(exp_dir, "best"), like)


def save_last(exp_dir: str, state, epoch: int, max_iou: float) -> None:
    save_pytree(os.path.join(exp_dir, "last"), {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "rng": state.rng,
        "epoch": epoch,
        "max_iou": max_iou,
    })


def try_load_last(exp_dir: str, like: Any | None = None):
    path = os.path.join(exp_dir, "last")
    if not os.path.exists(path):
        return None
    return restore_pytree(path, like)
