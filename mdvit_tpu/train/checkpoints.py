"""Checkpointing via orbax: best-by-IoU (reference parity) plus FULL
train-state save/resume — the reference keeps only ``best.pth`` with no
optimizer/epoch state and no mid-run resume (SURVEY.md §5); we add resume as a
first-class capability.

Durability + latency (round-2 incident): ``PyTreeCheckpointer.save(path,
force=True)`` DELETES the finalized target before writing its own tmp dir, so
a kill during the per-epoch ``last`` save destroyed the only resume state;
the 420 MB sync write also cost ~60 s/epoch on this disk. ``CheckpointWriter``
fixes both: saves go ASYNC to a sibling ``<path>.w`` (orbax's own tmp+rename
makes ``.w`` appear only when complete), and the finalized ``.w`` is swapped
into place right before the NEXT save — at every instant either ``path`` or
``path.w`` holds a complete checkpoint, and the write overlaps training.
"""
from __future__ import annotations

import os
import shutil
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
        # Explicit per-leaf restore placement from ``like``. Without this,
        # orbax consults the checkpoint's ``_sharding`` file — which is
        # INCOMPLETE when the state was saved under a data-parallel mesh
        # (GSPMD-chosen leaf shardings are not all serializable, so orbax
        # silently skips recording them) — and restore dies with a JSON
        # pointer error. Placement from the live ``like`` tree also makes
        # checkpoints topology-portable (save on N chips, restore on M).
        def _ra(leaf):
            if isinstance(leaf, jax.Array):
                return ocp.ArrayRestoreArgs(sharding=leaf.sharding,
                                            dtype=leaf.dtype)
            return ocp.RestoreArgs()

        restore_args = jax.tree_util.tree_map(_ra, like)
        return ckptr.restore(
            _abs(path),
            args=ocp.args.PyTreeRestore(item=like, restore_args=restore_args),
        )
    return ckptr.restore(_abs(path))


def _resolve(path: str) -> str | None:
    """A finalized checkpoint for ``path``. Prefer the pending ``.w`` sibling
    when present: it is complete by construction (orbax renames atomically)
    and always one save NEWER than the swapped-in ``path``."""
    if os.path.isdir(path + ".w"):
        return path + ".w"
    if os.path.isdir(path):
        return path
    return None


class CheckpointWriter:
    """Async two-phase checkpoint writer (one per experiment dir)."""

    def __init__(self, exp_dir: str):
        self.exp_dir = exp_dir
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        self._pending: str | None = None
        # stale orbax tmp dirs from a killed process wedge later saves
        if os.path.isdir(exp_dir):
            for name in os.listdir(exp_dir):
                if ".orbax-checkpoint-tmp" in name:
                    shutil.rmtree(os.path.join(exp_dir, name),
                                  ignore_errors=True)
            # a leftover complete ``<path>.w`` (kill happened after the async
            # write finished but before the next-save swap) is the NEWEST
            # state on disk — promote it now rather than rmtree-ing it in
            # _save, which would regress durability to the older ``<path>``
            # (or to nothing, if the kill hit during the first-ever save)
            for base in ("best", "last"):
                path = os.path.join(exp_dir, base)
                w = path + ".w"
                if os.path.isdir(w):
                    if os.path.isdir(path):
                        shutil.rmtree(path)
                    os.rename(w, path)

    def _save(self, path: str, tree: Any) -> None:
        self.finalize()
        w = path + ".w"
        if os.path.isdir(w):
            shutil.rmtree(w)
        self._ckptr.save(_abs(w), tree, force=True)
        self._pending = path

    def finalize(self) -> None:
        """Wait for the in-flight save and swap it into its final name."""
        if self._pending is None:
            return
        self._ckptr.wait_until_finished()
        path, self._pending = self._pending, None
        w = path + ".w"
        if os.path.isdir(w):
            if os.path.isdir(path):
                shutil.rmtree(path)
            os.rename(w, path)

    def save_best(self, params: Any, batch_stats: Any) -> None:
        self._save(os.path.join(self.exp_dir, "best"), {
            "params": params, "batch_stats": batch_stats,
        })

    def save_last(self, state, epoch: int, max_iou: float) -> None:
        self._save(os.path.join(self.exp_dir, "last"), {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "rng": state.rng,
            "epoch": epoch,
            "max_iou": max_iou,
        })

    def close(self) -> None:
        self.finalize()


def save_best(exp_dir: str, params: Any, batch_stats: Any) -> None:
    save_pytree(os.path.join(exp_dir, "best"), {
        "params": params, "batch_stats": batch_stats,
    })


def load_best(exp_dir: str, like: Any | None = None) -> Any:
    path = _resolve(os.path.join(exp_dir, "best"))
    if path is None:
        raise FileNotFoundError(os.path.join(exp_dir, "best"))
    return restore_pytree(path, like)


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
    path = _resolve(os.path.join(exp_dir, "last"))
    if path is None:
        return None
    return restore_pytree(path, like)
