"""CheckpointWriter durability: at every instant either the finalized path
or its complete ``.w`` sibling exists (round-2 incident: the old
``save(force=True)`` deleted the finalized ``last`` before writing, so a kill
mid-save destroyed the only resume state)."""
import os

import jax.numpy as jnp
import numpy as np

from mdvit_tpu.train import checkpoints as ckpt


class _State:
    def __init__(self, v):
        self.params = {"w": jnp.full((3,), float(v))}
        self.batch_stats = {"m": jnp.zeros((2,))}
        self.opt_state = {"mu": jnp.ones((3,))}
        self.step = jnp.asarray(v, jnp.int32)
        self.rng = jnp.zeros((2,), jnp.uint32)


def test_writer_swap_and_resume(tmp_path):
    d = str(tmp_path)
    w = ckpt.CheckpointWriter(d)
    w.save_last(_State(1), epoch=0, max_iou=0.1)
    # pending save lives at last.w until the next save finalizes it
    w.finalize()
    assert os.path.isdir(os.path.join(d, "last"))
    got = ckpt.try_load_last(d)
    assert int(got["step"]) == 1 and int(got["epoch"]) == 0

    w.save_last(_State(2), epoch=1, max_iou=0.2)
    w.close()
    got = ckpt.try_load_last(d)
    assert int(got["step"]) == 2 and int(got["epoch"]) == 1


def test_restore_falls_back_to_pending_sibling(tmp_path):
    d = str(tmp_path)
    w = ckpt.CheckpointWriter(d)
    w.save_last(_State(3), epoch=2, max_iou=0.3)
    w._ckptr.wait_until_finished()  # complete on disk, NOT yet swapped
    assert os.path.isdir(os.path.join(d, "last.w"))
    assert not os.path.isdir(os.path.join(d, "last"))
    # simulate a kill before the swap: a fresh loader must find last.w
    got = ckpt.try_load_last(d)
    assert int(got["step"]) == 3 and int(got["epoch"]) == 2
    w.close()  # cleanup


def test_writer_clears_stale_orbax_tmp(tmp_path):
    d = str(tmp_path)
    stale = os.path.join(d, "last.orbax-checkpoint-tmp-123")
    os.makedirs(stale)
    ckpt.CheckpointWriter(d)
    assert not os.path.isdir(stale)


def test_best_fallback_resolution(tmp_path):
    d = str(tmp_path)
    w = ckpt.CheckpointWriter(d)
    w.save_best({"w": jnp.ones((2,))}, {"m": jnp.zeros((1,))})
    w._ckptr.wait_until_finished()  # killed-before-swap scenario
    got = ckpt.load_best(d)
    np.testing.assert_array_equal(np.asarray(got["params"]["w"]), [1, 1])
    w.close()


def test_pending_sibling_preferred_over_swapped(tmp_path):
    """After a kill, `last.w` is one save newer than `last` — resume must
    pick the newer one."""
    d = str(tmp_path)
    w = ckpt.CheckpointWriter(d)
    w.save_last(_State(1), epoch=0, max_iou=0.1)
    w.save_last(_State(2), epoch=1, max_iou=0.2)  # finalizes epoch 0 → last
    w._ckptr.wait_until_finished()  # epoch 1 complete at last.w, not swapped
    got = ckpt.try_load_last(d)
    assert int(got["epoch"]) == 1
    w.close()


def test_init_promotes_leftover_pending_sibling(tmp_path):
    """A kill after the async write finished but before the swap leaves a
    complete `last.w` as the NEWEST state on disk. A fresh writer must promote
    it to `last` at init — the old behaviour rmtree'd it in the next _save,
    regressing durability to an older (or nonexistent) checkpoint."""
    d = str(tmp_path)
    w = ckpt.CheckpointWriter(d)
    w.save_last(_State(5), epoch=4, max_iou=0.5)
    w._ckptr.wait_until_finished()  # complete at last.w, NOT swapped (kill)
    assert os.path.isdir(os.path.join(d, "last.w"))

    w2 = ckpt.CheckpointWriter(d)  # fresh process after the kill
    assert os.path.isdir(os.path.join(d, "last"))
    assert not os.path.isdir(os.path.join(d, "last.w"))
    got = ckpt.try_load_last(d)
    assert int(got["epoch"]) == 4
    # the promoted checkpoint survives a subsequent save cycle
    w2.save_last(_State(6), epoch=5, max_iou=0.6)
    w2.close()
    assert int(ckpt.try_load_last(d)["epoch"]) == 5
    w.close()


def test_results_table_total_row():
    """Regression: the Total Dice/IoU must average over ALL datasets — the
    old in-line code sliced [:-1] before Total was appended and silently
    dropped the last dataset (NaN for single-dataset runs)."""
    from mdvit_tpu.train.trainer import results_table

    res = {"a": {"loss": 1.0, "dice": 0.5, "iou": 0.4},
           "b": {"loss": 2.0, "dice": 0.7, "iou": 0.6}}
    df = results_table(["a", "b"], res)
    total = df[df.Name == "Total"].iloc[0]
    assert abs(total.Di_score - 0.6) < 1e-9
    assert abs(total.IOU - 0.5) < 1e-9
    assert abs(total.loss - 3.0) < 1e-9
    one = results_table(["a"], {"a": res["a"]})
    t1 = one[one.Name == "Total"].iloc[0]
    assert abs(t1.Di_score - 0.5) < 1e-9  # no NaN for a single dataset
