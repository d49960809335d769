"""Multi-domain training/eval driver.

Mirrors the reference entry points (``multi_train_MDViT.py`` main/train_val/
test) with the TPU-native execution model: all domains in one jitted step,
on-device augmentation, device-resident data, on-device metrics. Keeps the
reference's protocol knobs: epoch length = max domain length
(``:112``), model selection by best average val IoU (``:330-335``), val on
the test split (reference defect kept for parity, flagged in SURVEY §7.4),
per-domain scalars, ``test_results.csv`` with a Total row (``:404-415``),
``debug`` one-batch mode (``:224,293,343``).
"""
from __future__ import annotations

import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from mdvit_tpu.config import save_config
from mdvit_tpu.data.datasets import build_domain_data
from mdvit_tpu.data.loader import (
    DeviceDomainStore,
    EvalSplitStore,
    RoundRobinSampler,
    eval_batches,
    eval_index_batches,
)
from mdvit_tpu.models.registry import get_model
from mdvit_tpu.train import checkpoints as ckpt
from mdvit_tpu.train.optim import build_optimizer
from mdvit_tpu.train.steps import (
    TrainState,
    counts_to_metrics,
    make_eval_step,
    make_train_step,
)
from mdvit_tpu.utils.logging import ScalarLogger


def _is_mkd_model(name: str) -> bool:
    return name.startswith("MDViT")


def results_table(names, results) -> pd.DataFrame:
    """test_results rows + the Total row (loss summed, Dice/IoU averaged over
    datasets — reference ``multi_train_MDViT.py:404-415``)."""
    rows = {"Name": [], "loss": [], "Di_score": [], "IOU": []}
    for n in names:
        rows["Name"].append(n)
        rows["loss"].append(results[n]["loss"])
        rows["Di_score"].append(results[n]["dice"])
        rows["IOU"].append(results[n]["iou"])
    total = {"loss": float(np.sum(rows["loss"])),
             "Di_score": float(np.mean(rows["Di_score"])),
             "IOU": float(np.mean(rows["IOU"]))}
    rows["Name"].append("Total")
    for k, v in total.items():
        rows[k].append(v)
    return pd.DataFrame(rows)


def build_model_from_config(config):
    name = config.model
    adapt = config.model_adapt.adapt_method
    kwargs = dict(
        img_size=int(config.data.img_size),
        num_domains=int(config.model_adapt.num_domains),
        adapt_method=adapt,
    )
    if str(config.tpu.compute_dtype) == "bfloat16":
        kwargs["dtype"] = jnp.bfloat16
    # optional architecture overrides (tiny models for CPU tests/benches);
    # lists → tuples so flax dataclass attributes stay hashable
    extra = config.get("model_kwargs") or {}
    kwargs.update({
        k: tuple(v) if isinstance(v, list) else v for k, v in extra.items()
    })
    return get_model(name, **kwargs)


def init_state(config, model, sample_batch, seed: int = 42) -> TrainState:
    """Jitted init (eager init is minutes on this host)."""
    x, onehot = sample_batch
    mkd = _is_mkd_model(config.model)

    @jax.jit
    def _init(key):
        rngs = {"params": key, "dropout": key}
        if mkd:
            return model.init(rngs, x, onehot, train=False, aux_mode="grouped")
        return model.init(rngs, x, onehot, train=False)

    variables = _init(jax.random.PRNGKey(seed))
    return variables["params"], variables.get("batch_stats", {})


class Trainer:
    def __init__(self, config, exp_dir: str):
        self.config = config
        self.exp_dir = exp_dir
        os.makedirs(exp_dir, exist_ok=True)
        save_config(config, os.path.join(exp_dir, "exp_config.yml"))
        self.logger = ScalarLogger(exp_dir)
        self.mkd = _is_mkd_model(config.model)

        names = list(config.data.name)
        self.names = names
        self.num_domains = len(names)
        syn_sizes = None
        if config.data.get("synthetic_sizes"):
            syn_sizes = {
                k: tuple(v) for k, v in config.data.synthetic_sizes.items()
            }
        self.data = build_domain_data(
            names,
            config.data.data_folder,
            int(config.data.img_size),
            k_fold=str(config.data.k_fold),
            split_ratio=tuple(config.data.split_ratio),
            synthetic=bool(config.data.get("synthetic", False)),
            synthetic_sizes=syn_sizes,
        )
        for n in names:
            print(f"{n} has {len(self.data[n]['train'])} training samples")

        self.batch_size = int(config.train.batch_size)

        # ---- data-parallel mesh (auto-engages when >1 device is visible,
        # like the reference's DataParallel, ``multi_train_MDViT.py:73-74``).
        # ``tpu.mesh.data`` caps the device count (-1 = all); the mesh size is
        # shrunk to the largest divisor of the stacked batch so every shard
        # is even. Single-device behaviour is exactly unchanged (no mesh).
        mesh_cfg = config.tpu.get("mesh") or {}
        want = int(mesh_cfg.get("data", -1) or -1)
        avail = len(jax.devices())
        n_mesh = avail if want in (-1, 0) else min(want, avail)
        total_batch = self.num_domains * self.batch_size
        while n_mesh > 1 and total_batch % n_mesh:
            n_mesh -= 1
        from mdvit_tpu.parallel.mesh import (
            batch_sharding, make_mesh, replicated,
        )
        self.mesh = None
        self.data_sharding = None
        if n_mesh > 1:
            self.mesh = make_mesh(n_mesh)
            self.data_sharding = batch_sharding(self.mesh)
            print(f"data-parallel mesh over {n_mesh} devices "
                  f"(global batch {total_batch})")

        self.store = DeviceDomainStore(
            [self.data[n]["train"] for n in names],
            sharding=replicated(self.mesh) if self.mesh is not None else None,
        )
        self.sampler = RoundRobinSampler(
            self.store.sizes, self.batch_size, seed=int(config.get("seed", 42))
        )
        if config.train.num_iters:
            self.steps_per_epoch = int(config.train.num_iters)
        else:
            self.steps_per_epoch = self.sampler.steps_per_epoch

        self.model = build_model_from_config(config)
        x0 = jnp.zeros(
            (self.num_domains * self.batch_size, int(config.data.img_size),
             int(config.data.img_size), 3), jnp.float32,
        )
        oh0 = jnp.repeat(
            jnp.eye(self.num_domains, dtype=jnp.float32), self.batch_size, 0
        )
        params, batch_stats = init_state(config, self.model, (x0, oh0))
        if config.get("pretrained_folder"):
            # reference parity: TransFuse always starts from ImageNet
            # backbones (``TransFuse.py:86,189,293``); trees are produced
            # offline by scripts/convert_torch_weights.py
            from mdvit_tpu.train.pretrained import apply_pretrained

            params, batch_stats, report = apply_pretrained(
                params, batch_stats, config.model,
                str(config.pretrained_folder), int(config.data.img_size),
                model=self.model,
            )
            if report:
                print(report)
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
        print(f"{n_params / 1e6}M total trainable parameters")

        self.tx = build_optimizer(config, self.steps_per_epoch)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            rng=jax.random.PRNGKey(int(config.get("seed", 42))),
        )

        self.state = self._place_on_mesh(self.state)
        if bool(config.data.train_aug) and not bool(
                config.tpu.get("device_augment", True)):
            # there is NO host-side augmentation path — the jitted step is
            # the only place train augs run; don't let train_aug=True train
            # silently unaugmented
            raise ValueError(
                "data.train_aug=True requires tpu.device_augment=True "
                "(augmentations run inside the jitted step; set "
                "data.train_aug=False to intentionally train unaugmented)")
        # per-computation XLA overrides (tpu.xla_options) reach the jit only
        # on TPU backends: the flag names are TPU-specific and the CPU
        # compiler rejects unknown options loudly
        xla_options = dict(config.tpu.get("xla_options") or {}) or None
        if jax.default_backend() == "cpu":
            xla_options = None
        self.train_step = make_train_step(
            self.model,
            self.tx,
            self.num_domains,
            alpha=float(config.train.get("alpha", 0.5)),
            det_sup=bool(config.train.get("det_sup", True)),
            mkd=self.mkd,
            device_augment=bool(config.tpu.get("device_augment", True))
            and bool(config.data.train_aug),
            donate=bool(config.tpu.get("donate", True)),
            data_sharding=self.data_sharding,
            remat=bool(config.tpu.get("remat", False)),
            compiler_options=xla_options,
        )
        # device-resident eval (default): eval splits upload once as uint8
        # and evaluate() transfers only int32 index rows — the eval loop is
        # zero-image-H2D like the train loop. tpu.device_eval=False restores
        # host streaming (HBM-tight setups); both modes are metric-identical
        # (tests/test_trainer_dp.py).
        self.device_eval = bool(config.tpu.get("device_eval", True))
        self._eval_stores: dict[str, EvalSplitStore] = {}
        self.eval_step = make_eval_step(self.model, mkd=self.mkd,
                                        data_sharding=self.data_sharding,
                                        from_store=self.device_eval,
                                        compiler_options=xla_options)
        self.max_iou = 0.0
        self.best_epoch = 0
        self.start_epoch = 0

    # ------------------------------------------------------------------
    def _place_on_mesh(self, tree):
        """Replicate every array over the DP mesh (no-op without a mesh).
        Init and checkpoint-restore place arrays on a single device; the
        sharded train/eval steps need them resident mesh-wide."""
        if self.mesh is None:
            return tree
        from mdvit_tpu.parallel.mesh import replicated
        sh = replicated(self.mesh)
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sh) if isinstance(a, jax.Array)
            else a, tree)

    # ------------------------------------------------------------------
    def _eval_store(self, split: str) -> EvalSplitStore:
        """Upload one eval split to HBM on first use (replicated over the DP
        mesh when one exists), cached for the run's remaining epochs."""
        if split not in self._eval_stores:
            from mdvit_tpu.parallel.mesh import replicated
            self._eval_stores[split] = EvalSplitStore(
                [self.data[n][split] for n in self.names],
                sharding=replicated(self.mesh) if self.mesh is not None
                else None,
            )
        return self._eval_stores[split]

    # ------------------------------------------------------------------
    def maybe_resume(self):
        like = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "rng": self.state.rng,
            "epoch": 0,
            "max_iou": 0.0,
        }
        restored = ckpt.try_load_last(self.exp_dir, like)
        if restored is None:
            return
        self.state = self._place_on_mesh(TrainState(
            step=restored["step"], params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"], rng=restored["rng"],
        ))
        self.start_epoch = int(restored["epoch"]) + 1
        self.max_iou = float(restored["max_iou"])
        # `last` is saved every save_last_every epochs but `best` updates every
        # epoch; take the per-epoch sidecar's max_iou so a post-resume epoch
        # can never overwrite a better `best` checkpoint with a worse model
        meta = self._read_best_meta()
        if meta is not None and float(meta.get("max_iou", 0.0)) > self.max_iou:
            self.max_iou = float(meta["max_iou"])
            self.best_epoch = int(meta.get("best_epoch", self.best_epoch))
        print(f"resumed from epoch {self.start_epoch - 1}")

    def _best_meta_path(self) -> str:
        return os.path.join(self.exp_dir, "best_meta.json")

    def _read_best_meta(self):
        import json
        try:
            with open(self._best_meta_path()) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None

    def _write_best_meta(self):
        import json
        tmp = self._best_meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"max_iou": self.max_iou,
                       "best_epoch": self.best_epoch}, f)
        os.replace(tmp, self._best_meta_path())

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> dict:
        """Run one epoch; log per-step per-domain scalars AND epoch averages
        over all steps (AvgMeter semantics, ``multi_train_MDViT.py:181-232``).

        Step metrics are accumulated as device arrays and fetched with ONE
        host sync at epoch end — a per-step device_get through the tunnel
        would serialize the async dispatch pipeline.
        """
        t0 = time.time()
        pending = []
        step0 = int(self.state.step)
        profile_steps = int(self.config.tpu.get("profile_steps", 0) or 0)
        profiling = profile_steps > 0 and epoch == self.start_epoch
        if profiling:
            jax.profiler.start_trace(os.path.join(self.exp_dir, "profile"))
        for it in range(self.steps_per_epoch):
            indices = jnp.asarray(self.sampler.next_batch())
            self.state, metrics = self.train_step(
                self.state, self.store.images, self.store.masks, indices
            )
            pending.append(metrics)
            if profiling and it + 1 >= profile_steps:
                jax.block_until_ready(self.state.params)
                jax.profiler.stop_trace()
                profiling = False
                print(f"profiler trace ({profile_steps} steps) written to "
                      f"{os.path.join(self.exp_dir, 'profile')}")
            if self.config.debug:
                break
        if profiling:
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
        steps = jax.device_get(pending)
        dt = time.time() - t0

        # per-step per-domain scalars at the global step, like the reference
        for k, m in enumerate(steps):
            gstep = step0 + k + 1
            for i, n in enumerate(self.names):
                self.logger.add_scalar(
                    f"Train/{n}/loss", m["loss_per_domain"][i], gstep)
                self.logger.add_scalar(
                    f"Train/{n}/IOU", m["iou_per_domain"][i], gstep)
                if self.mkd:
                    self.logger.add_scalar(
                        f"Train/{n}/auxloss",
                        m["aux_loss_per_domain"][i], gstep)
                    self.logger.add_scalar(
                        f"Train/{n}/ktloss", m["kt_loss_per_domain"][i], gstep)

        # epoch means over ALL steps (the reference's AvgMeter averages)
        def mean_of(key):
            return float(np.mean([m[key] for m in steps]))

        epoch_mean = {
            "loss": mean_of("loss"),
            "iou": float(np.mean([m["iou_per_domain"] for m in steps])),
            "dice": float(np.mean([m["dice_per_domain"] for m in steps])),
        }
        gstep = step0 + len(steps)
        # lr per epoch (reference: multi_train_MDViT.py:326). The schedule is
        # step-indexed; recompute it host-side from the config. optax's
        # scale_by_schedule evaluates at the PRE-increment count, so the rate
        # the epoch's last update actually used is schedule(gstep - 1) — at a
        # StepLR boundary schedule(gstep) would report the NEXT epoch's lr.
        from mdvit_tpu.train.optim import steplr_schedule
        sched_cfg = self.config.train.get("scheduler", {})
        opt = self.config.train.optimizer
        base_lr = float(
            opt.adamw.lr if opt.mode == "adamw" else opt.adam.lr)
        lr_now = float(steplr_schedule(
            base_lr, int(sched_cfg.get("step_size", 50)),
            float(sched_cfg.get("gamma", 0.5)), self.steps_per_epoch)(
                max(gstep - 1, 0)))
        self.logger.add_scalar("Train/lr", lr_now, epoch)
        self.logger.add_scalar(
            "Train/Average/sum_loss", epoch_mean["loss"], gstep)
        self.logger.add_scalar("Train/Average/IOU", epoch_mean["iou"], gstep)
        if self.mkd:
            epoch_mean["aux_loss"] = mean_of("aux_loss")
            epoch_mean["kt_loss"] = mean_of("kt_loss")
            self.logger.add_scalar(
                "Train/Average/aux_loss", epoch_mean["aux_loss"], gstep)
            self.logger.add_scalar(
                "Train/Average/kt_loss", epoch_mean["kt_loss"], gstep)
        print(
            f"Epoch {epoch}, steps {len(steps)} || "
            f"sum_loss: {epoch_mean['loss']:.4f}, "
            f"Avg IOU: {epoch_mean['iou']:.4f} "
            f"|| {dt:.1f}s "
            f"({len(steps) * self.num_domains * self.batch_size / max(dt, 1e-9):.1f} img/s)"
        )
        return epoch_mean

    # ------------------------------------------------------------------
    def evaluate(self, split: str = "test", epoch: int | None = None) -> dict:
        """Per-domain batch-weighted loss/dice/iou (reference protocol)."""
        results = {}
        eval_bs = int(self.config.test.batch_size)
        pad_to = eval_bs
        if self.mesh is not None:
            # even shards for the sharded eval step: pad every batch up to a
            # mesh multiple but keep ITERATING at the nominal batch size —
            # Dice/IoU are medpy-global per eval batch then batch-weighted,
            # so the grouping is part of the metric protocol and must not
            # change with the device count (tests/test_trainer_dp.py pins
            # 1-device ≡ N-device evaluate())
            n = int(self.mesh.devices.size)
            pad_to = ((eval_bs + n - 1) // n) * n
        for di, n in enumerate(self.names):
            dom = self.data[n][split]
            loss_sum = dice_sum = iou_sum = 0.0
            aux_dice_sum = aux_iou_sum = 0.0
            num = 0
            onehot = np.zeros((pad_to, self.num_domains), np.float32)
            onehot[:, di] = 1.0
            onehot = jnp.asarray(onehot)
            aux_vars = None
            if self.mkd and "debranch" in self.state.params:
                # single-domain batches: slice the vmap-stacked debranch to
                # this dataset's branch (reference dispatch, mdvit.py:714-724)
                aux_vars = {
                    "params": jax.tree_util.tree_map(
                        lambda a: a[di], self.state.params["debranch"]),
                    "batch_stats": jax.tree_util.tree_map(
                        lambda a: a[di],
                        self.state.batch_stats.get("debranch", {})),
                }
            # dispatch every batch asynchronously; ONE host sync per dataset
            # (a per-batch device_get costs a tunnel round-trip each — at
            # ~200 eval batches/epoch that would dwarf the train step)
            pending = []
            if self.device_eval:
                # index-only H2D: gather + uint8→f32 run inside the jitted
                # step against the HBM-resident split store
                store = self._eval_store(split)
                off, n_dom = store.domain(di)
                batches = (
                    (store.images, store.masks, jnp.asarray(idx), valid)
                    for idx, valid in eval_index_batches(
                        off, n_dom, eval_bs, pad_to=pad_to))
            else:
                batches = (
                    (jnp.asarray(imgs), jnp.asarray(msks), None, valid)
                    for imgs, msks, valid in eval_batches(
                        dom, eval_bs, pad_to=pad_to))
            for imgs, msks, idx, valid in batches:
                out = self.eval_step(
                    self.state.params, self.state.batch_stats,
                    imgs, msks, onehot, jnp.asarray(valid, jnp.int32),
                    aux_vars=aux_vars, indices=idx,
                )
                pending.append((out, valid))
                if self.config.debug:
                    break
            for out, valid in jax.device_get(pending):
                dice, iou = counts_to_metrics(out["primary"])
                loss_sum += float(out["loss"]) * valid
                dice_sum += dice * valid
                iou_sum += iou * valid
                if self.mkd:
                    adice, aiou = counts_to_metrics(out["aux"])
                    aux_dice_sum += adice * valid
                    aux_iou_sum += aiou * valid
                num += valid
            results[n] = {
                "loss": loss_sum / num,
                "dice": dice_sum / num,
                "iou": iou_sum / num,
                "aux_dice": aux_dice_sum / num,
                "aux_iou": aux_iou_sum / num,
            }
            if epoch is not None:
                self.logger.add_scalar(f"Val/{n}/loss", results[n]["loss"], epoch)
                self.logger.add_scalar(f"Val/{n}/Di_score", results[n]["dice"], epoch)
                self.logger.add_scalar(f"Val/{n}/IOU", results[n]["iou"], epoch)
        return results

    # ------------------------------------------------------------------
    def fit(self):
        epochs = int(self.config.train.num_epochs)
        writer = ckpt.CheckpointWriter(self.exp_dir)
        if self.start_epoch == 0:
            # the reference saves initial weights to best_model_dir before
            # the epoch loop (multi_train_MDViT.py:114) so test() always has
            # a checkpoint even if val IoU never improves over 0
            writer.save_best(self.state.params, self.state.batch_stats)
        for epoch in range(self.start_epoch, epochs):
            self.train_epoch(epoch)
            val = self.evaluate("test", epoch=epoch)
            avg_iou = float(np.mean([v["iou"] for v in val.values()]))
            avg_dice = float(np.mean([v["dice"] for v in val.values()]))
            self.logger.add_scalar("Val/Average/IOU", avg_iou, epoch)
            self.logger.add_scalar("Val/Average/Di_score", avg_dice, epoch)
            print(
                f"Epoch {epoch}, Validation || Avg Dice: {avg_dice:.4f}, "
                f"Avg IOU: {avg_iou:.4f}"
            )
            if avg_iou > self.max_iou:
                writer.save_best(self.state.params, self.state.batch_stats)
                self.max_iou = avg_iou
                self.best_epoch = epoch
                self._write_best_meta()
                print(f"New best epoch {epoch}!===============================")
            every = int(self.config.train.get("save_last_every", 5) or 1)
            if (epoch + 1) % every == 0 or epoch == epochs - 1:
                writer.save_last(self.state, epoch, self.max_iou)
            self.logger.flush()
            if self.config.debug:
                writer.close()
                return
        writer.close()
        print(
            "Complete training ------------------------------------------\n"
            f"The best epoch is {self.best_epoch}"
        )

    # ------------------------------------------------------------------
    def test(self, model_dir: str | None = None) -> pd.DataFrame:
        """Load best checkpoint, evaluate test split, write test_results.csv
        (reference ``test()``, ``multi_train_MDViT.py:351-425``)."""
        like = {"params": self.state.params,
                "batch_stats": self.state.batch_stats}
        if model_dir is None:
            try:
                restored = ckpt.load_best(self.exp_dir, like)
            except FileNotFoundError:
                # degenerate runs may never save a best ckpt; fall back to last
                full = ckpt.try_load_last(self.exp_dir)
                if full is None:
                    raise
                print("best checkpoint missing; testing the last checkpoint")
                restored = {"params": full["params"],
                            "batch_stats": full["batch_stats"]}
        else:
            restored = ckpt.restore_pytree(model_dir, like)
        self.state = self._place_on_mesh(self.state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        ))
        results = self.evaluate("test")
        df = results_table(self.names, results)
        df.to_csv(os.path.join(self.exp_dir, "test_results.csv"), index=False)
        print(df)
        return df
