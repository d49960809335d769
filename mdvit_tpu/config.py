"""Config system: YAML + CLI overrides → DotDict.

Key-compatible with the reference config (``Configs/multi_train_local.yml:1-50``,
CLI override precedence at ``multi_train_MDViT.py:442-447``): CLI > YAML >
defaults. The reference stores lr/eps as *strings* and floats them at the use
site; we normalise numerics at load time instead, while still accepting the
string form for config-file compatibility.

TPU-native extensions live under ``tpu:`` (mesh shape, dtype policy, on-device
augmentation) and default to sensible single-chip values.
"""
from __future__ import annotations

import argparse
import copy
from typing import Any, Sequence

import yaml

from mdvit_tpu.utils.pieces import DotDict

DEFAULT_CONFIG: dict[str, Any] = {
    "name": "mdvit_tpu experiment",
    "root_dir": ".",
    "pretrained_folder": "",  # dir of converted backbone trees (TransFuse;
    # see scripts/convert_torch_weights.py + train/pretrained.py)
    "device": "tpu",
    "debug": False,  # True: one batch per train/val/test loop, one epoch
    "seed": 42,
    "model": "MDViT",
    "data": {
        "name": ["isic2018", "PH2", "DMF", "SKD"],
        "data_folder": "./data/skin_lesion",
        "k_fold": "4",  # 'No' or '0'..'4' (string, as in the reference)
        "split_ratio": [0.8, 0.2],
        "use_val": False,
        "train_aug": True,
        "img_size": 256,
        "synthetic": False,  # use generated data (for tests/benchmarks)
        "synthetic_sizes": None,  # per-domain sample counts when synthetic
    },
    "train": {
        "num_workers": 2,
        "num_epochs": 200,
        "save_last_every": 5,  # full-state resume ckpt cadence (420 MB; the
        # write is async but finalize blocks when it outlasts an epoch)
        "num_iters": False,
        "batch_size": 4,  # per-domain batch size
        "optimizer": {
            "mode": "adamw",
            "adamw": {
                "lr": 1e-4,
                "betas": [0.9, 0.999],
                "eps": 1e-8,
                "weight_decay": 0.05,
            },
            "adam": {"lr": 1e-4, "betas": [0.9, 0.999], "eps": 1e-8},
        },
        "scheduler": {"mode": "step", "step_size": 50, "gamma": 0.5},
        "alpha": 0.5,  # MKD loss mixing weight (multi_train_MDViT.py:105)
        "det_sup": True,  # aux losses do not update domain_layer params
    },
    "test": {
        "only_test": False,
        "test_model_dir": "",
        "num_workers": 2,
        "batch_size": 5,
    },
    "model_encoder_id": 0,
    "model_adapt": {
        "adapt_method": "Sup",  # 'Sup' | False
        "Sup_label": "Domain",
        "use_one_hot": True,
        "num_domains": 4,
    },
    "kt": {"ensemble_method": "att"},
    "tpu": {
        "mesh": {"data": -1},  # -1: all visible devices on the data axis
        "compute_dtype": "bfloat16",  # 'bfloat16' | 'float32' — bf16 activations / fp32 params+norms track fp32 convergence epoch-for-epoch (Dice deltas < 0.002 over 6-epoch runs)
        "device_augment": True,  # run augmentations inside the jitted step
        "device_eval": True,  # eval splits HBM-resident; evaluate() sends
        # only int32 index rows (False: stream fp32 batches from host)
        "donate": True,
        "remat": False,  # jax.checkpoint the forward: recompute activations
        # in the backward (memory for FLOPs; see train/steps.py)
        "xla_options": {  # per-computation XLA overrides for the train step;
            # applied only on TPU backends (CPU rejects TPU flag names).
            # 24 MiB scoped vmem: measured +2% (README §floor); 64 MiB: −4%
            "xla_tpu_scoped_vmem_limit_kib": "24576",
        },
    },
    "log": {"every_steps": 10, "backend": "csv"},
}

_NUMERIC_KEYS = {
    "lr",
    "eps",
    "weight_decay",
    "gamma",
    "alpha",
}


def _normalize_numerics(obj: Any) -> Any:
    """Convert string-typed numerics (reference stores lr: '1e-4') to float."""
    if isinstance(obj, dict):
        return {
            k: float(v)
            if k in _NUMERIC_KEYS and isinstance(v, str)
            else _normalize_numerics(v)
            for k, v in obj.items()
        }
    if isinstance(obj, list):
        return [_normalize_numerics(v) for v in obj]
    return obj


def _deep_update(base: dict, upd: dict) -> dict:
    for k, v in upd.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v
    return base


def load_config(
    config_yml: str | None = None, overrides: dict[str, Any] | None = None
) -> DotDict:
    cfg = copy.deepcopy(DEFAULT_CONFIG)
    if config_yml:
        with open(config_yml) as f:
            file_cfg = yaml.safe_load(f) or {}
        _deep_update(cfg, _normalize_numerics(file_cfg))
    if overrides:
        _deep_update(cfg, _normalize_numerics(overrides))
    return DotDict(cfg)


def build_argparser() -> argparse.ArgumentParser:
    """CLI surface mirrors the reference (``multi_train_MDViT.py:433-441``)."""
    p = argparse.ArgumentParser(description="mdvit_tpu training")
    p.add_argument("--exp_name", type=str, default="exp")
    p.add_argument("--config_yml", type=str, default=None)
    p.add_argument("--model", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--adapt_method", type=str, default=None)
    p.add_argument("--sup_label", type=str, default=None)
    p.add_argument("--dataset", type=str, nargs="+", default=None)
    p.add_argument("--k_fold", type=str, default=None)
    p.add_argument("--num_epochs", type=int, default=None)
    p.add_argument("--data_folder", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--results_dir", type=str, default="./results")
    p.add_argument(
        "--exp_dir", type=str, default=None,
        help="exact experiment dir (overrides the timestamped path; point at "
        "an existing run to resume from its last checkpoint)",
    )
    p.add_argument(
        "--profile_steps", type=int, default=0,
        help="capture a jax.profiler trace of this many train steps into "
        "<exp_dir>/profile (view with TensorBoard)",
    )
    p.add_argument(
        "--distributed", action="store_true",
        help="call jax.distributed.initialize() for multi-host (DCN) "
        "training; env-based coordinator discovery (TPU pods set this up)",
    )
    return p


def config_from_args(args: argparse.Namespace) -> DotDict:
    overrides: dict[str, Any] = {}
    if args.model is not None:
        overrides["model"] = args.model
    if args.batch_size is not None:
        overrides.setdefault("train", {})["batch_size"] = args.batch_size
    if args.num_epochs is not None:
        overrides.setdefault("train", {})["num_epochs"] = args.num_epochs
    if args.adapt_method is not None:
        # the reference passes the *string* 'False' here and only ever checks
        # `'Sup' in adapt_method` — we convert it to a real False
        m = args.adapt_method
        overrides.setdefault("model_adapt", {})["adapt_method"] = (
            False if m in ("False", "false", "none", "None") else m
        )
    if args.sup_label is not None:
        overrides.setdefault("model_adapt", {})["Sup_label"] = args.sup_label
    if args.dataset is not None:
        overrides.setdefault("data", {})["name"] = list(args.dataset)
    if args.k_fold is not None:
        overrides.setdefault("data", {})["k_fold"] = args.k_fold
    if args.data_folder is not None:
        overrides.setdefault("data", {})["data_folder"] = args.data_folder
    if args.synthetic:
        overrides.setdefault("data", {})["synthetic"] = True
    if args.debug:
        overrides["debug"] = True
    if args.profile_steps:
        overrides.setdefault("tpu", {})["profile_steps"] = args.profile_steps
    if args.distributed:
        overrides.setdefault("tpu", {})["distributed"] = True
    cfg = load_config(args.config_yml, overrides)
    cfg["exp_name"] = args.exp_name
    cfg["results_dir"] = args.results_dir
    return cfg


def save_config(cfg: DotDict, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)
