"""Device mesh + sharding helpers.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(``multi_train_MDViT.py:73-74``). TPU-native equivalent: a ``jax.sharding.Mesh``
with a ``data`` axis; the stacked multi-domain batch is sharded over it and
XLA inserts the gradient all-reduces (ICI collectives) automatically via
GSPMD — no explicit NCCL-style code. Multi-host extends the same mesh over
DCN with ``jax.distributed.initialize``.

Domain-grouped batch layout vs. data sharding: the (D·B) batch is domain-
contiguous, so sharding its leading axis over N devices keeps each domain's
group together as long as D·B % N == 0; the per-domain masked BN statistics
are global sums over the batch axis, which GSPMD turns into psums — per-domain
stats stay exact under any such sharding.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is None or n_devices == -1:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested a {n_devices}-device mesh but only {len(devices)} "
            "devices are visible")
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_batch(x, sharding: NamedSharding | None):
    if sharding is None:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)
