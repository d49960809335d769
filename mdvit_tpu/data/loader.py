"""Device-resident multi-domain batching.

The reference drives four ``torch.utils.data.DataLoader`` round-robin
iterators, re-iterating each domain when exhausted
(``multi_train_MDViT.py:106-134``): every optimizer step consumes one
batch-of-4 from EVERY domain. Here the four domains are stacked into one
``(D·B, ...)`` device batch; the epoch length is
``max(len(domain))//batch_size`` like the reference's
``iterations = max(len(loader))`` (``:112``).

TPU-native: the full uint8 corpus sits in device HBM; the host only supplies
``(D, B)`` int32 index arrays per step, and the gather + augmentation run
inside the jitted train step. Zero per-step image H2D traffic.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mdvit_tpu.data.datasets import DomainArrays


class DeviceDomainStore:
    """Uploads each domain's arrays to device once; exposes them as a tuple
    of (images_u8, masks_u8) jax arrays for consumption inside jit."""

    def __init__(self, domains: Sequence[DomainArrays], sharding=None):
        self.names = [d.name for d in domains]
        self.sizes = [len(d) for d in domains]
        put = (lambda a: jax.device_put(a, sharding)) if sharding else jax.device_put
        self.images = tuple(put(d.images) for d in domains)
        self.masks = tuple(put(d.masks) for d in domains)


class RoundRobinSampler:
    """Per-domain shuffled index streams with drop_last + re-shuffle on
    exhaustion (reference DataLoader(shuffle=True, drop_last=True) + the
    StopIteration re-iter at ``multi_train_MDViT.py:130-134``)."""

    def __init__(self, sizes: Sequence[int], batch_size: int, seed: int = 0):
        self.sizes = list(sizes)
        self.batch_size = batch_size
        small = [(i, s) for i, s in enumerate(self.sizes) if s < batch_size]
        if small:
            # the reference's drop_last DataLoader would yield ZERO batches
            # for such a domain and its re-iter loop would spin forever —
            # fail up front instead of emitting ragged/empty index rows
            raise ValueError(
                f"batch_size={batch_size} exceeds the training-set size of "
                f"domain(s) {small}")
        self._rngs = [np.random.RandomState(seed + i) for i in range(len(sizes))]
        self._queues = [self._fresh(i) for i in range(len(sizes))]

    def _fresh(self, i: int) -> list[int]:
        perm = self._rngs[i].permutation(self.sizes[i])
        usable = (self.sizes[i] // self.batch_size) * self.batch_size
        return list(perm[:usable])

    @property
    def steps_per_epoch(self) -> int:
        return max(s // self.batch_size for s in self.sizes)

    def next_batch(self) -> np.ndarray:
        """(D, B) int32 indices, one row per domain."""
        rows = []
        for i in range(len(self.sizes)):
            if len(self._queues[i]) < self.batch_size:
                self._queues[i] = self._fresh(i)
            rows.append(self._queues[i][: self.batch_size])
            del self._queues[i][: self.batch_size]
        return np.asarray(rows, np.int32)


def gather_batch(
    store_images: tuple, store_masks: tuple, indices: jax.Array
):
    """Inside-jit gather: stack D per-domain batches into one (D·B, S, S, ·)
    float batch plus the (D·B, D) one-hot. ``indices`` is (D, B)."""
    d = len(store_images)
    b = indices.shape[1]
    imgs = jnp.concatenate(
        [store_images[i][indices[i]] for i in range(d)], axis=0
    ).astype(jnp.float32)
    masks = jnp.concatenate(
        [store_masks[i][indices[i]] for i in range(d)], axis=0
    ).astype(jnp.float32)
    onehot = jnp.repeat(jnp.eye(d, dtype=jnp.float32), b, axis=0)
    return imgs, masks, onehot


class EvalSplitStore:
    """Device-resident eval split: ALL domains of one split concatenated into
    a single uint8 (N, S, S, 3) images / (N, S, S) masks pair uploaded to HBM
    once, plus per-domain offsets. ``evaluate()`` then transfers only tiny
    int32 index rows per batch — the eval loop becomes zero-image-H2D like
    the train loop (gather + uint8→f32 happen inside the jitted eval step).

    One concatenated array (rather than per-domain arrays) keeps the eval
    step at ONE compiled shape across domains and splits.
    """

    def __init__(self, domains: Sequence[DomainArrays], sharding=None):
        self.names = [d.name for d in domains]
        sizes = [len(d) for d in domains]
        self.sizes = sizes
        self.offsets = np.concatenate([[0], np.cumsum(sizes[:-1])]).astype(int)
        put = (lambda a: jax.device_put(a, sharding)) if sharding else jax.device_put
        self.images = put(np.concatenate([d.images for d in domains], axis=0))
        self.masks = put(np.concatenate([d.masks for d in domains], axis=0))

    def domain(self, i: int) -> tuple[int, int]:
        return int(self.offsets[i]), int(self.sizes[i])


def eval_index_batches(offset: int, n: int, batch_size: int,
                       pad_to: int | None = None):
    """Yield ``(indices, valid)`` for one domain of an :class:`EvalSplitStore`
    — the index-only twin of :func:`eval_batches`. ``indices`` is a static
    (pad_to,) int32 array of absolute store rows; the ragged tail is padded
    by repeating the domain's first row (the eval step masks every reduction
    by ``valid``, so padding CONTENT is irrelevant — pinned equal to the
    zero-padded streaming path by tests/test_trainer_dp.py)."""
    pad_to = batch_size if pad_to is None else max(pad_to, batch_size)
    for start in range(0, n, batch_size):
        stop = min(start + batch_size, n)
        valid = stop - start
        idx = np.full((pad_to,), offset, np.int32)
        idx[:valid] = np.arange(offset + start, offset + stop, dtype=np.int32)
        yield idx, valid


def eval_batches(domain: DomainArrays, batch_size: int, pad_to: int | None = None):
    """Yield padded eval batches (images, masks, valid_count). Pads the ragged
    tail to keep shapes static for jit; metrics must mask by valid_count.

    ``pad_to`` (≥ batch_size) pads EVERY batch to that static size while the
    iteration — and therefore the metric grouping — stays at ``batch_size``.
    Dice/IoU here are medpy-global per eval batch then batch-weighted, so the
    grouping is part of the metric protocol: DP meshes pass ``pad_to`` = the
    next mesh multiple instead of raising the batch size, keeping N-device
    ``evaluate()`` bit-comparable to the single-chip protocol
    (reference batch-weighted protocol, ``multi_train_MDViT.py:273-291``).
    """
    n = len(domain)
    pad_to = batch_size if pad_to is None else max(pad_to, batch_size)
    for start in range(0, n, batch_size):
        stop = min(start + batch_size, n)
        imgs = domain.images[start:stop].astype(np.float32)
        msks = domain.masks[start:stop].astype(np.float32)
        valid = stop - start
        if valid < pad_to:
            pad = pad_to - valid
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:], np.float32)])
            msks = np.concatenate([msks, np.zeros((pad,) + msks.shape[1:], np.float32)])
        yield imgs, msks, valid
