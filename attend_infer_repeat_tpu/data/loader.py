"""Loaders: reference-compatible pickles and in-memory minibatching.

Mirrors the reference's ``attend_infer_repeat/data.py`` public surface
(``load_data``, ``tensors_from_data`` — SURVEY §3 #6): pickles with keys
``imgs`` (N, H, W) and ``nums`` (N,), shuffled minibatch iteration.  The
TF1 index-producer machinery becomes a plain numpy permutation iterator —
batches land on device when the jitted train step consumes them.  New code
should prefer the fully on-device synthesis path (``synth.py``).
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Iterator, Tuple

import numpy as np


def load_data(path: str) -> dict:
    """Load a reference-format dataset pickle (``imgs`` + ``nums``)."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    imgs = np.asarray(blob["imgs"], np.float32)
    if imgs.max() > 1.5:
        imgs = imgs / 255.0
    out = {"imgs": imgs, "nums": np.asarray(blob["nums"], np.int32)}
    if "labels" in blob:
        out["labels"] = np.asarray(blob["labels"])
    return out


@dataclasses.dataclass
class InMemoryDataset:
    """Shuffled minibatcher over in-memory arrays (reference
    ``tensors_from_data`` equivalent)."""

    imgs: np.ndarray    # (N, H, W)
    nums: np.ndarray    # (N,)

    def __len__(self) -> int:
        return len(self.imgs)

    def batches(self, batch_size: int, seed: int = 0, shuffle: bool = True,
                ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Infinite iterator of ``(imgs, nums)`` minibatches (drops the
        ragged tail of each epoch, like the reference's producer)."""
        rng = np.random.default_rng(seed)
        n = len(self.imgs)
        if batch_size > n:
            raise ValueError(
                f"batch_size {batch_size} > dataset size {n}: the "
                f"tail-dropping iterator would yield nothing and block "
                f"forever")
        while True:
            order = rng.permutation(n) if shuffle else np.arange(n)
            for lo in range(0, n - batch_size + 1, batch_size):
                sel = order[lo:lo + batch_size]
                yield self.imgs[sel], self.nums[sel]


def auto_split(blob: dict, eval_fraction: float = 0.1,
               ) -> Tuple["InMemoryDataset", "InMemoryDataset"]:
    """Deterministic train/eval split of a single dataset pickle.

    Tail slice (same convention as ``digits.py``'s 90/10 digit-bank
    split): the last ``eval_fraction`` of rows become the held-out eval
    set.  Used when the training loop gets a train pickle but no
    validation pickle — rows logged under ``eval/*`` must never silently
    be held-in data (reference ``make_logger`` keeps distinct
    train/validation splits, SURVEY §4.5).
    """
    n = len(blob["imgs"])
    cut = n - int(n * eval_fraction)
    if cut <= 0 or cut >= n:
        raise ValueError(
            f"dataset has only {n} image(s) — too few to auto-split "
            f"{1 - eval_fraction:.0%}/{eval_fraction:.0%}; pass an "
            f"explicit validation pickle (--eval-data)")
    return (InMemoryDataset(blob["imgs"][:cut], blob["nums"][:cut]),
            InMemoryDataset(blob["imgs"][cut:], blob["nums"][cut:]))


def tensors_from_data(data: dict, batch_size: int, seed: int = 0,
                      shuffle: bool = True):
    """Reference-API shim: dataset dict → infinite minibatch iterator."""
    ds = InMemoryDataset(data["imgs"], data["nums"])
    return ds.batches(batch_size, seed=seed, shuffle=shuffle)


def batch_iterator(synth_fn, key, batch_size: int):
    """Infinite iterator over freshly synthesized on-device batches.

    Thin host-side wrapper for consumers that want an iterator interface;
    the train loop itself folds the key and calls ``synth_fn`` inside the
    jitted step instead (no host round-trip).
    """
    import jax

    step = 0
    while True:
        k = jax.random.fold_in(key, step)
        yield synth_fn(k, batch_size)
        step += 1
