"""Digit template banks: the raw single-digit images canvases are built from.

The reference pulls MNIST via TF's tutorial loader inside its offline
generator script (SURVEY §4.4).  This environment has no network and no
MNIST archive on disk, so the default bank is scikit-learn's *bundled*
8×8 handwritten-digit set upsampled to the configured digit size — same
role (grayscale digits in [0, 1] with labels), fully offline.  Real MNIST
(an ``.npz`` with ``images``/``labels`` or the reference's pickle format)
is supported via ``source="mnist:<path>"``.
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np


def load_digit_bank(source: str = "auto", digit_size=(28, 28),
                    split: str = "train"):
    """Return ``(images (N, h, w) float32 in [0,1], labels (N,) int32)``.

    ``source``:
      - ``"auto"`` / ``"sklearn"`` — scikit-learn's bundled digits,
        bilinearly upsampled to ``digit_size``.  Deterministic 90/10
        train/eval split.
      - ``"mnist:<path>"`` — load ``<path>``: either an ``.npz`` with
        ``images`` (N, 28, 28 uint8/float) + ``labels``, or a pickle with
        the reference's keys.
    """
    if source in ("auto", "sklearn"):
        return _sklearn_bank(digit_size, split)
    if source.startswith("mnist:"):
        return _file_bank(source[len("mnist:"):], digit_size, split)
    raise ValueError(f"unknown digit source {source!r}")


def _sklearn_bank(digit_size, split):
    from sklearn.datasets import load_digits

    raw = load_digits()
    imgs = np.asarray(raw.images, np.float32) / 16.0      # (1797, 8, 8)
    labels = np.asarray(raw.target, np.int32)
    n_eval = len(imgs) // 10
    if split == "train":
        imgs, labels = imgs[:-n_eval], labels[:-n_eval]
    else:
        imgs, labels = imgs[-n_eval:], labels[-n_eval:]
    up = jax.image.resize(
        jnp.asarray(imgs), (imgs.shape[0],) + tuple(digit_size), "linear")
    up = jnp.clip(up * 1.6, 0.0, 1.0)   # restore contrast lost to smoothing
    return np.asarray(up, np.float32), labels


def _file_bank(path, digit_size, split="train"):
    if path.endswith(".npz"):
        blob = np.load(path)
        imgs = np.asarray(blob["images"], np.float32)
        labels = np.asarray(blob["labels"], np.int32)
    else:
        with open(path, "rb") as f:
            blob = pickle.load(f)
        imgs = np.asarray(blob["imgs"], np.float32)
        labels = np.asarray(blob.get("labels",
                                     np.zeros(len(imgs))), np.int32)
    # deterministic 90/10 train/eval split (same convention as the
    # bundled bank) so eval canvases use held-out digits
    n_eval = max(len(imgs) // 10, 1)
    if split == "train":
        imgs, labels = imgs[:-n_eval], labels[:-n_eval]
    else:
        imgs, labels = imgs[-n_eval:], labels[-n_eval:]
    if imgs.max() > 1.5:
        imgs = imgs / 255.0
    if imgs.shape[-2:] != tuple(digit_size):
        imgs = np.asarray(jax.image.resize(
            jnp.asarray(imgs), (imgs.shape[0],) + tuple(digit_size),
            "linear"), np.float32)
    return imgs, labels
