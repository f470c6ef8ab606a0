"""On-device multi-digit canvas synthesis (jit-compiled data generation).

Replaces the reference's offline generator (``scripts/create_dataset.sh`` →
pickle files — SURVEY §4.4) with the north star's on-device preprocessing
stage: canvases are composed on the accelerator with vectorized JAX ops,
one RNG key per batch, using the SAME separable spatial-transformer paste
as the model's decoder (``ops/spatial_transformer.py:st_paste``).  This
keeps the whole train step — data synthesis included — inside one XLA
program; no host↔device transfer of image batches at all.

Per canvas:
  1. ``k ~ Uniform{min_digits .. max_digits}`` digits (the ground-truth
     count, used for evaluation only).
  2. Each of the ``max_digits`` slots draws a digit index from the bank, a
     scale from ``scale_range``, and a uniform in-bounds position.
  3. Slots are assigned DISTINCT grid cells (per-example random
     permutation) and jittered inside them — non-overlapping digit boxes
     by construction, with static shapes (the reference generator avoids
     heavy overlap via host-side rejection; see the placement comment
     below for why rejection cannot work here).
  4. Slots are pasted with ``st_paste`` (bilinear, handles sub-pixel
     positions and rescaling in one affine) and summed, masked by slot
     presence; pixel values clip to [0, 1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from attend_infer_repeat_tpu.configs import DataConfig
from attend_infer_repeat_tpu.ops.spatial_transformer import st_paste




def synthesize_batch(key: jax.Array, digit_bank: jax.Array,
                     cfg: DataConfig, batch: int,
                     return_meta: bool = False):
    """Generate a batch of canvases.

    ``digit_bank (N, dh, dw)`` float32 in [0,1] (device-resident).
    Returns ``(imgs (batch, H, W) float32, nums (batch,) int32)``; with
    ``return_meta`` also a dict of per-slot placement geometry
    (normalized half-extents ``sx``/``sy``, centers ``tx``/``ty``,
    ``present`` mask) for analysis (scripts/characterize_overlap.py).
    """
    ch, cw = cfg.canvas_size
    dh, dw = cfg.digit_size
    t_slots = max(cfg.max_digits, 1)
    n_bank = digit_bank.shape[0]

    k_count, k_idx, k_scale, k_pos = jax.random.split(key, 4)

    # 1. ground-truth count per canvas and slot presence mask
    nums = jax.random.randint(
        k_count, (batch,), cfg.min_digits, cfg.max_digits + 1)
    slot = jnp.arange(t_slots)
    present = (slot[None, :] < nums[:, None]).astype(jnp.float32)  # (B, T)

    # 2. digit indices and scales per slot
    idx = jax.random.randint(k_idx, (batch, t_slots), 0, n_bank)
    lo, hi = cfg.scale_range
    s = jax.random.uniform(k_scale, (batch, t_slots), minval=lo, maxval=hi)
    # normalized half-extents of the pasted digit on the canvas
    sx = s * dw / cw
    sy = s * dh / ch

    # 3. positions
    if cfg.placement == "uniform":
        tx, ty = _uniform_positions(k_pos, sx, sy, cfg)
    else:
        tx, ty = _grid_positions(k_pos, sx, sy, cfg, t_slots)

    # 4. paste: glimpse = digit template, z_where = (sx, sy, tx, ty)
    z_where = jnp.stack([sx, sy, tx, ty], axis=-1)          # (B, T, 4)
    glimpses = digit_bank[idx]                              # (B, T, dh, dw)
    pastes = st_paste(glimpses, z_where, (ch, cw))          # (B, T, H, W)
    imgs = jnp.sum(pastes * present[..., None, None], axis=1)
    imgs = jnp.clip(imgs, 0.0, 1.0)
    nums = nums.astype(jnp.int32)
    if return_meta:
        return imgs, nums, {"sx": sx, "sy": sy, "tx": tx, "ty": ty,
                            "present": present}
    return imgs, nums


def _grid_positions(k_pos: jax.Array, sx: jax.Array, sy: jax.Array,
                    cfg: DataConfig, t_slots: int):
    """Disjoint-by-construction placement (the easy counting task).

    Rejection sampling is a poor fit for XLA (data-dependent convergence)
    and is actually infeasible for large digits (a centered first digit
    leaves NO disjoint spot for a second 20 px digit on a 50 px canvas).
    Instead: partition the canvas into a G×G grid, assign each slot a
    DISTINCT cell via a per-example random permutation, and jitter the
    digit inside its cell.  Boxes stay inside their cells → disjoint.
    """
    batch = sx.shape[0]
    g = _grid_size(t_slots, cfg)
    k_cell, k_jit = jax.random.split(k_pos)
    # distinct cells per example: argsort of iid uniforms = a uniform
    # random permutation, as ONE batched sort (a vmapped Fisher-Yates
    # permutation was the most expensive op in the synthesis pipeline)
    scores = jax.random.uniform(k_cell, (batch, g * g))
    cell_ids = jnp.argsort(scores, axis=-1)[:, :t_slots]   # (B, T)
    row = (cell_ids // g).astype(jnp.float32)
    col = (cell_ids % g).astype(jnp.float32)
    cell_w = 2.0 / g                                       # normalized units
    cx = -1.0 + (col + 0.5) * cell_w                       # cell centers
    cy = -1.0 + (row + 0.5) * cell_w
    # jitter: keep the digit box (half-extent sx) inside the cell, with a
    # small margin; if the box is bigger than the cell, pin to center.
    margin = cfg.cell_margin * cell_w
    free_x = jnp.maximum(cell_w / 2 - sx - margin, 0.0)
    free_y = jnp.maximum(cell_w / 2 - sy - margin, 0.0)
    u = jax.random.uniform(k_jit, (batch, t_slots, 2), minval=-1.0,
                           maxval=1.0)
    return cx + u[..., 0] * free_x, cy + u[..., 1] * free_y


def _pairwise_iou(ax, ay, aw, ah, bx, by, bw, bh):
    """IoU of axis-aligned boxes given centers and half-extents
    (broadcasting; normalized [-1, 1] canvas coordinates)."""
    ix = jnp.maximum(0.0, jnp.minimum(ax + aw, bx + bw)
                     - jnp.maximum(ax - aw, bx - bw))
    iy = jnp.maximum(0.0, jnp.minimum(ay + ah, by + bh)
                     - jnp.maximum(ay - ah, by - bh))
    inter = ix * iy
    union = 4.0 * aw * ah + 4.0 * bw * bh - inter
    return inter / jnp.maximum(union, 1e-8)


def _uniform_positions(k_pos: jax.Array, sx: jax.Array, sy: jax.Array,
                       cfg: DataConfig):
    """Reference-style placement: uniform in-bounds positions, HEAVY
    overlap softly rejected (SURVEY §1.4/§4.4 — digits may touch/overlap;
    AIR's explain-away is what untangles them).

    Static-shape rejection: each slot draws ``place_attempts`` candidate
    positions and takes the FIRST whose worst IoU against all previously
    placed slots is ≤ ``overlap_iou_max``; if every candidate overlaps
    heavily, the last one is used anyway (soft rejection — overlap happens,
    exactly like host-side rejection with a retry budget).  The slot loop
    is a Python unroll over ≤ max_digits (static), so the whole generator
    stays one XLA program.
    """
    batch, t_slots = sx.shape
    n_try = cfg.place_attempts
    u = jax.random.uniform(k_pos, (batch, t_slots, n_try, 2),
                           minval=-1.0, maxval=1.0)
    cand_x = u[..., 0] * jnp.maximum(1.0 - sx, 0.0)[..., None]  # (B, T, R)
    cand_y = u[..., 1] * jnp.maximum(1.0 - sy, 0.0)[..., None]

    txs, tys = [], []
    for t in range(t_slots):
        cx, cy = cand_x[:, t], cand_y[:, t]                  # (B, R)
        if txs:
            prev_x = jnp.stack(txs, axis=1)                  # (B, t)
            prev_y = jnp.stack(tys, axis=1)
            worst = jnp.max(_pairwise_iou(
                cx[:, None, :], cy[:, None, :],
                sx[:, t, None, None], sy[:, t, None, None],
                prev_x[:, :, None], prev_y[:, :, None],
                sx[:, :t, None], sy[:, :t, None]), axis=1)   # (B, R)
            ok = worst <= cfg.overlap_iou_max
            pick = jnp.where(jnp.any(ok, axis=-1),
                             jnp.argmax(ok, axis=-1), n_try - 1)
        else:
            pick = jnp.zeros((batch,), jnp.int32)
        txs.append(jnp.take_along_axis(cx, pick[:, None], axis=1)[:, 0])
        tys.append(jnp.take_along_axis(cy, pick[:, None], axis=1)[:, 0])
    return jnp.stack(txs, axis=1), jnp.stack(tys, axis=1)


def _grid_size(t_slots: int, cfg: DataConfig) -> int:
    """Smallest G ≥ 2 with G² ≥ slots (distinct cells must exist).

    If a max-scale digit is bigger than a cell, the jitter range collapses
    and digits sit at distinct cell centers — maximally spread, possibly
    touching — which degrades gracefully for infeasible geometries.
    """
    import math

    return max(2, math.ceil(math.sqrt(max(t_slots, 1))))


def make_synth_fn(cfg: DataConfig, digit_bank):
    """Jit-compiled ``(key, batch) → (imgs, nums)`` with a baked-in bank."""
    bank = jnp.asarray(digit_bank)

    @functools.partial(jax.jit, static_argnums=1)
    def synth(key, batch: int):
        return synthesize_batch(key, bank, cfg, batch)

    return synth
