"""Differentiable view metrics (per-sample; reductions happen in the runner).

Behavioural reference: /root/reference/yanerf/pipelines/utils.py:36-269.
Every loss returns shape ``(B,)`` — the batch dimension is preserved so the
distributed-eval contract (all-gather -> truncate to dataset length -> mean)
stays exact regardless of sharding.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .sampling import sample_grid


def safe_sqrt(x: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Differentiable sqrt, clamped at zero and offset by ``eps``."""
    return jnp.sqrt(jnp.clip(x, min=0.0) + eps)


def huber(dfsq: jax.Array, scaling: float = 0.03) -> jax.Array:
    """Huber-style robustification of a squared error."""
    return (safe_sqrt(1.0 + dfsq / (scaling * scaling), eps=1e-4) - 1.0) * scaling


def calc_mse(x: jax.Array, y: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    if mask is None:
        return jnp.mean((x - y) ** 2, axis=-1)
    num = jnp.sum(((x - y) ** 2) * mask, axis=-1)
    den = jnp.clip(jnp.sum(jnp.broadcast_to(mask, x.shape), axis=-1), min=1e-5)
    return num / den


def calc_psnr(x: jax.Array, y: jax.Array, mask: Optional[jax.Array] = None, base: float = 1.0) -> jax.Array:
    mse = calc_mse(x, y, mask=mask)
    return jnp.log10(jnp.clip(mse, min=1e-10)) * (-10.0) + 20.0 * math.log10(base)


def mse2psnr(mse: float, base: float = 1.0) -> float:
    return math.log10(max(1e-10, mse)) * (-10.0) + 20.0 * math.log10(base)


def rgb_metrics(
    images: jax.Array,
    images_pred: jax.Array,
    loss_reweight_masks: Optional[jax.Array] = None,
    huber_scaling: float = 0.03,
) -> Dict[str, jax.Array]:
    """Per-sample ``rgb_mse`` and ``rgb_huber`` over flattened pixels."""
    batch_size = images.shape[0]
    images = images.reshape(batch_size, -1)
    images_pred = images_pred.reshape(batch_size, -1)

    differences = (images_pred - images) ** 2
    if loss_reweight_masks is not None:
        differences = differences * loss_reweight_masks.reshape(batch_size, -1)

    rgb_squared = jnp.mean(differences, axis=-1)
    return {"rgb_huber": huber(rgb_squared, scaling=huber_scaling), "rgb_mse": rgb_squared}


def estimate_depth_scale_factor(
    pred: jax.Array, gt: jax.Array, mask: jax.Array, clamp_thr: float
) -> jax.Array:
    reduce_axes = tuple(range(1, pred.ndim))
    xy = jnp.mean(pred * gt * mask, axis=reduce_axes)
    xx = jnp.mean(pred * pred * mask, axis=reduce_axes)
    return xy / jnp.clip(xx, min=clamp_thr)


def eval_depth(
    pred: jax.Array,
    gt: jax.Array,
    crop: int = 1,
    mask: Optional[jax.Array] = None,
    get_best_scale: bool = True,
    mask_thr: float = 0.5,
    best_scale_clamp_thr: float = 1e-4,
) -> Tuple[jax.Array, jax.Array]:
    """Per-sample depth MSE / MAE with optional best-scale alignment.

    ``pred``/``gt`` are ``(B, *spatial, 1)``; ``crop`` removes a border from the
    two innermost spatial dims (only meaningful for image-shaped inputs).
    """
    if crop > 0:
        gt = gt[:, crop:-crop, crop:-crop]
        pred = pred[:, crop:-crop, crop:-crop]
        if mask is not None:
            mask = mask[:, crop:-crop, crop:-crop]
    if mask is not None:
        gt = gt * (mask > mask_thr).astype(gt.dtype)

    dmask = (gt > 0.0).astype(gt.dtype)
    reduce_axes = tuple(range(1, pred.ndim))
    dmask_mass = jnp.clip(jnp.sum(dmask, axis=reduce_axes), min=1e-4)

    if get_best_scale:
        scale_best = estimate_depth_scale_factor(pred, gt, dmask, best_scale_clamp_thr)
        pred = pred * scale_best.reshape((-1,) + (1,) * (pred.ndim - 1))

    df = gt - pred
    mse_depth = jnp.sum(dmask * (df ** 2), axis=reduce_axes) / dmask_mass
    abs_depth = jnp.sum(dmask * jnp.abs(df), axis=reduce_axes) / dmask_mass
    return mse_depth, abs_depth


def calc_ssim(
    x: jax.Array,
    y: jax.Array,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Per-sample SSIM over ``(B, H, W, C)`` images (Wang et al. 2004).

    The standard NeRF evaluation metric alongside PSNR (the reference
    reports PSNR only). Separable Gaussian windows via two 1-D
    convolutions with channels folded into the batch — VPU/MXU-friendly,
    no gathers. Returns ``(B,)`` mean SSIM.
    """
    b, h, w, c = x.shape
    hw = filter_size // 2
    offsets = jnp.arange(filter_size, dtype=jnp.float32) - hw
    kernel = jnp.exp(-0.5 * (offsets / filter_sigma) ** 2)
    kernel = kernel / jnp.sum(kernel)

    def blur(img):
        # (B, H, W, C) -> depthwise separable gaussian, VALID padding
        flat = jnp.moveaxis(img, -1, 1).reshape(b * c, 1, h, w)
        k_row = kernel.reshape(1, 1, 1, filter_size)
        k_col = kernel.reshape(1, 1, filter_size, 1)
        # HIGHEST precision: TPU convs otherwise run operands in bf16 on the
        # MXU, and the windowed variances below (blur(x*x) - mu^2) cancel
        # catastrophically — measured SSIM "values" up to 4.3 on real eval
        # frames before this was pinned. SSIM is a metric; it must be f32.
        out = jax.lax.conv_general_dilated(
            flat, k_row, (1, 1), "VALID", precision=jax.lax.Precision.HIGHEST
        )
        out = jax.lax.conv_general_dilated(
            out, k_col, (1, 1), "VALID", precision=jax.lax.Precision.HIGHEST
        )
        return out.reshape(b, c, h - 2 * hw, w - 2 * hw)

    x32 = x.astype(jnp.float32)
    y32 = y.astype(jnp.float32)
    mu_x, mu_y = blur(x32), blur(y32)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_xx = blur(x32 * x32) - mu_xx
    sigma_yy = blur(y32 * y32) - mu_yy
    sigma_xy = blur(x32 * y32) - mu_xy

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    ssim_map = ((2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)) / (
        (mu_xx + mu_yy + c1) * (sigma_xx + sigma_yy + c2)
    )
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def view_metrics(
    image_sampling_grid: jax.Array,
    images: Optional[jax.Array] = None,
    images_pred: Optional[jax.Array] = None,
    depths: Optional[jax.Array] = None,
    depths_pred: Optional[jax.Array] = None,
    loss_reweight_masks: Optional[jax.Array] = None,
    keys_prefix: str = "loss_",
) -> Dict[str, jax.Array]:
    """Gather GT at the sampled pixel grid and compute per-sample losses.

    Ground-truth tensors are full images ``(B, H, W, C)``; predictions are
    defined at ``image_sampling_grid`` locations ``(B, *spatial, 2)``.
    """

    def _maybe_sample(tensor):
        return None if tensor is None else sample_grid(tensor, image_sampling_grid)

    images = _maybe_sample(images)
    depths = _maybe_sample(depths)
    loss_reweight_masks = _maybe_sample(loss_reweight_masks)

    preds: Dict[str, jax.Array] = {}
    if images is not None and images_pred is not None:
        preds.update(rgb_metrics(images, images_pred, loss_reweight_masks))
        # SSIM only makes sense on full image grids (FULL_GRID eval, where
        # spatial is (H, W)); MASK_SAMPLE predictions are (N, 1)-shaped
        if (
            images_pred.ndim == 4
            and images_pred.shape[1] >= 11
            and images_pred.shape[2] >= 11
        ):
            preds["rgb_ssim"] = calc_ssim(images_pred, images)
    if depths is not None and depths_pred is not None:
        _, abs_depth = eval_depth(depths_pred, depths, get_best_scale=True, mask=None, crop=0)
        preds["depth_abs"] = abs_depth

    if keys_prefix is not None:
        preds = {keys_prefix + k: v for k, v in preds.items()}
    return preds
