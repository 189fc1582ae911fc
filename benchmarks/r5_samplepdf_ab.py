"""Pin down the round-4 classic-step regression inside sample_pdf.

r5 bisect (results/r5_bisect.json): commit 63cc87e took the classic train
step 59.2 -> 72.1 ms, and the only changes on the classic path are the two
sample_pdf edits (negative-weight clamp, u>=cdf[-1] top-edge fix). This
times the classic step with each edit independently reverted (monkeypatched
variants of the SAME current-tree function), to find the costly one and
validate a cheaper formulation.

Arms:
  current      — shipped sample_pdf (expect ~72 ms)
  no_edge      — drop the post-reduce top-edge where
  no_max       — weights + eps instead of maximum(weights, 0) + eps
  neither      — both reverted (round-3 semantics; expect ~59 ms)
  fused_edge   — top-edge fix folded INTO the bin mask (same semantics for
                 u >= cdf[-1], no post-reduce where on a second u read)

Run: nohup python -u benchmarks/r5_samplepdf_ab.py > /tmp/r5_spdf.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_sample_pdf(clamp_weights: bool, edge: str):
    """edge: 'post' (shipped), 'none', or 'fused'."""
    import jax
    import jax.numpy as jnp

    def sample_pdf(bins, weights, n_samples, rng=None, det=False, eps=1e-5,
                   stratified=False):
        dtype = bins.dtype
        if clamp_weights:
            weights = jnp.maximum(weights, 0.0) + eps
        else:
            weights = weights + eps
        pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
        cdf = jnp.cumsum(pdf, axis=-1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

        if det:
            u = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
            u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
        else:
            if rng is None:
                raise ValueError("sample_pdf with det=False requires an rng key")
            u = jax.random.uniform(rng, (*cdf.shape[:-1], n_samples), dtype=dtype)
            if stratified:
                u = (jnp.arange(n_samples, dtype=dtype) + u) / n_samples

        cdf_lo, cdf_hi = cdf[..., :-1], cdf[..., 1:]
        bins_lo, bins_hi = bins[..., :-1], bins[..., 1:]
        n_bins = cdf_lo.shape[-1]
        is_last = jnp.arange(n_bins) == n_bins - 1
        u_e = u[..., :, None]
        lo = cdf_lo[..., None, :]
        hi = cdf_hi[..., None, :]
        in_bin = (lo <= u_e) & ((u_e < hi) | is_last)
        denom = cdf_hi - cdf_lo
        denom = jnp.where(denom < eps, jnp.ones_like(denom), denom)
        t = (u_e - lo) / denom[..., None, :]
        val = bins_lo[..., None, :] + t * (bins_hi - bins_lo)[..., None, :]
        if edge == "fused":
            top = jnp.minimum(hi, 1.0)
            val = jnp.where(is_last & (u_e >= top), bins_hi[..., None, :], val)
        out = jnp.sum(jnp.where(in_bin, val, jnp.zeros_like(val)), axis=-1)
        if edge == "post":
            out = jnp.where(u >= jnp.minimum(cdf[..., -1:], 1.0), bins[..., -1:], out)
        return out

    return sample_pdf


ARMS = {
    "current": dict(clamp_weights=True, edge="post"),
    "no_edge": dict(clamp_weights=True, edge="none"),
    "no_max": dict(clamp_weights=False, edge="post"),
    "neither": dict(clamp_weights=False, edge="none"),
    "fused_edge": dict(clamp_weights=True, edge="fused"),
}


def main():
    import jax

    from typing import NamedTuple

    from benchmarks.r5_regression_bisect import time_train

    class Wrapper(NamedTuple):
        poses: np.ndarray
        focal_lengths: np.ndarray
        image_rgb: np.ndarray
    from __graft_entry__ import _example_batch, _flagship_pipeline
    from yanerf_tpu.runners import prepare_batch
    from yanerf_tpu.utils.cache import enable_compilation_cache

    import yanerf_tpu.ops.sample_pdf as spdf_mod
    import yanerf_tpu.pipelines.renderer as renderer_mod

    enable_compilation_cache()
    log(f"device: {jax.devices()[0].platform}")
    batch = prepare_batch(_example_batch(1, 800), Wrapper, None)
    out = {}
    for label, kw in ARMS.items():
        fn = make_sample_pdf(**kw)
        spdf_mod.sample_pdf = fn
        renderer_mod.sample_pdf = fn
        try:
            pipeline = _flagship_pipeline(n_rays=4096, image_hw=800,
                                          compute_dtype="bfloat16", approx_top_k=True)
            dt = time_train(pipeline, batch, n_steps=50)
            out[label] = round(dt * 1e3, 2)
            log(f"{label}: {dt*1e3:.2f} ms/step ({4096/dt:.0f} rays/s)")
        except Exception as e:  # noqa: BLE001
            log(f"{label} FAILED: {type(e).__name__}: {str(e)[:200]}")
            out[label] = None
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
