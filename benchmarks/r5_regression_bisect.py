"""Round-5 regression bisect harness: measure the hot paths of WHATEVER
source tree this file runs inside (it is copied into git worktrees of old
commits), so back-to-back runs on the same chip separate code regressions
from tunnel/environment drift.

Context (VERDICT r4 weak #1): the driver bench measured classic train at
69.3k rays/s in rounds 1-2 but 57.0k/56.8k in round 4 (-18%), and the
16-16-8 eval frontier at 5.44-5.85 fps in round 3 but 3.18-4.10 in round 4,
with no identified cause. Every suspect round-3/4 hot-path change is cheap
on paper, so this measures instead of guessing.

Usage (each arm sequential, same chip session):
  python benchmarks/r5_regression_bisect.py <label>
Prints one JSON line: {"label", "classic_ms", "proposal_ms",
"fps_frontier_4m", "fps_frontier_2m", "fps_full"} (null for phases the old
tree cannot build).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# the measured tree's root (this file is COPIED into old-commit worktrees)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def build_proposal(chunk=4194304, eval_budget=(64, 64, 32), replacement=True):
    from yanerf_tpu.pipelines import PIPELINES

    s0, s1, fin = eval_budget
    sampler = dict(
        type="RaySampler",
        image_height=800,
        image_width=800,
        min_depth=2.0,
        max_depth=6.0,
        n_pts_per_ray_training=64,
        n_pts_per_ray_evaluation=s0,
        n_rays_per_image_sampled_from_mask=4096,
        stratified_point_sampling_training=True,
    )
    if replacement:
        sampler["pixel_replacement"] = True
    cfg = dict(
        type="NeRFPipeline",
        chunk_size_grid=chunk,
        num_passes=3,
        output_rasterized_mc=False,
        loss_weights={"loss_rgb_mse": 1.0, "loss_proposal": 1.0},
        model=[
            dict(type="ProposalMLP", n_layers=4, hidden_dim=128,
                 n_harmonic_functions_xyz=10, compute_dtype="bfloat16"),
            dict(type="ProposalMLP", n_layers=4, hidden_dim=128,
                 n_harmonic_functions_xyz=10, compute_dtype="bfloat16"),
            dict(type="NeRFMLP", n_layers=8, input_skips=[5],
                 n_harmonic_functions_xyz=10, n_harmonic_functions_dir=4,
                 n_hidden_neurons_xyz=256, n_hidden_neurons_dir=128,
                 latent_dim=0, color_dim=3, compute_dtype="bfloat16"),
        ],
        ray_sampler=sampler,
        renderer=dict(
            type="ProposalEmissionAbsorpsionRenderer",
            n_pts_per_ray_final_training=48,
            n_pts_per_ray_final_evaluation=fin,
            n_pts_per_ray_intermediate_training=[64],
            n_pts_per_ray_intermediate_evaluation=[s1],
            bg_color=[0.0, 0.0, 0.0],
            density_noise_std_train=0.0,
            background_density_bias=1e-6,
        ),
        feature_extractor=[],
    )
    try:
        return PIPELINES.build(cfg)
    except TypeError:
        sampler.pop("pixel_replacement", None)
        return PIPELINES.build(cfg)


def runner_cfg():
    from yanerf_tpu.utils.config import ConfigDict

    return ConfigDict(
        dict(init_lr=5e-4, min_lr=5e-5, weight_decay=0.0, warmup_steps=1000, warmup_lr=1e-5,
             lr_decay_type="exponential", lr_decay_rate=0.1, lr_decay_iters=250000,
             num_iters=200000)
    )


def time_train(pipeline, batch, n_steps, warmup=3):
    import jax

    from yanerf_tpu.runners import create_optimizer, create_train_state, make_train_step

    optimizer = create_optimizer(runner_cfg())
    state = create_train_state(pipeline.init(jax.random.PRNGKey(0)), optimizer)
    step = make_train_step(pipeline, optimizer, mesh=None, donate=True)
    rng = jax.random.PRNGKey(1)
    for _ in range(warmup):
        state, preds = step(state, batch, rng)
    float(np.asarray(preds["objective"])[0])
    start = time.perf_counter()
    for _ in range(n_steps):
        state, preds = step(state, batch, rng)
    float(np.asarray(preds["objective"])[0])
    return (time.perf_counter() - start) / n_steps


def time_eval_fps(pipeline, n_frames=8, n_passes=2):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from yanerf_tpu.ops.structures import EvaluationMode

    poses_np, focals_np, _ = _example_batch(1, 800)
    params = pipeline.init(jax.random.PRNGKey(0))

    def render_fn(params, rng, poses, focals):
        return pipeline.forward(
            params, rng, poses=poses, focal_lengths=focals,
            evaluation_mode=EvaluationMode.EVALUATION,
        )["rendered_images"]

    render = jax.jit(render_fn)
    rng = jax.random.PRNGKey(1)
    poses, focals = jnp.asarray(poses_np), jnp.asarray(focals_np)
    np.asarray(render(params, rng, poses, focals))  # compile + sync
    best = 0.0
    for _ in range(n_passes):
        start = time.perf_counter()
        pending = render(params, jax.random.fold_in(rng, 0), poses, focals)
        for i in range(1, n_frames):
            nxt = render(params, jax.random.fold_in(rng, i), poses, focals)
            np.asarray(pending)
            pending = nxt
        np.asarray(pending)
        best = max(best, n_frames / (time.perf_counter() - start))
    return best


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "unlabeled"
    from typing import NamedTuple

    from yanerf_tpu.utils.cache import enable_compilation_cache

    try:
        enable_compilation_cache()
    except Exception as e:  # noqa: BLE001 — old trees may differ
        log(f"compile cache: {e}")

    import jax

    from __graft_entry__ import _example_batch, _flagship_pipeline
    from yanerf_tpu.runners import prepare_batch

    class Wrapper(NamedTuple):
        poses: np.ndarray
        focal_lengths: np.ndarray
        image_rgb: np.ndarray

    log(f"arm {label}: device {jax.devices()[0].platform} x{jax.local_device_count()}")
    batch = prepare_batch(_example_batch(1, 800), Wrapper, None)
    out = {"label": label, "classic_ms": None, "proposal_ms": None,
           "fps_frontier_4m": None, "fps_frontier_2m": None, "fps_full": None}

    def phase(key, fn):
        try:
            t0 = time.perf_counter()
            out[key] = round(fn(), 4)
            log(f"{label} {key}: {out[key]} ({time.perf_counter()-t0:.0f}s incl compile)")
        except Exception as e:  # noqa: BLE001
            log(f"{label} {key} FAILED: {type(e).__name__}: {str(e)[:200]}")

    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    def want(key):
        return only is None or key in only

    if want("classic_ms"):
        phase("classic_ms", lambda: 1e3 * time_train(
            _flagship_pipeline(n_rays=4096, image_hw=800, compute_dtype="bfloat16",
                               approx_top_k=True), batch, n_steps=50))
    if want("proposal_ms"):
        phase("proposal_ms", lambda: 1e3 * time_train(build_proposal(), batch, n_steps=100))
    if want("fps_frontier_4m"):
        phase("fps_frontier_4m", lambda: time_eval_fps(
            build_proposal(chunk=4194304, eval_budget=(16, 16, 8))))
    if want("fps_frontier_2m"):
        phase("fps_frontier_2m", lambda: time_eval_fps(
            build_proposal(chunk=2097152, eval_budget=(16, 16, 8))))
    if want("fps_full"):
        phase("fps_full", lambda: time_eval_fps(
            build_proposal(chunk=4194304, eval_budget=(64, 64, 32)), n_frames=5))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
