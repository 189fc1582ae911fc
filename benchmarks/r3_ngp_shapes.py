"""Hash-grid family at its own flagship shapes (VERDICT r2 #6).

Round 2 could not run lego_ngp.yml's shapes here: the one-shot scatter
lowerings crashed the remote compile helper at 4096/16384/32768 rays and
at the 800px eval. The chunked encode (models/hash_grid.py encode_chunk:
lax.map over fixed-size point chunks) gives every shape the SAME compiled
scatter body; this worker measures the flagship shapes with it.

Run:  nohup python -u benchmarks/r3_ngp_shapes.py > /tmp/r3_ngp.log 2>&1 &
Never kill it mid-run (stale TPU lease).
"""

from __future__ import annotations

import os
import sys
import time
from typing import NamedTuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, flush=True)


class W(NamedTuple):
    poses: object
    focal_lengths: object
    image_rgb: object


def ngp_pipeline(n_rays, image_hw=800, encode_chunk=1 << 17, chunk_size_grid=131072):
    """lego_ngp.yml's architecture (16 levels, 2^19 tables, 64-wide MLPs)."""
    from yanerf_tpu.pipelines import PIPELINES

    cfg = dict(
        type="NeRFPipeline",
        chunk_size_grid=chunk_size_grid,
        num_passes=2,
        output_rasterized_mc=False,
        loss_weights={"loss_rgb_mse": 1.0, "loss_prev_stage_rgb_mse": 1.0},
        model=dict(
            type="HashGridNeRF",
            n_levels=16,
            table_size_log2=19,
            n_features_per_level=2,
            base_resolution=16,
            max_resolution=2048,
            hidden_dim=64,
            geo_feature_dim=15,
            n_color_layers=2,
            n_harmonic_functions_dir=4,
            color_dim=3,
            scene_bound=1.5,
            compute_dtype="bfloat16",
            encode_chunk=encode_chunk,
        ),
        ray_sampler=dict(
            type="RaySampler",
            image_height=image_hw,
            image_width=image_hw,
            min_depth=2.0,
            max_depth=6.0,
            n_pts_per_ray_training=64,
            n_pts_per_ray_evaluation=64,
            n_rays_per_image_sampled_from_mask=n_rays,
            stratified_point_sampling_training=True,
            approx_top_k=True,
        ),
        renderer=dict(
            type="MultipassEmissionAbsorpsionRenderer",
            append_coarse_samples_to_fine=True,
            bg_color=[0.0, 0.0, 0.0],
            density_noise_std_train=0.0,
            n_pts_per_ray_fine_training=128,
            n_pts_per_ray_fine_evaluation=128,
            background_density_bias=1e-6,
        ),
        feature_extractor=[],
    )
    return PIPELINES.build(cfg)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from yanerf_tpu.ops.structures import EvaluationMode
    from yanerf_tpu.runners import create_optimizer, create_train_state, make_train_step, prepare_batch
    from yanerf_tpu.utils.cache import enable_compilation_cache
    from yanerf_tpu.utils.config import ConfigDict

    enable_compilation_cache()
    t0 = time.time()
    log(f"claimed device: {float(np.asarray(jnp.ones((2,)).sum()))} after {time.time()-t0:.1f}s")

    opt_cfg = ConfigDict(dict(init_lr=1e-2, min_lr=1e-3, weight_decay=0.0, warmup_steps=200,
                              warmup_lr=1e-4, lr_decay_type="exponential", lr_decay_rate=0.1,
                              lr_decay_iters=20000, num_iters=20000))
    batch = prepare_batch(_example_batch(1, 800), W, None)
    rng = jax.random.PRNGKey(1)

    # train shapes, chunked encode (1M pts/chunk)
    for n_rays in (4096, 8192, 16384):
        try:
            p = ngp_pipeline(n_rays)
            opt = create_optimizer(opt_cfg)
            state = create_train_state(p.init(jax.random.PRNGKey(0)), opt)
            step = make_train_step(p, opt, mesh=None, donate=True)
            t0 = time.time()
            state, preds = step(state, batch, rng)
            float(np.asarray(preds["objective"])[0])
            compile_t = time.time() - t0
            log(f"NGP TRAIN rays={n_rays}: compiled in {compile_t:.1f}s")
            for _ in range(3):
                state, preds = step(state, batch, rng)
            float(np.asarray(preds["objective"])[0])
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                state, preds = step(state, batch, rng)
            val = float(np.asarray(preds["objective"])[0])
            dt = (time.perf_counter() - t0) / n
            log(f"NGP TRAIN rays={n_rays}: {dt*1e3:.1f} ms/step -> {n_rays/dt:.0f} rays/s (obj {val:.4f})")
        except Exception as e:
            log(f"NGP TRAIN rays={n_rays} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # 800px eval render (pipeline chunks x encode chunks)
    poses_np, focals_np, _ = _example_batch(1, 800)
    for grid_chunk in (131072, 1048576):
        try:
            p = ngp_pipeline(8192, chunk_size_grid=grid_chunk)
            params = p.init(jax.random.PRNGKey(0))

            def render_fn(params, rng, poses, focals):
                return p.forward(params, rng, poses=poses, focal_lengths=focals,
                                 evaluation_mode=EvaluationMode.EVALUATION)["rendered_images"]

            render = jax.jit(render_fn)
            t0 = time.time()
            np.asarray(render(params, rng, jnp.asarray(poses_np), jnp.asarray(focals_np)))
            compile_t = time.time() - t0
            n_frames = 3
            t0 = time.perf_counter()
            for i in range(n_frames):
                frame = render(params, jax.random.fold_in(rng, i), jnp.asarray(poses_np), jnp.asarray(focals_np))
            np.asarray(frame)
            dt = (time.perf_counter() - t0) / n_frames
            log(f"NGP EVAL 800px grid_chunk={grid_chunk}: {dt:.2f}s/frame = {1/dt:.3f} fps (compile {compile_t:.1f}s)")
        except Exception as e:
            log(f"NGP EVAL grid_chunk={grid_chunk} FAILED: {type(e).__name__}: {str(e)[:300]}")

    log("WORKER DONE")


if __name__ == "__main__":
    main()
