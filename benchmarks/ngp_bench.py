"""HashGridNeRF (Instant-NGP family) TPU measurements.

The hash-grid model is the time-to-quality flagship: ~60x fewer per-point
FLOPs than the 8x256 NeRFMLP means the classic-NeRF eval roofline
(~195 TFLOP per 800x800 frame -> >1 s/frame on one v5e) does not apply,
so this family is the single-chip route to the BASELINE.json >5 fps
eval target. This worker measures:

  1. train step ms / rays/s at several ray-batch sizes,
  2. 800x800 eval render fps at several chunk sizes,
  3. (context) the same model's step with f32 tables + bf16 MLPs is the
     shipped config — no variants, the knobs live in configs/nerf/lego_ngp.yml.

Run:  nohup python -u benchmarks/ngp_bench.py > /tmp/ngp_bench.log 2>&1 &
Never kill it mid-run (stale TPU lease).
"""

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


def ngp_pipeline(n_rays, image_hw=800, chunk=1048576):
    from yanerf_tpu.pipelines import PIPELINES

    model = dict(
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
    )
    cfg = dict(
        type="NeRFPipeline",
        chunk_size_grid=chunk,
        num_passes=2,
        output_rasterized_mc=False,
        loss_weights={"loss_rgb_mse": 1.0, "loss_prev_stage_rgb_mse": 1.0},
        model=model,
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
    x = jnp.ones((8, 8))
    log(f"claimed device after {time.time()-t0:.1f}s: {float(np.asarray(x.sum()))}")

    opt_cfg = ConfigDict(dict(init_lr=1e-2, min_lr=1e-3, weight_decay=0.0, warmup_steps=200,
                              warmup_lr=1e-5, lr_decay_type="exponential", lr_decay_rate=0.1,
                              lr_decay_iters=20000, num_iters=20000))

    # ---- 1. train step vs ray batch ----------------------------------------
    for n_rays in (4096, 8192, 16384, 32768):
        p = ngp_pipeline(n_rays)
        opt = create_optimizer(opt_cfg)
        params = p.init(jax.random.PRNGKey(0))
        state = create_train_state(params, opt)
        batch = prepare_batch(_example_batch(1, 800), W, None)
        step = make_train_step(p, opt, mesh=None, donate=True)
        rng = jax.random.PRNGKey(1)
        try:
            t0 = time.time()
            state, preds = step(state, batch, rng)
            obj0 = float(np.asarray(preds["objective"])[0])
            compile_t = time.time() - t0
            for _ in range(5):
                state, preds = step(state, batch, rng)
            float(np.asarray(preds["objective"])[0])
            n = 60
            t0 = time.time()
            for _ in range(n):
                state, preds = step(state, batch, rng)
            val = float(np.asarray(preds["objective"])[0])
            dt = time.time() - t0
            log(
                f"NGP TRAIN rays={n_rays}: {dt/n*1000:.2f} ms/step -> "
                f"{n_rays*n/dt:.0f} rays/s (obj {val:.4f}, compile {compile_t:.1f}s)"
            )
        except Exception as e:
            log(f"NGP TRAIN rays={n_rays} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # ---- 2. eval render fps -------------------------------------------------
    poses_np, focals_np, _ = _example_batch(1, 800)
    for chunk in (1048576, 2097152, 4194304):
        p = ngp_pipeline(8192, chunk=chunk)
        params = p.init(jax.random.PRNGKey(0))

        def render_fn(params, rng, poses, focals):
            preds = p.forward(params, rng, poses=poses, focal_lengths=focals,
                              evaluation_mode=EvaluationMode.EVALUATION)
            return preds["rendered_images"]

        try:
            render = jax.jit(render_fn)
            rng = jax.random.PRNGKey(1)
            t0 = time.time()
            frame = render(params, rng, jnp.asarray(poses_np), jnp.asarray(focals_np))
            np.asarray(frame)
            compile_t = time.time() - t0
            n_frames = 6
            t0 = time.time()
            for i in range(n_frames):
                frame = render(params, jax.random.fold_in(rng, i), jnp.asarray(poses_np), jnp.asarray(focals_np))
            np.asarray(frame)
            dt = time.time() - t0
            log(f"NGP RENDER 800px chunk={chunk}: {dt/n_frames:.3f}s/frame = {n_frames/dt:.3f} fps (compile {compile_t:.1f}s)")
        except Exception as e:
            log(f"NGP RENDER chunk={chunk} FAILED: {type(e).__name__}: {str(e)[:300]}")

    log("WORKER DONE")


if __name__ == "__main__":
    main()
