"""Proposal-sampler pipeline TPU measurements (train rays/s + eval fps).

The proposal estimator (configs/nerf/lego_proposal.yml) is the TPU-native
fast path: 64 proposal points on a 4x128 density MLP + 32 final points on
the full 8x256 model ~= 48 MFLOP/ray vs the reference schedule's 305.
Expected speedup ~6x at equal ray count; this worker verifies it and the
800x800 eval fps.

Run:  nohup python -u benchmarks/proposal_bench.py > /tmp/proposal_bench.log 2>&1 &
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


def proposal_pipeline(n_rays, image_hw=800, chunk=1048576, n_prop_pts=64, n_final=32):
    from yanerf_tpu.pipelines import PIPELINES

    cfg = dict(
        type="NeRFPipeline",
        chunk_size_grid=chunk,
        num_passes=2,
        output_rasterized_mc=False,
        loss_weights={"loss_rgb_mse": 1.0, "loss_proposal": 1.0},
        model=[
            dict(
                type="ProposalMLP",
                n_layers=4,
                hidden_dim=128,
                n_harmonic_functions_xyz=10,
                compute_dtype="bfloat16",
            ),
            dict(
                type="NeRFMLP",
                n_layers=8,
                input_skips=[5],
                n_harmonic_functions_xyz=10,
                n_harmonic_functions_dir=4,
                n_hidden_neurons_xyz=256,
                n_hidden_neurons_dir=128,
                latent_dim=0,
                color_dim=3,
                compute_dtype="bfloat16",
            ),
        ],
        ray_sampler=dict(
            type="RaySampler",
            image_height=image_hw,
            image_width=image_hw,
            min_depth=2.0,
            max_depth=6.0,
            n_pts_per_ray_training=n_prop_pts,
            n_pts_per_ray_evaluation=n_prop_pts,
            n_rays_per_image_sampled_from_mask=n_rays,
            stratified_point_sampling_training=True,
            approx_top_k=True,  # the throughput config's sampler
        ),
        renderer=dict(
            type="ProposalEmissionAbsorpsionRenderer",
            n_pts_per_ray_final_training=n_final,
            n_pts_per_ray_final_evaluation=n_final,
            bg_color=[0.0, 0.0, 0.0],
            density_noise_std_train=0.2,
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

    opt_cfg = ConfigDict(dict(init_lr=5e-4, min_lr=5e-5, weight_decay=0.0, warmup_steps=1000,
                              warmup_lr=1e-5, lr_decay_type="exponential", lr_decay_rate=0.1,
                              lr_decay_iters=250000, num_iters=200000))

    # ---- 1. train step vs ray batch ----------------------------------------
    for n_rays in (4096, 8192, 16384, 32768):
        p = proposal_pipeline(n_rays)
        opt = create_optimizer(opt_cfg)
        state = create_train_state(p.init(jax.random.PRNGKey(0)), opt)
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
            n = 100
            t0 = time.time()
            for _ in range(n):
                state, preds = step(state, batch, rng)
            val = float(np.asarray(preds["objective"])[0])
            dt = time.time() - t0
            log(
                f"PROPOSAL TRAIN rays={n_rays}: {dt/n*1000:.2f} ms/step -> "
                f"{n_rays*n/dt:.0f} rays/s (obj {val:.4f}, compile {compile_t:.1f}s)"
            )
        except Exception as e:
            log(f"PROPOSAL TRAIN rays={n_rays} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # ---- 2. eval render fps -------------------------------------------------
    poses_np, focals_np, _ = _example_batch(1, 800)
    for chunk in (1048576, 2097152):
        p = proposal_pipeline(8192, chunk=chunk)
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
            n_frames = 8
            t0 = time.time()
            for i in range(n_frames):
                frame = render(params, jax.random.fold_in(rng, i), jnp.asarray(poses_np), jnp.asarray(focals_np))
            np.asarray(frame)
            dt = time.time() - t0
            log(f"PROPOSAL RENDER 800px chunk={chunk}: {dt/n_frames:.3f}s/frame = {n_frames/dt:.3f} fps (compile {compile_t:.1f}s)")
        except Exception as e:
            log(f"PROPOSAL RENDER chunk={chunk} FAILED: {type(e).__name__}: {str(e)[:300]}")

    log("WORKER DONE")


if __name__ == "__main__":
    main()
