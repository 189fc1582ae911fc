"""Multi-chip ICI scaling runbook: measure it the day the pod arrives.

The one environment-blocked deliverable left in the perf story is a REAL
multi-chip measurement (this box exposes a single tunneled chip; the
multi-chip path is certified on the virtual 8-device CPU mesh and by the
driver's dryrun). This script is the pre-staged runbook — the analog of
scripts/repro_parity.py for the scaling claim. On a machine with N>1 TPU
chips, ONE command:

    python benchmarks/multichip_scaling.py

measures, at every power-of-two mesh size up to N:

  * DP training scaling — the flagship two-level proposal train step
    (4096 rays/image, 64->64->48 pts, bf16), one image per data-parallel
    group: global rays/s and parallel efficiency vs the 1-chip run
    (the reference's DDP scaling analog, ref README.md:61);
  * ray-sharded eval scaling — the 800x800 full-budget render with the
    ray axis sharded over the mesh (the NeRF "sequence parallel" analog):
    fps and efficiency (docs/performance.md projects ~linear to >15 fps
    on v5e-8 from the measured 43%-of-roofline single-chip render).

Results land in results/multichip_scaling.json. The code path is
identical at every size — mesh construction, GSPMD shardings, fused
collectives — only shapes differ, so `--smoke` (tiny shapes, virtual CPU
mesh) keeps the whole flow continuously green before hardware exists:
tests/test_multichip_scaling.py runs it on the 8-device CPU mesh.

Timing follows CLAUDE.md: synchronize against a value fetch, never
`block_until_ready`, through the device tunnel.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time
from typing import NamedTuple

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


class Wrapper(NamedTuple):
    poses: np.ndarray
    focal_lengths: np.ndarray
    image_rgb: np.ndarray


def _progress(msg: str) -> None:
    print(f"[multichip] {msg}", file=sys.stderr, flush=True)


def _proposal_cfg(smoke: bool, n_rays_per_image: int, image_hw: int) -> dict:
    """The shipped two-level proposal config (lego_proposal.yml shapes);
    smoke mode shrinks widths/points but keeps the identical program
    structure (two proposal levels + interlevel loss + final NeRFMLP)."""
    width = 32 if smoke else 128
    mlp_w, mlp_d = (64, 32) if smoke else (256, 128)
    pts = dict(train_sampler=16, train_mid=[12], train_final=8,
               eval_sampler=16, eval_mid=[12], eval_final=8) if smoke else dict(
        train_sampler=64, train_mid=[64], train_final=48,
        eval_sampler=64, eval_mid=[64], eval_final=32)
    return dict(
        type="NeRFPipeline",
        chunk_size_grid=65536 if smoke else 4194304,
        num_passes=3,
        output_rasterized_mc=False,
        loss_weights={"loss_rgb_mse": 1.0, "loss_proposal": 1.0},
        model=[
            dict(type="ProposalMLP", n_layers=4, hidden_dim=width,
                 n_harmonic_functions_xyz=10, compute_dtype="bfloat16"),
            dict(type="ProposalMLP", n_layers=4, hidden_dim=width,
                 n_harmonic_functions_xyz=10, compute_dtype="bfloat16"),
            dict(type="NeRFMLP", n_layers=8, input_skips=[5],
                 n_harmonic_functions_xyz=10, n_harmonic_functions_dir=4,
                 n_hidden_neurons_xyz=mlp_w, n_hidden_neurons_dir=mlp_d,
                 latent_dim=0, color_dim=3, compute_dtype="bfloat16"),
        ],
        ray_sampler=dict(
            type="RaySampler",
            image_height=image_hw, image_width=image_hw,
            min_depth=2.0, max_depth=6.0,
            n_pts_per_ray_training=pts["train_sampler"],
            n_pts_per_ray_evaluation=pts["eval_sampler"],
            n_rays_per_image_sampled_from_mask=n_rays_per_image,
            stratified_point_sampling_training=True,
            pixel_replacement=True,
        ),
        renderer=dict(
            type="ProposalEmissionAbsorpsionRenderer",
            n_pts_per_ray_final_training=pts["train_final"],
            n_pts_per_ray_final_evaluation=pts["eval_final"],
            n_pts_per_ray_intermediate_training=pts["train_mid"],
            n_pts_per_ray_intermediate_evaluation=pts["eval_mid"],
            bg_color=[0.0, 0.0, 0.0],
            density_noise_std_train=0.0,
            background_density_bias=1e-6,
        ),
        feature_extractor=[],
    )


def _runner_cfg():
    from yanerf_tpu.utils.config import ConfigDict

    return ConfigDict(dict(
        init_lr=5e-4, min_lr=5e-5, weight_decay=0.0, warmup_steps=1000, warmup_lr=1e-5,
        lr_decay_type="exponential", lr_decay_rate=0.1, lr_decay_iters=250000,
        num_iters=200000,
    ))


def _example_batch(batch: int, image_hw: int):
    rs = np.random.RandomState(0)
    poses = np.tile(np.eye(4, dtype=np.float32)[None, :3, :4], (batch, 1, 1))
    poses[:, 2, 3] = 4.0
    focals = np.full((batch, 1), image_hw * 1.2, dtype=np.float32)
    images = rs.rand(batch, image_hw, image_hw, 3).astype(np.float32)
    return poses, focals, images


def measure_train(mesh, smoke: bool, n_rays: int, image_hw: int, n_steps: int):
    """DP train-step throughput on the given mesh (one image per dp group)."""
    import jax

    from yanerf_tpu.pipelines import PIPELINES
    from yanerf_tpu.runners import (
        create_optimizer, create_train_state, make_train_step, prepare_batch,
    )

    data_parallel = mesh.shape["data"]
    pipeline = PIPELINES.build(_proposal_cfg(smoke, n_rays, image_hw))
    optimizer = create_optimizer(_runner_cfg())
    state = create_train_state(pipeline.init(jax.random.PRNGKey(0)), optimizer)
    step = make_train_step(pipeline, optimizer, mesh=mesh, donate=True)
    batch = prepare_batch(_example_batch(data_parallel, image_hw), Wrapper, mesh)
    rng = jax.random.PRNGKey(1)

    for _ in range(2):  # compile + settle
        state, preds = step(state, batch, rng)
    float(np.asarray(preds["objective"])[0])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, preds = step(state, batch, rng)
    float(np.asarray(preds["objective"])[0])
    dt = (time.perf_counter() - t0) / n_steps
    return {
        "ms_per_step": round(dt * 1e3, 3),
        "global_rays_per_sec": round(data_parallel * n_rays / dt, 1),
    }


def measure_eval(mesh, smoke: bool, n_rays: int, image_hw: int, n_frames: int):
    """Ray-sharded FULL_GRID render fps (one frame in flight, value-fetch
    synced — the shipped eval_one_epoch pipelining)."""
    import jax
    import jax.numpy as jnp

    from yanerf_tpu.ops.structures import EvaluationMode
    from yanerf_tpu.parallel.sharding import mesh_context
    from yanerf_tpu.pipelines import PIPELINES

    pipeline = PIPELINES.build(_proposal_cfg(smoke, n_rays, image_hw))
    params = pipeline.init(jax.random.PRNGKey(0))
    poses_np, focals_np, _ = _example_batch(1, image_hw)
    poses, focals = jnp.asarray(poses_np), jnp.asarray(focals_np)

    def render_fn(params, rng, poses, focals):
        preds = pipeline.forward(
            params, rng, poses=poses, focal_lengths=focals,
            evaluation_mode=EvaluationMode.EVALUATION,
        )
        return preds["rendered_images"]

    render = jax.jit(render_fn)
    rng = jax.random.PRNGKey(1)
    with mesh_context(mesh):
        np.asarray(render(params, rng, poses, focals))  # compile + sync
        t0 = time.perf_counter()
        pending = render(params, jax.random.fold_in(rng, 0), poses, focals)
        for i in range(1, n_frames):
            nxt = render(params, jax.random.fold_in(rng, i), poses, focals)
            np.asarray(pending)
            pending = nxt
        np.asarray(pending)
    fps = n_frames / (time.perf_counter() - t0)
    return {"fps": round(fps, 3)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true",
                        help="tiny shapes (CI / virtual CPU mesh); same code paths")
    parser.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    parser.add_argument("--out", default=osp.join(REPO, "results", "multichip_scaling.json"))
    parser.add_argument("--n_steps", type=int, default=None)
    parser.add_argument("--n_frames", type=int, default=None)
    parser.add_argument("--sizes", type=int, nargs="*", default=None,
                        help="mesh sizes to measure (default: powers of 2 up to n_devices)")
    args = parser.parse_args()

    import jax

    if args.device == "cpu":
        # the axon sitecustomize force-pins the tunneled TPU; flip back
        jax.config.update("jax_platforms", "cpu")

    from yanerf_tpu.parallel import create_mesh
    from yanerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    devices = jax.devices()
    n_dev = len(devices)
    if args.sizes:
        sizes = [s for s in args.sizes if s <= n_dev]
    else:
        sizes, s = [], 1
        while s <= n_dev:
            sizes.append(s)
            s *= 2
    if args.smoke:
        n_rays, image_hw = 64, 16
        n_steps = args.n_steps or 2
        n_frames = args.n_frames or 2
    else:
        n_rays, image_hw = 4096, 800
        n_steps = args.n_steps or 50
        n_frames = args.n_frames or 5

    platform = devices[0].platform
    _progress(f"{n_dev} {platform} device(s); mesh sizes {sizes}; smoke={args.smoke}")

    record = {
        "mode": "smoke" if args.smoke else "full",
        "platform": platform,
        "n_devices": n_dev,
        "n_rays_per_image": n_rays,
        "image_hw": image_hw,
        "train": {},
        "eval": {},
    }
    for n in sizes:
        _progress(f"train @ mesh size {n} (dp={n}): compiling...")
        mesh = create_mesh(devices[:n], data_parallel=n, ray_parallel=1)
        record["train"][str(n)] = measure_train(mesh, args.smoke, n_rays, image_hw, n_steps)
        _progress(f"train @ {n}: {record['train'][str(n)]}")

        _progress(f"eval @ mesh size {n} (rays={n}): compiling...")
        mesh = create_mesh(devices[:n], data_parallel=1, ray_parallel=n)
        record["eval"][str(n)] = measure_eval(mesh, args.smoke, n_rays, image_hw, n_frames)
        _progress(f"eval @ {n}: {record['eval'][str(n)]}")

    base_rays = record["train"]["1"]["global_rays_per_sec"] if "1" in record["train"] else None
    base_fps = record["eval"]["1"]["fps"] if "1" in record["eval"] else None
    for n in sizes:
        key = str(n)
        if base_rays:
            record["train"][key]["efficiency_vs_1chip"] = round(
                record["train"][key]["global_rays_per_sec"] / (n * base_rays), 3
            )
        if base_fps:
            record["eval"][key]["efficiency_vs_1chip"] = round(
                record["eval"][key]["fps"] / (n * base_fps), 3
            )

    os.makedirs(osp.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(json.dumps({"wrote": args.out, "sizes": sizes,
                      "train": record["train"], "eval": record["eval"]}))


if __name__ == "__main__":
    main()
