"""Export a trained pipeline's renderer as a self-contained serving artifact.

Serializes the jitted FULL_GRID render function — parameters baked in as
constants — via ``jax.export`` (StableHLO), producing a single file a
serving process can load WITHOUT the framework, the config system, or the
checkpoint layout:

    python scripts/export.py --config configs/nerf/lego_proposal.yml \
        --checkpoint results/.../ckpts/ckpts_-001 --out lego.nerfx

    # consumer (needs only jax):
    from jax import export
    render = export.deserialize(open("lego.nerfx", "rb").read()).call
    images = render(poses, focal_lengths)   # (B,4,4), (B,1) -> (B,H,W,3)

The artifact records the lowering platform(s); pass ``--platforms tpu cpu``
to emit a multi-platform module. This is a deployment surface the reference
does not have (its serving path is "load the torch checkpoint into the full
framework", scripts/run.py --test_only).
"""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from yanerf_tpu.utils.config import Config, DictAction  # noqa: E402


def build_render_fn(config, checkpoint=None, seed=0):
    import jax

    from yanerf_tpu.ops.structures import EvaluationMode
    from yanerf_tpu.pipelines import PIPELINES

    pipeline = PIPELINES.build(config.pipeline)
    params = pipeline.init(jax.random.PRNGKey(seed))
    if checkpoint:
        # optimizer-free restore (serve.py/render.py pattern): export only
        # needs params, so no runner section / stored opt_state required,
        # and reference .pth checkpoints import directly
        if str(checkpoint).endswith(".pth"):
            from yanerf_tpu.runners.checkpoints import import_torch_checkpoint

            params, _ = import_torch_checkpoint(checkpoint, params)
        else:
            import jax.numpy as jnp

            from yanerf_tpu.runners import load_checkpoint

            restored = load_checkpoint(checkpoint)
            params = jax.tree_util.tree_map(jnp.asarray, restored["restored"]["params"])

    rng = jax.random.PRNGKey(0)  # eval path is deterministic (det inverse CDF)

    def render(poses, focal_lengths):
        preds = pipeline.forward(
            params,
            rng,
            poses=poses,
            focal_lengths=focal_lengths,
            evaluation_mode=EvaluationMode.EVALUATION,
        )
        return preds["rendered_images"]

    hw = (config.pipeline.ray_sampler.image_height, config.pipeline.ray_sampler.image_width)
    return render, hw


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--out", default="render.nerfx")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument(
        "--platforms", nargs="*", default=None,
        help="lowering platforms, e.g. --platforms tpu cpu (default: current backend)",
    )
    parser.add_argument("--validate", action="store_true", help="deserialize + compare on dummy inputs")
    parser.add_argument("--device", default=None, choices=["tpu", "cpu"],
                        help="force a backend (cpu needed on machines whose sitecustomize pins a device)")
    parser.add_argument("--cfg_options", nargs="+", action=DictAction)
    args = parser.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from jax import export as jax_export

    config = Config.fromfile(args.config)
    if args.cfg_options:
        config.merge_from_dict(args.cfg_options)

    render, (h, w) = build_render_fn(config, args.checkpoint)
    poses_spec = jax.ShapeDtypeStruct((args.batch, 4, 4), np.float32)
    focals_spec = jax.ShapeDtypeStruct((args.batch, 1), np.float32)

    kwargs = {}
    if args.platforms:
        kwargs["platforms"] = args.platforms
    exported = jax_export.export(jax.jit(render), **kwargs)(poses_spec, focals_spec)
    data = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(data)
    print(
        f"exported {args.out}: {len(data) / 1e6:.2f} MB, platforms={exported.platforms}, "
        f"out_shape=({args.batch}, {h}, {w}, ...)"
    )

    if args.validate:
        poses = np.broadcast_to(np.eye(4, dtype=np.float32), (args.batch, 4, 4)).copy()
        poses[:, 2, 3] = 4.0
        focals = np.full((args.batch, 1), float(w), dtype=np.float32)
        restored = jax_export.deserialize(data)
        got = np.asarray(restored.call(poses, focals))
        want = np.asarray(render(poses, focals))
        err = float(np.max(np.abs(got - want)))
        assert err < 1e-5, f"deserialized render mismatch: {err}"
        print(f"validate OK: max |restored - direct| = {err:.2e}")


if __name__ == "__main__":
    main()
