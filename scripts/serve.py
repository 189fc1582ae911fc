"""HTTP render server: serve a trained NeRF checkpoint over REST.

The online-serving companion to scripts/render.py (batch) and
scripts/export.py (offline artifact): loads a config + checkpoint ONCE,
jit-compiles the eval-mode render, then answers render requests over
plain HTTP (stdlib http.server — no web framework dependency). Renders
are serialized behind a lock: the device executes one frame at a time
anyway, and queueing in-process keeps tail latency honest instead of
thrashing the compiled executable with interleaved dispatches.

Endpoints:
  GET  /health            liveness + request/latency counters (JSON)
  GET  /spec              resolved serving parameters (JSON)
  POST /render            body: {"pose": 4x4|3x4 camera-to-world,
                                 "focal": float,              (optional)
                                 "min_depth"/"max_depth": float, (optional)
                                 "convention": "blender"|"world",
                                 "output": "rgb"|"depth",
                                 "format": "png"|"json"}
                          -> image/png bytes (or JSON float grid)
  GET  /render?theta=DEG&phi=DEG&radius=R[&focal=F][&output=rgb|depth]
                          orbit camera (Blender convention, z-up), handy
                          for browsers / curl smoke checks
  GET  /trajectory?n=20&radius=4&phi=-30[&fps=15][&focal=F]
                          full orbit as an animated GIF, rendered with one
                          frame in flight (the measured 2.1x serving
                          pattern, docs/serving.md)

Quality/latency is set by the config's eval point budget and chunk size —
see docs/serving.md for the measured ladder (e.g. the two-level proposal
flagship serves 39.5-PSNR-class frames at >2 fps on one v5e chip) and
always ship a fitted scene AABB (scripts/fit_aabb.py) at low budgets.

Usage:
  python scripts/serve.py --config configs/nerf/lego_proposal.yml \
      --checkpoint results/.../ckpts/ckpts_-001 --port 8765
  curl 'localhost:8765/render?theta=30&phi=-25&radius=4' > frame.png

Reference parity note: the reference (xk-huang/yet-another-nerf) ships no
serving path at all — scripts/run.py --test_only (ref scripts/run.py:292)
is its only inference entry; this component is net-new TPU-era surface.
"""

from __future__ import annotations

import argparse
import io
import json
import os.path as osp
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from yanerf_tpu.utils.config import Config, DictAction  # noqa: E402

# camera-to-world in Blender/OpenGL convention (-z forward, z-up world),
# same math as scripts/make_synth_scene.py::look_at_blender
def _look_at_blender(position: np.ndarray, target: np.ndarray) -> np.ndarray:
    forward = target - position
    forward = forward / np.linalg.norm(forward)
    z_axis = -forward
    up = np.array([0.0, 0.0, 1.0])
    x_axis = np.cross(up, z_axis)
    n = np.linalg.norm(x_axis)
    x_axis = np.array([1.0, 0.0, 0.0]) if n < 1e-6 else x_axis / n
    y_axis = np.cross(z_axis, x_axis)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x_axis, y_axis, z_axis, position
    return c2w


def orbit_pose(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Blender-convention camera on a sphere around the origin.

    theta: azimuth around +z (deg); phi: elevation from the xy-plane (deg,
    negative looks down from above like the lego test cameras).
    """
    t, p = np.deg2rad(theta_deg), np.deg2rad(phi_deg)
    position = radius * np.array([np.cos(t) * np.cos(p), np.sin(t) * np.cos(p), -np.sin(p)])
    return _look_at_blender(position, np.zeros(3))


class RenderService:
    """Owns the pipeline, params, and the single-flight render lock."""

    def __init__(self, pipeline, params, default_focal: float, image_hw, bounds=(None, None)):
        import jax

        from yanerf_tpu.ops.structures import EvaluationMode

        self._pipeline = pipeline
        self._params = params
        self._lock = threading.Lock()
        self._rng = jax.random.PRNGKey(0)
        self.default_focal = float(default_focal)
        self.image_hw = tuple(image_hw)  # (H, W)
        self.default_bounds = bounds
        self.n_renders = 0
        self.total_render_s = 0.0

        def render_fn(params, rng, pose, focal, min_depth, max_depth):
            preds = pipeline.forward(
                params, rng,
                poses=pose[None], focal_lengths=focal[None],
                min_depth=min_depth, max_depth=max_depth,
                evaluation_mode=EvaluationMode.EVALUATION,
            )
            return preds["rendered_images"], preds["rendered_depths"]

        self._render = jax.jit(render_fn)

    def warmup(self):
        """Compile (and page in params) before the first request lands."""
        pose = orbit_pose(0.0, -30.0, 4.0)[:3, :4].astype(np.float32)
        self.render(pose, self.default_focal)

    def render(self, pose_world_3x4: np.ndarray, focal: float, min_depth=None, max_depth=None):
        """Serialized render; returns (rgb (H,W,3) f32 in [0,1], depth (H,W))."""
        import jax
        import jax.numpy as jnp

        lo, hi = self.default_bounds
        if min_depth is None:
            min_depth = lo
        if max_depth is None:
            max_depth = hi
        with self._lock:
            t0 = time.perf_counter()
            self._rng, key = jax.random.split(self._rng)
            rgb, depth = self._render(
                self._params, key,
                jnp.asarray(pose_world_3x4, dtype=jnp.float32),
                jnp.asarray([focal], dtype=jnp.float32),
                None if min_depth is None else jnp.float32(min_depth),
                None if max_depth is None else jnp.float32(max_depth),
            )
            # value fetch = the only tunnel-safe synchronization (CLAUDE.md)
            rgb = np.asarray(rgb)[0]
            depth = np.asarray(depth)[0, ..., 0] if np.asarray(depth).ndim == 4 else np.asarray(depth)[0]
            self.n_renders += 1
            self.total_render_s += time.perf_counter() - t0
        return rgb, depth

    def render_trajectory(self, n_frames: int, radius: float, phi: float, focal=None):
        """Orbit trajectory with one frame in flight (dispatch i+1 before
        fetching i — the measured 2.1x serving pattern, docs/serving.md)."""
        import jax
        import jax.numpy as jnp

        from yanerf_tpu.datasets.blender import CAM_CALIBRATION

        focal = self.default_focal if focal is None else float(focal)
        lo, hi = self.default_bounds
        poses = [
            jnp.asarray(
                (orbit_pose(360.0 * i / n_frames, phi, radius) @ CAM_CALIBRATION)[:3, :4],
                dtype=jnp.float32,
            )
            for i in range(n_frames)
        ]
        focal_arr = jnp.asarray([focal], dtype=jnp.float32)
        lo = None if lo is None else jnp.float32(lo)
        hi = None if hi is None else jnp.float32(hi)
        frames = []
        with self._lock:
            t0 = time.perf_counter()

            def dispatch(pose):
                self._rng, key = jax.random.split(self._rng)
                return self._render(self._params, key, pose, focal_arr, lo, hi)

            pending = dispatch(poses[0])
            for pose in poses[1:]:
                nxt = dispatch(pose)
                frames.append(np.asarray(pending[0])[0])
                pending = nxt
            frames.append(np.asarray(pending[0])[0])
            self.n_renders += n_frames
            self.total_render_s += time.perf_counter() - t0
        return frames

    def stats(self):
        n = self.n_renders
        return {
            "status": "ok",
            "renders": n,
            "mean_render_s": round(self.total_render_s / n, 4) if n else None,
            "image_hw": list(self.image_hw),
        }


def _parse_pose(body: dict) -> np.ndarray:
    pose = np.asarray(body["pose"], dtype=np.float32)
    if pose.shape == (4, 4):
        pose = pose[:3, :4]
    if pose.shape != (3, 4):
        raise ValueError(f"pose must be 3x4 or 4x4, got {pose.shape}")
    if body.get("convention", "blender") == "blender":
        from yanerf_tpu.datasets.blender import CAM_CALIBRATION

        pose = (np.vstack([pose, [0, 0, 0, 1]]) @ CAM_CALIBRATION)[:3, :4]
    return pose


def _png_bytes(img_u8: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img_u8).save(buf, format="PNG")
    return buf.getvalue()


def _gif_bytes(frames_u8, fps: float) -> bytes:
    from PIL import Image

    ims = [Image.fromarray(f) for f in frames_u8]
    buf = io.BytesIO()
    ims[0].save(
        buf, format="GIF", save_all=True, append_images=ims[1:],
        duration=int(1000 / max(fps, 0.1)), loop=0,
    )
    return buf.getvalue()


def make_handler(service: RenderService):
    from yanerf_tpu.runners import to_img

    class Handler(BaseHTTPRequestHandler):
        # quieten the default per-request stderr lines under test
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _send(self, code: int, content_type: str, payload: bytes):
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _send_json(self, obj, code=200):
            self._send(code, "application/json", json.dumps(obj).encode())

        def _reply_render(self, pose_world, focal, output, fmt, min_depth=None, max_depth=None):
            try:
                rgb, depth = service.render(pose_world, focal, min_depth, max_depth)
            except Exception as e:  # render failure must not drop the connection
                return self._send_json({"error": f"render failed: {e}"}, code=500)
            arr = depth / max(float(depth.max()), 1e-6) if output == "depth" else rgb
            if fmt == "json":
                self._send_json({"shape": list(arr.shape), "data": np.asarray(arr, dtype=float).tolist()})
            else:
                self._send(200, "image/png", _png_bytes(to_img(arr)))

        def do_GET(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path == "/health":
                return self._send_json(service.stats())
            if url.path == "/spec":
                return self._send_json(
                    {
                        "image_hw": list(service.image_hw),
                        "default_focal": service.default_focal,
                        "default_focal_source": getattr(
                            service, "focal_source", "blender_synthetic_assumption"
                        ),
                        "default_bounds": [
                            None if b is None else float(b) for b in service.default_bounds
                        ],
                    }
                )
            if url.path == "/render":
                q = {k: v[-1] for k, v in parse_qs(url.query).items()}
                try:
                    pose = orbit_pose(
                        float(q.get("theta", 0.0)), float(q.get("phi", -30.0)),
                        float(q.get("radius", 4.0)),
                    )
                    pose_world = _parse_pose({"pose": pose.tolist(), "convention": "blender"})
                    focal = float(q.get("focal", service.default_focal))
                    output = q.get("output", "rgb")
                except (ValueError, KeyError) as e:
                    return self._send_json({"error": str(e)}, code=400)
                return self._reply_render(pose_world, focal, output, q.get("format", "png"))
            if url.path == "/trajectory":
                q = {k: v[-1] for k, v in parse_qs(url.query).items()}
                try:
                    n = max(2, min(int(q.get("n", 20)), 240))
                    radius = float(q.get("radius", 4.0))
                    phi = float(q.get("phi", -30.0))
                    fps = float(q.get("fps", 15.0))
                    focal = float(q["focal"]) if "focal" in q else None
                except ValueError as e:
                    return self._send_json({"error": str(e)}, code=400)
                try:
                    frames = service.render_trajectory(n, radius, phi, focal)
                except Exception as e:
                    return self._send_json({"error": f"render failed: {e}"}, code=500)
                return self._send(200, "image/gif", _gif_bytes([to_img(f) for f in frames], fps))
            self._send_json({"error": f"unknown path {url.path}"}, code=404)

        def do_POST(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path != "/render":
                return self._send_json({"error": f"unknown path {url.path}"}, code=404)
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(length) or b"{}")
                pose_world = _parse_pose(body)
                focal = float(body.get("focal", service.default_focal))
                output = body.get("output", "rgb")
                fmt = body.get("format", "png")
                lo = body.get("min_depth")
                hi = body.get("max_depth")
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                return self._send_json({"error": str(e)}, code=400)
            self._reply_render(pose_world, focal, output, fmt, lo, hi)

    return Handler


def create_server(service: RenderService, host: str = "127.0.0.1", port: int = 0):
    """Bind a ThreadingHTTPServer (port=0 -> ephemeral, for tests)."""
    return ThreadingHTTPServer((host, port), make_handler(service))


def service_from_config(cfg, checkpoint: str | None, device: str = "tpu") -> RenderService:
    import jax
    import jax.numpy as jnp

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from yanerf_tpu.pipelines import PIPELINES
    from yanerf_tpu.runners import load_checkpoint
    from yanerf_tpu.runners.checkpoints import import_torch_checkpoint
    from yanerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    pipeline = PIPELINES.build(cfg.pipeline)
    params = pipeline.init(jax.random.PRNGKey(0))
    if checkpoint:
        if str(checkpoint).endswith(".pth"):
            params, _ = import_torch_checkpoint(checkpoint, params)
        else:
            restored = load_checkpoint(checkpoint)
            params = jax.tree_util.tree_map(jnp.asarray, restored["restored"]["params"])

    rs = cfg.pipeline.ray_sampler
    # default focal resolution order: an explicit serving override in the
    # config (serve.default_focal), else the dataset's camera_angle_x if
    # the config records one, else the standard blender-synthetic intrinsic
    # (0.6911 rad) — which is WRONG for non-blender scenes, so /spec labels
    # the source and real deployments should pass ?focal= or the override.
    default_focal = None
    focal_source = "config:serve.default_focal"
    serve_cfg = cfg.get("serve", {}) or {}
    if serve_cfg.get("default_focal"):
        default_focal = float(serve_cfg["default_focal"])
    if default_focal is None:
        for ds_key in ("data", "dataset", "datasets"):
            ds = cfg.get(ds_key)
            if isinstance(ds, (list, tuple)):
                ds = ds[0] if ds else None
            if ds and ds.get("camera_angle_x"):
                default_focal = rs.image_width / (2.0 * np.tan(float(ds["camera_angle_x"]) / 2.0))
                focal_source = f"config:{ds_key}.camera_angle_x"
                break
    if default_focal is None:
        default_focal = rs.image_width / (2.0 * np.tan(0.6911112070083618 / 2.0))
        focal_source = "blender_synthetic_assumption"
    bounds = (rs.get("min_depth"), rs.get("max_depth"))
    service = RenderService(
        pipeline, params, default_focal, (rs.image_height, rs.image_width), bounds
    )
    service.focal_source = focal_source
    return service


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument("--device", default="tpu", choices=["tpu", "cuda", "cpu"])
    parser.add_argument("--no_warmup", action="store_true")
    parser.add_argument("--cfg_options", nargs="+", action=DictAction)
    args = parser.parse_args()

    cfg = Config.fromfile(args.config)
    if args.cfg_options is not None:
        cfg.merge_from_dict(args.cfg_options)

    service = service_from_config(cfg, args.checkpoint, args.device)
    if not args.no_warmup:
        t0 = time.perf_counter()
        service.warmup()
        print(f"warmup render (compile included): {time.perf_counter() - t0:.1f}s")

    server = create_server(service, args.host, args.port)
    print(f"serving on http://{args.host}:{server.server_address[1]}  (ctrl-c to stop)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
