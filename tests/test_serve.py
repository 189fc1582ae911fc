"""scripts/serve.py: HTTP render server end-to-end on the CPU backend."""

import io
import json
import sys
import threading
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(REPO_ROOT / "scripts"))


HW = 8

PIPELINE_CFG = dict(
    type="NeRFPipeline",
    chunk_size_grid=64,
    num_passes=1,
    output_rasterized_mc=False,
    loss_weights={"loss_rgb_mse": 1.0},
    model=dict(
        type="NeRFMLP", n_layers=2, input_skips=[1], n_harmonic_functions_xyz=2,
        n_harmonic_functions_dir=1, n_hidden_neurons_xyz=16, n_hidden_neurons_dir=8,
    ),
    ray_sampler=dict(
        type="RaySampler", image_height=HW, image_width=HW, min_depth=1.0,
        max_depth=3.0, n_pts_per_ray_training=4, n_pts_per_ray_evaluation=4,
        n_rays_per_image_sampled_from_mask=8,
    ),
    renderer=dict(
        type="MultipassEmissionAbsorpsionRenderer", n_pts_per_ray_fine_training=4,
        n_pts_per_ray_fine_evaluation=4, bg_color=[0.0, 0.0, 0.0],
    ),
    feature_extractor=[],
)


@pytest.fixture(scope="module")
def server_url():
    import jax

    from scripts.serve import RenderService, create_server
    from yanerf_tpu.pipelines import PIPELINES

    pipeline = PIPELINES.build(dict(PIPELINE_CFG))
    params = pipeline.init(jax.random.PRNGKey(0))
    service = RenderService(
        pipeline, params, default_focal=10.0, image_hw=(HW, HW), bounds=(1.0, 3.0)
    )
    server = create_server(service, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _get(url, timeout=120):
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


def _post(url, body, timeout=120):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


def test_health_and_spec(server_url):
    status, ctype, payload = _get(f"{server_url}/health")
    assert status == 200 and ctype == "application/json"
    assert json.loads(payload)["status"] == "ok"

    status, _, payload = _get(f"{server_url}/spec")
    spec = json.loads(payload)
    assert spec["image_hw"] == [HW, HW]
    assert spec["default_bounds"] == [1.0, 3.0]


def test_orbit_render_returns_png(server_url):
    status, ctype, payload = _get(f"{server_url}/render?theta=30&phi=-25&radius=4")
    assert status == 200 and ctype == "image/png"
    img = Image.open(io.BytesIO(payload))
    assert img.size == (HW, HW)


def test_post_render_pose_and_json_format(server_url):
    pose = np.eye(4)
    pose[2, 3] = 2.0  # camera 2 units up the z-axis, Blender convention
    status, ctype, payload = _post(
        f"{server_url}/render",
        {"pose": pose.tolist(), "focal": 10.0, "format": "json"},
    )
    assert status == 200 and ctype == "application/json"
    out = json.loads(payload)
    assert out["shape"][:2] == [HW, HW]
    arr = np.asarray(out["data"])
    assert np.all(np.isfinite(arr))


def test_depth_output(server_url):
    status, ctype, payload = _get(f"{server_url}/render?theta=0&phi=-30&radius=4&output=depth")
    assert status == 200 and ctype == "image/png"
    img = Image.open(io.BytesIO(payload))
    assert img.size == (HW, HW)


def test_bad_requests(server_url):
    # malformed pose -> 400
    try:
        _post(f"{server_url}/render", {"pose": [[1, 2], [3, 4]]})
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
    assert raised

    try:
        _get(f"{server_url}/nope")
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 404
    assert raised


def test_trajectory_gif(server_url):
    status, ctype, payload = _get(f"{server_url}/trajectory?n=3&radius=4&phi=-30")
    assert status == 200 and ctype == "image/gif"
    gif = Image.open(io.BytesIO(payload))
    assert gif.size == (HW, HW)
    gif.seek(2)  # three frames present


def test_service_renders_proposal_family():
    """The flagship (two-level proposal) family serves through the same
    RenderService path — structure identical to lego_proposal.yml at tiny
    widths."""
    import jax

    from scripts.serve import RenderService, orbit_pose
    from yanerf_tpu.datasets.blender import CAM_CALIBRATION
    from yanerf_tpu.pipelines import PIPELINES

    cfg = dict(
        type="NeRFPipeline",
        chunk_size_grid=64,
        num_passes=3,
        output_rasterized_mc=False,
        loss_weights={"loss_rgb_mse": 1.0, "loss_proposal": 1.0},
        model=[
            dict(type="ProposalMLP", n_layers=2, hidden_dim=16),
            dict(type="ProposalMLP", n_layers=2, hidden_dim=16),
            dict(type="NeRFMLP", n_layers=2, input_skips=[1], n_harmonic_functions_xyz=2,
                 n_harmonic_functions_dir=1, n_hidden_neurons_xyz=16, n_hidden_neurons_dir=8),
        ],
        ray_sampler=dict(
            type="RaySampler", image_height=HW, image_width=HW, min_depth=1.0,
            max_depth=3.0, n_pts_per_ray_training=4, n_pts_per_ray_evaluation=4,
            n_rays_per_image_sampled_from_mask=8,
        ),
        renderer=dict(
            type="ProposalEmissionAbsorpsionRenderer", n_pts_per_ray_final_training=3,
            n_pts_per_ray_final_evaluation=3, n_pts_per_ray_intermediate_training=[3],
            n_pts_per_ray_intermediate_evaluation=[3], bg_color=[0.0, 0.0, 0.0],
        ),
        feature_extractor=[],
    )
    pipeline = PIPELINES.build(cfg)
    params = pipeline.init(jax.random.PRNGKey(0))
    service = RenderService(pipeline, params, 10.0, (HW, HW), bounds=(1.0, 3.0))
    pose_world = (orbit_pose(30.0, -30.0, 2.0) @ CAM_CALIBRATION)[:3, :4]
    rgb, depth = service.render(pose_world.astype(np.float32), 10.0)
    assert rgb.shape == (HW, HW, 3) and np.all(np.isfinite(rgb))
    assert depth.shape[:2] == (HW, HW) and np.all(np.isfinite(depth))


def test_render_counter_advances(server_url):
    _, _, payload = _get(f"{server_url}/health")
    stats = json.loads(payload)
    assert stats["renders"] >= 3
    assert stats["mean_render_s"] > 0
