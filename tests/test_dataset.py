"""Dataset + loader tests.

Unlike the reference (which skips when real data is absent), these tests
synthesize miniature Blender/LLFF datasets on disk so the full load path —
JSON/npy parsing, pose calibration, minification cache, holdout split —
always runs. Real-data smoke tests still skip gracefully when absent.
"""

import json
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from yanerf_tpu.datasets import (
    DATASETS,
    BlenderDataset,
    DataLoader,
    LLFFDataset,
    ShardedEpochSampler,
    create_loader,
    create_sampler,
    stack_batch,
)


@pytest.fixture
def blender_root(tmp_path):
    root = tmp_path / "lego_mini"
    root.mkdir()
    rng = np.random.RandomState(0)
    for split, n in (("train", 4), ("val", 4), ("test", 4)):
        frames = []
        for i in range(n):
            name = f"r_{split}_{i}"
            pose = np.eye(4)
            pose[0, 3] = i * 0.1
            frames.append({"file_path": f"./{name}", "transform_matrix": pose.tolist()})
            img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(root / f"{name}.png")
        meta = {"camera_angle_x": 0.6911, "frames": frames}
        (root / f"transforms_{split}.json").write_text(json.dumps(meta))
    return root


def test_blender_dataset(blender_root):
    ds = DATASETS.build({"type": "BlenderDataset", "base_dir": str(blender_root), "split": "train"})
    assert len(ds) == 4
    pose, focal, image = ds[1]
    assert pose.shape == (4, 4) and pose.dtype == np.float32
    # calibration flips the y/z columns
    assert pose[1, 1] == -1.0 and pose[2, 2] == -1.0
    assert pose[0, 3] == pytest.approx(0.1)
    expected_focal = 0.5 * 16 / np.tan(0.5 * 0.6911)
    assert focal[0] == pytest.approx(expected_focal, rel=1e-5)
    assert image.shape == (16, 16, 3) and image.max() <= 1.0

    # val split respects test_skip
    ds_val = BlenderDataset(str(blender_root), "val", test_skip=2)
    assert len(ds_val) == 2

    # scale_down halves resolution and focal
    ds_half = BlenderDataset(str(blender_root), "train", scale_down=2)
    _, focal_half, image_half = ds_half[0]
    assert image_half.shape == (8, 8, 3)
    assert focal_half[0] == pytest.approx(expected_focal / 2, rel=1e-5)

    # data_wrapper names the pipeline kwargs
    batch = stack_batch([ds[0], ds[1]])
    wrapped = ds.data_wrapper(*batch)._asdict()
    assert set(wrapped) == {"poses", "focal_lengths", "image_rgb"}
    assert wrapped["poses"].shape == (2, 4, 4)


@pytest.fixture
def llff_root(tmp_path):
    root = tmp_path / "fern_mini"
    (root / "images").mkdir(parents=True)
    rng = np.random.RandomState(1)
    n, H, W = 6, 32, 40
    poses = np.zeros((n, 3, 5), dtype=np.float64)
    for i in range(n):
        # cameras on a circle looking at the origin, LLFF [down, right, back] cols
        theta = 2 * np.pi * i / n
        pos = np.array([4 * np.cos(theta), 4 * np.sin(theta), 1.0 + 0.1 * i])
        back = pos / np.linalg.norm(pos)
        right = np.cross([0.0, 0.0, 1.0], back)
        right = right / np.linalg.norm(right)
        up = np.cross(back, right)
        poses[i, :, 0] = -up
        poses[i, :, 1] = right
        poses[i, :, 2] = back
        poses[i, :, 3] = pos
        poses[i, 0, 4] = H
        poses[i, 1, 4] = W
        poses[i, 2, 4] = 50.0  # focal
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"img_{i:03d}.png")
    bds = np.stack([np.full(n, 2.0), np.full(n, 10.0)], axis=1)
    arr = np.concatenate([poses.reshape(n, -1), bds], axis=1)
    np.save(root / "poses_bounds.npy", arr)
    return root


def test_llff_dataset(llff_root):
    ds = DATASETS.build(
        {"type": "LLFFDataset", "base_dir": str(llff_root), "split": "train", "factor": 2, "test_skip": 3}
    )
    # holdout: indices 0 and 3 go to test, 4 remain
    assert len(ds) == 4
    pose, focal, image, min_d, max_d = ds[0]
    assert pose.shape == (3, 4)
    assert image.shape == (16, 20, 3)  # minified by factor 2
    assert focal[0] == pytest.approx(25.0, rel=1e-5)  # focal rescaled by factor
    assert 0 < min_d[0] < max_d[0]
    # minification cache created on disk
    assert (llff_root / "images_2").exists()

    ds_test = LLFFDataset(str(llff_root), "test", factor=2, test_skip=3)
    assert len(ds_test) == 2
    # spiral render path generated
    assert ds.render_poses.shape[0] > 0


def test_llff_spherify(llff_root):
    ds = LLFFDataset(str(llff_root), "train", factor=2, test_skip=3, spherify=True)
    assert len(ds) == 4
    assert ds.render_poses.shape == (120, 3, 5)
    pose, focal, image, min_d, max_d = ds[0]
    assert np.isfinite(pose).all() and np.isfinite(min_d).all()


def test_sharded_epoch_sampler():
    # 10 items over 4 "processes": wraparound pads to 12, 3 each, disjoint-ish
    shards = [ShardedEpochSampler(10, shuffle=False, world_size=4, rank=r) for r in range(4)]
    all_indices = np.concatenate([s.indices() for s in shards])
    assert len(all_indices) == 12
    assert set(all_indices.tolist()) == set(range(10))  # covers everything
    for s in shards:
        assert len(s.indices()) == 3

    # shuffled: same permutation across ranks for one epoch, different across epochs
    s0 = ShardedEpochSampler(10, shuffle=True, world_size=2, rank=0, seed=1)
    s1 = ShardedEpochSampler(10, shuffle=True, world_size=2, rank=1, seed=1)
    union = set(s0.indices().tolist()) | set(s1.indices().tolist())
    assert union == set(range(10))
    first = s0.indices().tolist()
    s0.set_epoch(1)
    assert s0.indices().tolist() != first


def test_dataloader_batching_and_prefetch(blender_root):
    ds = BlenderDataset(str(blender_root), "train")
    loader = create_loader(ds, create_sampler(ds, shuffle=False), batch_size=2, num_workers=2, is_train=False)
    batches = list(loader)
    assert len(batches) == 2
    poses, focals, images = batches[0]
    assert poses.shape == (2, 4, 4) and images.shape == (2, 16, 16, 3)

    # train mode drops the last incomplete batch
    loader3 = create_loader(ds, create_sampler(ds, shuffle=True), batch_size=3, num_workers=0, is_train=True)
    assert len(loader3) == 1 and len(list(loader3)) == 1


@pytest.mark.skipif(
    not osp.isdir("data/nerf_synthetic/lego"), reason="real lego data not present"
)
def test_real_blender_smoke():
    ds = BlenderDataset("data/nerf_synthetic/lego", "train")
    pose, focal, image = ds[0]
    assert image.shape[2] == 3


def test_llff_path_zflat(llff_root):
    ds = LLFFDataset(str(llff_root), "train", factor=2, test_skip=3, path_zflat=True)
    # z-flat spiral: half the views, single rotation, zero z-radius
    assert ds.render_poses.shape[0] == 60
    assert np.isfinite(ds.render_poses).all()


def test_device_cached_loader_matches_host_loader(blender_root):
    from yanerf_tpu.datasets import DeviceCachedLoader

    ds = BlenderDataset(str(blender_root), "train")
    host = create_loader(ds, create_sampler(ds, shuffle=True, seed=3), batch_size=2, num_workers=0, is_train=True)
    cached = DeviceCachedLoader(
        create_loader(ds, create_sampler(ds, shuffle=True, seed=3), batch_size=2, num_workers=0, is_train=True)
    )
    host_batches = list(host)
    cached_batches = list(cached)
    assert len(host_batches) == len(cached_batches) == len(cached)
    for hb, cb in zip(host_batches, cached_batches):
        for hf, cf in zip(hb, cb):
            np.testing.assert_allclose(np.asarray(cf), np.asarray(hf), atol=1e-7)
    # second epoch reshuffles identically to the host loader
    host.sampler.set_epoch(1)
    cached.sampler.set_epoch(1)
    for hb, cb in zip(host, cached):
        np.testing.assert_allclose(np.asarray(cb[0]), np.asarray(hb[0]), atol=1e-7)


def test_device_cached_loader_size_fallback(blender_root):
    from yanerf_tpu.datasets import DeviceCachedLoader

    ds = BlenderDataset(str(blender_root), "train")
    cached = DeviceCachedLoader(
        create_loader(ds, create_sampler(ds, shuffle=False), batch_size=2, num_workers=0, is_train=False),
        max_bytes=1,  # force fallback to the host loader
    )
    batches = list(cached)
    assert len(batches) == 2
    assert isinstance(batches[0][0], np.ndarray)  # host path yields numpy


def test_device_cache_uint8_quantization_lossless(blender_root):
    """quantize_images stores 8-bit-sourced images as uint8 and decodes them
    BIT-exactly (correctly-rounded f32 division by 255), while refusing to
    quantize anything not provably lossless."""
    import numpy as np

    from yanerf_tpu.datasets import DeviceCachedLoader, decode_cached_field

    ds = BlenderDataset(str(blender_root), "train")
    host = create_loader(ds, create_sampler(ds, shuffle=True, seed=3), batch_size=2, num_workers=0, is_train=True)
    cached = DeviceCachedLoader(
        create_loader(ds, create_sampler(ds, shuffle=True, seed=3), batch_size=2, num_workers=0, is_train=True),
        quantize_images=True,
    )
    host_batches = list(host)
    cached_batches = list(cached)
    # the image field was actually stored quantized...
    img_field = len(host_batches[0]) - 1
    assert cached._arrays[img_field].dtype == np.uint8
    # ...and decodes bit-for-bit against the host loader
    for hb, cb in zip(host_batches, cached_batches):
        for hf, cf in zip(hb, cb):
            np.testing.assert_array_equal(np.asarray(cf), np.asarray(hf))

    # non-8-bit-sourced floats are refused (lossless gate)
    arbitrary = np.asarray([[0.1234567, 0.7654321]], dtype=np.float32)[None]
    assert cached._maybe_quantize(arbitrary).dtype == np.float32
    # decode passes non-uint8 fields through untouched
    assert decode_cached_field(arbitrary) is arbitrary


def test_device_cache_quantize_skips_out_of_range_fields(blender_root):
    """ADVICE r3: pose-like f32 fields with negative entries must be gated by
    a range check (no undefined float->uint8 cast, no RuntimeWarning) and the
    cache-fit estimate must use the ACTUAL quantization outcome."""
    import warnings

    from yanerf_tpu.datasets import DeviceCachedLoader

    ds = BlenderDataset(str(blender_root), "train")
    cached = DeviceCachedLoader(
        create_loader(ds, create_sampler(ds, shuffle=False), batch_size=2, num_workers=0, is_train=False),
        quantize_images=True,
    )
    poses = np.stack([np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)] * 3)[..., :4]
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning -> failure
        out = cached._maybe_quantize(poses)
    assert out.dtype == np.float32 and out is poses

    # estimate path: a dataset whose image-shaped field does NOT quantize
    # (arbitrary floats) must fall back when the UNSHRUNK size exceeds
    # max_bytes, instead of assuming a blanket 4x shrink
    class FloatDs:
        data_wrapper = None

        def __len__(self):
            return 4

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            return (rng.rand(8, 8, 3).astype(np.float32) * 0.9999,)

    ds2 = FloatDs()
    loader = create_loader(ds2, create_sampler(ds2, shuffle=False), batch_size=2, num_workers=0, is_train=False)
    budget = 4 * 8 * 8 * 3 * 4 // 2  # fits only if the bogus 4x shrink applied
    cached2 = DeviceCachedLoader(loader, quantize_images=True, max_bytes=budget)
    assert cached2._ensure_cache() is False  # falls back, no HBM blowout
