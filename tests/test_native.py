"""Native C++ image decoder: build, decode, and PIL-equivalence tests."""

import numpy as np
import pytest
from PIL import Image

from yanerf_tpu import native


@pytest.fixture(scope="module")
def png_file(tmp_path_factory):
    rng = np.random.RandomState(3)
    img = (rng.rand(13, 17, 3) * 255).astype(np.uint8)
    path = tmp_path_factory.mktemp("imgs") / "x.png"
    Image.fromarray(img).save(path)
    return str(path), img


@pytest.fixture(scope="module")
def rgba_png_file(tmp_path_factory):
    rng = np.random.RandomState(4)
    img = (rng.rand(9, 11, 4) * 255).astype(np.uint8)
    path = tmp_path_factory.mktemp("imgs") / "rgba.png"
    Image.fromarray(img, mode="RGBA").save(path)
    return str(path), img


def test_native_builds():
    assert native.available(), "native image io failed to build (g++/libpng/libjpeg expected)"


def test_native_png_matches_pil(png_file):
    path, img = png_file
    out = native.decode_image(path)
    assert out.shape == (13, 17, 3) and out.dtype == np.float32
    pil = np.array(Image.open(path).convert("RGB")).astype(np.float32) / 255.0
    np.testing.assert_allclose(out, pil, atol=1e-7)


def test_native_rgba_drops_alpha_like_pil(rgba_png_file):
    path, img = rgba_png_file
    out = native.decode_image(path)
    pil = np.array(Image.open(path).convert("RGB")).astype(np.float32) / 255.0
    np.testing.assert_allclose(out, pil, atol=1e-7)


def test_native_jpeg(tmp_path):
    rng = np.random.RandomState(5)
    img = (rng.rand(16, 24, 3) * 255).astype(np.uint8)
    path = tmp_path / "x.jpg"
    Image.fromarray(img).save(path, quality=95)
    out = native.decode_image(str(path))
    pil = np.array(Image.open(path).convert("RGB")).astype(np.float32) / 255.0
    # JPEG decoders may differ by a few LSBs of IDCT rounding
    assert np.abs(out - pil).max() < 0.02


def test_native_batch_decode(tmp_path):
    rng = np.random.RandomState(6)
    paths = []
    refs = []
    for i in range(6):
        img = (rng.rand(8, 10, 3) * 255).astype(np.uint8)
        p = tmp_path / f"b{i}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))
        refs.append(img.astype(np.float32) / 255.0)
    out = native.decode_batch(paths, n_threads=3)
    assert out.shape == (6, 8, 10, 3)
    np.testing.assert_allclose(out, np.stack(refs), atol=1e-7)


def test_load_image_uses_native(png_file):
    from yanerf_tpu.datasets.utils import load_image

    path, img = png_file
    out = load_image(path)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-7)
