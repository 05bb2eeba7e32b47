"""Native C++ JPEG loader: builds, decodes, and matches the PIL path."""

import numpy as np
import pytest

from mspi_tpu.data import native
from mspi_tpu.data.video import load_frame


@pytest.fixture(scope="module")
def jpeg_file(tmp_path_factory):
    from PIL import Image

    rng = np.random.default_rng(0)
    # smooth-ish image so JPEG loss is small
    base = rng.random((8, 12, 3))
    img = np.kron(base, np.ones((40, 40, 1)))  # 320x480
    img = (img * 255).astype(np.uint8)
    path = str(tmp_path_factory.mktemp("jpg") / "frame.jpg")
    Image.fromarray(img).save(path, quality=95)
    return path


def test_native_builds(jpeg_file):
    assert native.available(), "native loader failed to build"


def test_native_matches_pil(jpeg_file):
    if not native.available():
        pytest.skip("no native lib")
    size = (224, 384)
    ours = native.load_frame_native(jpeg_file, size)
    ref = load_frame(jpeg_file, size)
    assert ours is not None and ours.shape == ref.shape == (224, 384, 3)
    diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
    assert diff.mean() < 2.0, diff.mean()  # PIL-compatible antialias filter


def test_native_clip_threaded(jpeg_file):
    if not native.available():
        pytest.skip("no native lib")
    clip = native.load_clip_native([jpeg_file] * 6, (112, 192), n_threads=3)
    assert clip is not None and clip.shape == (6, 112, 192, 3)
    single = native.load_frame_native(jpeg_file, (112, 192))
    np.testing.assert_array_equal(clip[0], single)
    np.testing.assert_array_equal(clip[5], single)


def test_native_missing_file():
    if not native.available():
        pytest.skip("no native lib")
    assert native.load_frame_native("/nonexistent.jpg", (32, 32)) is None
