"""Native C++ batch loader (native/loader.cpp) parity with the Python path.

The loader is the framework's host-side hot loop (the reference's per-image
PIL loop, preprocessors.py:27-42); these tests pin its decode -> PIL-nearest
resize -> caffe-BGR preprocessing against the Python ImagePreprocessor, and
the graceful fallback contract. Builds the shared library on demand (g++ is
part of the environment); skips only if the build itself fails.
"""

import os
import subprocess

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native():
    from lrp_imagecaptioning_tpu.data import loader_native

    if not loader_native.available():
        r = subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                           capture_output=True, text=True)
        # a fresh process would re-probe; reset the binding's cache instead
        loader_native._TRIED = False
        loader_native._LIB = None
        if r.returncode != 0 or not loader_native.available():
            pytest.skip(f"native loader unbuildable: {r.stderr[-200:]}")
    return loader_native


def _write_images(tmp_path, rng):
    paths = {}
    arr = (rng.random((300, 451, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(arr).save(p)
    paths["png"] = p
    p = str(tmp_path / "img.jpg")
    Image.fromarray(arr).save(p, quality=95)
    paths["jpg"] = p
    # grayscale PNG exercises the mode-conversion branch
    p = str(tmp_path / "gray.png")
    Image.fromarray(arr[..., 0]).save(p)
    paths["gray"] = p
    return paths


def test_native_matches_python_path(native, tmp_path, rng):
    from lrp_imagecaptioning_tpu.data.images import ImagePreprocessor

    paths = _write_images(tmp_path, rng)
    pp = ImagePreprocessor(encoder="vgg16")
    batch = list(paths.values())
    got = native.load_batch_vgg(batch)
    want = np.asarray(pp.preprocess_images(batch), np.float32)
    assert got.shape == want.shape == (3, 224, 224, 3)
    # PNG + grayscale decode bit-identically; JPEG decoders may round DCT
    # output differently by a couple of 8-bit levels
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[2], want[2])
    assert np.abs(got[1] - want[1]).max() <= 4.0
    assert (np.abs(got[1] - want[1]) > 0.5).mean() < 0.05


def test_preprocess_batch_paths_uses_native(native, tmp_path, rng):
    """The provider-facing entry point routes through the native loader at
    the production configuration and matches it bit-for-bit."""
    from lrp_imagecaptioning_tpu.data.images import ImagePreprocessor

    paths = _write_images(tmp_path, rng)
    pp = ImagePreprocessor(encoder="vgg16")
    out = pp.preprocess_batch_paths([paths["png"], paths["png"]])
    np.testing.assert_array_equal(out, native.load_batch_vgg([paths["png"]] * 2))


def test_native_loader_failure_reports_index(native, tmp_path, rng):
    paths = _write_images(tmp_path, rng)
    with pytest.raises(RuntimeError, match="1-th"):
        native.load_batch_vgg([paths["png"], str(tmp_path / "missing.png")])


def test_native_inception_mode(native, tmp_path, rng):
    """The generalized entry point covers inception's 299/[-1,1] RGB path
    (keras inception preprocess_input) and routes from ImagePreprocessor."""
    from lrp_imagecaptioning_tpu.data.images import ImagePreprocessor

    paths = _write_images(tmp_path, rng)
    pp = ImagePreprocessor(encoder="inception_v3")
    batch = [paths["png"], paths["gray"]]
    got = native.load_batch(batch, size=299, mode="inception")
    want = np.asarray(pp.preprocess_images(batch), np.float32)
    assert got.shape == want.shape == (2, 299, 299, 3)
    np.testing.assert_array_equal(got, want)  # PNG decodes bit-identically
    assert got.min() >= -1.0 and got.max() <= 1.0
    # provider-facing entry point routes inception through the native loader
    np.testing.assert_array_equal(pp.preprocess_batch_paths(batch), got)


def test_native_custom_size_caffe(native, tmp_path, rng):
    """Square override sizes (small-shape test/bench configs) stay native."""
    from lrp_imagecaptioning_tpu.data.images import ImagePreprocessor

    paths = _write_images(tmp_path, rng)
    pp = ImagePreprocessor(encoder="resnet50", image_size=(64, 64))
    got = pp.preprocess_batch_paths([paths["png"]])
    want = np.asarray(pp.preprocess_images([paths["png"]]), np.float32)
    assert got.shape == (1, 64, 64, 3)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, native.load_batch([paths["png"]], 64, "caffe"))
