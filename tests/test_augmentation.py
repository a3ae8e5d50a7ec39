"""Keras ImageDataGenerator parity for the training augmentation
(data/images.py::apply_affine_transform / ImagePreprocessor._random_transform).

The reference augments with ImageDataGenerator(rotation_range=40,
width/height_shift_range=0.2, shear_range=0.2, zoom_range=0.2,
horizontal_flip=True, fill_mode='nearest') (preprocessors.py:18-25). Two
layers of pinning:

* differential: tf_keras.preprocessing.image.apply_affine_transform (the
  canonical Keras implementation, present in this environment) must agree
  BIT-FOR-BIT on a parameter grid — this is what exposed the previous
  implementation applying rotation/shift on swapped axes;
* hand-derived: integer shifts, 90-degree rotation, nearest-fill edges and
  the shear-in-degrees quirk, computed by hand.

Draw semantics (ranges, shear in degrees, zoom in [1-z,1+z], hflip p=.5)
are asserted separately on the preprocessor.
"""

import numpy as np
import pytest

from lrp_imagecaptioning_tpu.data.images import ImagePreprocessor, apply_affine_transform

tf_keras_image = pytest.importorskip("tf_keras.preprocessing.image")

_AX = dict(row_axis=0, col_axis=1, channel_axis=2, fill_mode="nearest", order=1)


@pytest.mark.parametrize("kw", [
    dict(theta=25.0),
    dict(theta=-40.0),
    dict(theta=90.0),
    dict(tx=3.0),
    dict(tx=-2.5),
    dict(ty=-4.0),
    dict(ty=1.5),
    dict(shear=0.2),       # the reference's actual shear magnitude (degrees)
    dict(shear=30.0),
    dict(zx=1.2, zy=0.85),
    dict(zx=0.8),
    dict(zy=1.2),
    dict(tx=0.5, ty=0.5),
    dict(theta=-40.0, tx=2.5, ty=-3.1, shear=-0.15, zx=0.9, zy=1.1),
    dict(theta=12.0, tx=-1.0, ty=2.0, shear=0.1, zx=1.05, zy=0.95),
])
def test_affine_matches_keras_bitwise(kw):
    rng = np.random.default_rng(0)
    # deliberately non-square and multi-channel to catch axis swaps
    x = rng.normal(size=(16, 20, 3)).astype(np.float32)
    ours = apply_affine_transform(x, **kw)
    keras = tf_keras_image.apply_affine_transform(x.copy(), **kw, **_AX)
    np.testing.assert_array_equal(ours, keras)


def test_affine_identity_is_noop():
    x = np.arange(24, dtype=np.float32).reshape(4, 2, 3)
    out = apply_affine_transform(x)
    np.testing.assert_array_equal(out, x)


def test_shift_hand_case_integer_rows():
    """Keras ty shifts ROWS (its x axis = array rows after the PMP swap):
    ty=+2 -> output row i shows input row i+2, bottom rows repeat the last
    row (nearest fill)."""
    x = np.arange(6 * 4, dtype=np.float32).reshape(6, 4, 1)
    out = apply_affine_transform(x, ty=2.0)
    want = np.concatenate([x[2:], x[-1:], x[-1:]], axis=0)
    np.testing.assert_array_equal(out, want)


def test_shift_hand_case_integer_cols():
    """Keras tx shifts COLUMNS: tx=+1 -> output col j shows input col j+1,
    the right edge repeating (nearest fill)."""
    x = np.arange(3 * 5, dtype=np.float32).reshape(3, 5, 1)
    out = apply_affine_transform(x, tx=1.0)
    want = np.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    np.testing.assert_array_equal(out, want)


def test_rotation_90_hand_case():
    """90-degree rotation about the center of a square image is a pure
    permutation (no interpolation): pin it against numpy's rot90."""
    x = np.arange(5 * 5, dtype=np.float32).reshape(5, 5, 1)
    out = apply_affine_transform(x, theta=90.0)
    keras = tf_keras_image.apply_affine_transform(x.copy(), theta=90.0, **_AX)
    np.testing.assert_array_equal(out, keras)
    # up to float eps from the trig terms, exactly the rot90 permutation
    np.testing.assert_allclose(out[..., 0], np.rot90(x[..., 0], k=1), atol=1e-5)


def test_shear_is_interpreted_in_degrees():
    """The reference's shear_range=0.2 means +-0.2 DEGREES (Keras quirk):
    a 0.2-degree shear must perturb far less than a 0.2-radian one would."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(14, 14, 1)).astype(np.float32)
    small = apply_affine_transform(x, shear=0.2)
    big = apply_affine_transform(x, shear=np.rad2deg(0.2))
    assert np.abs(small - x).max() < np.abs(big - x).max()
    keras = tf_keras_image.apply_affine_transform(x.copy(), shear=0.2, **_AX)
    np.testing.assert_array_equal(small, keras)


def test_random_transform_draw_semantics():
    """_random_transform's parameter distribution matches the reference
    generator config: recorded draws stay in range, hflip fires ~half the
    time, and each output equals apply_affine_transform at the drawn params
    (+ flip), reproduced from the same RNG stream."""
    ip = ImagePreprocessor(encoder="vgg16", image_size=(16, 20),
                           image_augmentation=True)
    rng_clone = np.random.default_rng()
    rng_clone.bit_generator.state = ip._rng.bit_generator.state
    x = np.random.default_rng(3).normal(size=(16, 20, 3)).astype(np.float32)
    flips = 0
    for _ in range(40):
        out = ip._random_transform(x)
        theta = rng_clone.uniform(-40, 40)
        tx = rng_clone.uniform(-0.2, 0.2) * 16
        ty = rng_clone.uniform(-0.2, 0.2) * 20
        shear = rng_clone.uniform(-0.2, 0.2)
        zx, zy = rng_clone.uniform(0.8, 1.2, size=2)
        flip = rng_clone.random() < 0.5
        assert -40 <= theta <= 40 and -3.2 <= tx <= 3.2 and -4 <= ty <= 4
        assert -0.2 <= shear <= 0.2 and 0.8 <= zx <= 1.2 and 0.8 <= zy <= 1.2
        want = apply_affine_transform(x, theta, tx, ty, shear, zx, zy)
        if flip:
            want = want[:, ::-1]
            flips += 1
        np.testing.assert_array_equal(out, want)
    assert 8 <= flips <= 32  # hflip probability ~0.5
