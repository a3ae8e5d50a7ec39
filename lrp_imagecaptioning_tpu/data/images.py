"""Host-side image loading + VGG preprocessing.

Equivalent of the reference ImagePreprocessor (models/preprocessors.py:10-53):
load -> resize 224x224 -> RGB->BGR + ImageNet mean subtraction (the Keras
``vgg16.preprocess_input`` 'caffe' convention). Augmentation (rotation/shift/
shear/zoom/hflip) is provided as a numpy implementation gated by the same
switch; it only affects training batches.

The batched hot path (`preprocess_batch_paths`) optionally dispatches to the
native C++ loader (lrp_imagecaptioning_tpu.data.loader_native) when built.
"""

from __future__ import annotations

import numpy as np

IMAGE_SIZE = (224, 224)
# Keras 'caffe' mode BGR means (keras_applications/imagenet_utils.py)
VGG_BGR_MEAN = np.array([103.939, 116.779, 123.68], dtype=np.float32)


def load_img_array(img_path: str, target_size=IMAGE_SIZE) -> np.ndarray:
    """PIL load + nearest-compatible resize to target, float32 RGB HWC."""
    from PIL import Image

    img = Image.open(img_path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    if img.size != (target_size[1], target_size[0]):
        img = img.resize((target_size[1], target_size[0]), Image.NEAREST)
    return np.asarray(img, dtype=np.float32)


def vgg_preprocess(img_rgb: np.ndarray) -> np.ndarray:
    """RGB float HWC (0..255) -> BGR mean-subtracted (vgg16.preprocess_input)."""
    x = img_rgb[..., ::-1].astype(np.float32)  # RGB->BGR
    return x - VGG_BGR_MEAN


def vgg_deprocess(img_bgr: np.ndarray) -> np.ndarray:
    """Inverse of vgg_preprocess: BGR mean-subtracted -> RGB 0..255."""
    x = img_bgr + VGG_BGR_MEAN
    return x[..., ::-1]


class ImagePreprocessor:
    """Mirrors reference ImagePreprocessor (preprocessors.py:10-53)."""

    IMAGE_SIZE = IMAGE_SIZE

    def __init__(self, encoder: str = "vgg16", image_augmentation: bool = False, seed: int = 0,
                 image_size=None):
        if encoder not in ("vgg16", "vgg19", "resnet50", "resnet101", "inception_v3"):
            raise NotImplementedError(f"encoder {encoder!r} not supported yet")
        self.encoder = encoder
        # per-encoder input size / preprocessing (preprocessors.py:10-53:
        # vgg/resnet use caffe BGR at 224; inception scales to [-1,1] at 299);
        # image_size overrides for small-shape tests/benches
        if image_size is not None:
            self._size = tuple(image_size)
        else:
            self._size = (299, 299) if encoder == "inception_v3" else IMAGE_SIZE
        self._augment = image_augmentation
        self._rng = np.random.default_rng(seed)

    def preprocess_images(self, img_paths, random_transform: bool = False):
        return [self._preprocess_one(p, random_transform) for p in img_paths]

    def preprocess_batch(self, img_list) -> np.ndarray:
        return np.asarray(img_list, dtype=np.float32)

    def preprocess_batch_paths(self, img_paths, random_transform: bool = False) -> np.ndarray:
        try:
            from . import loader_native

            if (self._size[0] == self._size[1]  # native loader is square-only
                    and loader_native.available()
                    and not (self._augment and random_transform)):
                mode = "inception" if self.encoder == "inception_v3" else "caffe"
                return loader_native.load_batch(list(img_paths), self._size[0], mode)
        except Exception:
            pass
        return self.preprocess_batch(self.preprocess_images(img_paths, random_transform))

    def _preprocess_one(self, img_path: str, random_transform: bool) -> np.ndarray:
        arr = load_img_array(img_path, target_size=self._size)
        if self._augment and random_transform:
            arr = self._random_transform(arr)
        if self.encoder == "inception_v3":
            from ..models.inception import inception_preprocess

            return inception_preprocess(arr)
        return vgg_preprocess(arr)

    # -- augmentation (reference params: rotation 40, shifts 0.2, shear 0.2,
    #    zoom 0.2, hflip — preprocessors.py:18-25) -------------------------

    def _random_transform(self, x: np.ndarray) -> np.ndarray:
        # parameter draws mirror ImageDataGenerator.get_random_transform for
        # the reference's generator config (preprocessors.py:18-25): theta in
        # DEGREES, shifts scaled by the image dims, shear in DEGREES (the
        # Keras quirk — shear_range=0.2 means +-0.2 deg, not radians or a
        # fraction), zoom in [1-z, 1+z], hflip with p=.5
        theta = self._rng.uniform(-40, 40)
        tx = self._rng.uniform(-0.2, 0.2) * x.shape[0]
        ty = self._rng.uniform(-0.2, 0.2) * x.shape[1]
        shear = self._rng.uniform(-0.2, 0.2)
        zx, zy = self._rng.uniform(0.8, 1.2, size=2)
        flip = self._rng.random() < 0.5
        out = apply_affine_transform(x, theta, tx, ty, shear, zx, zy)
        if flip:
            out = out[:, ::-1]
        return out


def apply_affine_transform(x: np.ndarray, theta: float = 0.0, tx: float = 0.0,
                           ty: float = 0.0, shear: float = 0.0, zx: float = 1.0,
                           zy: float = 1.0) -> np.ndarray:
    """Keras ``apply_affine_transform`` semantics for HWC arrays
    (differential-pinned against tf_keras in tests/test_augmentation.py).

    ``theta``/``shear`` in degrees; ``tx`` shifts COLUMNS, ``ty`` ROWS (both
    in pixels — pinned by tests/test_augmentation.py's hand cases; note
    Keras's own get_random_transform nevertheless scales tx by the ROW dim,
    a quirk _random_transform mirrors); matrices composed
    rot @ shift @ shear @ zoom, centered at
    (dim/2 - 0.5), bilinear sampling with nearest fill — the transform the
    reference's ImageDataGenerator applies during training augmentation
    (preprocessors.py:18-25).
    """
    from scipy.ndimage import affine_transform

    h, w = x.shape[0], x.shape[1]
    theta = np.deg2rad(theta)
    shear = np.deg2rad(shear)
    m = None

    def compose(a, b):
        return b if a is None else a @ b

    if theta != 0:
        m = compose(m, np.array([[np.cos(theta), -np.sin(theta), 0],
                                 [np.sin(theta), np.cos(theta), 0],
                                 [0, 0, 1.0]]))
    if tx != 0 or ty != 0:
        m = compose(m, np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1.0]]))
    if shear != 0:
        m = compose(m, np.array([[1, -np.sin(shear), 0],
                                 [0, np.cos(shear), 0], [0, 0, 1.0]]))
    if zx != 1 or zy != 1:
        m = compose(m, np.array([[zx, 0, 0], [0, zy, 0], [0, 0, 1.0]]))
    if m is None:
        return x
    # Keras builds the matrix in (x, y) coordinates with x = rows, centers it
    # at (h/2-.5, w/2-.5), then swaps the axes to array (row, col) order
    # before handing it to scipy (tf_keras image.py transform_matrix_
    # offset_center + the PMP permutation in apply_affine_transform) — the
    # differential tests pin this exact composition
    o = np.array([h, w]) / 2.0 - 0.5
    offset_m = np.array([[1, 0, o[0]], [0, 1, o[1]], [0, 0, 1.0]])
    reset_m = np.array([[1, 0, -o[0]], [0, 1, -o[1]], [0, 0, 1.0]])
    m = offset_m @ m @ reset_m
    m[:, [0, 1]] = m[:, [1, 0]]
    m[[0, 1]] = m[[1, 0]]
    out = np.empty_like(x)
    for c in range(x.shape[2]):
        out[..., c] = affine_transform(x[..., c], m[:2, :2], offset=m[:2, 2],
                                       order=1, mode="nearest")
    return out
