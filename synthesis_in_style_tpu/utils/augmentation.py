"""Paired image/mask augmentation — native numpy/OpenCV implementation.

Capability parity with the reference augmentation pipeline
(/root/reference/stylegan_code_finder/utils/augment_dataset.py:27-73), which
used imgaug (not available here; reimplemented from the documented op
semantics):

Geometric (applied with IDENTICAL parameters to image and mask; the mask is
warped with nearest-neighbor so no interpolated colors appear — an
improvement over the reference, which ran cubic interpolation over color
masks):
  * 1-2 of: ElasticTransformation(alpha 5-25, sigma 5-9), ShearX(20deg),
    CropAndPad(-80..80 px, resized back), Affine translate +-15%.
  * then with p=0.66 one of: Rot90(k in {1,3}), Rotate(+-15deg).

Color (image only):
  * p=0.8: GammaContrast, gamma in (1.5, 2.5) [darker] or (0.1, 1.0)
    [lighter], chosen uniformly between the two intervals;
  * p=0.10: Invert.

All randomness flows through a caller-supplied `numpy.random.Generator` so
per-worker streams are reproducible (the reference relied on imgaug's global
RNG).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import cv2
import numpy as np


def _warp(
    image: np.ndarray, matrix: np.ndarray, is_mask: bool, border_value=0
) -> np.ndarray:
    h, w = image.shape[:2]
    flags = cv2.INTER_NEAREST if is_mask else cv2.INTER_LINEAR
    return cv2.warpAffine(
        image, matrix[:2], (w, h), flags=flags,
        borderMode=cv2.BORDER_CONSTANT, borderValue=border_value,
    )


def _elastic_fields(
    shape: Tuple[int, int], alpha: float, sigma: float, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray]:
    """Smoothed random displacement fields (imgaug ElasticTransformation
    semantics: gaussian-filtered uniform noise scaled by alpha)."""
    h, w = shape
    dx = rng.uniform(-1, 1, (h, w)).astype(np.float32)
    dy = rng.uniform(-1, 1, (h, w)).astype(np.float32)
    ksize = int(max(3, (int(sigma * 4) | 1)))
    dx = cv2.GaussianBlur(dx, (ksize, ksize), sigma) * alpha
    dy = cv2.GaussianBlur(dy, (ksize, ksize), sigma) * alpha
    grid_x, grid_y = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32)
    )
    return grid_x + dx, grid_y + dy


def _remap(image: np.ndarray, map_x, map_y, is_mask: bool) -> np.ndarray:
    flags = cv2.INTER_NEAREST if is_mask else cv2.INTER_LINEAR
    return cv2.remap(
        image, map_x, map_y, flags, borderMode=cv2.BORDER_CONSTANT, borderValue=0
    )


def _crop_and_pad(image: np.ndarray, amount: int, is_mask: bool) -> np.ndarray:
    """imgaug CropAndPad(px, keep_size=True): positive pads all sides,
    negative crops, then resize back to the original size."""
    h, w = image.shape[:2]
    if amount == 0:
        return image
    if amount > 0:
        pad_width = [(amount, amount), (amount, amount)] + [(0, 0)] * (image.ndim - 2)
        out = np.pad(image, pad_width, mode="constant")
    else:
        c = min(-amount, (min(h, w) - 2) // 2)
        if c <= 0:
            return image
        out = image[c : h - c, c : w - c]
    interp = cv2.INTER_NEAREST if is_mask else cv2.INTER_LINEAR
    return cv2.resize(out, (w, h), interpolation=interp)


class PairedAugmenter:
    """Samples one augmentation program and applies it to (image, mask)
    pairs. Parameter ranges mirror reference augment_dataset.py:34-51."""

    def __init__(
        self,
        elastic_alpha: Tuple[float, float] = (5.0, 25.0),
        elastic_sigma: Tuple[float, float] = (5.0, 9.0),
        shear_deg: Tuple[float, float] = (20.0, 20.0),
        crop_and_pad_px: Tuple[int, int] = (-80, 80),
        translate_pct: float = 0.15,
        rotate_deg: float = 15.0,
        rot_prob: float = 0.66,
        gamma_prob: float = 0.8,
        invert_prob: float = 0.10,
    ):
        self.elastic_alpha = elastic_alpha
        self.elastic_sigma = elastic_sigma
        self.shear_deg = shear_deg
        self.crop_and_pad_px = crop_and_pad_px
        self.translate_pct = translate_pct
        self.rotate_deg = rotate_deg
        self.rot_prob = rot_prob
        self.gamma_prob = gamma_prob
        self.invert_prob = invert_prob

    # ---- color ops (image only, reference :46-51) ----
    def _apply_color(self, image: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        out = image
        if rng.uniform() < self.gamma_prob:
            if rng.uniform() < 0.5:
                gamma = rng.uniform(1.5, 2.5)
            else:
                gamma = rng.uniform(0.1, 1.0)
            out = (
                np.power(out.astype(np.float32) / 255.0, gamma) * 255.0
            ).astype(np.uint8)
        if rng.uniform() < self.invert_prob:
            out = 255 - out
        return out

    def __call__(
        self,
        image: np.ndarray,
        mask: np.ndarray,
        rng: Optional[np.random.Generator] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """image: (H, W, C) uint8; mask: (H, W[, C]) uint8. Returns the
        augmented pair, same shapes."""
        rng = rng or np.random.default_rng()
        h, w = image.shape[:2]

        image = self._apply_color(image, rng)

        # ---- 1-2 geometric ops (reference SomeOf((1, 2), ...) :35-40) ----
        ops = ["elastic", "shear", "crop_pad", "translate"]
        n_ops = int(rng.integers(1, 3))
        chosen = list(rng.choice(ops, size=n_ops, replace=False))

        pair: List[np.ndarray] = [image, mask]
        for op in chosen:
            if op == "elastic":
                alpha = rng.uniform(*self.elastic_alpha)
                sigma = rng.uniform(*self.elastic_sigma)
                map_x, map_y = _elastic_fields((h, w), alpha, sigma, rng)
                pair = [
                    _remap(arr, map_x, map_y, is_mask=(i == 1))
                    for i, arr in enumerate(pair)
                ]
            elif op == "shear":
                deg = rng.uniform(*self.shear_deg)
                shear = np.tan(np.deg2rad(deg))
                # shear about the image center (imgaug convention)
                m = np.array(
                    [[1, shear, -shear * h / 2], [0, 1, 0]], np.float32
                )
                pair = [
                    _warp(arr, m, is_mask=(i == 1)) for i, arr in enumerate(pair)
                ]
            elif op == "crop_pad":
                amount = int(rng.integers(self.crop_and_pad_px[0],
                                          self.crop_and_pad_px[1] + 1))
                pair = [
                    _crop_and_pad(arr, amount, is_mask=(i == 1))
                    for i, arr in enumerate(pair)
                ]
            elif op == "translate":
                tx = rng.uniform(-self.translate_pct, self.translate_pct) * w
                ty = rng.uniform(-self.translate_pct, self.translate_pct) * h
                m = np.array([[1, 0, tx], [0, 1, ty]], np.float32)
                pair = [
                    _warp(arr, m, is_mask=(i == 1)) for i, arr in enumerate(pair)
                ]

        # ---- optional rotation (reference Sometimes(0.66, ...) :41-44) ----
        if rng.uniform() < self.rot_prob:
            if rng.uniform() < 0.5:
                k = int(rng.choice([1, 3]))
                pair = [np.rot90(arr, k).copy() for arr in pair]
                if h != w:
                    # imgaug Rot90 keep_size=True (the reference's default):
                    # resize back so output shape always matches input shape
                    pair = [
                        cv2.resize(
                            arr, (w, h),
                            interpolation=cv2.INTER_NEAREST if i == 1
                            else cv2.INTER_LINEAR,
                        )
                        for i, arr in enumerate(pair)
                    ]
            else:
                deg = rng.uniform(-self.rotate_deg, self.rotate_deg)
                m = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0)
                m = np.vstack([m, [0, 0, 1]]).astype(np.float32)
                pair = [
                    _warp(arr, m, is_mask=(i == 1)) for i, arr in enumerate(pair)
                ]

        return pair[0], pair[1]


def augment_image(
    image: np.ndarray,
    mask: np.ndarray,
    num_images: int,
    rng: Optional[np.random.Generator] = None,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Produce num_images independently-augmented copies of the pair
    (reference augment_image, augment_dataset.py:27-73)."""
    aug = PairedAugmenter()
    rng = rng or np.random.default_rng()
    return [aug(image, mask, rng) for _ in range(num_images)]
