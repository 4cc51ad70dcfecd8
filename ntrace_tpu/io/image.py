"""Framebuffer output: tonemap + PNG (~ framework/io/ImageLodePngIO etc.).

The reference writes screenshots via its own PNG/BMP/TGA/TIFF codecs; here a
single PNG path via PIL covers the capability (screenshots, golden-image
artifacts). Images are (H, W, 3) float32 linear in [0, inf)."""

from __future__ import annotations

import numpy as np


def tonemap(img: np.ndarray, gamma: float = 2.2) -> np.ndarray:
    """Linear float -> uint8 with clamp + gamma (matches a plain GL blit
    with sRGB-ish gamma; the reference displays linear values clamped)."""
    x = np.clip(np.asarray(img, dtype=np.float32), 0.0, 1.0)
    x = x ** (1.0 / gamma)
    return (x * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img: np.ndarray, gamma: float = 2.2) -> None:
    from PIL import Image

    arr = img
    if arr.dtype != np.uint8:
        arr = tonemap(arr, gamma)
    Image.fromarray(arr).save(path)


def checksum(img: np.ndarray) -> str:
    """Stable content hash of a float image (golden-image fingerprints)."""
    import hashlib

    a = np.ascontiguousarray(np.asarray(img, dtype=np.float32))
    return hashlib.sha1(a.tobytes()).hexdigest()[:16]
