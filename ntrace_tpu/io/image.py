"""Framebuffer/image I/O: tonemap + PNG/BMP/TGA/TIFF (~ framework/io/
ImageLodePngIO.*, ImageBmpIO.*, ImageTargaIO.*, ImageTiffIO.*; expected
paths, mount empty -- SURVEY.md SS3.1).

The reference ships four hand-written codecs for screenshots and texture
loading; PIL covers all four formats here through one dispatch pair
(write_image/read_image). Images are (H, W, 3) float32 linear in [0, inf)
on the render side, uint8 on disk."""

from __future__ import annotations

import numpy as np

FORMATS = (".png", ".bmp", ".tga", ".tif", ".tiff")


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


def write_image(path: str, img: np.ndarray, gamma: float = 2.2) -> None:
    """Write PNG/BMP/TGA/TIFF by file suffix (uint8 passthrough or
    tonemapped float)."""
    import os

    from PIL import Image

    ext = os.path.splitext(str(path))[1].lower()
    if ext not in FORMATS:
        raise ValueError(f"unsupported image format {ext!r}; use {FORMATS}")
    arr = img
    if arr.dtype != np.uint8:
        arr = tonemap(arr, gamma)
    Image.fromarray(arr).save(path)


def read_image(path: str) -> np.ndarray:
    """Read any supported format as (H, W, 3) uint8 (textures,
    golden-image comparisons)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def checksum(img: np.ndarray) -> str:
    """Stable content hash of a float image (golden-image fingerprints)."""
    import hashlib

    a = np.ascontiguousarray(np.asarray(img, dtype=np.float32))
    return hashlib.sha1(a.tobytes()).hexdigest()[:16]
