"""Texture atlas: per-material images stacked into one device array.

Capability parity (~ framework/3d/Texture.* + TextureAtlas.*): the
reference packs textures into an atlas for GPU shading. The TPU-native
equivalent is a (n_materials, S, S, 3) float32 stack (every image resized
to one resolution -- uniform shapes are what the hardware wants), sampled
with wrap addressing and nearest-neighbor lookup in the shading pass.
Materials without a map_Kd get a 1x1 tile of their flat diffuse color, so
the sampler is branch-free.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def build_atlas(materials, size: int = 256) -> np.ndarray:
    """(n_materials, size, size, 3) float32 linear-ish albedo atlas."""
    tiles = np.zeros((len(materials), size, size, 3), np.float32)
    for i, m in enumerate(materials):
        tex = getattr(m, "texture", "")
        loaded = False
        if tex:
            try:
                from PIL import Image

                img = Image.open(tex).convert("RGB").resize((size, size))
                tiles[i] = np.asarray(img, np.float32) / 255.0
                loaded = True
            except Exception:
                loaded = False
        if not loaded:
            tiles[i] = np.asarray(m.diffuse, np.float32)[None, None, :]
    return tiles


def sample_atlas(atlas, mat_ids, uv):
    """Nearest-neighbor wrap sampling.

    atlas  : (M, S, S, 3) device array
    mat_ids: (R,) int32; uv: (R, 2) float32 (v up, OBJ convention)
    Returns (R, 3) float32.
    """
    s = atlas.shape[1]
    u = uv[:, 0] - jnp.floor(uv[:, 0])
    v = uv[:, 1] - jnp.floor(uv[:, 1])
    x = jnp.clip((u * s).astype(jnp.int32), 0, s - 1)
    y = jnp.clip(((1.0 - v) * s).astype(jnp.int32), 0, s - 1)
    return atlas[mat_ids, y, x]


def interpolate_uv(scene_uvs, hit_tri, hit_u, hit_v):
    """Barycentric UV at a hit: (1-u-v)*uv0 + u*uv1 + v*uv2.

    scene_uvs: (M, 3, 2) device array; returns (R, 2).
    """
    tri = jnp.maximum(hit_tri, 0)
    c = scene_uvs[tri]  # (R, 3, 2)
    w0 = (1.0 - hit_u - hit_v)[:, None]
    return w0 * c[:, 0] + hit_u[:, None] * c[:, 1] + hit_v[:, None] * c[:, 2]
