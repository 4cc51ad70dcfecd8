"""Ray generators: primary, shadow, AO, diffuse (~ rt/ray/RayGen.*).

Reference parity (SURVEY.md SS3.2): RayGen::{primary, shadow, ao,
randomReflection}. primary shoots one ray per pixel in Morton pixel order;
shadow shoots any-hit rays toward a point light; ao shoots `samples`
hemisphere rays per hit with tmax=aoRadius (any-hit); randomReflection
(diffuse) shoots cosine-weighted bounce rays. The reference's LCG RNG is
replaced by jax.random (threefry) with fixed seeds -- seed-stable for golden
tests (SURVEY.md SS3.1 RNG row).

Everything here is jit-compatible: cameras are passed as packed arrays, RNG
as explicit keys, shapes are static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.core import Camera
from ntrace_tpu.ray.raybatch import RayBatch


def camera_arrays(camera: Camera, width: int, height: int) -> dict:
    """Pack a host Camera into arrays consumed by `primary` (no recompiles
    when only the pose changes)."""
    right, up, fwd = camera.basis()
    tan_half = np.tan(np.radians(camera.fov_deg) / 2.0)
    aspect = width / height
    return dict(
        pos=jnp.asarray(camera.position),
        right=jnp.asarray(right),
        up=jnp.asarray(up),
        fwd=jnp.asarray(fwd),
        tan_x=jnp.float32(tan_half * aspect),
        tan_y=jnp.float32(tan_half),
        znear=jnp.float32(camera.znear),
        zfar=jnp.float32(camera.zfar),
    )


def primary(cam: dict, width: int, height: int, pixel_order) -> RayBatch:
    """One ray per pixel, ordered by the Morton pixel table.

    pixel_order: (W*H,) int32 slot->pixel map from ray/pixeltable.py.
    Directions are normalized (the reference normalizes in RayGenKernels).
    """
    p = jnp.asarray(pixel_order)
    x = (p % width).astype(jnp.float32)
    y = (p // width).astype(jnp.float32)
    ndc_x = (x + 0.5) / width * 2.0 - 1.0
    ndc_y = 1.0 - (y + 0.5) / height * 2.0
    d = (
        ndc_x[:, None] * (cam["tan_x"] * cam["right"])[None, :]
        + ndc_y[:, None] * (cam["tan_y"] * cam["up"])[None, :]
        + cam["fwd"][None, :]
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    n = p.shape[0]
    return RayBatch(
        orig=jnp.broadcast_to(cam["pos"], (n, 3)).astype(jnp.float32),
        dirn=d.astype(jnp.float32),
        tmin=jnp.full((n,), cam["znear"], jnp.float32),
        tmax=jnp.full((n,), cam["zfar"], jnp.float32),
        slot_to_id=p.astype(jnp.int32),
    )


def _onb(n):
    """Branchless orthonormal basis around unit normal n (Duff et al. 2017)."""
    sign = jnp.where(n[..., 2] >= 0, jnp.float32(1.0), jnp.float32(-1.0))
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    b1 = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
        axis=-1,
    )
    b2 = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return b1, b2


def cosine_hemisphere(key, n, shape):
    """Cosine-weighted directions about unit normals n (broadcast to shape+(3,))."""
    u = jax.random.uniform(key, shape + (2,), dtype=jnp.float32)
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    lx = r * jnp.cos(phi)
    ly = r * jnp.sin(phi)
    lz = jnp.sqrt(jnp.maximum(0.0, 1.0 - u[..., 0]))
    b1, b2 = _onb(n)
    return (
        lx[..., None] * b1 + ly[..., None] * b2 + lz[..., None] * n
    ).astype(jnp.float32)


def surface_frame(hit_tri, dirn, geom_normals, eps_scale):
    """Shared secondary-ray setup: unit normal flipped against the incoming
    ray, and the self-intersection offset magnitude."""
    tri = jnp.maximum(hit_tri, 0)
    gn = geom_normals[tri]
    gn = gn / (jnp.linalg.norm(gn, axis=-1, keepdims=True) + 1e-30)
    flip = jnp.sum(gn * dirn, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -gn, gn)
    return n, jnp.float32(eps_scale)


def shadow(hit_pos, normal, light_pos, eps) -> RayBatch:
    """Any-hit rays from surface points toward a point light."""
    o = hit_pos + normal * eps
    to_l = jnp.asarray(light_pos, jnp.float32)[None, :] - o
    dist = jnp.linalg.norm(to_l, axis=-1)
    d = to_l / (dist[:, None] + 1e-30)
    r = o.shape[0]
    return RayBatch(
        orig=o.astype(jnp.float32),
        dirn=d.astype(jnp.float32),
        tmin=jnp.zeros((r,), jnp.float32),
        tmax=(dist * (1.0 - 1e-4)).astype(jnp.float32),
        slot_to_id=jnp.arange(r, dtype=jnp.int32),
    )


def ao(key, hit_pos, normal, samples: int, radius, eps) -> RayBatch:
    """samples hemisphere rays per surface point, tmax = aoRadius (any-hit).

    Layout: ray (i*samples + s) belongs to surface point i.
    """
    r = hit_pos.shape[0]
    d = cosine_hemisphere(key, normal[:, None, :], (r, samples)).reshape(-1, 3)
    o = jnp.repeat(hit_pos + normal * eps, samples, axis=0)
    n = r * samples
    return RayBatch(
        orig=o.astype(jnp.float32),
        dirn=d,
        tmin=jnp.zeros((n,), jnp.float32),
        tmax=jnp.full((n,), jnp.float32(radius)),
        slot_to_id=jnp.arange(n, dtype=jnp.int32),
    )


def diffuse(key, hit_pos, normal, samples: int, tfar, eps) -> RayBatch:
    """Cosine-weighted bounce rays (closest hit) -- the incoherent workload
    (~ RayGen::randomReflection)."""
    batch = ao(key, hit_pos, normal, samples, tfar, eps)
    return batch
