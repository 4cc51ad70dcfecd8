"""Multi-chip ray-parallelism over a jax.sharding.Mesh.

The reference is single-GPU (SURVEY.md SS3.4); its only parallelism is
intra-chip. The TPU-native scaling axis added here is DATA PARALLELISM OVER
RAYS: the BVH (nodes/woop/tri_index) is replicated on every chip, ray
batches are sharded along a `rays` mesh axis, each chip traces its shard
with the local engine, and per-frame reductions (hit counts, framebuffer
gathers) ride ICI collectives. This composes with any engine because
tracing is embarrassingly parallel across rays.

Design notes (How-to-Scale recipe): pick a mesh -> annotate shardings ->
let XLA insert collectives. Rays are the batch dimension; the accel is the
"weights". A replicated 480MB San Miguel accel fits every v5e's 16GB HBM,
so no tensor-parallel accel sharding tier is needed at reference scale; the
mesh keeps a single axis until scene sizes demand accel sharding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ntrace_tpu.trace.stack_jax import trace_stack


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def trace_sharded(mesh: Mesh, nodes, woop, tri_index, orig, dirn, tmin, tmax,
                  any_hit: bool = False):
    """Trace with rays sharded over the mesh, accel replicated.

    Ray count must be divisible by mesh size (pad at the caller; the
    renderer's batching already rounds ray counts).
    """
    fn = jax.shard_map(
        partial(trace_stack, any_hit=any_hit),
        mesh=mesh,
        in_specs=(P(), P(), P(), P("rays"), P("rays"), P("rays"), P("rays")),
        out_specs=(P("rays"), P("rays"), P("rays"), P("rays")),
        check_vma=False,
    )
    return jax.jit(fn)(nodes, woop, tri_index, orig, dirn, tmin, tmax)


def render_step_sharded(mesh: Mesh, nodes, woop, tri_index, geom_normals,
                        orig, dirn, tmin, tmax, light_pos):
    """One full sharded frame step: primary trace -> shadow any-hit ->
    shading -> global stats psum. This is the multi-chip "step" the driver
    dry-runs; it exercises replicated-accel + ray-sharded compute and an
    ICI collective (psum of hit counts).
    Returns (color (R,3) sharded by rays, global_hits scalar replicated).
    """

    def step(nodes, woop, tri_index, gn, o, d, tn, tx, lp):
        tri, t, u, v = trace_stack(nodes, woop, tri_index, o, d, tn, tx)
        hit = tri >= 0
        gtri = jnp.maximum(tri, 0)
        n = gn[gtri]
        n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-30)
        n = jnp.where((jnp.sum(n * d, axis=-1, keepdims=True) > 0), -n, n)
        t_safe = jnp.where(hit, t, 0.0)
        hp = o + t_safe[:, None] * d + n * 1e-3
        to_l = lp[None, :] - hp
        dist = jnp.linalg.norm(to_l, axis=-1)
        sd = to_l / (dist[:, None] + 1e-30)
        stri, *_ = trace_stack(
            nodes, woop, tri_index, hp, sd,
            jnp.zeros_like(dist), jnp.where(hit, dist * 0.9999, 0.0),
            any_hit=True,
        )
        lit = (stri < 0).astype(jnp.float32)
        color = jnp.abs(n) * (0.25 + 0.75 * lit)[:, None]
        color = jnp.where(hit[:, None], color, 0.0)
        global_hits = jax.lax.psum(hit.sum(), "rays")
        return color, global_hits

    fn = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(),
                  P("rays"), P("rays"), P("rays"), P("rays"), P()),
        out_specs=(P("rays"), P()),
        check_vma=False,
    )
    return jax.jit(fn)(nodes, woop, tri_index, geom_normals,
                       orig, dirn, tmin, tmax, light_pos)
