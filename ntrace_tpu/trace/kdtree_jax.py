"""kd-tree traversal engine (interval-stack while-while).

Behavioral contract (~ the reference's fermi_kdtree_while_while kernels,
SURVEY.md SS3.3 [MED]): per-ray segment [seg_min, seg_max] clipped at each
split plane; descend the near side, push (far child, t_split, seg_max);
leaves run the same packed Woop rows as the BVH engines; a ray terminates
EARLY once it holds a hit inside the current cell (hit_t <= seg_max) --
kd cells are visited strictly front-to-back, the structural advantage the
reference built kd-trees for.

State extends the BVH stack with two f32 interval stacks. Same SENTINEL
protocol; lockstep + one-dispatch persistent driver like the others.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ntrace_tpu.ops.aabb import safe_inv_dir, slab_test
from ntrace_tpu.ops.woop import LEAF_END_BITS, woop_intersect
from ntrace_tpu.trace.common import SENTINEL, STACK_DEPTH


@dataclass
class KDState:
    cur: Any
    sp: Any
    stack: Any       # (R, D) int32 node
    stack_t0: Any    # (R, D) f32 segment min
    stack_t1: Any    # (R, D) f32 segment max
    seg_min: Any
    seg_max: Any
    hit_t: Any
    hit_tri: Any
    hit_u: Any
    hit_v: Any


jax.tree_util.register_pytree_node(
    KDState,
    lambda s: ((s.cur, s.sp, s.stack, s.stack_t0, s.stack_t1, s.seg_min,
                s.seg_max, s.hit_t, s.hit_tri, s.hit_u, s.hit_v), None),
    lambda _, c: KDState(*c),
)


def _bc_i32(x):
    return jax.lax.bitcast_convert_type(x, "int32")


def _step_kd(utable, n_nodes, orig, dirn, inv_dir, tmin, state, any_hit):
    ns = jnp
    cur, sp = state.cur, state.sp
    r = cur.shape[0]
    rows = ns.arange(r)

    alive = cur != SENTINEL
    is_inner = alive & (cur >= 0)
    is_leaf = alive & (cur < 0)

    fetch_row = ns.where(is_inner, cur, 0)
    fetch_row = ns.where(is_leaf, n_nodes + (~cur), fetch_row)
    rec = utable[fetch_row]

    # ---- inner: split-plane clip ----
    split = rec[:, 0]
    axis = _bc_i32(rec[:, 1])
    c0 = _bc_i32(rec[:, 12])
    c1 = _bc_i32(rec[:, 13])
    o_ax = ns.where(axis == 0, orig[:, 0],
                    ns.where(axis == 1, orig[:, 1], orig[:, 2]))
    i_ax = ns.where(axis == 0, inv_dir[:, 0],
                    ns.where(axis == 1, inv_dir[:, 1], inv_dir[:, 2]))
    t_split = (split - o_ax) * i_ax
    below = (o_ax < split) | ((o_ax == split) & (i_ax < 0))
    near = ns.where(below, c0, c1)
    far = ns.where(below, c1, c0)
    seg_min, seg_max = state.seg_min, state.seg_max
    # Three cases (PBRT kd logic): a crossing behind the origin
    # (t_split <= 0) keeps the ray on ITS side of the plane -> near only.
    near_only = (t_split >= seg_max) | (t_split <= 0)
    far_only = (~near_only) & (t_split < seg_min)
    both = (~near_only) & (~far_only)

    # ---- leaf: one Woop row ----
    sent = _bc_i32(rec[:, 0]) == LEAF_END_BITS
    w12 = rec[:, :12]
    tri_here = c0
    valid, t, u, v = woop_intersect(ns, w12, orig, dirn, tmin, state.hit_t)
    accept = is_leaf & (~sent) & valid
    hit_t = ns.where(accept, t, state.hit_t)
    hit_tri = ns.where(accept, tri_here, state.hit_tri)
    hit_u = ns.where(accept, u, state.hit_u)
    hit_v = ns.where(accept, v, state.hit_v)

    # kd early exit: a hit inside the current cell is globally closest.
    leaf_done = is_leaf & sent & (hit_tri >= 0) & (hit_t <= seg_max)
    if any_hit:
        leaf_done = leaf_done | accept

    # ---- control ----
    do_pop = (is_leaf & sent & (~leaf_done))
    can_pop = sp > 0
    psl = ns.maximum(sp - 1, 0)
    popped = ns.where(can_pop, state.stack[rows, psl],
                      SENTINEL + ns.zeros_like(cur))
    pop_t0 = state.stack_t0[rows, psl]
    pop_t1 = state.stack_t1[rows, psl]

    cur_inner = ns.where(near_only, near, ns.where(far_only, far, near))
    new_cur = ns.where(is_inner, cur_inner, cur)
    new_cur = ns.where(is_leaf, ns.where(leaf_done,
                                         SENTINEL + ns.zeros_like(cur),
                                         ns.where(sent, popped, cur - 1)),
                       new_cur)

    new_seg_min = ns.where(is_inner & both, seg_min, seg_min)
    new_seg_max = ns.where(is_inner & both, t_split, seg_max)
    new_seg_min = ns.where(do_pop & can_pop, pop_t0, new_seg_min)
    new_seg_max = ns.where(do_pop & can_pop, pop_t1, new_seg_max)

    push = is_inner & both
    slot = ns.where(push, ns.minimum(sp, STACK_DEPTH - 1), STACK_DEPTH)
    new_stack = state.stack.at[rows, slot].set(far, mode="drop")
    new_t0 = state.stack_t0.at[rows, slot].set(t_split, mode="drop")
    new_t1 = state.stack_t1.at[rows, slot].set(seg_max, mode="drop")
    new_sp = sp + push.astype(sp.dtype) - (do_pop & can_pop).astype(sp.dtype)

    return KDState(cur=new_cur, sp=new_sp, stack=new_stack,
                   stack_t0=new_t0, stack_t1=new_t1,
                   seg_min=new_seg_min, seg_max=new_seg_max,
                   hit_t=hit_t, hit_tri=hit_tri, hit_u=hit_u, hit_v=hit_v)


@partial(jax.jit, static_argnames=("n_nodes", "any_hit", "unroll", "chunk"))
def trace_kd(utable, n_nodes, root_lo, root_hi, orig, dirn, tmin, tmax,
             any_hit=False, unroll=8, chunk=1 << 13):
    """One-dispatch persistent kd tracer (pad rays to a chunk multiple)."""
    r = orig.shape[0]
    assert r % chunk == 0
    c = r // chunk
    orig = orig.astype(jnp.float32).reshape(c, chunk, 3)
    dirn = dirn.astype(jnp.float32).reshape(c, chunk, 3)
    tmin = jnp.broadcast_to(tmin.astype(jnp.float32), (r,)).reshape(c, chunk)
    tmax = jnp.broadcast_to(tmax.astype(jnp.float32), (r,)).reshape(c, chunk)

    def one_chunk(args):
        o, d, tn, tx = args
        inv = safe_inv_dir(jnp, d)
        # Clip the ray to the scene bounds (root cell).
        hit_root, t_entry = slab_test(jnp, root_lo, root_hi, o, inv, tn, tx)
        n = o.shape[0]
        state = KDState(
            cur=jnp.where(hit_root, 0, SENTINEL).astype(jnp.int32),
            sp=jnp.zeros((n,), jnp.int32),
            stack=jnp.full((n, STACK_DEPTH), SENTINEL, jnp.int32),
            stack_t0=jnp.zeros((n, STACK_DEPTH), jnp.float32),
            stack_t1=jnp.zeros((n, STACK_DEPTH), jnp.float32),
            seg_min=jnp.maximum(t_entry, tn),
            seg_max=tx,
            hit_t=tx + jnp.zeros((n,), jnp.float32),
            hit_tri=jnp.full((n,), -1, jnp.int32),
            hit_u=jnp.zeros((n,), jnp.float32),
            hit_v=jnp.zeros((n,), jnp.float32),
        )

        def cond(s):
            return jnp.any(s.cur != SENTINEL)

        def body(s):
            for _ in range(unroll):
                s = _step_kd(utable, n_nodes, o, d, inv, tn, s, any_hit)
            return s

        s = jax.lax.while_loop(cond, body, state)
        miss = s.hit_tri < 0
        return (s.hit_tri, jnp.where(miss, jnp.float32(jnp.inf), s.hit_t),
                s.hit_u, s.hit_v)

    tri, t, u, v = jax.lax.map(one_chunk, (orig, dirn, tmin, tmax))
    return tri.reshape(r), t.reshape(r), u.reshape(r), v.reshape(r)
