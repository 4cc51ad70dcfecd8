"""8-wide traversal engine over the 64-column wide table (bvh/wide.py).

Per step, per ray: ONE 256-byte row fetch, then either
  - inner: 8 slab tests, sort hit children by entry distance (Batcher
    8-network, misses pushed to +inf), descend nearest, push the rest
    far-to-near (so the nearest pops first), or
  - leaf: 4 simultaneous Woop tests, accept the closest valid (first-slot
    tie-break = first-visited, matching the sequential semantics for
    closest-hit since all 4 compare against the same incoming hitT).
Any-hit terminates on the first accepted row. Stack pushes are up to 7
masked scatters. Same SENTINEL/termination protocol as the binary engines.

Constraint inherited from the layout: ray tmax must be < 1e38 (empty child
slots live at 3e38).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ntrace_tpu.ops.aabb import safe_inv_dir
from ntrace_tpu.ops.woop import LEAF_END_BITS, woop_intersect
from ntrace_tpu.trace import common
from ntrace_tpu.trace import stack_jax  # noqa: F401  (TraceState pytree reg.)
from ntrace_tpu.trace.common import SENTINEL, STACK_DEPTH, TraceState, init_state


def _bc_i32(x):
    return jax.lax.bitcast_convert_type(x, "int32")


def _step_wide(utable, n_nodes, orig, dirn, inv_dir, tmin, state, any_hit):
    ns = jnp
    cur, sp, stack = state.cur, state.sp, state.stack
    r = cur.shape[0]
    rows = ns.arange(r)

    alive = cur != SENTINEL
    is_inner = alive & (cur >= 0)
    is_leaf = alive & (cur < 0)

    fetch_row = ns.where(is_inner, cur, 0)
    fetch_row = ns.where(is_leaf, n_nodes + (~cur), fetch_row)
    rec = utable[fetch_row]  # (R, 64)

    ox, oy, oz = orig[:, 0], orig[:, 1], orig[:, 2]
    ix, iy, iz = inv_dir[:, 0], inv_dir[:, 1], inv_dir[:, 2]

    # ---- inner: 8 slab tests ----
    ts = []
    hits = []
    for k in range(8):
        b = rec[:, 6 * k:6 * k + 6]
        t0x = (b[:, 0] - ox) * ix
        t1x = (b[:, 1] - ox) * ix
        t0y = (b[:, 2] - oy) * iy
        t1y = (b[:, 3] - oy) * iy
        t0z = (b[:, 4] - oz) * iz
        t1z = (b[:, 5] - oz) * iz
        tb = ns.fmax(ns.fmax(ns.fmin(t0x, t1x), ns.fmin(t0y, t1y)),
                     ns.fmax(ns.fmin(t0z, t1z), tmin))
        te = ns.fmin(ns.fmin(ns.fmax(t0x, t1x), ns.fmax(t0y, t1y)),
                     ns.fmin(ns.fmax(t0z, t1z), state.hit_t))
        h = tb <= te
        hits.append(h)
        ts.append(ns.where(h, tb, ns.float32(jnp.inf)))
    encs = [_bc_i32(rec[:, 48 + k]) for k in range(8)]

    # Batcher odd-even merge sort network for 8 keys (ascending t).
    net = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
           (1, 2), (5, 6), (0, 4), (1, 5), (2, 6), (3, 7),
           (2, 4), (3, 5), (1, 2), (3, 4), (5, 6)]
    for a, b in net:
        swap = ts[a] > ts[b]
        ta = ns.where(swap, ts[b], ts[a])
        tb2 = ns.where(swap, ts[a], ts[b])
        ea = ns.where(swap, encs[b], encs[a])
        eb = ns.where(swap, encs[a], encs[b])
        ts[a], ts[b], encs[a], encs[b] = ta, tb2, ea, eb

    nh = sum(h.astype(ns.int32) for h in hits)
    none_hit = nh == 0

    # ---- leaf: 4 packed Woop tests ----
    sent = _bc_i32(rec[:, 0]) == LEAF_END_BITS
    best_t = state.hit_t
    best_tri = state.hit_tri
    best_u = state.hit_u
    best_v = state.hit_v
    any_accept = ns.zeros_like(is_leaf)
    for k in range(4):
        w12 = rec[:, 12 * k:12 * k + 12]
        tri_k = _bc_i32(rec[:, 48 + k])
        valid, t, u, v = woop_intersect(ns, w12, orig, dirn, tmin, state.hit_t)
        acc = is_leaf & (~sent) & valid & (t < best_t)
        best_t = ns.where(acc, t, best_t)
        best_tri = ns.where(acc, tri_k, best_tri)
        best_u = ns.where(acc, u, best_u)
        best_v = ns.where(acc, v, best_v)
        any_accept = any_accept | acc

    # ---- control ----
    do_pop = (is_inner & none_hit) | (is_leaf & sent)
    can_pop = sp > 0
    popped = ns.where(can_pop, stack[rows, ns.maximum(sp - 1, 0)],
                      SENTINEL + ns.zeros_like(cur))
    cur_inner = ns.where(none_hit, popped, encs[0])
    cur_leaf = ns.where(sent, popped, cur - 1)
    if any_hit:
        cur_leaf = ns.where(any_accept, SENTINEL + ns.zeros_like(cur), cur_leaf)
    new_cur = ns.where(is_inner, cur_inner, ns.where(is_leaf, cur_leaf, cur))

    # Pushes: children ranks nh-1 .. 1, farthest first at sp, sp+1, ...
    # Drop-mode scatters: masked-out lanes get an out-of-range column so
    # no read-modify-write gather of the previous stack value is needed
    # (a hidden ~7ns row-gather per push otherwise dominates the step).
    new_stack = stack
    for j in range(7):
        kk = nh - 1 - j  # rank to push at slot sp+j
        valid_push = is_inner & (kk >= 1)
        src = encs[1]
        for m in range(2, 8):
            src = ns.where(kk == m, encs[m], src)
        slot = ns.where(valid_push, ns.minimum(sp + j, STACK_DEPTH - 1),
                        STACK_DEPTH)
        new_stack = new_stack.at[rows, slot].set(src, mode="drop")
    n_push = ns.where(is_inner, ns.maximum(nh - 1, 0), 0)
    new_sp = sp + n_push - (do_pop & can_pop).astype(sp.dtype)

    return TraceState(cur=new_cur, sp=new_sp, stack=new_stack,
                      hit_t=best_t, hit_tri=best_tri,
                      hit_u=best_u, hit_v=best_v)


@partial(jax.jit, static_argnames=("n_nodes", "any_hit", "unroll", "chunk"))
def trace_wide(utable, n_nodes, orig, dirn, tmin, tmax,
               any_hit=False, unroll=4, chunk=1 << 14):
    """One-dispatch persistent 8-wide tracer (pad rays to a chunk multiple)."""
    r = orig.shape[0]
    assert r % chunk == 0, "pad rays to a chunk multiple"
    c = r // chunk
    orig = orig.astype(jnp.float32).reshape(c, chunk, 3)
    dirn = dirn.astype(jnp.float32).reshape(c, chunk, 3)
    tmin = jnp.broadcast_to(tmin.astype(jnp.float32), (r,)).reshape(c, chunk)
    # Clamp below the 3e38 empty-slot sentinel: a tmax >= 3e38 (e.g. inf)
    # would make empty child slots test as hits and send rays to row 0
    # forever (enc 0), hanging the while_loop.
    tmax = jnp.minimum(tmax.astype(jnp.float32), jnp.float32(1e38))
    tmax = jnp.broadcast_to(tmax, (r,)).reshape(c, chunk)

    def one_chunk(args):
        o, d, tn, tx = args
        inv = safe_inv_dir(jnp, d)
        state = init_state(jnp, o, tx)

        def cond(s):
            return common.any_alive(jnp, s)

        def body(s):
            for _ in range(unroll):
                s = _step_wide(utable, n_nodes, o, d, inv, tn, s, any_hit)
            return s

        s = jax.lax.while_loop(cond, body, state)
        miss = s.hit_tri < 0
        return (s.hit_tri, jnp.where(miss, jnp.float32(jnp.inf), s.hit_t),
                s.hit_u, s.hit_v)

    tri, t, u, v = jax.lax.map(one_chunk, (orig, dirn, tmin, tmax))
    return tri.reshape(r), t.reshape(r), u.reshape(r), v.reshape(r)
