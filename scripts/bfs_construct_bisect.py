"""Bisect ladder #2: which bfs/bdl slab-section construct kills Mosaic.

bdl_compile_bisect localized the crash to the slab+verdict section
(noslab OK, novrd OK => the section is DCE'd in both knockouts; the
enqueue/drain/leafq sections are innocent). slabbc in packet_pallas
already compiles with rep_rows + lane-slice slabs + jnp.sum, so the
suspects are the constructs UNIQUE to the batch kernels:

  a) jnp.where(traced_scalar_cond, (rows,128) vec, False)  -- rank-0
     cond broadcast into a vector select (the known-lethal broadcast
     class, session-6 mosaic_bisect).
  b) bool->int32 astype + static vector shifts + OR-accumulate (the
     16-bit want-mask packing).
  c) sublane fold p[:w] | p[w:2w] on offset sublane slices.
  d) 4-field packed reduce ((p>>k)&1 etc. + jnp.sum).

Each mode compiles one minimal kernel; pass/fail localizes. Safe
replacement candidates are included (scalar int mask multiply, etc).

Usage: python scripts/bfs_construct_bisect.py   (device; compile-only)
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 16
RESULTS: dict[str, object] = {}
OUT = "results_bfs_construct_bisect.json"


def _kernel(mode: str):
    def kernel(tab_ref, rays_ref, out_ref):
        rays = rays_ref[...]                        # (ROWS, 128) f32
        vb = rays > 0.5                             # (ROWS, 128) bool

        def body(i, carry):
            node, acc = carry
            row = tab_ref[pl.ds(jnp.maximum(node, 0), 1), :]
            act = node >= 0                         # traced rank-0 bool
            h = vb & (rays < row[0, 0])             # live vector bool

            if mode == "control":
                p = h.astype(jnp.int32)
            elif mode == "sc_where":
                # suspect (a): scalar-cond vector select
                p = jnp.where(act, h, False).astype(jnp.int32)
            elif mode == "sc_binop":
                # rank-0 & (ROWS,128) binop broadcast
                p = (h & act).astype(jnp.int32)
            elif mode == "sc_intmul":
                # replacement candidate: lift to scalar int, multiply
                ai = jax.lax.select(act, jnp.int32(1), jnp.int32(0))
                p = h.astype(jnp.int32) * ai
            elif mode == "sc_intand":
                # replacement candidate: scalar int mask AND
                ai = jax.lax.select(act, jnp.int32(-1), jnp.int32(0))
                p = h.astype(jnp.int32) & ai
            elif mode == "shift_or":
                # suspect (b): packed want-mask accumulation (8 slots)
                p = jnp.zeros((ROWS, 128), jnp.int32)
                for j in range(8):
                    hj = vb & (rays < row[0, j])
                    p = p | (hj.astype(jnp.int32) << (2 * j))
            elif mode == "subfold":
                # suspect (c): sublane-offset fold
                p = h.astype(jnp.int32)
                w = ROWS
                while w > 1:
                    w //= 2
                    p = p[:w] | p[w:2 * w]
            elif mode == "packfields":
                # suspect (d): 4-field packed reduce
                p0 = h.astype(jnp.int32) * 0xFFFF
                q = (((p0 >> 0) & 1)
                     | (((p0 >> 1) & 1) << 8)
                     | (((p0 >> 2) & 1) << 16)
                     | (((p0 >> 3) & 1) << 24))
                p = q
            elif mode == "all_safe":
                # full composed section with the safe scalar-int form
                p = jnp.zeros((ROWS, 128), jnp.int32)
                for j in range(4):
                    hj = vb & (rays < row[0, j])
                    ai = jax.lax.select(act, jnp.int32(-1), jnp.int32(0))
                    p = p | ((hj.astype(jnp.int32) & ai) << (2 * j))
                w = ROWS
                while w > 1:
                    w //= 2
                    p = p[:w] | p[w:2 * w]
                q = (((p >> 0) & 1) | (((p >> 1) & 1) << 8)
                     | (((p >> 2) & 1) << 16) | (((p >> 3) & 1) << 24))
                p = q
            else:
                raise ValueError(mode)

            r = jnp.sum(p)
            node = (node * 1103515245 + 12345 + (r & 1)) & 255
            return node, acc + r

        node, acc = jax.lax.fori_loop(0, 64, body,
                                      (jnp.int32(0), jnp.int32(0)))
        out_ref[0, 0] = acc + node

    return kernel


def main():
    tab = jnp.asarray(np.random.default_rng(0).random((256, 128),
                                                      np.float32))
    rays = jnp.asarray(np.random.default_rng(1).random((ROWS, 128),
                                                       np.float32))
    modes = ("control", "sc_where", "sc_binop", "sc_intmul", "sc_intand",
             "shift_or", "subfold", "packfields", "all_safe")
    for mode in modes:
        t0 = time.time()
        try:
            f = pl.pallas_call(
                _kernel(mode),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            )
            jax.jit(lambda t, r, f=f: f(t, r)).lower(tab, rays).compile()
            RESULTS[mode] = f"OK {time.time() - t0:.1f}s"
        except Exception as e:  # noqa: BLE001 — recording compile crashes
            RESULTS[mode] = f"FAIL {type(e).__name__}: {e}"[:160]
        print(f"[cb2] {mode}: {RESULTS[mode][:110]}", flush=True)
        with open(OUT, "w") as fh:
            json.dump(RESULTS, fh, indent=1)
    print("[cb2] DONE", flush=True)


if __name__ == "__main__":
    main()
