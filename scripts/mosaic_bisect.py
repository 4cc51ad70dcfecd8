"""Bisect which vector-layout construct crashes the TPU compile helper.

Round-3 device sweep: every kernel using jnp.broadcast_to((1,128)->(rows,128))
on a dynamically loaded row (leafbc/slabbc/packet_bfs/packet_bdl) failed with
  MosaicError: INTERNAL: ... tpu_compile_helper subprocess exit code 1
while packet_dleaf (same SMEM queues, no broadcast_to) compiled. The helper
swallows the real error, so this ladder compiles one minimal kernel per
construct and records pass/fail + a timing; whatever passes becomes the
replacement formulation in the kernels.

Usage: python scripts/mosaic_bisect.py   (needs the device; ~4 s/config)
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


def _kernel(mode: str, iters: int):
    def kernel(tab_ref, rays_ref, out_ref):
        rays = rays_ref[...]  # (ROWS, 128) f32

        def body(i, carry):
            node, acc = carry
            row = tab_ref[pl.ds(node, 1), :]  # (1, 128) dynamic load

            if mode == "control":
                # scalar extracts (the known-good but serial form)
                s = row[0, 3]
                val = rays * s + row[0, 7]
            elif mode == "bcast_row":
                # the suspect: sublane replication of a dynamic row
                tb = jnp.broadcast_to(row, (ROWS, 128))
                val = rays * tb[:, 3:4] + tb[:, 7:8]
            elif mode == "bcast_static":
                # same broadcast_to on a loop-invariant row
                tb = jnp.broadcast_to(tab_ref[0:1, :], (ROWS, 128))
                val = rays * tb[:, 3:4] + tb[:, 7:8] + row[0, 0]
            elif mode == "slice11":
                # (1,1) lane slices; binop broadcasts (1,1)->(ROWS,128)
                val = rays * row[:, 3:4] + row[:, 7:8]
            elif mode == "mul_ones":
                # force the replication through an arithmetic broadcast
                tb = row * jnp.ones((ROWS, 1), jnp.float32)
                val = rays * tb[:, 3:4] + tb[:, 7:8]
            elif mode == "concat_rep":
                tb = jnp.concatenate([row] * ROWS, axis=0)
                val = rays * tb[:, 3:4] + tb[:, 7:8]
            elif mode == "pltpu_repeat":
                tb = pltpu.repeat(row, ROWS, axis=0)
                val = rays * tb[:, 3:4] + tb[:, 7:8]
            elif mode == "bdim":
                tb = jax.lax.broadcast_in_dim(row, (ROWS, 128), (0, 1))
                val = rays * tb[:, 3:4] + tb[:, 7:8]
            elif mode == "roll0":
                m = (rays > 0.5).astype(jnp.int32)
                sh = 1
                while sh < ROWS:
                    m = m | pltpu.roll(m, sh, axis=0)
                    sh *= 2
                val = rays + m[0, 0].astype(jnp.float32) + row[0, 0]
            elif mode == "row_1x128_binop":
                # (1,128) row against (ROWS,128) rays directly (sublane
                # broadcast inside the binop, no materialization)
                val = rays * row + row
            else:
                raise ValueError(mode)

            r = jnp.sum(val).astype(jnp.int32)
            node = (node * 1103515245 + 12345 + (r & 1)) & 255
            return node, acc + r

        node, acc = jax.lax.fori_loop(0, iters, body,
                                      (jnp.int32(0), jnp.int32(0)))
        out_ref[0, 0] = acc + node

    return kernel


def main():
    tab = jnp.asarray(np.random.default_rng(0).random((256, 128), np.float32))
    rays = jnp.asarray(np.random.default_rng(1).random((ROWS, 128),
                                                       np.float32))
    modes = ("control", "bcast_row", "bcast_static", "slice11", "mul_ones",
             "concat_rep", "pltpu_repeat", "bdim", "roll0",
             "row_1x128_binop")
    for mode in modes:
        try:
            times = {}
            for iters in (256, 4096):
                f = pl.pallas_call(
                    _kernel(mode, iters),
                    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                )
                g = jax.jit(lambda t, r, f=f: f(t, r))
                jax.block_until_ready(g(tab, rays))
                best = np.inf
                for _ in range(5):
                    t0 = time.time()
                    jax.block_until_ready(g(tab, rays))
                    best = min(best, time.time() - t0)
                times[iters] = best
            ns = (times[4096] - times[256]) / (4096 - 256) * 1e9
            RESULTS[mode] = round(ns, 1)
            print(f"[bisect] {mode}: OK {ns:.1f} ns/iter", flush=True)
        except Exception as e:  # noqa: BLE001 — recording compile crashes
            RESULTS[mode] = f"FAIL: {type(e).__name__}"
            print(f"[bisect] {mode}: FAIL {type(e).__name__}: {e}"[:200],
                  flush=True)
        with open("results_mosaic_bisect.json", "w") as fh:
            json.dump(RESULTS, fh, indent=1)


if __name__ == "__main__":
    main()
