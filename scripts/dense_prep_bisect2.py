"""Top-down bisect: the REAL binraster_prep_dense vs truncated variants.

The stage-prefix bisect puts the full pipeline at ~27 ms marginal, yet
the dense probe measured 1.17 s -- something in the function tail (or in
how the probe chains it) costs a second. Times (a) the exact function,
(b) the probe's exact chain structure around it, (c) a variant with the
walked-global tier's verts gathers removed. Appends to
results_dense_prep_bisect.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ntrace_tpu.ray import raygen
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace import binraster_dense as bd

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_dense_prep_bisect.json")
W, H, TILE = 1024, 768, 16


def emit(rec):
    rec = {k: (round(v, 2) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    scene = get_scene("conference", n_tris=280_000)
    verts = jax.device_put(jnp.asarray(scene.tri_verts()))
    ca = raygen.camera_arrays(default_camera(scene.name), W, H)
    txn, tyn = W // TILE, H // TILE
    mcodes = jnp.asarray(bd.bin_mcodes(txn, tyn, 12))
    total, n_mid, n_g = (int(x) for x in bd.count_pairs_dense(
        verts, ca, width=W, height=H, tile=TILE, k_slots=8))
    p_max = bd.pick_quant(total, bd.TPT, 8 * bd.TPT)
    g_max = bd.pick_quant(n_mid + n_g, bd.TPT, 16 * bd.TPT)
    g2_max = bd.pick_quant(n_g, bd.TPT, 2 * bd.TPT)

    def prep(c):
        return bd.binraster_prep_dense(
            verts, c, mcodes, width=W, height=H, tile=TILE,
            k_slots=8, g_max=g_max, p_max=p_max, g2_max=g2_max,
            z_bits=19)

    # (a) fori-chained, all outputs consumed as scalars.
    def chain_fori(k):
        @jax.jit
        def run(pos):
            def body(i, acc):
                c = dict(ca, pos=pos + acc * 1e-30)
                rows, row0, row1, g_r1, ok = prep(c)
                return (acc + rows[0, 0] * 1e-9
                        + (row0[0] + row1[0] + g_r1[0]).astype(jnp.float32)
                        * 1e-9 + ok.astype(jnp.float32) * 1e-9)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return run

    # (b) the probe's python-unrolled chain, rows[0,0]-only consumption.
    def chain_unroll(k):
        @jax.jit
        def run(pos):
            acc = jnp.float32(0)
            c = dict(ca)
            for _ in range(k):
                c = dict(c, pos=pos + 1e-12 * acc)
                rows, *_ = prep(c)
                acc = acc + rows[0, 0]
            return acc
        return run

    for tag, chain in (("full_fori", chain_fori),
                       ("probe_unroll", chain_unroll)):
        try:
            walls = {}
            for k in (1, 3):
                r = chain(k)
                t0 = time.time()
                float(jax.block_until_ready(r(ca["pos"])))
                compile_s = time.time() - t0
                best = 1e30
                for _ in range(2):
                    t0 = time.time()
                    float(jax.block_until_ready(r(ca["pos"])))
                    best = min(best, time.time() - t0)
                walls[k] = best
            emit({"stage": tag, "marginal_ms": (walls[3] - walls[1])
                  / 2 * 1e3, "wall1_ms": walls[1] * 1e3,
                  "compile_s": compile_s})
        except Exception as e:
            emit({"stage": tag,
                  "failed": f"{type(e).__name__}: {str(e)[:200]}"})


if __name__ == "__main__":
    main()
