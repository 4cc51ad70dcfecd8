"""Round-5: full-frame 786,432-ray device golden for the armed v5 prep.

Reuses the EXACT chain shape of scripts/r5_arm_bench2.py's fullframe
t16_v5_walk config (k=1), so the XLA compile-cache hit avoids a fresh
multi-minute remote compile (the tunnel wedges around big compiles --
r4_golden_full_gate's renderer-path jit is a different program and
stalled 29 min). Compares every primary ray of the 1024x768 frame
against the CPU golden tracer, tie-aware (trace/cpu.py
golden_mismatches) plus raw id diffs. Appends to results_r5_arm.json
(stage golden_full_tieaware, cfg t16_v5_walk -- the authoritative stage
pick_tuned gates on).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace import binraster_dense as bd

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "results_r5_arm.json")
W, H, TILE = 1024, 768, 16
Z_BITS = 12


def emit(rec):
    rec = {k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in rec.items()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    print(f"[v5g] devices={jax.devices()}", file=sys.stderr)
    scene = get_scene("conference", n_tris=280_000)
    verts = jax.device_put(jnp.asarray(scene.tri_verts()))
    ca = raygen.camera_arrays(default_camera(scene.name), W, H)
    txn, tyn = W // TILE, H // TILE
    nb = txn * tyn
    mcodes = jnp.asarray(bd.bin_mcodes(txn, tyn, 31 - Z_BITS))
    _, hist, n_g = (x for x in bd.count_hist_dense(
        verts, ca, width=W, height=H, tile=TILE, k_cap=64))
    n_ks = bd.pick_nks(np.asarray(hist))
    p_v5 = bd.pick_cap(sum(n_ks), 16 * bd.TPT)
    g2 = bd.pick_cap(int(n_g), bd.TPT, pad=bd.TPT) if int(n_g) else 0

    order_px, _ = pixel_table(W, H)
    batch = raygen.primary(ca, W, H, jnp.asarray(order_px))
    R = batch.num_rays
    ray_rows = TILE * TILE // 128
    dirs = jnp.transpose(batch.dirn).reshape(3 * nb * ray_rows, 128)
    scalars = jnp.concatenate([
        ca["pos"].astype(jnp.float32),
        jnp.stack([ca["znear"], jnp.float32(1e8), jnp.float32(0),
                   jnp.float32(0), jnp.float32(0)])])

    # Identical program shape to arm_bench2's ffchain(mode="v5", k=1).
    @jax.jit
    def run(tn):
        acc = jnp.float32(0)
        tn2 = tn
        for _ in range(1):
            rows, r0, r1, g1, ok = bd.binraster_prep_dense5(
                verts + 1e-30 * tn2, ca, mcodes, n_ks=n_ks, p_max=p_v5,
                width=W, height=H, tile=TILE, k_cap=64, g2_max=g2,
                z_bits=Z_BITS)
            sc = scalars.at[3].set(tn2)
            tri, t, u, v = bd.trace_dense_rows(
                rows, r0, r1, dirs, sc, g1, n_bins=nb,
                ray_rows=ray_rows, ez_chunk=0, tpv=1)
            tri = jnp.where(ok, tri, -2)
            acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
            tn2 = tn + 1e-12 * acc
        return acc, tri, t

    t0 = time.time()
    acc, tri, t = jax.block_until_ready(run(
        jnp.float32(float(ca["znear"]))))
    dev_s = time.time() - t0
    tri_d, t_d = np.asarray(tri), np.asarray(t)
    print(f"[v5g] device frame done {dev_s:.1f}s "
          f"hit_rate={(tri_d >= 0).mean():.3f}", file=sys.stderr)

    from ntrace_tpu.core import BuildConfig
    from ntrace_tpu.render.renderer import build_accel
    from ntrace_tpu.trace.cpu import golden_mismatches, trace_cpu_golden

    flat = build_accel(scene, BuildConfig(
        builder="binned_sah", sah_tri_cost=0.02, max_leaf_size=48),
        use_cache=True)
    t0 = time.time()
    rec = trace_cpu_golden(flat, np.asarray(batch.orig),
                           np.asarray(batch.dirn),
                           np.asarray(batch.tmin), np.asarray(batch.tmax))
    cpu_s = time.time() - t0
    raw = int((tri_d != rec.tri).sum())
    mism = golden_mismatches(tri_d, t_d, rec.tri, rec.t)
    emit({"stage": "golden_full_tieaware", "cfg": "t16_v5_walk",
          "rays": R, "raw_id_diffs": raw, "mismatches": mism,
          "match": mism == 0, "device_s": dev_s, "cpu_golden_s": cpu_s,
          "hit_rate": float((tri_d >= 0).mean())})


if __name__ == "__main__":
    main()
