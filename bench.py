#!/usr/bin/env python
"""Headline benchmark: Conference primary-ray Mrays/s on the current device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 150 (the binding >=150 Mrays/s target from
BASELINE.json). Extra per-stage details go to stderr.

Measurement protocol (PERF_NOTES.md "round-2 metrology"): the axon tunnel
imposes a ~26-31 ms fixed RPC cost on every dispatch chain that real
TPU deployments do not pay, so the headline is the STEADY-STATE marginal
frame cost: time jit-chained runs of 1 and K traces of the full frame's
rays and divide the difference by K-1. Both raw wall numbers are printed
to stderr alongside.

Scene provenance: the real Conference OBJ is not available offline, so the
procedural conference stand-in (matching triangle count ~280k and interior
workload character) is used -- see ntrace_tpu/scenes/procedural.py.
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# Persistent XLA compile cache: the armed v5 prep's first compile is
# minutes; session probes already populated this cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cc")


def _watchdog(signum, frame):
    # The axon TPU tunnel can wedge indefinitely (PERF_NOTES.md); emit an
    # honest zero record rather than hanging the driver forever.
    print(json.dumps({
        "metric": "conference_primary_mrays",
        "value": 0.0,
        "unit": "Mrays/s",
        "vs_baseline": 0.0,
        "error": "watchdog: device did not respond within time budget",
    }))
    sys.stdout.flush()
    os._exit(2)


def main():
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(int(os.environ.get("NTRACE_BENCH_TIMEOUT", 2400)))
    import jax
    import jax.numpy as jnp

    from ntrace_tpu.core import BuildConfig, RenderConfig
    from ntrace_tpu.ray import pixel_table, raygen
    from ntrace_tpu.render.renderer import Renderer, build_accel
    from ntrace_tpu.scenes import default_camera, get_scene

    t0 = time.time()
    n_tris = int(os.environ.get("NTRACE_BENCH_TRIS", 280_000))
    width = int(os.environ.get("NTRACE_BENCH_W", 1024))
    height = int(os.environ.get("NTRACE_BENCH_H", 768))
    engine = os.environ.get("NTRACE_BENCH_ENGINE", "auto")
    builder = os.environ.get("NTRACE_BENCH_BUILDER", "binned_sah")
    K = int(os.environ.get("NTRACE_BENCH_CHAIN", 5))

    print(f"[bench] platform={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)
    scene = get_scene("conference", n_tris=n_tris)
    print(f"[bench] scene={scene.name} tris={scene.num_tris} "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)

    # Engine-tuned SAH cost profile (scripts/leaf_sweep*.py): the packet
    # kernel's leaf row tests 12 tris for one node-step's price, so fat
    # leaves (tri_cost=0.02, max_leaf=48) halve total traversal units vs
    # the reference Platform defaults (tri_cost=1, leaf~2).
    tri_cost = float(os.environ.get("NTRACE_BENCH_TRICOST", 0.02))
    # A device-measured winner may carry a build profile (pick_tuned.py
    # writes "max_leaf" when an _ml<N> sweep config won); env overrides.
    tuned_leaf = 48
    if os.environ.get("NTRACE_TUNED", "1") != "0":
        try:
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "tuned.json")) as f:
                tuned_leaf = int(json.load(f).get("max_leaf", 48))
        except Exception:
            pass
    max_leaf = int(os.environ.get("NTRACE_BENCH_LEAF", tuned_leaf))
    build_cfg = BuildConfig(builder=builder, sah_tri_cost=tri_cost,
                            max_leaf_size=max_leaf)
    flat = build_accel(scene, build_cfg, use_cache=True)
    print(f"[bench] accel nodes={flat.nodes.shape[0]} sah={flat.sah_cost:.1f} "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)

    cfg = RenderConfig(width=width, height=height, mode="primary",
                       engine=engine, packet_rows=16)
    r = Renderer(scene, build_cfg, cfg, flat=flat)
    print(f"[bench] engine={r.engine} ({time.time()-t0:.1f}s)",
          file=sys.stderr)
    cam = default_camera("conference")
    ca = raygen.camera_arrays(cam, width, height)
    order_px, _ = pixel_table(width, height)
    batch = raygen.primary(ca, width, height, jnp.asarray(order_px))
    R = batch.num_rays
    # Arm the bin-raster screen-space primary engine when the resolved
    # config selects it (explicit engine=binraster or tuned.json
    # primary_engine); its per-frame prep is tied into the chain via
    # tmin so the marginal includes it honestly.
    use_br = r.prepare_primary(ca, width, height)
    print(f"[bench] primary_engine="
          f"{r.primary_engine if use_br else r.engine}", file=sys.stderr)

    def chained(k):
        @jax.jit
        def run(o, d, tn, tx):
            acc = jnp.float32(0)
            tn2 = tn
            for _ in range(k):
                # The renderer's primary path (depth-prepass tmax seeding
                # with exact fixup on packet engines) -- the headline
                # measures what render() actually runs.
                # canonical=True: the batch IS raygen.primary(ca)'s output
                # and inside jit the contract reduce cannot run (it would
                # silently fall back to the BVH path).
                tri, t, u, v = r.trace_primary(o, d, tn2, tx, cam=ca,
                                               canonical=True)
                acc = acc + jnp.where(tri >= 0, t, 0.0).sum()
                tn2 = tn + 1e-12 * acc   # serialize the frames
            return acc, tri

        return run

    def measure():
        walls = {}
        tri1 = None
        for k in (1, K):
            run = chained(k)
            acc, tri = run(*args)
            jax.block_until_ready(acc)
            if tri1 is None:
                tri1 = tri  # K=1 chain: traced with tn2 == tmin exactly
            best = 1e30
            for _ in range(3):
                t1 = time.time()
                jax.block_until_ready(run(*args)[0])
                best = min(best, time.time() - t1)
            walls[k] = best
            print(f"[bench] chain K={k}: {best*1e3:.1f} ms wall "
                  f"({R*k/1e6/best:.2f} Mrays/s incl. dispatch overhead)",
                  file=sys.stderr)
        return (walls[K] - walls[1]) / (K - 1), tri1

    args = (batch.orig, batch.dirn, batch.tmin, batch.tmax)
    marginal, hit_tri = measure()
    mrays = R / 1e6 / marginal
    # Protocol parity with the reference headline (SURVEY SS7): upstream
    # times traversal kernels against a PREBUILT CudaBVH -- structure
    # build is outside the per-frame loop. The dense screen-space
    # engine's prep is its structure build (camera-dependent, so real
    # camera motion pays it -- reported alongside, never hidden): the
    # headline freezes the structure once and times the trace kernel;
    # fullframe_mrays keeps the prep-in-frame marginal.
    fullframe_mrays = prep_wall_ms = None
    if use_br and r.primary_engine == "binraster_dense":
        fullframe_mrays = round(mrays, 2)
        prep_wall_ms = min(r.freeze_primary_structure(ca)
                           for _ in range(3)) * 1e3
        print(f"[bench] structure frozen: prep wall {prep_wall_ms:.1f} ms "
              f"(incl. dispatch)", file=sys.stderr)
        marginal, hit_tri = measure()
        mrays = R / 1e6 / marginal
    import numpy as np

    hit_rate = float((np.asarray(hit_tri) >= 0).mean())

    # On-device image-exactness gate (binding target: image-exact vs the
    # CPU golden tracer; round 2's denormal-flush bug proved device-only
    # corruption is real). Deterministic stride subsample keeps the host
    # golden trace cheap while sampling every packet.
    n_sub = int(os.environ.get("NTRACE_BENCH_GOLDEN_RAYS", 4096))
    stride = max(R // n_sub, 1)
    sub = np.arange(0, R, stride)
    from ntrace_tpu.trace.cpu import trace_cpu_golden

    rec = trace_cpu_golden(
        flat, np.asarray(batch.orig)[sub], np.asarray(batch.dirn)[sub],
        np.asarray(batch.tmin)[sub], np.asarray(batch.tmax)[sub])
    dev_tri = np.asarray(hit_tri)[sub]
    mismatches = int((dev_tri != rec.tri).sum())
    golden_match = mismatches == 0
    print(f"[bench] marginal frame {marginal*1e3:.1f} ms; hit_rate "
          f"{hit_rate:.3f}; golden {len(sub)-mismatches}/{len(sub)} match; "
          f"total {time.time()-t0:.1f}s", file=sys.stderr)
    # vs_baseline reports the BINDING-relevant figure (r4 VERDICT
    # protocol ruling): when the frozen-structure split exists, the
    # moving-camera number is fullframe_mrays, so that is what gets
    # compared to the >=150 target; the frozen kernel marginal keeps
    # its own ratio alongside.
    vs_binding = (fullframe_mrays if fullframe_mrays is not None
                  else mrays) / 150.0
    print(json.dumps({
        "metric": "conference_primary_mrays",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(vs_binding, 4),
        **({"frozen_vs_baseline": round(mrays / 150.0, 4)}
           if fullframe_mrays is not None else {}),
        "golden_match": golden_match,
        "golden_mismatches": mismatches,
        "golden_sampled": int(len(sub)),
        # tuned.json-resolved kernel, if any; <primary>+X = screen-space
        # primary engine over X for everything else
        "engine": (f"{r.primary_engine}+{r.engine}" if use_br
                   else r.engine),
        **({"br2_kernel": r._br.get("kernel", "walk")}
           if use_br and getattr(r, "_br", None) else {}),
        "packet_rows": r.tuned_rows or cfg.packet_rows,
        **({"fullframe_mrays": fullframe_mrays,
            "prep_wall_ms": round(prep_wall_ms, 2),
            "protocol": "structure-prebuilt kernel marginal "
                        "(reference parity); fullframe_mrays = "
                        "prep-in-frame marginal"}
           if fullframe_mrays is not None else {}),
        **{k: v for k, v in r.tuned_kw.items() if v},  # kernel knobs
    }))


if __name__ == "__main__":
    main()
