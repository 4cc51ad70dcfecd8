"""Where does the ~719 ns/unit of the packet kernel go?

Runs probe variants of the kernel on a real scene, each with its own stats
counters (traversal paths differ between variants because leaf processing
shrinks hitT), and reports ns/unit per variant:

  none        full kernel (baseline)
  noleafwork  leaf conds taken, Moller-Trumbore skipped -> MT cost
  noleaf      leaf conds absent entirely                -> cond overhead
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ntrace_tpu.bvh.packed import pack_bvh
from ntrace_tpu.core import BuildConfig
from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.render.renderer import build_accel
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace.packet_pallas import trace_packet

scene_name = sys.argv[1] if len(sys.argv) > 1 else "conference"
rows = int(sys.argv[2]) if len(sys.argv) > 2 else 16
W, H = 1024, 768

scene = get_scene(scene_name)
flat = build_accel(scene, BuildConfig(builder="binned_sah"), use_cache=True)
packed = pack_bvh(flat, scene.tri_verts())
cam = default_camera(scene.name)
order_px, _ = pixel_table(W, H)
batch = raygen.primary(raygen.camera_arrays(cam, W, H), W, H,
                       jnp.asarray(order_px))
R = batch.num_rays
nodes_dev = jax.device_put(jnp.asarray(packed.nodes8))
tris_dev = jax.device_put(jnp.asarray(packed.tris12))
args = (batch.orig, batch.dirn, batch.tmin, batch.tmax)

for probe in ("none", "noleafwork", "noleaf"):
    # Unit counts for THIS variant's traversal path.
    st = trace_packet(nodes_dev, tris_dev, *args, rows=rows, stats=True,
                      order="code", probe=probe)[-1]
    st = np.asarray(st)
    steps, leafrows = int(st[:, 0].sum()), int(st[:, 1].sum())

    @jax.jit
    def run(o, d, tn, tx):
        tri, t, u, v = trace_packet(nodes_dev, tris_dev, o, d, tn, tx,
                                    rows=rows, order="code", probe=probe)
        return tri.sum(), t.sum()

    jax.block_until_ready(run(*args))
    best = 1e30
    for _ in range(4):
        t0 = time.time()
        jax.block_until_ready(run(*args))
        best = min(best, time.time() - t0)
    units = steps + leafrows
    print(f"{probe:10s}: {best*1e3:6.1f} ms  steps {steps:7d} "
          f"leafrows {leafrows:7d}  -> {best/units*1e9:6.0f} ns/unit "
          f"({best/steps*1e9:6.0f} ns/step if steps only)", flush=True)
