"""Per-packet traversal stats of the packet kernel on the real TPU:
inner steps + leaf rows per packet -> where the wall-clock goes."""

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
tri_cost = float(os.environ.get("TRI_COST", "1.0"))
max_leaf = int(os.environ.get("MAX_LEAF", "8"))
tpr = int(os.environ.get("TPR", "12"))
npr = int(os.environ.get("NPR", "8"))
flat = build_accel(scene, BuildConfig(builder="binned_sah",
                                      sah_tri_cost=tri_cost,
                                      max_leaf_size=max_leaf), use_cache=True)
packed = pack_bvh(flat, scene.tri_verts(), tris_per_row=tpr, nodes_per_row=npr)
cam = default_camera(scene.name)
order, _ = pixel_table(W, H)
batch = raygen.primary(raygen.camera_arrays(cam, W, H), W, H, jnp.asarray(order))

nodes_dev = jax.device_put(jnp.asarray(packed.nodes8))
tris_dev = jax.device_put(jnp.asarray(packed.tris12))
tri, t, u, v, st = trace_packet(
    nodes_dev, tris_dev, batch.orig, batch.dirn, batch.tmin, batch.tmax,
    rows=rows, stats=True, tris_per_row=packed.tris_per_row,
    nodes_per_row=packed.nodes_per_row,
)
st = np.asarray(st)
steps, leafrows = st[:, 0], st[:, 1]
P = len(steps)
R = batch.num_rays
print(f"{scene_name} rows={rows}: {P} packets of {rows*128} rays")
print(f"inner steps/packet: mean {steps.mean():.0f} p50 {np.percentile(steps,50):.0f} "
      f"p95 {np.percentile(steps,95):.0f} max {steps.max()}")
print(f"leaf rows/packet:   mean {leafrows.mean():.0f} p50 {np.percentile(leafrows,50):.0f} "
      f"p95 {np.percentile(leafrows,95):.0f} max {leafrows.max()}")
print(f"total: {steps.sum()} steps + {leafrows.sum()} leaf rows; "
      f"{steps.sum()*1.0/R:.2f} steps/ray, {leafrows.sum()*1.0/R:.2f} rows/ray")

# Time the non-stats kernel for the derived per-unit cost.
@jax.jit
def run(o, d, tn, tx):
    tri, t, u, v = trace_packet(nodes_dev, tris_dev, o, d, tn, tx, rows=rows,
                                tris_per_row=packed.tris_per_row,
                                nodes_per_row=packed.nodes_per_row)
    return tri.sum(), t.sum()

args = (batch.orig, batch.dirn, batch.tmin, batch.tmax)
jax.block_until_ready(run(*args))
best = min(
    (lambda t0: (jax.block_until_ready(run(*args)), time.time() - t0)[1])(time.time())
    for _ in range(4)
)
units = steps.sum() + leafrows.sum()
print(f"best {best*1e3:.1f} ms -> {R/1e6/best:.2f} Mrays/s; "
      f"{best/P*1e6:.0f} us/packet; {best/units*1e9:.0f} ns/unit "
      f"({units/P:.0f} units/packet)")
