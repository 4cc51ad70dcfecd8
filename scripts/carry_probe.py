"""Does Mosaic spill fat while_loop carries every iteration?

Variants (all: 2000-iteration loop, one dynamic row load + extract per
iteration, slope protocol over grid sizes):
  W0   carry = 1 scalar + 1 (R,128) tile
  W2   carry = 1 scalar + 2 tiles (touched: += tiny)
  W4   carry = 1 scalar + 4 tiles
  W8   carry = 1 scalar + 8 tiles
  W4v  W4 + reads 6 ray-view refs per iteration (live view values)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 16
STEPS = 2000
NROWS = 4096


def make_kernel(n_tiles: int, views: bool):
    shape = (ROWS, 128)

    def kernel(nodes_ref, rays_ref, out_ref):
        def body(c):
            node, k, tiles = c
            row = nodes_ref[pl.ds(jax.lax.rem(node, NROWS), 1), :]
            enc0 = row[0, 12].astype(jnp.int32)
            if views:
                v = rays_ref[0:ROWS, :]
                for i in range(1, 6):
                    v = v + rays_ref[i * ROWS:(i + 1) * ROWS, :]
                tiles = tuple(t + v * np.float32(1e-20) for t in tiles)
            else:
                tiles = tuple(t + np.float32(1e-20) for t in tiles)
            return node + enc0 + 1, k + 1, tiles

        init = (jnp.int32(1), jnp.int32(0),
                tuple(jnp.full(shape, float(i), jnp.float32)
                      for i in range(n_tiles)))
        node_f, _, tiles_f = jax.lax.while_loop(
            lambda c: c[1] < STEPS, body, init)
        acc = tiles_f[0]
        for t in tiles_f[1:]:
            acc = acc + t
        out_ref[:] = acc + node_f.astype(jnp.float32)

    return kernel


def time_level(n_tiles, views, grid):
    rng = np.random.default_rng(0)
    nodes = rng.standard_normal((NROWS, 128), dtype=np.float32)
    nodes[:, 12] = rng.integers(0, 7, size=NROWS).astype(np.float32)
    rays = rng.standard_normal((grid * 6 * ROWS, 128), dtype=np.float32)
    fn = pl.pallas_call(
        make_kernel(n_tiles, views),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((6 * ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * ROWS, 128), jnp.float32),
    )

    @jax.jit
    def run(n, r):
        return fn(n, r).sum()

    args = (jnp.asarray(nodes), jnp.asarray(rays))
    jax.block_until_ready(run(*args))
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        float(run(*args))
        best = min(best, time.time() - t0)
    return best


for name, n_tiles, views in (("W0", 1, False), ("W2", 2, False),
                             ("W4", 4, False), ("W8", 8, False),
                             ("W4v", 4, True)):
    t_small = time_level(n_tiles, views, 8)
    t_big = time_level(n_tiles, views, 40)
    ns = (t_big - t_small) / ((40 - 8) * STEPS) * 1e9
    print(f"{name:4s}: {ns:7.1f} ns/iter (g8 {t_small*1e3:.1f} ms, "
          f"g40 {t_big*1e3:.1f} ms)", flush=True)
