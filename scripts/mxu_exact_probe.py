"""Is a K<=8 f32 matmul on the MXU bit-equal to the VPU mul-add chain?

Gate for an MXU-based bin-raster engine (Woop dots as matmuls): the
golden-exactness contract requires dot(d, m) to produce the exact f32
bits of x*a + (y*b + (z*c)) -- if the MXU's f32 path (bf16x3/x6 passes)
differs in ulps, hit ids flip on triangle edges and the engine cannot be
promoted under the bench golden gate.

Tests, on device, for precision DEFAULT and HIGHEST:
  xla_dot   -- jnp.dot((128,8) f32, (8,128) f32) at the XLA level
  pallas_dot-- the same inside a pallas kernel (Mosaic lowering)
vs the reference chain a0*b0 + (a1*b1 + (a2*b2)) with the remaining five
K rows exactly zero. Appends to results_mxu_exact.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results_mxu_exact.json")


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    rng = np.random.default_rng(0)
    # Scene-scale magnitudes plus adversarial near-cancellation rows.
    a = np.zeros((128, 8), np.float32)
    a[:, :3] = rng.normal(0, 1, (128, 3)).astype(np.float32)
    a[:64, :3] *= rng.uniform(1e-3, 1e3, (64, 1)).astype(np.float32)
    b = np.zeros((8, 128), np.float32)
    b[:3] = rng.normal(0, 1, (3, 128)).astype(np.float32)
    b[:3, :64] *= rng.uniform(1e-3, 1e3, (1, 64)).astype(np.float32)
    ad, bd = jnp.asarray(a), jnp.asarray(b)

    @jax.jit
    def chain(ad, bd):
        # The golden op order: x*a + (y*b + z*c) evaluated left-to-right
        # as jnp would: (x*a + y*b) + z*c -- match binraster_dense's MT
        # convention (sum of three products, left-assoc).
        return (ad[:, 0:1] * bd[0:1, :] + ad[:, 1:2] * bd[1:2, :]
                + ad[:, 2:3] * bd[2:3, :])

    ref = np.asarray(chain(ad, bd))

    for prec in ("default", "highest"):
        @jax.jit
        def xdot(ad, bd):
            return jax.lax.dot_general(
                ad, bd, (((1,), (0,)), ((), ())), precision=prec)

        got = np.asarray(xdot(ad, bd))
        bits = (got.view(np.int32) != ref.view(np.int32)).sum()
        maxulp = int(np.abs(got.view(np.int32).astype(np.int64)
                            - ref.view(np.int32).astype(np.int64)).max())
        emit({"stage": f"xla_dot_{prec}", "mismatched_bits": int(bits),
              "max_ulp": maxulp})

        def kern(aref, bref, oref):
            oref[:, :] = jax.lax.dot_general(
                aref[:, :], bref[:, :], (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)

        try:
            got2 = np.asarray(pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            )(ad, bd))
            bits2 = (got2.view(np.int32) != ref.view(np.int32)).sum()
            maxulp2 = int(np.abs(got2.view(np.int32).astype(np.int64)
                                 - ref.view(np.int32).astype(np.int64)).max())
            emit({"stage": f"pallas_dot_{prec}",
                  "mismatched_bits": int(bits2), "max_ulp": maxulp2})
        except Exception as e:
            emit({"stage": f"pallas_dot_{prec}",
                  "failed": f"{type(e).__name__}: {str(e)[:200]}"})


if __name__ == "__main__":
    main()
