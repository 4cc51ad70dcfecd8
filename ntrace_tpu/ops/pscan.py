"""Pallas carry-scan: one-pass row-wise cummax/cummin along lanes.

XLA lowers lax.cummax over a (R, n) array's minor axis to ~log2(n)
shifted-max passes, each streaming the full array through HBM: for the
LBVH ANSV scans ((31, 1M) int32, bvh/lbvh.py) that is ~10 GB of HBM
traffic and ~12 ms per direction at 1M tris. This kernel makes the scan
a SINGLE streaming pass: a sequential grid over column blocks holds the
running row maxima in VMEM scratch, and the log2(block) shifted-max
passes happen inside VMEM, whose bandwidth is an order of magnitude
above HBM. HBM traffic drops to read+write of the array itself.

Reference context: the radix-sort/scan primitives the reference's HLBVH
builder leans on (expected src/rt/bvh/HLBVH/*, SURVEY.md SS3.2) are CUB-
class GPU scans; this is the TPU-native equivalent for the Morton build
path. Exact integer ops -- results are bit-identical to lax.cummax, so
CPU (lax fallback) and TPU builds produce identical trees.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32_MIN = np.int32(-0x80000000)
_I32_MAX = np.int32(0x7FFFFFFF)


def _make_kernel(R: int, B: int, reverse: bool, op):
    ident = _I32_MAX if op is jnp.minimum else _I32_MIN

    def kernel(x_ref, o_ref, carry_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_ref[...] = jnp.full((R, 128), ident, jnp.int32)

        acc = x_ref[...]
        sh = 1
        while sh < B:
            if not reverse:
                shifted = jnp.concatenate(
                    [jnp.full((R, sh), ident, jnp.int32), acc[:, : B - sh]],
                    axis=1)
            else:
                shifted = jnp.concatenate(
                    [acc[:, sh:],
                     jnp.full((R, sh), ident, jnp.int32)], axis=1)
            acc = op(acc, shifted)
            sh *= 2
        acc = op(acc, carry_ref[:, 0:1])
        o_ref[...] = acc
        edge = acc[:, B - 1: B] if not reverse else acc[:, 0:1]
        carry_ref[...] = jnp.broadcast_to(edge, (R, 128))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("reverse", "op_name", "block",
                                    "interpret"))
def _scan(x, *, reverse: bool, op_name: str, block: int, interpret: bool):
    R, n = x.shape
    op = jnp.minimum if op_name == "min" else jnp.maximum
    ident = _I32_MAX if op_name == "min" else _I32_MIN
    Rp = -(-R // 8) * 8          # Mosaic block sublanes: multiples of 8
    if Rp != R:
        x = jnp.concatenate(
            [x, jnp.full((Rp - R, n), ident, jnp.int32)], axis=0)
    B = min(block, max(128, 1 << int(np.ceil(np.log2(max(n, 1))))))
    pad = (-n) % B
    if pad:
        fill = jnp.full((Rp, pad), ident, jnp.int32)
        x = jnp.concatenate([x, fill] if not reverse else [fill, x], axis=1)
    nb = (n + pad) // B
    if reverse:
        index_map = lambda i: (0, nb - 1 - i)
    else:
        index_map = lambda i: (0, i)
    spec = pl.BlockSpec((Rp, B), index_map, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(Rp, B, reverse, op),
        grid=(nb,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Rp, nb * B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((Rp, 128), jnp.int32)],
        interpret=interpret,
    )(x)
    out = out[:R]
    if pad:
        out = out[:, :n] if not reverse else out[:, pad:]
    return out


def row_scan_i32(x, *, op: str = "max", reverse: bool = False,
                 block: int = 8192, interpret: bool | None = None):
    """Row-wise inclusive cummax/cummin of a 2-D int32 array along axis 1.

    Bit-identical to jax.lax.cummax/cummin(x, axis=1, reverse=reverse).
    `interpret=None` auto-selects the Pallas interpreter off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _scan(x, reverse=reverse, op_name=op, block=block,
                 interpret=interpret)
