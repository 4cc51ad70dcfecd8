"""ops/gather.py: bit-exact paged one-hot gather (CPU interpret mode).

The kernel itself targets TPU; interpret=True runs the same lowering on CPU
so correctness is covered by CI even while TPU Pallas compilation is
unavailable through the axon tunnel (see PERF_NOTES.md SS3).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ntrace_tpu.ops.gather import GatherTable, split_table_bytes


class TestSplitBytes:
    def test_roundtrip_bits(self):
        rng = np.random.default_rng(0)
        t = rng.standard_normal((64, 4)).astype(np.float32)
        t[0] = [0.0, -0.0, np.inf, -np.inf]
        t[1] = [np.nan, 1e-38, -1e38, 255.5]
        b = np.asarray(split_table_bytes(jnp.asarray(t)))
        bits = t.view(np.int32)
        for k in range(4):
            want = (bits >> (8 * k)) & 0xFF
            got = b[:, 4 * k:4 * (k + 1)].astype(np.int32) & 0xFF
            np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n,c,q,page,tile", [
    (1000, 16, 2048, 256, 256),
    (100, 12, 513, 128, 128),     # padding: Q not a tile multiple
    (65536, 16, 4096, 512, 512),
])
def test_paged_gather_bit_exact(n, c, q, page, tile):
    rng = np.random.default_rng(1)
    table = rng.standard_normal((n, c)).astype(np.float32)
    table[0, :2] = [np.inf, -0.0]
    gt = GatherTable(table, page=page, tile=tile)
    idx = rng.integers(0, n, q).astype(np.int32)
    out = np.asarray(gt(jnp.asarray(idx), interpret=True))
    want = table[idx]
    np.testing.assert_array_equal(out.view(np.int32), want.view(np.int32))


def test_skewed_and_repeated_indices():
    rng = np.random.default_rng(2)
    table = rng.standard_normal((512, 8)).astype(np.float32)
    gt = GatherTable(table, page=128, tile=128)
    # All items on one page; many duplicates; plus boundary rows.
    idx = np.concatenate([
        np.zeros(200, np.int32),
        np.full(200, 511, np.int32),
        rng.integers(0, 128, 112).astype(np.int32),
    ])
    out = np.asarray(gt(jnp.asarray(idx), interpret=True))
    np.testing.assert_array_equal(out.view(np.int32), table[idx].view(np.int32))
