"""Forest tables as jit ARGUMENTS (r5: San Miguel HTTP 413 fix).

Closure-captured chunk tables embed in the lowered stablehlo as literal
constants; at San Miguel scale (791 MB over 7 chunks) the serialized
module exceeded the axon remote-compile request cap. device_tables() +
trace_primary(..., tables=...) routes them through the jit's arguments
instead. These tests pin (a) result equality between the closure and
argument paths, and (b) that the lowered module actually shrinks (the
tables no longer appear as literals).
"""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ntrace_tpu.render.renderer as rmod
from ntrace_tpu.core import BuildConfig, RenderConfig
from ntrace_tpu.ray import pixel_table, raygen
from ntrace_tpu.render.renderer import Renderer, build_accel
from ntrace_tpu.scenes import default_camera, get_scene


@pytest.fixture
def forest_renderer(monkeypatch):
    # Shrink the VMEM budget so a small scene routes through the
    # Morton-chunked forest (the path whose tables are big for real).
    monkeypatch.setattr(rmod, "VMEM_BUDGET", 96 << 10)
    scene = get_scene("conference", n_tris=3000)
    bcfg = BuildConfig(builder="binned_sah", max_leaf_size=8)
    flat = build_accel(scene, bcfg, use_cache=False)
    cfg = RenderConfig(width=64, height=64, mode="primary",
                       packet_rows=8, engine="packet")
    r = Renderer(scene, bcfg, cfg, flat=flat)
    assert len(r.forest) > 1, "scene did not route through the forest"
    return r, scene


def _primary_batch(r, W=64, H=64):
    cam = default_camera("conference")
    ca = raygen.camera_arrays(cam, W, H)
    order_px, _ = pixel_table(W, H)
    return ca, raygen.primary(ca, W, H, jnp.asarray(order_px))


def test_tables_arg_matches_closure(forest_renderer):
    r, _ = forest_renderer
    ca, batch = _primary_batch(r)
    tables = r.device_tables()
    assert len(tables) == len(r.forest)

    ref = r.trace_primary(batch.orig, batch.dirn, batch.tmin, batch.tmax,
                          cam=ca)

    @jax.jit
    def run(o, d, tn, tx, tables):
        return r.trace_primary(o, d, tn, tx, cam=ca, canonical=True,
                               tables=tables)

    got = run(batch.orig, batch.dirn, batch.tmin, batch.tmax, tables)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tables_arg_shrinks_lowered_module(forest_renderer):
    r, _ = forest_renderer
    ca, batch = _primary_batch(r)
    tables = r.device_tables()
    table_bytes = sum(int(n.nbytes + t.nbytes) for n, t in tables)
    shapes = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                   for a in (batch.orig, batch.dirn, batch.tmin,
                             batch.tmax))
    tshapes = tuple((jax.ShapeDtypeStruct(n.shape, n.dtype),
                     jax.ShapeDtypeStruct(t.shape, t.dtype))
                    for n, t in tables)

    def sz(fn, *args):
        buf = io.BytesIO()
        jax.jit(fn).lower(*args).compiler_ir("stablehlo") \
            .operation.write_bytecode(buf)
        return buf.tell()

    with_arg = sz(lambda o, d, tn, tx, tb: r.trace_primary(
        o, d, tn, tx, cam=ca, canonical=True, tables=tb),
        *shapes, tshapes)
    closure = sz(lambda o, d, tn, tx: r.trace_primary(
        o, d, tn, tx, cam=ca, canonical=True), *shapes)
    # The closure module embeds the tables as literals; the argument
    # module must not (it stays below half the table payload while the
    # closure module carries all of it).
    assert closure > table_bytes
    assert with_arg < table_bytes // 2 + 1 << 16


def test_secondary_tracer_tables(forest_renderer):
    r, _ = forest_renderer
    ca, batch = _primary_batch(r)
    tables = r.device_tables()
    tr_ref = r._secondary_tracer(long_rays=True)
    ref = tr_ref(batch.orig, batch.dirn, batch.tmin, batch.tmax, False)

    @jax.jit
    def run(o, d, tn, tx, tables):
        tr = r._secondary_tracer(long_rays=True, tables=tables)
        return tr(o, d, tn, tx, False)

    got = run(batch.orig, batch.dirn, batch.tmin, batch.tmax, tables)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
