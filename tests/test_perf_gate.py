"""Performance-regression gates (SURVEY.md SS5 "Perf regression harness").

The reference's benchmark .bat logs had no regression gating; the rebuild
wires thresholds over the recorded per-round benchmark results so a perf
regression fails CI loudly (`pytest -m perf`).

Like-for-like rule (round-4 VERDICT item 6): round 4 split the headline
into a structure-prebuilt kernel marginal (`value`) and the prep-in-frame
marginal (`fullframe_mrays`). Rounds 1-3 predate the split and their
`value` IS the prep-in-frame marginal, so the comparable cross-round
series is fullframe_mrays when recorded, else value. The frozen-protocol
`value` numbers are gated separately among rounds that record both.

Two layers:
  - cross-round: the newest BENCH_r*.json must not regress more than
    TOLERANCE vs the best earlier round on the SAME field semantics.
  - intra-repo: results_matrix JSONs must stay parseable and keep the
    scene set of BASELINE.json's five configs.
"""

import glob
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOLERANCE = 0.8  # newest round may not drop below 80% of the best prior


def _bench_rounds(root=ROOT, field="fullframe"):
    """[(round, mrays)] of the comparable series.

    field="fullframe": prep-in-frame marginal -- fullframe_mrays when
    recorded (frozen-protocol rounds), else value (pre-split rounds,
    where value measured exactly that).
    field="frozen": structure-prebuilt kernel marginal -- value, but
    ONLY from rounds that record the protocol split (fullframe_mrays
    present); earlier rounds measured something else under `value`.
    """
    recs = []
    for p in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        try:
            data = json.load(open(p))
        except (OSError, json.JSONDecodeError):
            continue
        parsed = data.get("parsed") or {}
        value = parsed.get("value")
        ff = parsed.get("fullframe_mrays")
        if not m or not isinstance(value, (int, float)):
            continue
        if field == "fullframe":
            v = ff if isinstance(ff, (int, float)) else value
            recs.append((int(m.group(1)), float(v)))
        elif isinstance(ff, (int, float)):
            recs.append((int(m.group(1)), float(value)))
    return sorted(recs)


def _assert_no_regression(recs, label):
    *prior, (last_round, last_value) = recs
    best_prior = max(v for _, v in prior)
    assert last_value >= TOLERANCE * best_prior, (
        f"round {last_round} {label} {last_value} Mrays/s regressed below "
        f"{TOLERANCE:.0%} of best prior round ({best_prior} Mrays/s)"
    )


@pytest.mark.perf
def test_fullframe_no_cross_round_regression():
    recs = _bench_rounds(field="fullframe")
    if len(recs) < 2:
        pytest.skip("fewer than two recorded rounds")
    _assert_no_regression(recs, "prep-in-frame headline")


@pytest.mark.perf
def test_frozen_headline_no_cross_round_regression():
    recs = _bench_rounds(field="frozen")
    if len(recs) < 2:
        pytest.skip("fewer than two frozen-protocol rounds")
    _assert_no_regression(recs, "frozen-structure headline")


def test_gate_fires_on_simulated_regression(tmp_path):
    """The gate must actually fail on a like-for-like regression (round-4
    VERDICT: the old value-vs-value gate compared 203.62 frozen against
    44.26 prep-in-frame and could never fire again)."""
    def write(rnd, value, ff=None):
        parsed = {"value": value}
        if ff is not None:
            parsed["fullframe_mrays"] = ff
        (tmp_path / f"BENCH_r{rnd:02d}.json").write_text(
            json.dumps({"parsed": parsed}))

    write(3, 44.0)                  # pre-split: value is prep-in-frame
    write(4, 203.0, ff=48.8)        # split: frozen value + fullframe
    write(5, 210.0, ff=30.0)        # frozen improved, fullframe REGRESSED
    recs = _bench_rounds(root=str(tmp_path), field="fullframe")
    assert recs == [(3, 44.0), (4, 48.8), (5, 30.0)]
    with pytest.raises(AssertionError):
        _assert_no_regression(recs, "prep-in-frame headline")
    # and the frozen series only spans the split rounds
    assert _bench_rounds(root=str(tmp_path), field="frozen") == [
        (4, 203.0), (5, 210.0)]


@pytest.mark.perf
def test_headline_round1_floor():
    """The round-1 record (0.9 Mrays/s) is the absolute floor."""
    recs = _bench_rounds()
    if not recs:
        pytest.skip("no recorded rounds")
    assert recs[-1][1] >= 0.9 * TOLERANCE


@pytest.mark.perf
def test_results_matrix_covers_baseline_scenes():
    base = json.load(open(os.path.join(ROOT, "BASELINE.json")))
    paths = sorted(glob.glob(os.path.join(ROOT, "results_matrix_r*.json")))
    if not paths:
        pytest.skip("no results matrix recorded")
    matrix = json.load(open(paths[-1]))
    runs = matrix if isinstance(matrix, list) else matrix.get("runs", [])
    scenes = {r.get("scene", "").split("@")[0] for r in runs}
    # configs are prose strings: "Sibenik (~80k tris), primary rays ..."
    want = {cfg.split()[0].strip(",").lower().replace("fairy", "fairy")
            for cfg in base.get("configs", [])}
    alias = {"san": "san_miguel", "fairy": "fairy"}
    missing = set()
    for w in want:
        key = alias.get(w, w)
        if not any(key in s for s in scenes):
            missing.add(w)
    assert not missing, f"matrix lost baseline scenes: {missing}"


@pytest.mark.perf
def test_matrix_no_cross_round_regression():
    """Per-scene, per-mode gate: the newest results matrix must keep every
    mrays number at >= TOLERANCE x the best prior round for the same
    (scene, mode) (round-2 VERDICT: the headline-only gate was toothless).
    Entries new in the latest round (no prior) pass vacuously."""
    paths = sorted(glob.glob(os.path.join(ROOT, "results_matrix_r*.json")))
    # A matrix that documents its own degradation (e.g. the r3 rows
    # measured on a wedged tunnel -- r4 VERDICT) is history, not a
    # gating target; it never becomes "latest".
    paths = [p for p in paths
             if not (isinstance(d := json.load(open(p)), dict)
                     and d.get("degraded"))]
    if len(paths) < 2:
        pytest.skip("fewer than two recorded matrices")

    def load(p):
        rows = json.load(open(p))
        out = {}
        for r in (rows if isinstance(rows, list) else rows.get("runs", [])):
            for k, v in r.items():
                if k.startswith("mrays") and isinstance(v, (int, float)):
                    out[(r.get("scene"), r.get("mode"), k)] = float(v)
        return out

    prior = {}
    for p in paths[:-1]:
        for key, v in load(p).items():
            prior[key] = max(prior.get(key, 0.0), v)
    latest = load(paths[-1])
    bad = {k: (v, prior[k]) for k, v in latest.items()
           if k in prior and v < TOLERANCE * prior[k]}
    assert not bad, f"matrix regressions (latest, best prior): {bad}"
