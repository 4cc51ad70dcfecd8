"""Performance-regression gates (SURVEY.md SS5 "Perf regression harness").

The reference's benchmark .bat logs had no regression gating; the rebuild
wires thresholds over the recorded per-round benchmark results so a perf
regression fails CI loudly (`pytest -m perf`).

Two layers:
  - cross-round: the newest BENCH_r*.json headline must not regress more
    than TOLERANCE vs the best earlier round (driver-recorded, real TPU).
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


def _bench_rounds():
    recs = []
    for p in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        try:
            data = json.load(open(p))
        except (OSError, json.JSONDecodeError):
            continue
        parsed = data.get("parsed") or {}
        value = parsed.get("value")
        if m and isinstance(value, (int, float)):
            recs.append((int(m.group(1)), float(value)))
    return sorted(recs)


@pytest.mark.perf
def test_headline_no_cross_round_regression():
    recs = _bench_rounds()
    if len(recs) < 2:
        pytest.skip("fewer than two recorded rounds")
    *prior, (last_round, last_value) = recs
    best_prior = max(v for _, v in prior)
    assert last_value >= TOLERANCE * best_prior, (
        f"round {last_round} headline {last_value} Mrays/s regressed below "
        f"{TOLERANCE:.0%} of best prior round ({best_prior} Mrays/s)"
    )


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
