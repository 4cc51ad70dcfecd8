#!/usr/bin/env python
"""Distill the device A/B sweep into tuned.json for auto dispatch.

Reads results_r3b_sweep.json (scripts/r3b_sweep.py, conference-primary
chained-marginal protocol) and writes {"engine", "packet_rows",
"mrays", "source_key"} for the fastest packet-family config. The
renderer's auto resolution (render/renderer.py _load_tuned) consults
this file on TPU backends, so bench.py and the benchmark matrix pick
the measured winner without per-script knobs.

Keys are parsed structurally: packet16_<knob> rows=16 base kernel,
packet_bfs<rows>, packet_dleaf<rows>_dm<d>, packet_bdl<rows>_dm<d>.
Knob variants (leafbc/slabbc) tune kernel internals, not the engine
name, so they map to plain "packet".
"""
import json
import os
import re
import sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
src = os.path.join(root, "results_r3b_sweep.json")
with open(src) as f:
    results = json.load(f)

best = None
for key, val in results.items():
    if not isinstance(val, dict) or "mrays" not in val:
        continue
    m = re.match(r"packet(?:_(bfs|dleaf|bdl))?(\d+)(?:_.*)?$", key)
    if not m:
        continue
    kind, rows = m.group(1), int(m.group(2))
    engine = "packet" if kind is None else f"packet_{kind}"
    cand = dict(engine=engine, packet_rows=rows,
                mrays=val["mrays"], source_key=key)
    if kind is None:  # base-kernel knob variants (vector-pipe broadcasts)
        cand["leafbc"] = "leafbc" in key or "bothbc" in key
        cand["slabbc"] = "slabbc" in key or "bothbc" in key
    dm = re.search(r"_dm(\d+)", key)
    if dm and kind in ("dleaf", "bdl"):
        cand["drain_min"] = int(dm.group(1))
    if kind == "bdl" and "_ms" in key:
        cand["merge_sibs"] = True
    qg = re.search(r"_qg(\d+)", key)
    if qg and kind == "bdl":
        cand["qgroup"] = int(qg.group(1))
    ml = re.search(r"_ml(\d+)", key)
    if ml:  # build-profile variant: consumers override max_leaf_size
        cand["max_leaf"] = int(ml.group(1))
    if best is None or cand["mrays"] > best["mrays"]:
        best = cand

if best is None:
    print("[pick_tuned] no packet-family results found; leaving tuned.json")
    sys.exit(0)

# Bin-raster screen-space primary engine (results_binraster_fast.json,
# scripts/binraster_fast_probe.py): if its best full-frame marginal beats
# the packet winner, record it as the PRIMARY engine -- the packet winner
# above still serves every secondary/any-hit pass.
br_src = os.path.join(root, "results_binraster_fast.json")
try:
    with open(br_src) as f:
        br = json.load(f)
except OSError:
    br = []
br_best = None
# Only configs with a committed golden record that MATCHED are eligible:
# arming a fast-but-wrong config fleet-wide until the next bench golden
# gate trips is worse than leaving the packet winner in place.
br_golden_ok = {rec.get("cfg") for rec in br
                if rec.get("stage") == "golden" and rec.get("match")}
for rec in br:
    if rec.get("stage") != "full" or "mrays" not in rec:
        continue
    m = re.match(r"k(\d+)_u(\d+)_ez(\d+)$", rec.get("cfg", ""))
    if not m or rec.get("cfg") not in br_golden_ok:
        continue
    cand = dict(primary_engine="binraster", br_k=int(m.group(1)),
                br_unroll=int(m.group(2)), br_ez=int(m.group(3)),
                primary_mrays=rec["mrays"], primary_source=rec["cfg"])
    if br_best is None or cand["primary_mrays"] > br_best["primary_mrays"]:
        br_best = cand
if br_best is not None and br_best["primary_mrays"] > best["mrays"]:
    best.update(br_best)

# Dense-lane (v2) bin-raster engine: same golden-gated promotion rule.
# v2-prep cfg keys are t<tile>_ez<ez> (results_binraster_dense.json,
# "full" + "golden" record pairs); v3-prep keys are
# t<tile>_ez<ez>_tpv<tpv>_prep3 (results_r4_dense3.json, "fullframe3"
# records carrying their own golden fields).
bd = []
for src in ("results_binraster_dense.json", "results_r4_dense3.json",
            "results_r4_dense5.json", "results_r5_arm.json"):
    try:
        with open(os.path.join(root, src)) as f:
            bd += [json.loads(line) for line in f if line.strip()]
    except OSError:
        pass
# Authoritative golden stages (tie-aware compare): a cfg is eligible only
# if it PASSES at least one and FAILS none (ADVICE r4: a stale passing
# record must not outvote a later authoritative failure). The raw
# "golden_full" stage compares ids without tie-awareness -- its
# match:false records may be pure shared-edge ulp ties
# (results_r4_dense5.json), so it neither qualifies nor disqualifies.
def _auth_verdict(rec):
    if rec.get("stage") == "golden":
        return bool(rec.get("match"))
    if rec.get("stage") in ("fullframe3", "fullframe5", "fullframe_r5"):
        return bool(rec.get("golden_match"))
    if rec.get("stage") == "golden_full_tieaware":
        return bool(rec.get("match"))
    return None


bd_pass = {rec.get("cfg") for rec in bd if _auth_verdict(rec) is True}
bd_fail = {rec.get("cfg") for rec in bd if _auth_verdict(rec) is False}
bd_golden_ok = bd_pass - bd_fail
bd_best = None
for rec in bd:
    if (rec.get("stage") not in ("full", "fullframe3", "fullframe5",
                                 "fullframe_r5")
            or "mrays" not in rec):
        continue
    if rec.get("cfg") not in bd_golden_ok:
        continue
    if rec.get("stage") == "fullframe_r5":
        # round-5 records carry their knobs explicitly (no cfg regex)
        cand = dict(primary_engine="binraster_dense",
                    br2_tile=int(rec.get("br2_tile", 16)),
                    br2_ez=int(rec.get("br2_ez", 0)),
                    br2_tpv=int(rec.get("br2_tpv", 1)),
                    br2_sort=str(rec.get("br2_sort", "sg")),
                    br2_kernel=str(rec.get("br2_kernel", "walk")),
                    primary_mrays=rec["mrays"],
                    primary_source=rec["cfg"])
    else:
        m = re.match(r"t(\d+)_ez(\d+)(?:_tpv(\d+)_prep3(sg|s11)?)?$",
                     rec.get("cfg", ""))
        if not m:
            continue
        cand = dict(primary_engine="binraster_dense",
                    br2_tile=int(m.group(1)),
                    br2_ez=int(m.group(2)), br2_tpv=int(m.group(3) or 1),
                    primary_mrays=rec["mrays"], primary_source=rec["cfg"])
        if m.group(4):   # session-5 payload-movement A/B (prep sort mode)
            cand["br2_sort"] = m.group(4)
    if bd_best is None or cand["primary_mrays"] > bd_best["primary_mrays"]:
        bd_best = cand
if bd_best is not None and bd_best["primary_mrays"] > max(
        best["mrays"], best.get("primary_mrays", 0.0)):
    for k in ("br_k", "br_unroll", "br_ez"):
        best.pop(k, None)
    best.update(bd_best)

out = os.path.join(root, "tuned.json")
with open(out, "w") as f:
    json.dump(best, f, indent=2)
print(f"[pick_tuned] {best}")
