#!/usr/bin/env python
"""Round-3c device sweep: re-run the configs the broadcast_to Mosaic
crash killed in round-3b (leafbc/slabbc/bothbc knobs, packet_bfs, the
whole packet_bdl family) now that packet_common.rep_rows replaced the
replication formulation.

Loads the existing results_r3b_sweep.json and updates it IN PLACE so
scripts/pick_tuned.py sees the union of both sweeps; base/dleaf configs
re-measure under the same protocol, giving a session-local baseline.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import r3b_sweep as r3b  # noqa: E402

if os.path.exists(r3b.OUT):
    with open(r3b.OUT) as f:
        r3b.RESULTS.update(json.load(f))

r3b.reduce_probe()
r3b.conference_section()
print("[r3c] SWEEP DONE", flush=True)
