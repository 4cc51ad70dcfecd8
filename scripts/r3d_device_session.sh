#!/bin/bash
# Round-3 session-7 device run: two-tier bin-raster A/B -> tuned.json ->
# headline bench. No shell timeouts around TPU work (a killed compile
# wedges the axon tunnel); stages run sequentially, one TPU process at a
# time, each appending to its own log under /tmp/r3d/.
set -u
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python
mkdir -p /tmp/r3d

echo "[r3d] $(date -u +%H:%M:%S) fast-prep A/B probe" | tee -a /tmp/r3d/log
$PY scripts/binraster_fast_probe.py >> /tmp/r3d/probe.log 2>&1
echo "[r3d] $(date -u +%H:%M:%S) probe exit=$?" | tee -a /tmp/r3d/log

$PY scripts/pick_tuned.py | tee -a /tmp/r3d/log

echo "[r3d] $(date -u +%H:%M:%S) bench" | tee -a /tmp/r3d/log
$PY bench.py > /tmp/r3d/bench.json 2>> /tmp/r3d/bench.log
echo "[r3d] $(date -u +%H:%M:%S) bench exit=$?" | tee -a /tmp/r3d/log
cat /tmp/r3d/bench.json | tee -a /tmp/r3d/log
