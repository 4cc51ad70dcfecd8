#!/bin/bash
# Round-3c device session: the round-3b plan minus the already-measured
# stage-1 pieces, with the rep_rows compile fix in place.
# ONE process at a time (tunnel rule); stages ordered by information/cost.
# Usage: nohup bash scripts/r3c_device_session.sh > /tmp/r3cdev.log 2>&1 &
#        echo $! > /tmp/r3cdev.pid
set -x
cd "$(dirname "$0")/.."

# 0. Which replication formulations does the backend accept, and at what
#    cost? (writes results_mosaic_bisect.json; ~4 s/config)
python scripts/mosaic_bisect.py

# 1. Re-run the crashed conference A/Bs (updates results_r3b_sweep.json)
python scripts/r3c_sweep.py

# 1b. distill into tuned.json so auto dispatch uses the measured winner
python scripts/pick_tuned.py

# 2. LBVH binding-target probe, both emissions, both leaf profiles,
#    both chain protocols (unroll = the r3 chained-2.3x discriminator)
NTRACE_LBVH_EMIT=packed NTRACE_PROBE_ML=8  NTRACE_PROBE_SIZES=1000000 \
    python scripts/lbvh_build_probe.py
NTRACE_LBVH_EMIT=packed NTRACE_PROBE_ML=32 NTRACE_PROBE_SIZES=1000000 \
    python scripts/lbvh_build_probe.py
NTRACE_LBVH_EMIT=flat   NTRACE_PROBE_ML=8  NTRACE_PROBE_SIZES=1000000 \
    python scripts/lbvh_build_probe.py
NTRACE_PROBE_CHAIN=unroll NTRACE_LBVH_EMIT=packed NTRACE_PROBE_ML=8 \
    NTRACE_PROBE_SIZES=1000000 python scripts/lbvh_build_probe.py
NTRACE_PROBE_CHAIN=unroll NTRACE_LBVH_EMIT=packed NTRACE_PROBE_ML=32 \
    NTRACE_PROBE_SIZES=1000000 python scripts/lbvh_build_probe.py
# hairball-scale per-frame rebuild (BASELINE checklist: 2.9M tris)
NTRACE_LBVH_EMIT=packed NTRACE_PROBE_ML=32 NTRACE_PROBE_SIZES=2900000 \
    python scripts/lbvh_build_probe.py

# 3. Headline (protocol-identical to BENCH_r02)
python bench.py

# 4. Five-config matrix (longest; caches pre-warmed)
python scripts/benchmark_matrix.py

# 5. Incoherent modes: engines x compaction (VERDICT item 3)
ENGINE=packet       ROWS=16,8 COMPACT=on  python scripts/incoherent_sweep.py
ENGINE=packet       ROWS=16   COMPACT=off python scripts/incoherent_sweep.py
ENGINE=packet_bfs   ROWS=16,8 COMPACT=on  python scripts/incoherent_sweep.py
ENGINE=packet_dleaf ROWS=16,8 COMPACT=on  python scripts/incoherent_sweep.py
ENGINE=packet_bdl   ROWS=16,8 COMPACT=on  python scripts/incoherent_sweep.py
ENGINE=packet_bdl   ROWS=16   COMPACT=on MERGE=1 python scripts/incoherent_sweep.py
ENGINE=packet_bdl   ROWS=16   COMPACT=on MERGE=1 QGROUP=4 python scripts/incoherent_sweep.py

echo "R3C DEVICE SESSION DONE"
