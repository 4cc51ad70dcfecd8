#!/bin/bash
# Round-3 device session: run once the axon tunnel is back.
# ONE process at a time (tunnel rule); stages ordered by information/cost.
# Usage: nohup bash scripts/r3_device_session.sh > /tmp/r3dev.log 2>&1 &
#        echo $! > /tmp/r3dev.pid
set -x
cd "$(dirname "$0")/.."

# 1. Microprobes + conference A/Bs + LBVH anomaly (cheapest, most load-bearing)
python scripts/r3b_sweep.py

# 1b. distill the sweep into tuned.json so auto dispatch (bench.py,
#     matrix) uses the measured-fastest kernel config
python scripts/pick_tuned.py

# 2. LBVH binding-target probe, both emissions, both leaf profiles,
#    both chain protocols (fori default; unroll = same dependency chain
#    without the while-loop construct, the r3 anomaly discriminator)
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
# hairball-scale per-frame rebuild (BASELINE checklist: per-frame LBVH
# rebuild at 2.9M tris)
NTRACE_LBVH_EMIT=packed NTRACE_PROBE_ML=32 NTRACE_PROBE_SIZES=2900000 \
    python scripts/lbvh_build_probe.py

# 3. Headline (protocol-identical to BENCH_r02)
python bench.py

# 4. Five-config matrix (longest; caches pre-warmed)
python scripts/benchmark_matrix.py

# 5. Incoherent modes: packet vs BFS engines (fairy diffuse/ao),
#    and live-ray compaction on vs off (VERDICT item 3)
ENGINE=packet       ROWS=16,8 COMPACT=on  python scripts/incoherent_sweep.py
ENGINE=packet       ROWS=16   COMPACT=off python scripts/incoherent_sweep.py
ENGINE=packet_bfs   ROWS=16,8 COMPACT=on  python scripts/incoherent_sweep.py
# deferred-leaf: per-row leaf grouping should pay MOST on divergent rays
ENGINE=packet_dleaf ROWS=16,8 COMPACT=on  python scripts/incoherent_sweep.py
ENGINE=packet_bdl   ROWS=16,8 COMPACT=on  python scripts/incoherent_sweep.py
ENGINE=packet_bdl   ROWS=16   COMPACT=on MERGE=1 python scripts/incoherent_sweep.py
# grouped run queues: enqueue-chain / qgroup on the divergent workloads
ENGINE=packet_bdl   ROWS=16   COMPACT=on MERGE=1 QGROUP=4 python scripts/incoherent_sweep.py

echo "R3 DEVICE SESSION DONE"
