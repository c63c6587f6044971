#!/bin/bash
# Calm-bench watcher (r9): poll for a calm multicore phase, then fire
# one full bench capture. The machine shows host-level multicore
# throttle phases (single-thread spin calm while the 64-task
# calibration job runs 2-14x slower); only a capture whose own
# recorded machine_factor is ~1 may refresh baseline rows, so this
# watcher probes cheaply and only pays the full bench when a probe
# says the phase is calm.
#
# Usage: bash scripts/calm_bench_watch.sh  (run in background)
# Output: /root/repo/bench_calm_candidate.json on success + watcher log lines.
set -u
cd /root/repo
DEADLINE=$(( $(date +%s) + 18000 ))   # give up after 5h
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  LOAD=$(cut -d' ' -f1 /proc/loadavg)
  if python -c "import sys; sys.exit(0 if float('$LOAD') < 1.0 else 1)"; then
    CAL=$(timeout 300 python - <<'EOF'
import sys, time
sys.path.insert(0, '.')
from indexr_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark()
runs = []
for _ in range(3):
    t0 = time.time()
    spark.range(50_000_000).repartition(64).agg(F.sum("id")).collect()
    runs.append(time.time() - t0)
print(round(min(runs[1:]), 3))
EOF
)
    CAL=$(echo "$CAL" | tail -1)
    echo "$(date +%H:%M:%S) probe cal=$CAL load=$LOAD"
    # baseline cal is 2.189; accept <= 2.45 (factor ~1.12)
    if python -c "import sys; sys.exit(0 if 0 < float('$CAL' or 0) <= 2.45 else 1)" 2>/dev/null; then
      echo "$(date +%H:%M:%S) CALM PHASE — running full bench"
      timeout 3600 python bench.py > /tmp/calm_bench_stdout.txt 2>&1
      MF=$(python -c "import json; print(json.load(open('bench_out.json'))['machine_factor_vs_baseline'])")
      cp bench_out.json "bench_calm_candidate.json"
      echo "$(date +%H:%M:%S) capture done machine_factor=$MF"
      if python -c "import sys; sys.exit(0 if float('$MF') <= 1.15 else 1)"; then
        echo "CALM CAPTURE ACCEPTED (machine_factor=$MF)"
        exit 0
      fi
      echo "capture not calm enough (mf=$MF), continuing watch"
    fi
  else
    echo "$(date +%H:%M:%S) busy load=$LOAD, skipping probe"
  fi
  sleep 600
done
echo "watcher deadline reached without a calm capture"
exit 2
