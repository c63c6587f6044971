#!/bin/bash
# Calm-bench watcher (r10): repeatedly arm scripts/calm_capture.py —
# the ONE calm instrument (in-session min-of-3 multicore cal gate,
# bench chained immediately behind a passing probe) — until a capture
# lands at or under TARGET_MF, keeping the best candidate seen either
# way. The r9 ADVICE flagged that this watcher and calm_capture.py
# used different probe statistics (min-of-last-2 vs min-of-3) and
# different gates (2.45 vs 2.35); since r10 the watcher delegates the
# probe AND the gate to calm_capture.py, so captures are admitted by
# a single criterion. The r9 hunt showed calm windows are
# minute-scale flickers, hence fire-until-it-sticks rather than
# probe-then-hope.
#
# Usage: bash scripts/calm_bench_watch.sh  (run in background)
#   WATCH_BUDGET_SEC  total hunt budget (default 5h)
#   TARGET_MF         accept threshold   (default 1.05 — the r9
#                     verdict's true-calm bar)
#   GATE_CAL          calm_capture gate (default 2.35; tighten to
#                     ~2.25 when shallow flickers keep admitting
#                     mf-2 captures that burn 5 min each — the r10
#                     hunt's pattern)
# Output: /root/repo/bench_calm_candidate.json = best capture so far
# (by machine factor); exit 0 the moment one reads <= TARGET_MF.
set -u
cd /root/repo
DEADLINE=$(( $(date +%s) + ${WATCH_BUDGET_SEC:-18000} ))
TARGET_MF=${TARGET_MF:-1.05}
GATE_CAL=${GATE_CAL:-2.35}
# Seed BEST from the standing candidate so a fresh hunt can only
# improve it — a new watcher starting at 999 would clobber a prior
# hunt's better capture with its own first mediocre one.
BEST=$(python -c "
import json, sys
try:
    print(json.loads(open('bench_calm_candidate.json').readline())['machine_factor_vs_baseline'])
except Exception:
    print(999)
")
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 4000 python scripts/calm_capture.py /tmp/bench_calm.json "$GATE_CAL"; then
    MF=$(python -c "import json; print([json.loads(l)['machine_factor_vs_baseline'] for l in open('/tmp/bench_calm.json') if 'machine_factor_vs_baseline' in l][0])")
    # A capture that straddles a load transition can read a LOW mf
    # (the min-of-bracket cal catches the calm end) while its late
    # queries ran loaded — the bench's own regression gate flags
    # exactly those rows. regressions != {} means NOT a calm capture,
    # whatever the mf says; never promote one over a clean capture
    # (observed live: an mf-1.114 capture with two load-flagged rows
    # clobbering a clean mf-1.369 one).
    CLEAN=$(python -c "import json; print(0 if [json.loads(l)['regressions'] for l in open('/tmp/bench_calm.json') if 'machine_factor_vs_baseline' in l][0] else 1)")
    echo "$(date +%H:%M:%S) capture mf=$MF clean=$CLEAN (best so far $BEST)"
    if [ "$CLEAN" != "1" ]; then
      echo "$(date +%H:%M:%S) capture carries regression flags; discarded"
      sleep 60
      continue
    fi
    if python -c "import sys; sys.exit(0 if float('$MF') < float('$BEST') else 1)"; then
      BEST=$MF
      cp /tmp/bench_calm.json bench_calm_candidate.json
      echo "$(date +%H:%M:%S) new best candidate (mf=$MF)"
    fi
    # Flat-bracket condition (r10 lesson): mf normalizes by the MIN
    # of the start/end cal bracket, so a capture whose calm moment is
    # only its TAIL can pass TARGET_MF while its body ran contended
    # (observed: an accepted mf-1.049 capture with bracket 2.627/2.297
    # and raw total 1.254x, while a rejected mf-1.055 one had bracket
    # 2.309/2.358 and raw 1.057x). Acceptance — not best-so-far
    # tracking — additionally requires BOTH bracket readings within
    # TARGET_MF of the baseline cal, so the whole run is certified
    # calm, not just one end of it.
    FLAT=$(python -c "
import json
doc = [json.loads(l) for l in open('/tmp/bench_calm.json') if 'machine_factor_vs_baseline' in l][0]
base = json.JSONDecoder().raw_decode(open('bench_baseline.json').read())[0]['spark_cal_sec']
lim = base * float('$TARGET_MF')
print(1 if doc['spark_cal_start_sec'] <= lim and doc['spark_cal_end_sec'] <= lim else 0)
")
    if [ "$FLAT" = "1" ] && python -c "import sys; sys.exit(0 if float('$MF') <= float('$TARGET_MF') else 1)"; then
      echo "CALM CAPTURE ACCEPTED (machine_factor=$MF, flat bracket)"
      exit 0
    fi
  else
    echo "$(date +%H:%M:%S) calm_capture found no window in its budget; re-arming"
  fi
  sleep 60
done
echo "watcher deadline reached; best mf seen: $BEST"
exit 2
