#!/bin/bash
# Round-9 hardware campaign (see RUNBOOK_r9.md). Run when the tunnel is
# back:  bash experiments/round9_autorun.sh
# Logs to /tmp/r9/. Steps run sequentially; each gets its own timeout
# (expiry-SIGTERM only — never manual kills).
set -u
cd /root/repo
mkdir -p /tmp/r9
run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a /tmp/r9/autorun.log
  timeout "$@" > "/tmp/r9/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date))" | tee -a /tmp/r9/autorun.log
  tail -5 "/tmp/r9/$name.log" | tee -a /tmp/r9/autorun.log
}

# 1. settle (first-in-process measurements are garbage)
run settle 900 env BENCH_SMALL=1 python bench.py
# 2. record-film building blocks (DUS aliasing, global sort, resolve)
run recordfilm 2500 python experiments/round9_recordfilm.py
# 3. sort operand scaling + sorted-scatter hint
run sortprobe 2500 python experiments/round8_sortprobe.py
# 4. record film A/B + te re-sweep (the decision run)
run record_ab 3500 python experiments/round9_record_ab.py
# 5. dispatch-gap anatomy (xprof)
run gaps 2500 python experiments/round8_gaps.py
# 6. gather width scaling (attr f16 decision)
run gatherprobe 2500 python experiments/round8_gatherprobe.py
# 7. SBVH on the beams scene (tree quality where it should pay)
run sbvh_beams 3000 python experiments/round9_sbvh_beams.py

echo "=== campaign complete $(date)" | tee -a /tmp/r9/autorun.log
