#!/usr/bin/env bash
# Round-N eight-axis robustness battery (SURVEY.md §5.7). Regenerates the
# four perturbed fixtures from the CURRENT /root/testdata, then runs the
# full oracle differential on every axis:
#   1. ROBUST   (3x FK-consistent size)        driver_sim --sf-dir /tmp/pmr_robust
#   2. SKEW     (hot keys / dup cluster)       driver_sim --sf-dir /tmp/pmr_skew
#   3. CHARSET  (multi-byte + NFD text)        driver_sim --sf-dir /tmp/pmr_unicode
#   4. TEMPORAL (32x compressed clock)         driver_sim --sf-dir /tmp/pmr_temporal
#   5. sf0.001  (single-member groups)         driver_sim --sf-dir /root/testdata/sf0.001
#   6. tuned    (committed fixture, sf0.01)    driver_sim
#   7. default session, UTC                    default_session_sweep
#   8. default session, Asia/Tokyo             TZ=Asia/Tokyo default_session_sweep
# Each run prints "problems: 0" / "BAD=[]" when green. ~30 min total.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/axis_battery}
mkdir -p "$OUT"

for g in robust skew unicode temporal; do
  python "tools/gen_${g}_fixture.py" > "$OUT/gen_${g}.log" 2>&1 \
    || { echo "FIXTURE GEN FAILED: $g"; exit 1; }
done
echo "fixtures regenerated"

fail=0
run() { # name, command...
  local name=$1 rc; shift
  echo "=== axis: $name"
  "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  fail=$((fail + rc))
  echo "exit=$rc $(grep -E 'problems: [0-9]+|BAD=\[' "$OUT/$name.log" | tail -1)"
}

run robust    python tools/driver_sim.py --sf-dir /tmp/pmr_robust
run skew      python tools/driver_sim.py --sf-dir /tmp/pmr_skew
run charset   python tools/driver_sim.py --sf-dir /tmp/pmr_unicode
run temporal  python tools/driver_sim.py --sf-dir /tmp/pmr_temporal
run sf0001    python tools/driver_sim.py --sf-dir /root/testdata/sf0.001
run tuned     python tools/driver_sim.py
run def_utc   python tools/default_session_sweep.py
run def_tokyo env TZ=Asia/Tokyo python tools/default_session_sweep.py
echo "battery complete; logs in $OUT; failed-axis exit sum=$fail"
exit $((fail > 0 ? 1 : 0))
