#!/usr/bin/env bash
# One-command end-of-round release check: chains every gate the driver
# (and the judge) reads, in order, into a single artifact —
#   1. sbt test                       (all ScalaTest suites)
#   2. graft.Verify at sf0.001/0.01/0.1 + tools/selfcheck.py (DuckDB oracle)
#   3. SparkEntry.entry flagship smoke (rows > 0)
#   4. graft.Bench quiet pair (two back-to-back runs at the bench SF)
# Output: target/release_check/ with per-step logs plus SUMMARY.txt;
# exit code is non-zero if ANY step fails. A bench pair (not a single
# run) is emitted because SURVEY §8.0's ≥2-clean-runs rule applies to
# any perf conclusion — the summary prints both totals side by side.
#
# Usage: tools/release_check.sh [bench_sf_dir]   (default /root/testdata/sf0.1)
set -u
cd "$(dirname "$0")/.."
BENCH_SF="${1:-/root/testdata/sf0.1}"
OUT=target/release_check
rm -rf "$OUT"
mkdir -p "$OUT"
FAIL=0

note() { echo "[release] $*" | tee -a "$OUT/SUMMARY.txt"; }

step_test() {
  note "1/4 sbt test"
  if sbt -batch test >"$OUT/test.log" 2>&1; then
    grep -E "Tests: succeeded" "$OUT/test.log" | tail -1 | tee -a "$OUT/SUMMARY.txt"
  else
    note "FAIL: sbt test (see $OUT/test.log)"; FAIL=1
  fi
}

step_verify() {
  for sf in sf0.001 sf0.01 sf0.1; do
    note "2/4 verify $sf"
    rm -rf "$OUT/verify_$sf"
    if SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" sbt -batch \
        "runMain graft.Verify /root/testdata/$sf $PWD/$OUT/verify_$sf" \
        >"$OUT/verify_$sf.log" 2>&1; then
      if python3 tools/selfcheck.py "/root/testdata/$sf" "$OUT/verify_$sf" \
          >"$OUT/selfcheck_$sf.log" 2>&1; then
        tail -1 "$OUT/selfcheck_$sf.log" | sed "s/^/[$sf] /" | tee -a "$OUT/SUMMARY.txt"
        grep -q " 0 fail" "$OUT/selfcheck_$sf.log" || { note "FAIL: selfcheck $sf"; FAIL=1; }
      else
        note "FAIL: selfcheck $sf (see $OUT/selfcheck_$sf.log)"; FAIL=1
      fi
    else
      note "FAIL: verify $sf (see $OUT/verify_$sf.log)"; FAIL=1
    fi
  done
}

step_smoke() {
  note "3/4 entry smoke"
  cat > "$OUT/entry_smoke.sc" <<'EOF'
val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
println("ENTRY_ROWS=" + graft.SparkEntry.entry(spark).count())
sys.exit(0)
EOF
  /opt/spark/bin/spark-shell --master 'local[4]' \
      --driver-class-path target/scala-2.13/classes \
      --conf spark.ui.enabled=false \
      < "$OUT/entry_smoke.sc" > "$OUT/smoke.log" 2>/dev/null
  ROWS=$(grep -o 'ENTRY_ROWS=[0-9]*' "$OUT/smoke.log" | head -1 | cut -d= -f2)
  if [ -n "${ROWS:-}" ] && [ "$ROWS" -gt 0 ]; then
    note "entry smoke: $ROWS rows"
  else
    note "FAIL: entry smoke (see $OUT/smoke.log)"; FAIL=1
  fi
}

step_bench() {
  for i in 1 2; do
    note "4/4 bench run $i/2 ($BENCH_SF)"
    if SPARK_GRAFT_SF_DIR="$BENCH_SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
        sbt -batch "runMain graft.Bench" >"$OUT/bench_$i.log" 2>&1; then
      cp target/bench.json "$OUT/bench_$i.json"
      python3 - "$OUT/bench_$i.json" <<'EOF' | tee -a "$OUT/SUMMARY.txt"
import json, sys
b = json.load(open(sys.argv[1]))
print(f"[bench {sys.argv[1].split('_')[-1][0]}] total={b['value']}s rows={len(b['queries'])} errors={len(b.get('errors', {}))}")
EOF
      python3 -c "import json,sys; b=json.load(open('$OUT/bench_$i.json')); sys.exit(1 if b.get('errors') else 0)" \
        || { note "FAIL: bench run $i has errors"; FAIL=1; }
      # cert-metric trend gate (r16): the floored booleans only fail
      # on a cliff — diff the observed certs against the prior round's
      # recorded values and abort on any slide > 0.02 (direction-aware)
      if [ "$i" -eq 1 ]; then
        python3 tools/cert_trend.py "$OUT/bench_$i.json" > "$OUT/cert_trend.log" 2>&1
        CT=$?
        tee -a "$OUT/SUMMARY.txt" < "$OUT/cert_trend.log"
        [ "$CT" -eq 0 ] || { note "FAIL: cert trend (see table above)"; FAIL=1; }
      fi
    else
      note "FAIL: bench run $i (see $OUT/bench_$i.log)"; FAIL=1
    fi
  done
}

note "release check started $(date -u +%FT%TZ) at $(git rev-parse --short HEAD)"
step_test
step_verify
step_smoke
step_bench
note "release check finished $(date -u +%FT%TZ): $([ $FAIL -eq 0 ] && echo PASS || echo FAIL)"
exit $FAIL
