#!/usr/bin/env bash
# Drift-robust N vs 4N scaling measurement (BENCH/BASELINE.md).
#
# This VM shares its host, so effective CPU drifts over tens of minutes;
# a local[8] run taken half an hour after a local[32] run is not
# comparable. Strategy:
#   1. prepare the candidate-pair table ONCE (parquet on local disk);
#   2. interleave the parallelism levels back-to-back, several rounds:
#      8, 32, 8, 32, ...  (each JVM starts in seconds — no corpus gen);
#   3. report the per-level BEST, so a stolen-CPU window inflates a
#      sample, never the level's final number.
#
# Usage: tools/scaling_curve.sh [rounds] [levels...]   (defaults: 3, "2 8 4 16 8 32")
set -euo pipefail
cd "$(dirname "$0")/.."

ROUNDS="${1:-3}"; shift || true
LEVELS=("${@:-}")
if [ -z "${LEVELS[*]:-}" ]; then LEVELS=(2 8 4 16 8 32); fi
PAIRS_DIR="${PAIRS_DIR:-/tmp/graft_scaling_pairs}"
JAR=target/scala-2.13/polarsstrsimspark_2.13-0.1.0.jar
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
MEM="${SPARK_DRIVER_MEM:-16g}"
# Throughput-batch GC: the measured region allocates UTF8Strings at a rate
# proportional to parallelism, and G1's pause pattern taxes the 32-thread
# runs ~8% harder than the 8-thread runs (measured session 12: 32-level
# 7.3-7.4s G1 -> 6.8s ParallelGC; 8-level 23.7 -> 22.0). ParallelGC is the
# classic Spark-batch choice; applied identically to EVERY level.
GC_OPTS="${SPARK_GC_OPTS:--XX:+UseParallelGC}"

run_bench() { # $1 = args to ScalingBench
  # Record hypervisor steal around the sample: this VM shares its host, and
  # a contended window can steal >25% of cycles — which reads as fake
  # scaling loss at the widest parallelism (it saturates all 32 vCPUs,
  # while a local[8] run hides in the idle 24). steal_pct = stolen ticks /
  # (nproc * 100 ticks/sec * wall) over the whole JVM (startup+warmup+
  # measured), a per-sample noise gauge for choosing the reporting window.
  local s0 t0 s1 t1
  s0=$(awk '/^cpu /{print $9}' /proc/stat); t0=$(date +%s%N)
  # shellcheck disable=SC2086
  java $ADD_OPENS $GC_OPTS -Xmx"$MEM" -Dspark.ui.enabled=false \
    -cp "$JAR:/opt/spark/jars/*" graft.ScalingBench $1 2>/dev/null | grep '^{' > /tmp/.sb_out
  s1=$(awk '/^cpu /{print $9}' /proc/stat); t1=$(date +%s%N)
  python3 - "$s0" "$s1" "$t0" "$t1" <<'PYEOF'
import json, sys, os
line = open("/tmp/.sb_out").read().strip()
if line:
    d = json.loads(line)
    s0, s1, t0, t1 = (int(x) for x in sys.argv[1:5])
    wall = (t1 - t0) / 1e9
    d["host_steal_pct"] = round(100.0 * (s1 - s0) / (os.cpu_count() * 100.0 * wall), 1)
    print(json.dumps(d))
PYEOF
}

sbt -batch package >/dev/null

if [ ! -d "$PAIRS_DIR" ]; then
  echo "# preparing candidate pairs → $PAIRS_DIR" >&2
  run_bench "prepare $PAIRS_DIR ${PAGES:-250000}"
fi

OUT="${OUT:-/tmp/scaling_samples.jsonl}"
: > "$OUT"
for r in $(seq 1 "$ROUNDS"); do
  for n in "${LEVELS[@]}"; do
    echo "# round $r local[$n]" >&2
    run_bench "$n $PAIRS_DIR" | tee -a "$OUT"
  done
done

python3 - "$OUT" <<'EOF'
import json, sys, collections
best = collections.defaultdict(lambda: 1e18)
pps = {}
for line in open(sys.argv[1]):
    d = json.loads(line)
    if d["sec"] < best[d["cpus"]]:
        best[d["cpus"]] = d["sec"]; pps[d["cpus"]] = d["pairs_per_sec"]
print("\n| parallelism | best sec | pairs/sec |")
print("|---|---|---|")
for n in sorted(best):
    print(f"| local[{n}] | {best[n]:.2f} | {pps[n]/1e6:.2f}M |")
print("\n| N -> 4N | efficiency (T_N/T_4N)/4 |")
print("|---|---|")
for n in sorted(best):
    if 4*n in best:
        print(f"| {n} -> {4*n} | {best[n]/best[4*n]/4:.2f} |")
EOF
