#!/bin/bash
# One bench session, BOTH recipes, so regression triage never needs the
# per-round recipe-reconciliation caveat again (round-14 verdict item 7):
#   1. driver-comparable row: iters=1 under sbt, exactly how the driver
#      produces BENCH_r{N}.json (JVM flags from build.sbt's fork settings,
#      sbt runMain, local[32]) -> BENCH_driver_recipe_r{N}.json
#   2. builder artifact: plain-java min-of-2 (steady-state per-key truth
#      on a noisy box) -> BENCH_full_r{N}.json
# Usage: tools/bench_both.sh <roundN> [sfDir]
set -eu
N="$1"
SFDIR="${2:-/root/testdata/sf0.1}"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

echo "== driver recipe (sbt, iters=1, local[32]) -> BENCH_driver_recipe_r${N}.json"
SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_ITERS=1 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sbt_r"$N".log 2>&1 || {
    echo "sbt bench FAILED (see /tmp/bench_sbt_r$N.log)"; exit 1; }
cp target/bench_last.json "BENCH_driver_recipe_r${N}.json"

echo "== builder recipe (plain java, min-of-2, local[32]) -> BENCH_full_r${N}.json"
SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_ITERS=2 \
  java -Xmx48g $AO -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
  > /tmp/bench_java_r"$N".log 2>&1 || {
    echo "java bench FAILED (see /tmp/bench_java_r$N.log)"; exit 1; }
cp target/bench_last.json "BENCH_full_r${N}.json"

python3 - "$N" <<'EOF'
import json, sys
n = sys.argv[1]
a = json.load(open(f"BENCH_driver_recipe_r{n}.json"))
b = json.load(open(f"BENCH_full_r{n}.json"))
ka, kb = a["queries"], b["queries"]
print(f"driver-recipe total {a['value']:.1f}s / {len(ka)} keys; "
      f"builder min-of-2 total {b['value']:.1f}s / {len(kb)} keys")
drift = sorted(((k, ka[k], kb.get(k)) for k in ka if kb.get(k)),
               key=lambda t: -(t[1] - t[2]))[:8]
print("largest driver-vs-builder per-key deltas (warm-min vs one-shot):")
for k, x, y in drift:
    print(f"  {k}: {x:.2f} vs {y:.2f} (+{x-y:.2f})")
EOF
