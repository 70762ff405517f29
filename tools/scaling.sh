#!/bin/bash
# Scaling-efficiency evidence (north rule: >= 0.8 from N to 4N executors).
# No real cluster in this sandbox -> identical job at local[N] vs local[4N]
# (BASELINE.md methodology). Each level runs in a FRESH JVM: reusing one JVM
# across SparkSession stop/rebuild skews the second level badly. Reps within
# a JVM reach steady state (rep 1 pays JIT+codegen+cache warm-up); we report
# best-of-reps per level.
#
# Usage: tools/scaling.sh [N=8] [CONVS=2000000] [REPS=5]
set -e
cd "$(dirname "$0")/.."
N=${1:-8}; CONVS=${2:-2000000}; REPS=${3:-5}
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

run_level() {
  SPARK_GRAFT_TPS_ONLY=1 SPARK_GRAFT_BENCH_CONVS=$CONVS SPARK_GRAFT_BENCH_REPS=$REPS SPARK_GRAFT_CPUS=$1 \
  java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx${SPARK_DRIVER_MEM:-48g} \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench 2>/dev/null | grep turns_per_sec
}

A=$(run_level $N)
B=$(run_level $((4 * N)))
python3 - "$A" "$B" "$N" <<'EOF'
import json, sys
a, b, n = json.loads(sys.argv[1]), json.loads(sys.argv[2]), int(sys.argv[3])
eff = (b["value"] / a["value"]) / 4.0
print(json.dumps({"metric": "scaling_efficiency", "turns": a["turns"], "n_cores": n,
                  "turns_per_sec_n": a["value"], "turns_per_sec_4n": b["value"],
                  "all_n": a["all"], "all_4n": b["all"], "efficiency": round(eff, 4)}))
EOF
