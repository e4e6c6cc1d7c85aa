#!/usr/bin/env bash
# Per-face isolated bench: one FRESH JVM per face (SPARK_GRAFT_ONLY),
# so each number is free of cross-face heap/JIT/cache effects. This is
# the canonical per-face signal — when a driver full-run number
# disagrees with this by >1.5x, the full-run number is machine noise
# (r11 verdict: driver-run doc-family faces inflated 2-5x vs isolated).
#
# Usage: tools/bench_isolated.sh [sfDir] [face ...]
#   sfDir defaults to /root/testdata/sf0.1; with no faces listed, runs
#   every face. Writes target/bench_isolated.json:
#     {"sf":...,"cpus":N,"queries":{face:sec,...}}
# Env: SPARK_GRAFT_CPUS (default 32), SPARK_DRIVER_MEM (default 8g).
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.1}"
[ $# -gt 0 ] && shift
CPUS="${SPARK_GRAFT_CPUS:-32}"
MEM="${SPARK_DRIVER_MEM:-8g}"

sbt -batch compile >/dev/null

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | paste -sd:)"
# mirror build.sbt's jdk17AddOpens (SparkSession outside spark-submit)
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
JAVA_CMD=(java $OPENS -Xmx"$MEM" -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP")

if [ $# -gt 0 ]; then
  FACES=("$@")
else
  mapfile -t FACES < <(SPARK_GRAFT_LIST=1 "${JAVA_CMD[@]}" graft.Bench)
fi

OUT=target/bench_isolated.json
TMP=$(mktemp)
echo "{}" > "$TMP"
for f in "${FACES[@]}"; do
  t0=$(date +%s)
  # Bench tolerates a failed bench.json write (exit 0) — delete the
  # previous face's file first and fall back to -1 if extraction fails,
  # so a stale value can never be recorded under the wrong face
  rm -f target/bench.json
  if SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_ONLY="$f" \
      "${JAVA_CMD[@]}" graft.Bench >/dev/null 2>&1; then
    sec=$(python3 -c "import json;print(json.load(open('target/bench.json'))['queries']['$f'])") || sec=-1
  else
    sec=-1
  fi
  echo "$f $sec ($(($(date +%s)-t0))s wall)" >&2
  # fold into the output file AFTER EVERY FACE, so an interrupted
  # sweep still leaves a valid (partial) artifact
  python3 - "$TMP" "$f" "$sec" "$SF" "$CPUS" "$OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
d[sys.argv[2]] = float(sys.argv[3])
json.dump(d, open(sys.argv[1], "w"))
json.dump({"sf": sys.argv[4], "cpus": int(sys.argv[5]),
           "queries": dict(sorted(d.items()))},
          open(sys.argv[6], "w"), indent=1)
EOF
done
rm -f "$TMP"
echo "wrote $OUT (${#FACES[@]} faces)" >&2
