#!/bin/bash
# Same-session-window interleaved A/B bench: alternates full headline
# bench runs (incl. streaming) between two built checkouts, A-B-A-B-A-B,
# so machine drift is shared across both sides; per-run artifacts carry
# the canary + EnvProbe fingerprint (HEAD side) for normalization.
# Usage: tools/ab_bench.sh <classesA> <classesB> <outPrefix> [rounds]
set -e
A="$1"; B="$2"; OUT="$3"; ROUNDS="${4:-3}"
run() { # $1 classes dir, $2 out file
  CP="$1:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT="$2" \
  SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_ISOLATED=2 \
  java $(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
      java.util java.util.concurrent java.util.concurrent.atomic; do echo --add-opens java.base/$p=ALL-UNNAMED; done) \
    --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
    --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx16g \
    -cp "$CP" graft.Bench >/dev/null 2>&1
}
for i in $(seq 1 "$ROUNDS"); do
  echo "[ab] round $i side A"; run "$A" "${OUT}_A$i.json"
  echo "[ab] round $i side B"; run "$B" "${OUT}_B$i.json"
done
echo "[ab] done"
