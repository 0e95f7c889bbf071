#!/usr/bin/env bash
# The full correctness-audit sweep in one command: the DuckDB oracle
# compare at every shipped SF, plus the partition-invariance legs
# (varied shuffle partitions / scan splits) at sf0.01. Every leg must
# end "== N ok, 0 bad ==" with the same N (the declared-query count).
#
# Usage: tools/audit_all.sh [outBase]   (default /tmp/graft_audit)
#
# Runs OUTSIDE sbt (frees the console; see the verify skill notes).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-/tmp/graft_audit}"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
OPTS="--add-opens=java.base/java.lang=ALL-UNNAMED \
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
--add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED \
--add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
--add-opens=java.base/sun.security.action=ALL-UNNAMED"

leg() { # name sfDir [env assignments...]
  local name="$1" sf="$2"; shift 2
  echo "=== $name ==="
  env "$@" java -Xmx32g -cp "$CP" $OPTS graft.Verify "$sf" "$OUT/$name" \
    >/dev/null 2>&1
  python3 "$REPO/tools/check_oracle.py" "$sf" "$OUT/$name" 2>&1 | tail -1
}

# cross-SF legs (the de-pinned gates dispatch on the events row count)
leg sf0.001 /root/testdata/sf0.001
leg sf0.01  /root/testdata/sf0.01
leg sf0.1   /root/testdata/sf0.1
# partition-invariance legs at sf0.01: odd small layout, then many
# tiny scan splits (map-side order churn) — a hash that moves here
# would break on a differently-sized cluster
leg part7   /root/testdata/sf0.01 SPARK_GRAFT_CPUS=7
leg split256k /root/testdata/sf0.01 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_CONF="spark.sql.files.maxPartitionBytes=262144"
