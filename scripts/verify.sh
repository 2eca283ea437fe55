#!/bin/bash
# Fast local verify loop: compile once via sbt, then run Verify with
# plain java against /opt/spark/jars, then diff against DuckDB oracles.
# Usage: scripts/verify.sh [sfDir] [filter-substring]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=target/verify_out
# narrow both Verify and check.py to names containing $2 (they honor
# the same env var), e.g. `scripts/verify.sh /root/testdata/sf0.01 bpe`
if [ -n "${2:-}" ]; then export SPARK_GRAFT_VERIFY_ONLY="$2"; fi
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED \
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
--add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
rm -rf "$OUT"
java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT" 2>&1 | grep -v '^2[0-9]\{3\}-' || true
python3 scripts/check.py "$SF" "$OUT"
