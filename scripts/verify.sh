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
# set -e: capture rc without exiting so the gate-diff below still runs
python3 scripts/check.py "$SF" "$OUT" && CHECK_RC=0 || CHECK_RC=$?

# Gate-divergence alarm (round 14): round 13 closed with the builder
# claiming 129 green while the driver's CORRECTNESS artifact was `{}`,
# and nothing noticed until the judge diffed timestamps. On a FULL run
# (no filter), refuse to claim green when the newest driver artifact
# recorded nothing: local green + empty driver gate = the claim is
# self-reported, and the round docs must say so.
if [ $CHECK_RC -eq 0 ] && [ -z "${2:-}" ]; then
  LATEST=$(ls CORRECTNESS_r*.json 2>/dev/null | sort -V | tail -1)
  if [ -n "$LATEST" ] && [ "$(python3 -c "import json;print(len(json.load(open('$LATEST'))))")" = "0" ]; then
    echo ""
    echo "GATE DIVERGENCE: local check is green but the driver's last"
    echo "artifact ($LATEST) recorded ZERO queries. The driver gate did"
    echo "not see this state — do not claim driver-verified green."
    echo "(export GRAFT_ALLOW_GATE_DIVERGENCE=1 to override locally.)"
    [ -z "${GRAFT_ALLOW_GATE_DIVERGENCE:-}" ] && exit 2
  fi
  # Per-query set diff vs the driver's last artifact (round 15): the
  # zero-count alarm above catches a WIPED artifact; this catches a
  # SHRUNK one. Driver-graded-but-gone-locally = a registration
  # silently dropped or renamed (the q39 failure mode) — hard stop.
  # Local-but-not-driver-graded = expected for queries added since
  # the artifact was written — informational only.
  # names.json is written by every current Verify run, but guard its
  # presence anyway: a dump from an older build lacks it and the
  # heredoc would die on FileNotFoundError — a spurious gate
  # divergence, not a real one (round-15 ADVICE)
  if [ -n "$LATEST" ] && [ -f "$OUT/names.json" ]; then
    python3 - "$LATEST" "$OUT/names.json" <<'PYEOF' || { [ -z "${GRAFT_ALLOW_GATE_DIVERGENCE:-}" ] && exit 2; }
import json, sys
driver = set(json.load(open(sys.argv[1])))
local = set(json.load(open(sys.argv[2])))
new = sorted(local - driver)
gone = sorted(driver - local)
if new:
    print(f"note: {len(new)} local queries not yet in the driver's "
          f"last artifact (added since {sys.argv[1]}): {new}")
if gone:
    print(f"\nGATE DIVERGENCE: {len(gone)} queries the driver graded "
          f"in {sys.argv[1]} are MISSING from the local registry: "
          f"{gone}\n(dropped or renamed registration — if deliberate, "
          "export GRAFT_ALLOW_GATE_DIVERGENCE=1)")
    sys.exit(1)
PYEOF
  fi
fi
exit $CHECK_RC
