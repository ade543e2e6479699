#!/bin/bash
# Run graft.Bench --child <query> in a forked JVM (the idle bench-child
# protocol). Usage: bench_child.sh <query> [sfdir]
# Child stderr goes to a log file (not /dev/null) and a missing marker
# line is reported as a FAILURE with the child's exit code — a crashed
# child must never read as a silent empty benchmark.
Q=$1
SF=${2:-/root/testdata/sf0.1}
# strip the trailing ':' or the JVM adds the cwd to the classpath
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':' | sed 's/:$//')"
ERRLOG=$(mktemp /tmp/bench_child_err.XXXXXX.log)
OUT=$(java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g \
  -cp "$CP" graft.Bench --child "$Q" "$SF" 2>"$ERRLOG")
RC=$?
LINE=$(printf '%s\n' "$OUT" | grep GRAFT_BENCH_CHILD)
if [ -z "$LINE" ]; then
  echo "bench child '$Q' FAILED rc=$RC (stderr: $ERRLOG)" >&2
  tail -5 "$ERRLOG" >&2
  exit 1
fi
rm -f "$ERRLOG"
echo "$LINE"
