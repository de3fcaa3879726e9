#!/bin/bash
# Sharded graft.Verify: run the driver contract's queries across N
# concurrent JVMs (round-robin by sorted name), skipping names whose
# output dir already exists with a _SUCCESS marker. Queries are
# independent (each writes its own <out>/<name> dir; no shared catalog
# state), so sharding is safe — this exists because a serial 281-query
# sweep at sf10 is planner/floor-bound, not core-bound, and 4 JVMs of
# local[8] overlap those floors.
# Usage: verify_sharded.sh <sf_dir> <out_dir> [shards] [cpus_per] [mem]
set -u
SF=$1; OUT=$2; SHARDS=${3:-4}; CPUS=${4:-8}; MEM=${5:-22g}
REPO=$(cd "$(dirname "$0")/.." && pwd)
CP="$REPO/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | paste -sd:)"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

mkdir -p "$OUT"
# names = every contract query, minus ones already completed in OUT
NAMES=$(SPARK_GRAFT_CPUS=2 java -Xmx2g $OPENS -Dspark.ui.enabled=false -cp "$CP" graft.tools.ListQueries 2>/dev/null)
if [ -z "$NAMES" ]; then echo "no names from ListQueries" >&2; exit 1; fi
TODO=()
for n in $NAMES; do
  [ -f "$OUT/$n/_SUCCESS" ] || TODO+=("$n")
done
echo "${#TODO[@]} queries to run across $SHARDS shards"

PIDS=()
for ((s=0; s<SHARDS; s++)); do
  SHARD_NAMES=()
  for ((i=s; i<${#TODO[@]}; i+=SHARDS)); do SHARD_NAMES+=("${TODO[$i]}"); done
  [ ${#SHARD_NAMES[@]} -eq 0 ] && continue
  SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_CHECKPOINT_DIR=/tmp/ckpt_shard_$s \
    java -Xmx$MEM $OPENS -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -cp "$CP" \
      graft.Verify "$SF" "$OUT" "${SHARD_NAMES[@]}" \
      > /tmp/verify_shard_$s.log 2>&1 &
  PIDS+=($!)
done
RC=0
for p in "${PIDS[@]}"; do wait "$p" || RC=1; done
grep -h "\[verify\]" /tmp/verify_shard_*.log || true
echo "SHARDED_VERIFY_DONE_$RC"
exit $RC
