#!/usr/bin/env bash
# Package the engine and submit the staged KG build to a cluster.
#
#   tools/submit.sh [spark-submit args...] -- [run.py args...]
#
# e.g. tools/submit.sh --master yarn --num-executors 32 -- \
#        --n-docs 1000000 --warehouse hdfs:///kg/warehouse
#
# The job ships as --py-files per the north rule; with the Iceberg runtime
# jar on the executors' classpath the snapshot catalog binds to Iceberg
# tables (see mmkg_rag_spark/session.py).
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/mmkg_rag_spark.zip
rm -f "$ZIP"
zip -qr "$ZIP" mmkg_rag_spark -x '*__pycache__*'

SUBMIT_ARGS=()
RUN_ARGS=()
seen_sep=0
for a in "$@"; do
  if [[ "$a" == "--" ]]; then seen_sep=1; continue; fi
  if [[ $seen_sep == 0 ]]; then SUBMIT_ARGS+=("$a"); else RUN_ARGS+=("$a"); fi
done

exec spark-submit \
  --py-files "$ZIP" \
  "${SUBMIT_ARGS[@]}" \
  mmkg_rag_spark/run.py "${RUN_ARGS[@]}"
