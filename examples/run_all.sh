#!/bin/sh
set -e
cd "$(dirname "$0")"
for f in 01_basic_filtering.py 02_aggregations_windows.py \
         03_joins_federation.py 06_ddl_inserts.py 07_pipeline.py 08_streaming.py \
         09_clickhouse_dialect.py 10_remote_federation.py; do
    echo "== $f =="
    python "$f"
done
