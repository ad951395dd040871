#!/bin/bash
# Interleaved 3-arm drain comparison: broadcast-gated fetch join vs
# forced co-partitioned shuffle join vs bucket-wise SPJ over the
# bucket(B, url_hash) store relayout. Fresh subprocess per run.
set -u
export PEGASUS_BENCH_MODE=crawl PEGASUS_BENCH_PASSES=1 PEGASUS_BENCH_PAGES=150000
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
out=${1:-/root/repo/BENCH/ab_drain3_raw.jsonl}
: > "$out"
for pass in 1 2; do
  for prof in drain_giant drain_giant_shuffle drain_giant_bucketed; do
    line=$(PEGASUS_BENCH_PROFILE=$prof python /root/repo/bench.py 2>/dev/null | grep '^{' | tail -1)
    echo "{\"pass\": $pass, \"profile\": \"$prof\", \"r\": $line}" >> "$out"
    echo "pass $pass $prof: $(echo "$line" | python -c 'import json,sys; d=json.load(sys.stdin); print(d["crawl_sec"], d["urls_fetched"])')"
  done
done
