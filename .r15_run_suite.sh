#!/bin/bash
cd /root/repo
SPARK_GRAFT_BENCH_COLD=1 SPARK_GRAFT_SF_DIR=$1 \
  SPARK_GRAFT_BENCH_SUMMARY=$2 SPARK_GRAFT_BENCH_DETAIL=$3 \
  SPARK_GRAFT_BENCH_FORCE=${4:-0} timeout 5000 python bench.py
v=$(python3 -c "import json; print(json.load(open('$2'))['box_state']['steal_gate'])" 2>/dev/null || echo missing)
echo "VERDICT: $v"
if [ "$v" = "exceeded" ]; then
  mv "$2" "${2%.json}_steal_exceeded.json"
  mv "$3" "${3%.json}_steal_exceeded.json"
fi
