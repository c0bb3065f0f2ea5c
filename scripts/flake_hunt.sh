#!/bin/bash
# Loop the multiwriter lose-nothing stress until it fails, saving output.
cd /root/repo
out=/tmp/flake_hunt
mkdir -p $out
for i in $(seq 1 "${1:-80}"); do
  if ! timeout 600 python -m pytest \
      "tests/test_hot_multiwriter.py::TestRowBatchWritesVsMaintenance::test_concurrent_writes_and_compaction_lose_nothing" \
      -q -x > "$out/run_$i.log" 2>&1; then
    echo "FAILED on iteration $i — log at $out/run_$i.log"
    exit 1
  fi
  rm -f "$out/run_$i.log"
  echo "iter $i ok"
done
echo "all ${1:-80} iterations green"
