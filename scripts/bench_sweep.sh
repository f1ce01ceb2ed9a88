#!/bin/bash
# Sequential bench sweep on the chip; one line of JSON per config.
set -u
cd /root/repo
for cfg in "sup " "hac " "hac 192" "hac 256"; do
  set -- $cfg
  m=$1; b=${2:-}
  echo "=== model=$m batch=${b:-default} ==="
  if [ -n "$b" ]; then
    BENCH_MODEL=$m BENCH_BATCH=$b timeout 1700 python bench.py
  else
    BENCH_MODEL=$m timeout 1700 python bench.py
  fi
done
echo SWEEPDONE
