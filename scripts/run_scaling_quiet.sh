#!/bin/bash
# Quiet-window scaling harness: the sandbox host is time-shared, and a
# scaling pair measured while ANY other Spark work runs (even the
# builder's own pytest/crosscheck) is garbage — a contaminated x128
# pair in round 5 measured eff 0.378 with 1,932s of 4N GC purely from
# foreground jobs. This gates each pair on 1-min load < 5, waiting up
# to 20 minutes.
wait_quiet() {
  for i in $(seq 1 20); do
    L=$(awk '{print int($1)}' /proc/loadavg)
    [ "$L" -lt 5 ] && return 0
    sleep 60
  done
}
cd "$(dirname "$0")/.."
wait_quiet
python scripts/cluster_bench.py /root/testdata/sf0.1 --factor=128 --runs=2 --cores=4 >/tmp/cb128.json 2>/tmp/cb128.err
wait_quiet
python scripts/cluster_bench.py /root/testdata/sf0.1 --factor=256 --runs=2 --cores=4 --interleave=2 >/tmp/cb256.json 2>/tmp/cb256.err
