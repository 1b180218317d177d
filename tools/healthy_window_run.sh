#!/bin/bash
# Health-gated measurement runner.
#
# The sandbox VM's first-touch page-fault throughput flaps >100x on a minutes
# timescale (see BENCH/BASELINE.md "Host windows"); absolute bench numbers
# taken in a degraded window measure the window, not the code. This runner
# WAITS for a sustained healthy window (5 consecutive fresh-process
# first-touch probes >= 2000 MB/s, ~3 minutes) and only then runs, in order,
# with the box otherwise idle:
#   1. bench.py at sf0.1 (absolute query numbers in a healthy window)
#   2. tools/cluster_scaling_bench.py at 1M docs, 1 vs 4 single-core
#      executors (the north-rule N->4N executor criterion; the bench's own
#      in-flight ArmProber still gates each pair)
#
# Each probe runs in a FRESH python: repeated probes in one process reuse the
# allocator's already-faulted arena and read 100-500x too healthy (measured).
#
# Prereqs: CORES_PER_WORKER=1 tools/start_cluster.sh
cd "$(dirname "$0")/.." || exit 1
probe() { python -c "
import statistics, subprocess
code='import sys; sys.path.insert(0,\"$PWD\"); from tools.scaling_bench import host_fault_mbps; print(host_fault_mbps(100))'
v=[float(subprocess.run(['python','-c',code],capture_output=True,text=True).stdout) for _ in range(3)]
print(statistics.median(v))"
}
echo "$(date +%T) waiting for sustained healthy window (5 consecutive first-touch medians >= 2000 MB/s)..."
streak=0
while [ $streak -lt 5 ]; do
  m=$(probe)
  ok=$(python -c "print(1 if float('$m')>=2000 else 0)")
  if [ "$ok" = "1" ]; then streak=$((streak+1)); else streak=0; fi
  echo "$(date +%T) fault_mbps=$m streak=$streak"
  sleep 30
done
echo "$(date +%T) window healthy — running bench.py"
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  python bench.py > /tmp/bench_healthy.json 2>/tmp/bench_healthy.err
echo "$(date +%T) bench.py rc=$? — starting cluster bench"
CLUSTER_CORES_PER_EXECUTOR=1 python tools/cluster_scaling_bench.py --docs "${CLUSTER_DOCS:-1000000}" --pairs "${CLUSTER_PAIRS:-2}"
echo "$(date +%T) cluster bench rc=$?"
