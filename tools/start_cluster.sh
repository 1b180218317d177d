#!/bin/bash
# Start a local Spark standalone cluster: 1 master + 4 workers (4 cores / 16g
# each, tmpfs shuffle dirs). Used by tools/cluster_scaling_bench.py to measure
# N vs 4N EXECUTOR scaling (1 vs 4 worker JVMs) as the north rule specifies.
#
# 4 cores per worker ON PURPOSE: the box's 32 vCPUs are ~16 physical cores x
# 2 SMT threads (measured, see tools/scaling_bench.py hw_cpu_scaling), so
# 4 workers x 4c = 16 threads is the largest 4N arm that still adds physical
# cores rather than hyperthread contention — which is what adding EXECUTORS
# does on a real cluster.
set -e
export SPARK_LOCAL_IP=127.0.0.1
export SPARK_MASTER_HOST=127.0.0.1
SPARK_HOME=${SPARK_HOME:-/opt/spark}
CORES_PER_WORKER=${CORES_PER_WORKER:-4}
MEM_PER_WORKER=${MEM_PER_WORKER:-16g}

"$SPARK_HOME/sbin/start-master.sh" --host 127.0.0.1 --port 7077 --webui-port 8090 || true
sleep 3
for i in 1 2 3 4; do
  SPARK_IDENT_STRING=w$i \
  SPARK_LOCAL_DIRS=/dev/shm/spark-local-w$i \
  SPARK_WORKER_DIR=/dev/shm/spark-worker-$i \
  "$SPARK_HOME/sbin/start-worker.sh" spark://127.0.0.1:7077 \
      -c "$CORES_PER_WORKER" -m "$MEM_PER_WORKER" -h 127.0.0.1 -p $((7200+i)) --webui-port $((8190+i)) || true
done
sleep 5
grep -hc "Registering worker" "$SPARK_HOME"/logs/*Master*.out || true
