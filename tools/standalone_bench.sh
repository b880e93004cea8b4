#!/usr/bin/env bash
# Standalone-cluster scaling evidence (r4 VERDICT #6): the same crawl epoch
# through REAL multi-process executors with network shuffle + serialization
# on this box — the closest sandbox analog of "spark-submit to a cluster at
# N and 4N executors" that actually crosses process boundaries (local[N]
# never pays executor RPC, shuffle-file IO, or Arrow-over-socket).
#
# Topology: 1 master + 2 workers x 8 cores. Executor size fixed at 2 cores,
# so the N->4N pair is a true EXECUTOR-COUNT pair: 2 executors (4 cores)
# vs 8 executors (16 cores), same input bytes.
#
# Usage: tools/standalone_bench.sh [batch_size=120000]
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_HOME=/opt/spark
MASTER_URL=spark://127.0.0.1:7077
BATCH="${1:-120000}"
SEEDS=/tmp/spark_graft_bench_seeds_250k.parquet
[ -e "$SEEDS" ] || python -c "from etherscan_contract_crawler_spark.sources.synthetic import gen_seed_parquet; gen_seed_parquet('$SEEDS', 250_000, n_domains=8_000)"

cleanup() {
  SPARK_WORKER_INSTANCES=2 "$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1 || true
  "$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1 || true
  pkill -f 'org.apache.spark.deploy.worker.Worker' 2>/dev/null || true
  pkill -f 'org.apache.spark.deploy.master.Master' 2>/dev/null || true
}
trap cleanup EXIT
cleanup  # clear any stale daemons from a previous aborted run

"$SPARK_HOME/sbin/start-master.sh" --host 127.0.0.1 --port 7077 --webui-port 8091
SPARK_WORKER_INSTANCES=2 "$SPARK_HOME/sbin/start-worker.sh" "$MASTER_URL" \
  --cores 8 --memory 28g --webui-port 8092
sleep 5

run_level() {
  local cores="$1"
  SPARK_GRAFT_MASTER="$MASTER_URL" SPARK_GRAFT_EXECUTOR_CORES=2 \
  python -m etherscan_contract_crawler_spark.bench_crawl \
    --cpus "$cores" --epochs 1 --epoch-duration 1200 \
    --warmup-batch 5000 --batch-size "$BATCH" \
    --fetcher synthetic --seeds "$SEEDS" \
    | grep '^{' | tail -1
}

echo "== standalone 2 executors (4 cores) =="
run_level 4
echo "== standalone 8 executors (16 cores) =="
run_level 16
