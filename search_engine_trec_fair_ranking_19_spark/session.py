"""SparkSession factory with the engine's recommended configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "themis-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for the engine.

    Local defaults come from ``SPARK_GRAFT_CPUS`` (driver contract). On a real
    cluster, call with ``master=None`` and let spark-submit own the master.
    AQE (incl. skew-join handling) and Arrow are always on — the engine's hot
    paths are Arrow-batched pandas UDFs and skew-prone term aggregations.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 32)
    # execution memory scales with concurrent tasks: a fixed small heap makes
    # N threads SLOWER than N/4 (per-task Tungsten memory → spills). ~1.5 GiB
    # per local core, floor 8, cap 64 (the box has 128)
    if master.startswith("local["):
        inner = master[6:-1]
        n_threads = int(inner) if inner.isdigit() else (os.cpu_count() or 8)
    else:
        n_threads = 8  # cluster mode: executor memory is spark-submit's job
    default_mem = f"{min(max(8, round(n_threads * 1.5)), 64)}g"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # rows entering UDFs can be FAT (posting blocks carry ~4096-entry
        # arrays ≈ 64 KB/row): 10k-row batches would be ~GB-sized per worker
        # × 32 workers. 1024 keeps worst-case batches ~64 MB while thin-row
        # UDFs (tokenizer) still amortize fine.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # floor on scan splits: a bench-sized corpus (hundreds of MB) must
        # not collapse to 3-4 scan tasks and serialize the Python tokenizer;
        # at 100 TB the 128m byte cap dominates and this floor is moot
        .config("spark.sql.files.minPartitionNum", str(n_threads * 3))
        # dimension tables here (vocabulary, docid maps at bench SFs) are
        # tens of MB — the 10MB default forces them into sort-merge joins.
        # 64m is still executor-heap-safe; AQE re-checks actual sizes.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", default_mem))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
