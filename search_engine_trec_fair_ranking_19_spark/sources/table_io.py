"""Table-IO seam: where index tables live.

BASELINE.json's north rule targets an *Iceberg* table of web pages; this
sandbox has no Iceberg runtime jar (no network), so the engine writes plain
parquet directories. This module makes that a pluggable seam instead of a
hard-coded choice:

  * `ParquetDirIO` — the default: every index table is a parquet directory
    under the index root (exactly the previous behavior). "Snapshot" commits
    are emulated by the build manifest + the streaming layer's per-batch
    file-prefix protocol (`streaming/incremental.py`).
  * `IcebergIO` — the production backend: tables live in an Iceberg catalog
    namespace, writes go through the `DataFrameWriterV2` (``writeTo``) API so
    every overwrite/append is an atomic snapshot commit, readers get
    snapshot isolation, and resume-from-checkpoint becomes "roll back to /
    read from a snapshot". Activates only when the named catalog is
    configured on the session (``spark.sql.catalog.<name>`` set to the
    Iceberg SparkCatalog with the runtime jar on the classpath); otherwise
    raises with instructions rather than silently writing somewhere else.

`IndexTables` / `build_index` accept any object with this interface, so a
user on a real lakehouse swaps backends with one constructor argument and no
operator changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class ParquetDirIO:
    """Index tables as parquet directories under a root path (default)."""

    def __init__(self, root: str):
        self.root = root

    def location(self, name: str) -> str:
        return os.path.join(self.root, name)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.location(name))

    def overwrite(self, df: DataFrame, name: str) -> None:
        df.write.mode("overwrite").parquet(self.location(name))

    def append(self, df: DataFrame, name: str) -> None:
        df.write.mode("append").parquet(self.location(name))
        df.sparkSession.catalog.refreshByPath(self.location(name))

    def exists(self, spark: SparkSession, name: str) -> bool:
        return os.path.exists(os.path.join(self.location(name), "_SUCCESS"))


class IcebergIO:
    """Index tables in an Iceberg catalog namespace (``writeTo`` snapshots).

    Example session config (needs the iceberg-spark-runtime jar):

        spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.lake.type = hadoop
        spark.sql.catalog.lake.warehouse = /path/to/warehouse

    then ``IcebergIO(catalog="lake", namespace="themis_index")``.
    """

    def __init__(self, catalog: str, namespace: str):
        self.catalog = catalog
        self.namespace = namespace

    def _check(self, spark: SparkSession) -> None:
        key = f"spark.sql.catalog.{self.catalog}"
        if spark.conf.get(key, None) is None:
            raise RuntimeError(
                f"Iceberg catalog '{self.catalog}' is not configured on this "
                f"session: set {key} (and the iceberg-spark-runtime jar) or "
                "use ParquetDirIO"
            )

    def qualified(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        self._check(spark)
        return spark.table(self.qualified(name))

    def overwrite(self, df: DataFrame, name: str) -> None:
        self._check(df.sparkSession)
        # createOrReplace = one atomic snapshot commit (replace table state)
        df.writeTo(self.qualified(name)).createOrReplace()

    def append(self, df: DataFrame, name: str) -> None:
        self._check(df.sparkSession)
        # append = one atomic snapshot commit; the streaming layer's
        # rollback-on-replay maps to dropping the uncommitted snapshot
        df.writeTo(self.qualified(name)).append()

    def exists(self, spark: SparkSession, name: str) -> bool:
        self._check(spark)
        return spark.catalog.tableExists(self.qualified(name))
