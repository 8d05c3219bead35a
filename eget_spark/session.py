"""SparkSession construction tuned for the engine.

Local-mode defaults mirror what a cluster submit would set via spark-submit
conf; the engine code itself never assumes local mode.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "eget_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or '*'.  Shuffle partitions
    default to the core count — at cluster scale the caller sets this to
    ~2-3x total executor cores instead.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(8, n)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode runs every executor thread inside the driver JVM, so
        # the heap must be sized for the PARALLELISM, not for a driver:
        # 8g on this 125 GiB host produced GCLocker allocation stalls at
        # local[8] on the benchxxl corpus — GC pressure that grows with
        # core count and silently taxes exactly the wide leg of the
        # N-vs-4N scaling evidence.  32g leaves ample room for python
        # workers; a cluster submit overrides with executor memory conf.
        .config("spark.driver.memory", os.environ.get("EGET_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # bucketed-table warehouse (write_bucketed_corpus); keep it out of
        # the repo cwd — on a cluster this is the catalog's table location
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "EGET_WAREHOUSE",
                os.path.join(tempfile.gettempdir(), "eget_warehouse"),
            ),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
