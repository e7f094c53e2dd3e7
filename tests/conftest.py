from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("pg-walstream-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # JVM<->python-worker stall mitigation (EVIDENCE_r7.md): kill +
        # task-retry instead of an infinite suite hang
        .config("spark.python.worker.idleTimeoutSeconds", "300")
        .config("spark.python.worker.killOnIdleTimeout", "true")
        .getOrCreate()
    )
    yield s
    s.stop()
