"""Shared example scaffolding: session + catalog over the testdata dir."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_datafusion_spark import ClickHouseSparkEngine, get_spark  # noqa: E402

SF_DIR = os.environ.get("EX_SF_DIR", "/root/testdata/sf0.001")


def engine():
    spark = get_spark(app_name="examples")
    eng = ClickHouseSparkEngine(spark)
    eng.catalog.register_parquet_dir(SF_DIR, db="main")
    return eng
