"""Shared example scaffolding: session + catalog over the testdata dir."""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
# executor python workers import the package too (UDF closures pickle
# package functions); they see PYTHONPATH, not the driver's sys.path —
# set it BEFORE the JVM launches so running from any cwd works
os.environ["PYTHONPATH"] = (
    _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")).rstrip(os.pathsep)

from clickhouse_datafusion_spark import ClickHouseSparkEngine, get_spark  # noqa: E402

SF_DIR = os.environ.get("EX_SF_DIR", "/root/testdata/sf0.001")


def engine():
    spark = get_spark(app_name="examples")
    eng = ClickHouseSparkEngine(spark)
    eng.catalog.register_parquet_dir(SF_DIR, db="main")
    return eng
