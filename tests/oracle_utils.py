"""Local mimic of the driver's DuckDB-oracle comparison.

Stricter than 'ran without error': sorts columns by name, sorts rows,
and compares values exactly (floats to 1e-9 after the queries' own
rounding). Used by tests to catch mismatches before the driver does.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
        return "[" + ",".join(str(_norm_cell(x)) for x in v) + "]"
    return str(v)


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def _assert_scalar_cells(df: pd.DataFrame, name: str) -> None:
    """Driver-faithful strictness: the driver's canonicalizer sorts result
    cells with pandas `sort_values`, which raises on list/ndarray cells
    (r2 f4b/f5b, r5 s6 gate errors). Any oracle-gated entry returning an
    array-typed column WILL error at the driver even if values match, so
    fail it here first. Fix pattern: compare `array_join(col, ',')` /
    `array_to_string(col, ',')` instead (queries.py:839)."""
    if len(df) == 0:
        return
    row = df.iloc[0]
    bad = [c for c in df.columns
           if isinstance(row[c], (list, tuple, dict))
           or str(type(row[c])).endswith("ndarray'>")]
    assert not bad, (
        f"{name}: array-typed compared column(s) {bad} — the driver's "
        f"canonicalizer cannot sort these; gate a scalar join "
        f"(array_join/array_to_string) instead")


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle: str,
            name: str = "?") -> None:
    actual = spark_df.toPandas()
    expected = con.execute(oracle).fetchdf()
    _assert_scalar_cells(actual, name)
    _assert_scalar_cells(expected, f"{name} (oracle)")
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: column mismatch {sorted(actual.columns)} vs "
        f"{sorted(expected.columns)}")
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} vs {len(expected)}")
    a, e = _normalize(actual), _normalize(expected)
    mismatches = [(x, y) for x, y in zip(a, e) if x != y]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(a)} rows differ; first: "
        f"{mismatches[0]}")
