#!/usr/bin/env python
"""Mechanical audit of the federation gate's function allowlist.

For every scalar function the unparser lets ship unguarded
(``SUPPORTED_REMOTE_FUNCS`` minus keywords/type names), plus the
guarded forms in their PROVEN-SAFE shape, build a battery of literal
statements over adversarial typed inputs (NULL, empty/unicode strings,
±0.0, NaN/inf, int extremes, decimal casts, date/timestamp edges) and
execute the SAME text in Spark (local dialect) and DuckDB (remote
dialect). A VALUE divergence on any unguarded allowlisted function is
an allowlist bug: the gate would ship it and silently return different
answers. Dtype-only differences are reported but non-fatal — the
engine aligns hand-back schemas to the local analysis
(engine.py::_align_remote_schema).

This is the r10 hand-probe (tools/probe_dialect_divergence_r10b.py)
made mechanical, so the allowlist stays honest against future edits.
A compact battery runs in CI via tests/test_allowlist_audit.py.

Usage: python tools/audit_remote_allowlist.py [-v]
Exit 1 on any value divergence for an unguarded shippable form.
"""
from __future__ import annotations

import math
import sys

NULL = "CAST(NULL AS STRING)"
NULLN = "CAST(NULL AS DOUBLE)"

STRS = ["''", "'a'", "'ab c'", "'ß'", "'中文'", "'it''s'", "'  pad  '",
        NULL]
NUMS = ["0", "1", "-1", "4611686018427387904", "-4611686018427387904",
        "CAST(1.015 AS DOUBLE)", "CAST('nan' AS DOUBLE)",
        "CAST('inf' AS DOUBLE)", "CAST(-0.0 AS DOUBLE)",
        "CAST(5e-324 AS DOUBLE)", NULLN]
TS = ["TIMESTAMP '2024-02-29 23:59:59'", "TIMESTAMP '1969-12-31 23:59:59'",
      "CAST(NULL AS TIMESTAMP)"]
DATES = ["DATE '2024-02-29'", "DATE '1969-12-31'"]
DEC = ["CAST(1.005 AS DECIMAL(20,6))", "CAST(-7.5 AS DECIMAL(20,6))",
       "CAST(NULL AS DECIMAL(20,6))"]

# (function, [argument pools], guarded?) — guarded entries are tested in
# the exact syntactic shape the per-call guard admits.
BATTERY: list[tuple[str, list[list[str]], bool]] = [
    ("abs", [NUMS], False),
    ("length", [STRS], False),
    ("coalesce", [STRS, STRS], False),
    ("coalesce", [NUMS, NUMS], False),
    ("nullif", [NUMS, NUMS], False),
    ("nullif", [STRS, STRS], False),
    ("greatest", [NUMS, NUMS, NUMS], False),
    ("least", [NUMS, NUMS, NUMS], False),
    ("concat_ws", [["'-'"], STRS, STRS], False),
    ("replace", [STRS, ["'a'", "''", NULL], ["'X'", NULL]], False),
    ("year", [TS], False),
    ("month", [TS], False),
    ("day", [TS], False),
    ("hour", [TS], False),
    ("minute", [TS], False),
    ("second", [TS], False),
    ("year", [DATES], False),
    ("date_trunc", [["'month'", "'year'", "'day'"], TS], False),
    ("trim", [STRS], True),
    ("ltrim", [STRS], True),
    ("rtrim", [STRS], True),
    ("round", [DEC, ["0", "1", "2"]], True),
    ("substring", [STRS, ["1", "2"], ["1", "3"]], True),
]


def _norm(v):
    """Engine-neutral value: Decimal -> exact float when it fits, NaN
    canonicalized, a DATE and the midnight TIMESTAMP of the same day
    normalize together (the remote dialect returns DATE where the local
    one returns TIMESTAMP for date_trunc — equal instants; the engine's
    schema alignment casts remote DATE -> local TIMESTAMP losslessly)."""
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, datetime.datetime):
        if v.time() == datetime.time(0, 0) and v.tzinfo is None:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def run(compact: bool = False, verbose: bool = False):
    import itertools

    import duckdb
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[2]")
             .config("spark.sql.shuffle.partitions", "2")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    # getOrCreate may hand back an existing session (pytest) whose
    # builder configs are ignored — pin the tz the audit's time
    # extractions assume, and restore it afterwards
    tz_before = spark.conf.get("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")

    div, checked = [], 0
    for fn, pools, guarded in BATTERY:
        combos = list(itertools.product(*pools))
        if compact and len(combos) > 24:
            combos = combos[::max(1, len(combos) // 24)]
        for args in combos:
            stmt = f"SELECT {fn}({', '.join(args)}) AS v"
            try:
                s = _norm(spark.sql(stmt).collect()[0][0])
                s_err = None
            except Exception as e:
                s, s_err = None, type(e).__name__
            try:
                d = _norm(con.sql(stmt).fetchall()[0][0])
                d_err = None
            except Exception as e:
                d, d_err = None, type(e).__name__
            checked += 1
            # both erroring is consistent (local fallback surfaces the
            # local error); remote-only error is SAFE (exception
            # fallback -> local plan); LOCAL-only error on a shippable
            # statement is a divergence (ship would mask the error)
            bad = ((s_err is None and d_err is None and s != d)
                   or (s_err is not None and d_err is None))
            if bad:
                div.append((fn, stmt, f"{s_err or s!r}", f"{d_err or d!r}",
                            guarded))
            if verbose:
                mark = "!!" if bad else "  "
                print(f"{mark} {stmt}\n     spark={s_err or s!r} "
                      f"duckdb={d_err or d!r}")
    if compact:
        spark.conf.set("spark.sql.session.timeZone", tz_before)
    else:
        spark.stop()
    return checked, div


def main() -> int:
    verbose = "-v" in sys.argv
    checked, div = run(verbose=verbose)
    print(f"\nallowlist audit: {checked} statements, "
          f"{len(div)} divergent")
    for fn, stmt, s, d, guarded in div:
        tag = "GUARDED-FORM" if guarded else "UNGUARDED"
        print(f"  [{tag}] {stmt}\n     spark={s} duckdb={d}")
    return 1 if div else 0


if __name__ == "__main__":
    raise SystemExit(main())
