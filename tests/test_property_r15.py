"""r15 optimization-round regression tests: the ADVICE correctness fixes
(escape-mode-independent sql_str, packing literal guards, quoted chunk
column, conf-gated span-removal broadcast, no-probe d5 dim routing)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- sql_str

SQL_STR_CASES = [
    "plain",
    "it's quoted",
    "tab\there",
    "line\nbreak",
    "back\\slash",
    "mix'\\\n\t'",
    "unicode £σ✓",
    "",
    "trailing'",
]


@pytest.mark.parametrize("mode", ["false", "true"])
def test_sql_str_roundtrips_under_both_parser_modes(spark, mode):
    """sql_str output must parse back to the exact Python string under
    BOTH spark.sql.parser.escapedStringLiterals settings (r14's
    backslash-escape form corrupted literals under Hive-compat mode)."""
    from clickhouse_datafusion_spark.operators.dedup import sql_str

    old = spark.conf.get("spark.sql.parser.escapedStringLiterals")
    spark.conf.set("spark.sql.parser.escapedStringLiterals", mode)
    try:
        exprs = [f"{sql_str(s)} AS c{i}" for i, s in enumerate(SQL_STR_CASES)]
        row = spark.range(1).selectExpr(*exprs).first()
        for i, s in enumerate(SQL_STR_CASES):
            assert row[f"c{i}"] == s, (mode, s)
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", old)


def test_sql_str_folds_to_plain_literal(spark):
    """The CAST(X'..' AS STRING) form must constant-fold — the optimized
    plan carries the same string literal the old form produced."""
    from clickhouse_datafusion_spark.operators.dedup import sql_str
    from clickhouse_datafusion_spark.plans.explain import optimized_plan

    frag = sql_str("a\\b")
    assert frag.startswith("CAST(X'")
    plan = optimized_plan(spark.range(1).selectExpr(f"{frag} AS c"))
    assert "a\\b" in plan  # folded literal, not a runtime cast
    assert "cast" not in plan.lower()


# ------------------------------------------------- packing literal guards

def test_num_literal_guards(spark):
    """_num renders bool as a BOOLEAN literal (bool is an int subclass —
    the r14 form emitted the invalid bare token ``True``) and non-finite
    floats as castable spellings (``infD``/``nanD`` fail to parse); the
    finite forms keep F.lit's typing exactly."""
    from clickhouse_datafusion_spark.operators.packing import _num

    cases = [True, False, 3, -1, 2.5, float("inf"), float("-inf"),
             float("nan")]
    exprs = [f"{_num(x)} AS c{i}" for i, x in enumerate(cases)]
    lits = [F.lit(x).alias(f"l{i}") for i, x in enumerate(cases)]
    df = spark.range(1).selectExpr(*exprs).select("*", *lits)
    row = df.first()
    for i, x in enumerate(cases):
        got, want = row[f"c{i}"], row[f"l{i}"]
        assert got == want or (got != got and want != want), (x, got)
        # typing identical to F.lit
        assert (df.schema[f"c{i}"].dataType
                == df.schema[f"l{i}"].dataType), x


def test_global_prefix_sum_inf_order_values(spark):
    """A double order column containing inf drives inf into the uniform
    bucket bounds — the build must parse and the prefix sum stay exact."""
    from clickhouse_datafusion_spark.operators.packing import (
        global_prefix_sum)

    df = spark.createDataFrame(
        [(0.0, 1.0), (1.0, 2.0), (float("inf"), 4.0)], ["k", "v"])
    out = global_prefix_sum(df, value_col="v", order_col="k",
                            bounds_mode="uniform")
    rows = {r["k"]: r["_cum_before"] for r in out.collect()}
    assert rows == {0.0: 0.0, 1.0: 1.0, float("inf"): 3.0}


# -------------------------------------------------- chunk column quoting

def test_chunk_documents_quoted_text_col(spark):
    """A text column whose name needs backquoting must work end to end
    (the r14 n_chunks fragment interpolated the raw name)."""
    from clickhouse_datafusion_spark.operators.packing import (
        chunk_documents)

    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x y")],
        ["doc id", "body text"])
    out = chunk_documents(df, chunk_size=4, overlap=1,
                          text_col="body text", id_col="doc id")
    per_doc = sorted((r["doc id"], r["chunk_id"]) for r in out.collect())
    # doc1: 8 tokens, stride 3 -> 3 chunks; doc2: short doc -> 1 chunk
    assert per_doc == [(1, 0), (1, 1), (1, 2), (2, 0)]


# ------------------------------------- span-dedup broadcast gate (advice)

def test_span_dedup_broadcast_gate_matches(spark):
    """broadcastRemovals=false must produce byte-identical output to the
    default broadcast plan (AQE plans the marker join from runtime size
    instead of the unbounded-broadcast hint)."""
    from clickhouse_datafusion_spark.operators.dedup import (
        drop_cross_doc_spans)

    span = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 " \
           "wa wb wc wd we wf wg wh wi wj"
    rows = [(1, span + " tail one"), (2, span + " tail two"),
            (3, "unique doc with no duplicate span at all " * 2)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def run():
        return sorted(
            tuple(r) for r in drop_cross_doc_spans(df, ngram=20).collect())

    base = run()
    key = "spark.clickhouse_datafusion_spark.spanDedup.broadcastRemovals"
    spark.conf.set(key, "false")
    try:
        assert run() == base
    finally:
        spark.conf.unset(key)


# --------------------------------------------------- d5 dim probe removal

def test_blocked_cosine_small_n_route_needs_no_dim_probe(spark):
    """The small-N exact route must not probe the data for dim: an
    all-NULL vector column would make _infer_dim raise, so reaching the
    result proves no probe ran."""
    from clickhouse_datafusion_spark.operators.similarity import (
        blocked_cosine_dups)
    from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                                   StructField, StructType)

    schema = StructType([StructField("vec_id", LongType()),
                         StructField("embedding", ArrayType(DoubleType()))])
    df = spark.createDataFrame([(1, None), (2, None)], schema)
    out = blocked_cosine_dups(df, threshold=0.5, n_planes=1, n_tables=2,
                              n_rows=2)
    assert out.count() == 0
