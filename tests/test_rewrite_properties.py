"""Property-based robustness for the SQL rewriter (hypothesis).

Invariants:
- SQL containing none of the trigger names is returned byte-identical
  (the rewriter must never corrupt ordinary queries);
- string literals and comments are never rewritten, whatever they contain;
- the rewrite is idempotent (rewriting rewritten SQL is a no-op) for
  queries whose ch() calls carry no nested ch() in string form;
- tokenizer round-trips arbitrary SQL-ish text.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_datafusion_spark.functions.rewrite import (
    SqlRewriteError,
    rewrite_sql,
    tokenize,
)

sql_alphabet = string.ascii_letters + string.digits + " _.,()<>=+-*/%'`\n\t"

TRIGGERS = ("clickhouse", "ch", "apply", "lambda")


def _no_triggers(s: str) -> bool:
    low = s.lower()
    return not any(t in low for t in TRIGGERS)


@given(st.text(alphabet=sql_alphabet, max_size=200).filter(_no_triggers))
@settings(max_examples=300, deadline=None)
def test_no_trigger_identity(s):
    try:
        out = rewrite_sql(s)
    except SqlRewriteError:
        return  # unbalanced quotes/parens may legitimately error
    assert out == s


@given(st.text(alphabet=string.ascii_letters + string.digits + " _().,", max_size=80))
@settings(max_examples=200, deadline=None)
def test_literals_never_rewritten(payload):
    lit = payload.replace("'", "")
    sql = f"SELECT '{lit}' AS s, clickhouse(exp(x), 'Float64') AS e FROM t"
    out = rewrite_sql(sql)
    assert f"'{lit}'" in out
    assert "CAST((exp(x)) AS DOUBLE)" in out


@given(st.sampled_from([
    "SELECT clickhouse(exp(a), 'Float64') FROM t",
    "SELECT clickhouse(`arrayMap`($x, concat($x, 'z'), arr), 'List(Utf8)') FROM t",
    "SELECT clickhouse_eval('upper(name)', 'Utf8') FROM t",
    "SELECT * FROM clickhouse.db.t WHERE clickhouse(abs(v), 'Int64') > 0",
]))
@settings(max_examples=20, deadline=None)
def test_idempotent(sql):
    once = rewrite_sql(sql)
    twice = rewrite_sql(once)
    assert once == twice


@given(st.text(alphabet=sql_alphabet, max_size=300))
@settings(max_examples=300, deadline=None)
def test_tokenizer_roundtrip(s):
    try:
        toks = tokenize(s)
    except SqlRewriteError:
        return  # unterminated constructs
    assert "".join(t.text for t in toks) == s


@given(st.integers(min_value=-10**6, max_value=10**6),
       st.sampled_from(["Int64", "Float64", "Utf8"]))
@settings(max_examples=100, deadline=None)
def test_scalar_ch_always_rewrites(n, typ):
    out = rewrite_sql(f"SELECT clickhouse(abs({n}), '{typ}') AS v")
    assert "clickhouse" not in out.lower()
    assert "CAST" in out


def test_sequence_count_matches_bruteforce(spark):
    """Property: the distributed applyInPandas automaton equals a
    straight-line Python reference on randomized event histories —
    including tie timestamps and multi-flag events."""
    import random
    from datetime import datetime, timedelta

    from pyspark.sql import Row
    import pyspark.sql.functions as F

    from clickhouse_datafusion_spark.operators.funnel import sequence_count

    rng = random.Random(20260814)
    base = datetime(2024, 1, 1)
    rows = []
    for u in range(40):
        n = rng.randint(0, 25)
        for _ in range(n):
            # coarse seconds so tie timestamps genuinely occur
            s = rng.randint(0, 12)
            rows.append(Row(user_id=u,
                            ts=base + timedelta(seconds=s),
                            event_type=rng.choice("abc")))
    rows.append(Row(user_id=999, ts=base, event_type="c"))

    def ref_count(evts, pattern):
        # greedy automaton, strictly-later semantics (ts-level, so tie
        # order cannot matter)
        evts = sorted(evts, key=lambda e: e[0])
        state, last, cnt = 0, None, 0
        for ts, et in evts:
            if last is not None and ts <= last:
                continue
            if et == pattern[state]:
                state += 1
                last = ts
                if state == len(pattern):
                    cnt += 1
                    state = 0
        return cnt

    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    expected = {u: ref_count(e, "ab") for u, e in per_user.items()}

    got = {r.user_id: r.n_matches for r in sequence_count(
        spark.createDataFrame(rows),
        [F.col("event_type") == "a",
         F.col("event_type") == "b"]).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# Front-door parser robustness: mutation assignments and SAMPLE lowering are
# token-level parses — keywords inside string literals, odd whitespace, and
# nested parens must never confuse them.

@given(st.text(alphabet=" \t\n", min_size=1, max_size=3),
       st.sampled_from(["f(x, y)", "CASE WHEN a=1 THEN 2 ELSE 3 END",
                        "concat('WHERE', ',', 'SAMPLE 0.5')",
                        "(SELECT max(v) FROM (SELECT 1 v))"]))
@settings(max_examples=40, deadline=None)
def test_mutation_tail_parser_depth_aware(ws, expr):
    from clickhouse_datafusion_spark.engine import _parse_mutation_tail

    assigns, where = _parse_mutation_tail(
        "UPDATE", f"{ws}a ={ws}{expr}, b = 2{ws}WHERE{ws}k > 0")
    assert [c for c, _ in assigns] == ["a", "b"]
    assert assigns[1][1] == "2"
    # the expr survives verbatim modulo whitespace (ws may be injected
    # inside the RHS by the generator, so compare whitespace-stripped)
    assert assigns[0][1].replace(" ", "").replace("\t", "") \
        .replace("\n", "") == expr.replace(" ", "")
    assert where.strip() == "k > 0"


def test_mutation_tail_parser_string_safety():
    from clickhouse_datafusion_spark.engine import _parse_mutation_tail

    # WHERE and commas inside string literals are data, not syntax
    assigns, where = _parse_mutation_tail(
        "UPDATE", "note = 'keep WHERE x, y' WHERE id = 1")
    assert assigns == [("note", "'keep WHERE x, y'")]
    assert where == "id = 1"


def test_sample_lowering_string_and_subquery_safety(spark):
    from clickhouse_datafusion_spark.engine import ClickHouseSparkEngine

    eng = ClickHouseSparkEngine(spark)
    eng.set_sample_key("tsmp", "k")
    spark.createDataFrame([(i,) for i in range(50)],
                          "k int").createOrReplaceTempView("tsmp")
    # SAMPLE inside a string literal must be untouched even when the query
    # ALSO uses a real SAMPLE clause
    rows = eng.sql("SELECT 'not a SAMPLE 0.9 clause' AS s, k "
                   "FROM tsmp SAMPLE 0.5").collect()
    assert all(r.s == "not a SAMPLE 0.9 clause" for r in rows)
    assert 0 < len(rows) < 50
    # SAMPLE on a joined table name, qualified-column refs intact
    spark.createDataFrame([(i, i % 5) for i in range(50)],
                          "k int, g int").createOrReplaceTempView("tsmp2")
    eng.set_sample_key("tsmp2", "k")
    n = eng.sql("SELECT count(*) AS n FROM tsmp2 SAMPLE 0.5 "
                "JOIN tsmp ON tsmp2.k = tsmp.k").collect()[0].n
    assert 0 < n < 50
