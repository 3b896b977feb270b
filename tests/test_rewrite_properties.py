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
