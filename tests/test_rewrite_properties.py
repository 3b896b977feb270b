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
