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


# --- bucket-kernel property (r9): the in-bucket pair scorer vs brute force


def _brute_pairs(pdf, dim, threshold):
    """Reference implementation: per bucket, all pairs, fold-exact cosine,
    4dp rounding, NaN (zero-norm) never pairs, malformed rows excluded."""
    import numpy as np

    out = set()
    for bk in set(pdf["bk"]):
        rows = [(i, v) for i, v, b in zip(pdf["id"], pdf["v"], pdf["bk"])
                if b == bk and v is not None and len(v) == dim]
        for x in range(len(rows)):
            for y in range(x + 1, len(rows)):
                ia, va = rows[x]
                ib, vb = rows[y]
                if ia == ib:
                    continue
                d = na = nb = 0.0
                for k in range(dim):
                    d += float(va[k]) * float(vb[k])
                    na += float(va[k]) * float(va[k])
                    nb += float(vb[k]) * float(vb[k])
                denom = (na ** 0.5) * (nb ** 0.5)
                if denom == 0.0:
                    continue                       # NaN never pairs
                c = d / denom
                r = np.floor(c * 10000.0 + 0.5) / 10000.0
                if r >= threshold:
                    lo, hi = (ia, ib) if ia < ib else (ib, ia)
                    # kernel emits (id_a, id_b) sorted within bucket by
                    # (bk, id); ids are unique here so orient by id
                    out.add((lo, hi, float(r)))
    return out


@st.composite
def _bucket_frames(draw):
    import numpy as np

    dim = draw(st.integers(min_value=1, max_value=5))
    n = draw(st.integers(min_value=0, max_value=24))
    ids, vecs, bks = [], [], []
    for i in range(n):
        bks.append(draw(st.integers(min_value=0, max_value=2)))
        kind = draw(st.sampled_from(["ok", "ok", "ok", "zero", "null",
                                     "short"]))
        if kind == "null":
            vecs.append(None)
        elif kind == "zero":
            vecs.append(np.zeros(dim))
        elif kind == "short":
            vecs.append(np.zeros(max(0, dim - 1)))
        else:
            vecs.append(np.asarray([draw(st.floats(
                min_value=-4, max_value=4, allow_nan=False))
                for _ in range(dim)]))
        ids.append(i)
    thr = draw(st.sampled_from([0.9, 0.5, 0.0, -0.5]))
    tile = draw(st.sampled_from([2, 4, 2048]))
    return dim, ids, vecs, bks, thr, tile


@given(_bucket_frames())
@settings(max_examples=120, deadline=None)
def test_bucket_cosine_kernel_matches_bruteforce(case):
    """The gemm+fold bucket kernel (tiled and untiled) must equal the
    all-pairs fold reference on arbitrary buckets — including zero-norm,
    NULL, and wrong-length vectors, negative thresholds, and buckets
    smaller than / spanning multiple gemm tiles. This is the pure-pandas
    seam of blocked_cosine_dups, so the property runs Spark-free."""
    import numpy as np
    import pandas as pd

    from clickhouse_datafusion_spark.operators.similarity import (
        _bucket_cosine_kernel)

    dim, ids, vecs, bks, thr, tile = case
    pdf = pd.DataFrame({"id": pd.array(ids, dtype="int64"),
                        "v": vecs,
                        "bk": pd.array(bks, dtype="int64"),
                        "_g": pd.array([0] * len(ids), dtype="int64")})
    got = {(int(a), int(b), float(c)) for a, b, c in
           _bucket_cosine_kernel(dim, thr, tile=tile)(pdf)
           .itertuples(index=False)}
    want = _brute_pairs(pdf, dim, thr)
    assert got == want, (sorted(want - got)[:5], sorted(got - want)[:5],
                         dim, thr, tile)
