"""Remote-engine federation seam — the reference components a
single-engine design previously marked n/a-by-design, made real with
DuckDB playing the remote ClickHouse server:

- **S7 whole-subtree remote exec** (reference ``src/context.rs``'s
  analyzer shipping the largest all-ClickHouse subtree): when every
  table a SELECT references lives in the attached remote engine and
  the statement unparses to the remote dialect, the WHOLE statement
  executes remotely and the result returns as one Arrow table — the
  federation move that matters at 100 TB, where shipping a
  1000-row aggregate beats scanning the table into the local engine.
- **J8 remote join pushdown** (``tests/e2e.rs`` federation join
  suites): a join whose sides are all remote ships as part of that
  subtree — the remote engine joins locally to ITS data.
- **S20 connection pooling / compute context**
  (``src/connection.rs:45-57`` pool_size + ``buffer_unordered``):
  a bounded cursor pool over one shared DuckDB catalog; requests
  beyond ``pool_size`` queue instead of erroring — the reference's
  over-subscription contract (``tests/e2e_stress.rs:161-239``).
- **W6 window semantic validation** (``src/analyzer``'s
  window-function check before pushdown): window/aggregate functions
  in the candidate subtree are validated against the remote dialect's
  supported set; an unsupported name keeps the statement LOCAL
  rather than failing remotely.
- **F6 unparser dialect** (``src/dialect.rs``): the engine-side
  translation of a shippable statement into the remote engine's SQL.
  The surfaces share ANSI SQL, so the dialect work is the seam
  itself: catalog-qualifier stripping, construct validation (local
  rewrites like ``clickhouse(...)`` wrappers, LIMIT BY, SAMPLE,
  system tables must NOT ship), and the function allowlist.

The storage substrate is DuckDB instead of a ClickHouse wire protocol
for the same reason the connector's is parquet
(``clickhouse_source.py`` module docstring): no live server exists in
this environment; the FEDERATION MACHINERY — subtree detection,
dialect gate, pooled execution, Arrow hand-back, local fallback — is
the deliverable and retargets by swapping :meth:`RemoteEngine.execute`.

Decision rule at scale: this layer ships a subtree when it is
*shippable*, mirroring the reference (which pushes the largest
eligible subtree unconditionally); a cost-based "ship only when the
subtree's output is smaller than its inputs" is the natural extension
and belongs in the same `_shippable` seam.
"""

from __future__ import annotations

import os
import queue
import re
import threading

# Functions the remote dialect accepts inside OVER(...) clauses and as
# aggregates — the W6 validation set. Names outside this set keep the
# statement local (never a remote error). Deliberately conservative:
# everything here is verified ANSI-compatible between Spark and DuckDB
# by tests/test_differential_fuzz.py's window/aggregate algebra.
SUPPORTED_WINDOW_FUNCS = {
    "row_number", "rank", "dense_rank", "ntile", "lag", "lead",
    "first_value", "last_value", "count", "sum", "min", "max", "avg",
}

# The unparser's function allowlist (F6): ONLY names proven to share
# semantics between the local and remote dialects may ship — the
# reference's unparser refuses expressions it cannot prove translate
# (src/dialect.rs), and same-name/different-semantics traps are real
# (Spark LOG is ln, DuckDB LOG is log10; Spark double ROUND is
# HALF_UP, DuckDB's is rint — kept out except through the repo's
# decimal discipline, where rounding is exact in both). A statement
# containing ANY call outside this set stays local.
SUPPORTED_REMOTE_FUNCS = SUPPORTED_WINDOW_FUNCS | {
    # scalar, verified-shared
    "cast", "coalesce", "nullif", "greatest", "least", "abs", "floor",
    "ceil", "ceiling", "round", "upper", "lower", "length", "substring",
    "substr", "concat", "concat_ws", "trim", "ltrim", "rtrim", "replace",
    "year", "month", "day", "hour", "minute", "second", "date_trunc",
    # type names inside CAST(... AS T(p,s))
    "decimal", "numeric", "varchar", "char",
    # SQL keywords/constructs the call-shaped regex also captures
    # when a parenthesis follows them ("WHERE (", "OVER (", "ON (", …)
    "in", "exists", "values", "interval", "filter", "any", "some",
    "over", "on", "where", "and", "or", "not", "select", "from",
    "when", "then", "else", "union", "all", "intersect", "except",
    "by", "having", "distinct", "as", "join", "using", "between",
}

_IDENT_CALL_RE = re.compile(r"(?i)\b([a-z_][a-z_0-9]*)\s*\(")
_SQL_STRING_RE = re.compile(r"'(?:[^']|'')*'")

# Construct markers that must NOT ship: they are local-engine rewrites
# (the front door lowers them before Catalyst) or local introspection.
_LOCAL_ONLY_RE = re.compile(
    r"(?i)\bclickhouse\s*\(|\bclickhouse_eval\b|\blimit\s+\d+\s+by\b"
    r"|\bsample\b|\bsystem\s*\.|\binformation_schema\b|\bdictGet"
    r"|\bprewhere\b|\bwith\s+totals\b|\bformat\s+\w+\s*;?\s*$")

_TABLE_REF_RE = re.compile(
    r"(?i)\b(?:from|join)\s+([A-Za-z_][\w.]*)")

_OVER_FN_RE = re.compile(r"(?i)\b([A-Za-z_][A-Za-z_0-9]*)\s*\([^()]*\)\s+over\s*\(")


class RemoteEngine:
    """A pooled remote OLAP engine (DuckDB-backed).

    One shared catalog (``duckdb.connect`` root), ``pool_size`` cursors
    handed out through a blocking queue: the N+1th concurrent request
    WAITS — the reference pool's over-subscription behavior, where 16
    writers over a pool of 4 complete without deadlock or error.
    """

    def __init__(self, pool_size: int = 4):
        import duckdb

        self.pool_size = pool_size
        self._root = duckdb.connect()
        self._pool: queue.Queue = queue.Queue()
        for _ in range(pool_size):
            self._pool.put(self._root.cursor())
        self._tables: set[str] = set()
        self._writable: set[str] = set()
        self._lock = threading.Lock()

    # -- catalog -----------------------------------------------------
    def register_parquet_dir(self, path: str, tables: list[str] | None = None
                             ) -> list[str]:
        """Register every parquet table under ``path`` as a remote view.
        Returns the registered bare table names."""
        names = []
        for f in sorted(os.listdir(path)):
            if not f.endswith(".parquet"):
                continue
            name = f[:-len(".parquet")]
            if tables is not None and name not in tables:
                continue
            self.register_parquet(name, os.path.join(path, f))
            names.append(name)
        return names

    def register_parquet(self, name: str, file_path: str) -> None:
        with self._lock:
            self._root.execute(
                f"CREATE OR REPLACE VIEW {name} AS "
                f"SELECT * FROM read_parquet('{file_path}')")
            self._tables.add(name.lower())

    def create_table(self, name: str, schema_sql: str) -> None:
        """Create a WRITABLE remote table (``schema_sql`` is the column
        list, e.g. ``"id BIGINT, v DOUBLE"``) — the MergeTree-table
        analog the insert path targets; parquet registrations stay
        read-only views."""
        with self._lock:
            self._root.execute(f"CREATE TABLE {name} ({schema_sql})")
            self._tables.add(name.lower())
            self._writable.add(name.lower())

    def tables(self) -> set[str]:
        return set(self._tables)

    def writable(self) -> set[str]:
        return set(self._writable)

    # -- execution ---------------------------------------------------
    def execute(self, sql: str, timeout: float | None = None):
        """Run ``sql`` on a pooled cursor; returns a pyarrow Table.
        Blocks (bounded by ``timeout``) when all cursors are busy —
        the pool contract, not an error path."""
        cur = self._pool.get(timeout=timeout)
        try:
            return cur.execute(sql).arrow()
        finally:
            self._pool.put(cur)

    def execute_insert(self, sql: str) -> int:
        """Run a remote-side INSERT...SELECT on a pooled cursor; returns
        the inserted-row count (the reference sink's count contract)."""
        cur = self._pool.get()
        try:
            return int(cur.execute(sql).fetchone()[0])
        finally:
            self._pool.put(cur)

    def insert_arrow(self, name: str, tbl, columns: str = "") -> int:
        """Append an Arrow table into a writable remote table through the
        pool — the federation write path's data plane (the reference
        ships RecordBatches through its pooled connection,
        src/sink.rs:180-197). Registration names are unique per call so
        concurrent pooled writers never collide."""
        import uuid as _uuid

        if name.lower() not in self._writable:
            raise ValueError(
                f"remote table {name!r} is a read-only view; "
                "create_table() makes a writable one")
        alias = f"_ins_{_uuid.uuid4().hex[:12]}"
        cur = self._pool.get()
        try:
            cur.register(alias, tbl)
            try:
                n = int(cur.execute(
                    f"INSERT INTO {name} {columns} "
                    f"SELECT * FROM {alias}").fetchone()[0])
            finally:
                cur.unregister(alias)
            return n
        finally:
            self._pool.put(cur)


def table_refs(sql: str) -> set[str]:
    """Table references of a SELECT, lowercased, catalog-qualified or
    bare. Regex over FROM/JOIN heads — the same pragmatic level as the
    front door's other routing passes; anything it cannot see (derived
    tables resolve to their inner FROMs, CTE names show up as refs and
    simply won't match remote tables) errs toward NOT shipping."""
    refs = set()
    for m in _TABLE_REF_RE.finditer(sql):
        tok = m.group(1).lower().rstrip(";,)")
        refs.add(tok)
    return refs


def unparse_for_remote(sql: str, catalog: str, db: str,
                       remote_tables: set[str]) -> str | None:
    """F6: translate the engine-surface SQL to the remote dialect, or
    None when the statement must stay local.

    Shippable means: a SELECT/WITH statement, every table reference
    resolves to a remote table (bare, ``db.t``, or
    ``catalog.db.t``), no local-only construct markers, and every
    windowed function name is in :data:`SUPPORTED_WINDOW_FUNCS` (W6).
    The translation itself is qualifier stripping — the shared surface
    is ANSI SQL; divergent constructs are excluded by the gate.
    """
    s = sql.strip().rstrip(";")
    if not re.match(r"(?i)\s*(select|with)\b", s):
        return None
    if _LOCAL_ONLY_RE.search(s):
        return None
    # all structural scans run on the literal-stripped text — string
    # contents are data, not syntax
    scan = _SQL_STRING_RE.sub("''", s)
    refs = table_refs(scan)
    if not refs:
        return None
    cte_names = {m.group(1).lower() for m in re.finditer(
        r"(?i)\b(?:with|,)\s*([A-Za-z_]\w*)\s+as\s*\(", scan)}
    prefixes = (f"{catalog}.{db}.".lower(), f"{db}.".lower())
    for r in refs - cte_names:
        bare = r
        for p in prefixes:
            if r.startswith(p):
                bare = r[len(p):]
                break
        if "." in bare or bare not in remote_tables:
            return None
    for m in _OVER_FN_RE.finditer(scan):
        if m.group(1).lower() not in SUPPORTED_WINDOW_FUNCS:
            return None
    # F6 allowlist: strip string literals first (a quoted "foo(" must
    # not read as a call), then every call-shaped identifier must be a
    # proven-shared function. Failing ANY name keeps the whole
    # statement local — never a silent semantic divergence.
    for m in _IDENT_CALL_RE.finditer(scan):
        if m.group(1).lower() not in SUPPORTED_REMOTE_FUNCS:
            return None
    # Qualifier stripping OUTSIDE string literals only: a literal like
    # 'remote.orders' is DATA and must cross the seam untouched (the
    # r9 self-review catch; pinned by
    # tests/test_remote_engine.py::test_unparser_preserves_literals).
    parts = _SQL_STRING_RE.split(s)
    lits = _SQL_STRING_RE.findall(s)
    for p in (f"{catalog}.{db}.", f"{db}."):
        parts = [re.sub(re.escape(p), "", seg, flags=re.IGNORECASE)
                 for seg in parts]
    out = parts[0]
    for lit, seg in zip(lits, parts[1:]):
        out += lit + seg
    return out
