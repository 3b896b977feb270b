"""Remote-dialect PROFILES — every dialect-specific SQL string the
federation seam emits, in one swappable place (r12 VERDICT "what's
missing" 1: the ClickHouse retarget swap points were prose in
docstrings; a retarget should touch ONE profile, not the engine).

Reference analog: ``src/dialect.rs:16-77`` — the reference isolates its
ClickHouse unparser behind a dialect object; here the same seam is a
profile of statement builders covering the four surfaces that carry
dialect-specific SQL:

1. **tail offset plane** (sources/clickhouse_tail.py) — timestamp-key
   ↔ epoch-microsecond conversion, and the discrete-quantile partition
   boundary aggregate;
2. **tail progress plane** (ArrowIngestServer._handle_progress) — the
   capped tail's watermark row: create / greatest-wins put / get /
   reset;
3. **ingest transaction wrapper** (RemoteEngine.ingest_transaction) —
   BEGIN/COMMIT/ROLLBACK around a connection's batch appends;
4. **exactly-once commit log** (engine.append_remote_exactly_once) —
   the ``<table>__commits`` DDL, the seen-check, and the marker insert.

The DuckDB profile is LIVE — the seam code renders its statements from
it, so the golden transcripts in tests/test_dialect_transcripts.py pin
exactly what runs. The ClickHouse profile is the retarget blueprint:
same builder surface, ClickHouse SQL (public docs), transcript-pinned
so the swap pairs are tested artifacts instead of prose. Statements
take ``?`` placeholders where the live path binds parameters.

ClickHouse flavor notes (each a deliberate, documented swap):
* epoch plane: ``toUnixTimestamp64Micro`` / ``fromUnixTimestamp64Micro``
  (DateTime64(6) precision — the tail tracks micros exactly).
* quantiles: ``quantilesExact(p..)(expr)`` returns the boundary array
  like DuckDB's ``quantile_disc(expr, [p..])``.
* progress row: ClickHouse has no ``ON CONFLICT`` upsert — the profile
  swaps greatest-wins-at-write for append-at-write + ``max()``-at-read
  (monotone by construction, same observable watermark), with
  ``ALTER TABLE ... DELETE`` as the reset mutation.
* transactions: ``BEGIN TRANSACTION``/``COMMIT``/``ROLLBACK`` exist
  behind ClickHouse's experimental transactions; single-statement
  INSERT atomicity (one part per insert) is the fallback contract.
* commit log: no unique constraint on MergeTree — the blueprint keeps
  the seen-check and leans on the transactional marker insert for
  fencing (a KeeperMap-backed log is the strict-PK alternative).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class DialectProfile:
    """DuckDB-flavored base profile (the live remote's dialect)."""

    name: str = "duckdb"

    # -- 1. tail offset plane ------------------------------------------
    def ts_key_to_epoch_us(self, key: str) -> str:
        """Timestamp key column -> BIGINT epoch microseconds."""
        return f"epoch_us({key})"

    def epoch_us_to_ts_literal(self, v: int) -> str:
        """Epoch-microsecond watermark -> timestamp-typed SQL literal."""
        return f"make_timestamp({int(v)})"

    def quantile_bounds(self, key_expr: str, probs: list[float]) -> str:
        """Aggregate expression returning the LIST of discrete-quantile
        boundary keys (actual row values, never interpolated)."""
        qs = ", ".join(f"{p:.6f}" for p in probs)
        return f"quantile_disc({key_expr}, [{qs}])"

    # -- 2. tail progress plane ----------------------------------------
    def progress_create(self, prog: str) -> str:
        return (f"CREATE TABLE IF NOT EXISTS {prog} "
                f"(tail_id VARCHAR PRIMARY KEY, watermark BIGINT)")

    def progress_put(self, prog: str) -> str:
        """Monotone greatest-wins upsert of (tail_id?, watermark?)."""
        return (f"INSERT INTO {prog} VALUES (?, ?) "
                f"ON CONFLICT (tail_id) DO UPDATE SET watermark = "
                f"greatest(excluded.watermark, watermark)")

    def progress_get(self, prog: str) -> str:
        return f"SELECT watermark FROM {prog} WHERE tail_id = ?"

    def progress_reset(self, prog: str) -> str:
        return f"DELETE FROM {prog} WHERE tail_id = ?"

    # -- 3. ingest transaction wrapper ---------------------------------
    def txn_begin(self) -> str:
        return "BEGIN TRANSACTION"

    def txn_commit(self) -> str:
        return "COMMIT"

    def txn_rollback(self) -> str:
        return "ROLLBACK"

    # -- 4. exactly-once commit log ------------------------------------
    def commits_create(self, commits: str) -> str:
        """PRIMARY KEY = zombie-writer fencing (engine.py:676-683)."""
        return (f"CREATE TABLE IF NOT EXISTS {commits} (sink_id VARCHAR, "
                f"batch_id BIGINT, PRIMARY KEY (sink_id, batch_id))")

    def commits_seen(self, commits: str, sink: str, bid: int) -> str:
        return (f"SELECT CAST(count(*) AS BIGINT) FROM {commits} "
                f"WHERE sink_id = '{sink}' AND batch_id = {int(bid)}")

    def commits_marker(self, commits: str, sink: str, bid: int) -> str:
        return f"INSERT INTO {commits} VALUES ('{sink}', {int(bid)})"


@dataclass(frozen=True)
class ClickHouseProfile(DialectProfile):
    """The retarget blueprint — see the module docstring's flavor
    notes; every method is the documented swap of its DuckDB twin."""

    name: str = "clickhouse"

    def ts_key_to_epoch_us(self, key: str) -> str:
        return f"toUnixTimestamp64Micro({key})"

    def epoch_us_to_ts_literal(self, v: int) -> str:
        return f"fromUnixTimestamp64Micro({int(v)})"

    def quantile_bounds(self, key_expr: str, probs: list[float]) -> str:
        qs = ", ".join(f"{p:.6f}" for p in probs)
        return f"quantilesExact({qs})({key_expr})"

    def progress_create(self, prog: str) -> str:
        # append-at-write + max()-at-read replaces ON CONFLICT upsert:
        # the observable watermark (the row-set maximum) is identical
        return (f"CREATE TABLE IF NOT EXISTS {prog} "
                f"(tail_id String, watermark Int64) "
                f"ENGINE = MergeTree ORDER BY tail_id")

    def progress_put(self, prog: str) -> str:
        return f"INSERT INTO {prog} (tail_id, watermark) VALUES (?, ?)"

    def progress_get(self, prog: str) -> str:
        return (f"SELECT max(watermark) FROM {prog} "
                f"WHERE tail_id = ? HAVING count() > 0")

    def progress_reset(self, prog: str) -> str:
        return f"ALTER TABLE {prog} DELETE WHERE tail_id = ?"

    def commits_create(self, commits: str) -> str:
        # MergeTree has no unique constraint: the seen-check stays, and
        # fencing leans on the transactional marker insert (KeeperMap
        # is the strict-PK alternative for non-transactional setups)
        return (f"CREATE TABLE IF NOT EXISTS {commits} "
                f"(sink_id String, batch_id Int64) "
                f"ENGINE = MergeTree ORDER BY (sink_id, batch_id)")

    def commits_seen(self, commits: str, sink: str, bid: int) -> str:
        return (f"SELECT CAST(count(*) AS Int64) FROM {commits} "
                f"WHERE sink_id = '{sink}' AND batch_id = {int(bid)}")

    def commits_marker(self, commits: str, sink: str, bid: int) -> str:
        return (f"INSERT INTO {commits} (sink_id, batch_id) "
                f"VALUES ('{sink}', {int(bid)})")


PROFILES: dict[str, DialectProfile] = {
    "duckdb": DialectProfile(),
    "clickhouse": ClickHouseProfile(),
}


def get_profile(name: str) -> DialectProfile:
    try:
        return PROFILES[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown remote dialect {name!r}; "
            f"profiles: {sorted(PROFILES)}") from None
