"""Continue the r10 silent-divergence audit at the federation seam:
classes the call-shaped allowlist CANNOT see (operator tokens, result
dtypes, arithmetic edge cases). Each probe runs the SAME statement text
in Spark (local dialect) and DuckDB (remote dialect) and prints values
AND dtypes side by side. Anything divergent must be guarded in
unparse_for_remote or translated."""
import duckdb
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").getOrCreate())
con = duckdb.connect()

PROBES = [
    # operator tokens (not call-shaped -> invisible to the allowlist)
    "SELECT 2 ^ 3 AS v",                 # Spark XOR=1, DuckDB power=8?
    "SELECT 5 & 3 AS v",
    "SELECT 5 | 3 AS v",
    "SELECT ~5 AS v",
    "SELECT 8 >> 1 AS v",
    "SELECT 1 << 3 AS v",
    "SELECT 7 % 3 AS v",
    "SELECT -7 % 3 AS v",
    "SELECT 'ab' || 'cd' AS v",
    "SELECT 'ab' || NULL AS v",
    # arithmetic edges
    "SELECT 1 / 0 AS v",
    "SELECT 1.0 / 0 AS v",
    "SELECT CAST(1 AS DOUBLE) / 0 AS v",
    "SELECT 7 / 2 AS v",                 # int division semantics
    # result dtypes of shipped aggregates (schema fidelity)
    "SELECT sum(x) AS v FROM (SELECT CAST(1 AS INT) AS x)",
    "SELECT sum(x) AS v FROM (SELECT CAST(1 AS BIGINT) AS x)",
    "SELECT avg(x) AS v FROM (SELECT CAST(1 AS BIGINT) AS x)",
    "SELECT sum(x) AS v FROM (SELECT CAST(1.5 AS DECIMAL(10,2)) AS x)",
    "SELECT count(*) AS v",
    "SELECT 1 AS v",                     # literal int dtype
    "SELECT 1.5 AS v",                   # literal decimal dtype
    "SELECT date_trunc('month', DATE '2024-03-15') AS v",
    "SELECT year(DATE '2024-03-15') AS v",
    "SELECT length('abc') AS v",
    "SELECT abs(CAST(-1 AS INT)) AS v",
    "SELECT greatest(1, 2.5) AS v",
    "SELECT coalesce(NULL, 2) AS v",
    "SELECT min(x) AS v FROM (SELECT CAST(1 AS INT) AS x)",
    # comparison/semantic edges
    "SELECT '10' = 10 AS v",
    "SELECT NULL = NULL AS v",
    "SELECT 'a' < 'B' AS v",             # collation
    "SELECT CAST('nan' AS DOUBLE) > CAST('inf' AS DOUBLE) AS v",
]

for q in PROBES:
    try:
        sdf = spark.sql(q)
        srow = sdf.collect()[0][0]
        stype = sdf.schema[0].dataType.simpleString()
        sres = f"{srow!r} :: {stype}"
    except Exception as e:
        sres = f"ERR {type(e).__name__}: {str(e)[:80]}"
    try:
        rel = con.sql(q)
        drow = rel.fetchall()[0][0]
        dtype = str(rel.types[0])
        dres = f"{drow!r} :: {dtype}"
    except Exception as e:
        dres = f"ERR {type(e).__name__}: {str(e)[:80]}"
    flag = "  " if sres.split(" :: ")[0] == dres.split(" :: ")[0] else "!!"
    print(f"{flag} {q}\n     spark : {sres}\n     duckdb: {dres}")

spark.stop()
