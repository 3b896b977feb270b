"""r12 verdict task 4 probe: can d3x (production xxhash64 MinHash+LSH)
carry a HARD DuckDB oracle via an exact-verify projection?

The idea: the gate projection becomes
    d3x candidates (xx banding, est >= 0.3)  ->  exact 3-gram Jaccard
    verify  ->  keep pairs with exact J >= T
whose DuckDB twin is the all-pairs exact-Jaccard set at T (shared-gram
join — no LSH, no xxhash64 needed). Equality holds iff, on the FIXED
testdata corpus, every exact pair >= T is (a) a band collision and
(b) scores est >= 0.3. Both sides are deterministic (fixed hash
constants, fixed corpus), so this probe decides the threshold T per
scale: report, for each T, the exact-pair count, how many d3x finds,
and the missing pairs with their est scores.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from clickhouse_datafusion_spark.operators.dedup import minhash_candidates
from clickhouse_datafusion_spark.session import get_spark


def exact_pairs(docs, ngram=3):
    """All-pairs exact distinct-3-gram Jaccard via shared-gram join
    (exact: NO frequency cap), in the d2 oracle's integer rounding."""
    w = docs.select(F.col("doc_id").alias("id"),
                    F.split("text", " ").alias("ws"))
    g = (w.filter(F.size("ws") >= ngram)
         .select("id", F.array_distinct(F.transform(
             F.sequence(F.lit(1), F.size("ws") - ngram + 1),
             lambda i: F.concat_ws(" ", *[
                 F.element_at("ws", (i + k).cast("int"))
                 for k in range(ngram)]))).alias("grams")))
    e = g.select("id", F.size("grams").alias("n"),
                 F.explode("grams").alias("gr"))
    j = (e.alias("a").join(e.alias("b"),
                           (F.col("a.gr") == F.col("b.gr"))
                           & (F.col("a.id") < F.col("b.id")))
         .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                  F.col("a.n").alias("na"), F.col("b.n").alias("nb"))
         .agg(F.count("*").alias("c"))
         .select("id_a", "id_b",
                 (F.floor(F.col("c") * 10000 /
                          (F.col("na") + F.col("nb") - F.col("c"))
                          + F.lit(0.5)) / 10000.0).alias("jac")))
    return j


def main():
    spark = get_spark(app_name="probe_d3x")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        docs = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
        nd = docs.count()
        cand = minhash_candidates(docs, threshold=0.3).cache()
        ncand = cand.count()
        ex = exact_pairs(docs).filter(F.col("jac") >= 0.25).cache()
        print(f"== {sf}: {nd} docs, {ncand} d3x candidates, "
              f"{ex.count()} exact pairs J>=0.25")
        for T in (0.3, 0.4, 0.5, 0.6, 0.7, 0.8):
            exT = ex.filter(F.col("jac") >= T)
            hit = exT.join(cand, ["id_a", "id_b"], "left_semi")
            nT, nh = exT.count(), hit.count()
            flag = "OK " if nT == nh else "MISS"
            print(f"   T={T}: exact={nT} found={nh} {flag}")
            if nT != nh and nT - nh <= 10:
                miss = exT.join(cand, ["id_a", "id_b"], "left_anti")
                for r in miss.collect():
                    print(f"      missing {r['id_a']},{r['id_b']} "
                          f"J={r['jac']}")
        # distribution of exact J (are pairs well-separated?)
        hist = (ex.select(F.floor(F.col("jac") * 10).alias("bin"))
                .groupBy("bin").count().orderBy("bin").collect())
        print("   exact-J histogram (bin=J*10):",
              {int(r["bin"]): r["count"] for r in hist})
        cand.unpersist(); ex.unpersist()


if __name__ == "__main__":
    main()
