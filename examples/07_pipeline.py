"""Beyond-reference: the training-data pipeline operators composed
end-to-end on the documents/embeddings tables (BASELINE.json north star).
"""

import os

from pyspark.sql import functions as F

from _common import SF_DIR, engine
from clickhouse_datafusion_spark.operators.dedup import (
    drop_exact_dups, drop_repeated_spans, minhash_candidates)
from clickhouse_datafusion_spark.operators.packing import pack_sequences
from clickhouse_datafusion_spark.operators.similarity import cosine_topk
from clickhouse_datafusion_spark.operators.text import analyze

eng = engine()
spark = eng.spark

docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))

print("== exact dedup -> intra-doc span dedup -> quality/lang analysis ==")
clean = drop_exact_dups(docs)
spans = drop_repeated_spans(clean)
spans.filter(F.col("n_tokens_after") < F.col("n_tokens_before")).show(3)
analyze(clean.limit(100)).select(
    "doc_id", "ws_tokens", "quality", "lang_pred", "dup_word_frac").show(5)

print("== MinHash near-dup candidates (production xxhash64 family) ==")
minhash_candidates(docs, threshold=0.5).show(5)

print("== ANN: exact cosine top-k for vec 0 ==")
qvec = [float(x) for x in
        emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
cosine_topk(emb, qvec, k=5).show()

print("== sequence packing at budget 1024 ==")
pack_sequences(docs, budget=1024).show(5)

print("== BM25 corpus selection (pull docs about joins/hashing) ==")
from clickhouse_datafusion_spark.operators.text import bm25_scores

bm25_scores(docs, ["hash", "join", "vector", "stream"]) \
    .orderBy(F.desc("score_milli")).show(5)

print("== domain caps + blocklist, then seeded training order ==")
from clickhouse_datafusion_spark.operators.sampling import domain_cap, seeded_shuffle

capped = domain_cap(docs, cap=5, blocklist=["src0"])
seeded_shuffle(capped, seed=42, n_shards=4) \
    .orderBy("shard", "pos").show(5)

print("== incremental crawl dedup against the prior snapshot ==")
from clickhouse_datafusion_spark.operators.dedup import incremental_dedup

prior = docs.filter(F.col("doc_id") < 250)
crawl = docs.filter(F.col("doc_id") >= 250)
print("fresh docs:", incremental_dedup(crawl, prior).count())

print("== per-label embedding centroids (class prototypes) ==")
from clickhouse_datafusion_spark.operators.similarity import label_centroids

label_centroids(emb).orderBy("label", "pos").show(5)

print("== cross-document duplicate-span removal (ExactSubstr-style) ==")
from clickhouse_datafusion_spark.operators.dedup import drop_cross_doc_spans

spans = drop_cross_doc_spans(docs, ngram=8)
spans.filter(F.col("n_words_after") < F.col("n_words_before")) \
    .select("doc_id", "n_words_before", "n_words_after").show(5)

print("== one-pass per-column dataset profile ==")
from clickhouse_datafusion_spark.operators.profile import column_profile

column_profile(docs, ["doc_id", "lang", "source", "n_chars"]).show()

print("== int8 embedding quantization ==")
from clickhouse_datafusion_spark.operators.similarity import quantize_embeddings

quantize_embeddings(emb).select("vec_id", "scale_micro").show(3)

print("== bigram-LM familiarity filter (Stupid Backoff, integer ppm) ==")
from clickhouse_datafusion_spark.operators.text import bigram_lm_score

bigram_lm_score(docs.limit(200), lm_df=docs.filter(F.col("doc_id") < 250)) \
    .orderBy(F.desc("score_ppm")).show(5)

print("== production LM flow: train offline once, score every shard ==")
import tempfile

from clickhouse_datafusion_spark.operators.text import (
    build_bigram_lm, load_bigram_lm, save_bigram_lm, score_with_bigram_lm)

lm_dir = tempfile.mkdtemp(prefix="bigram_lm_")
bi, bk = build_bigram_lm(docs.filter(F.col("doc_id") < 250))
v = save_bigram_lm(bi, bk, lm_dir)          # pinned snapshot version
bi, bk = load_bigram_lm(spark, lm_dir, v)   # any later scoring run
score_with_bigram_lm(docs.limit(200), bi, bk) \
    .orderBy(F.desc("score_ppm")).show(5)

print("== HTML -> text extraction ==")
from clickhouse_datafusion_spark.operators.text import strip_html_col

html = docs.limit(3).select(
    "doc_id",
    F.concat(F.lit("<html><body><p>"), F.col("text"),
             F.lit("</p><script>x()</script></body></html>")).alias("html"))
html.select("doc_id", strip_html_col("html").alias("clean")).show(3, 60)

print("== priority sampling: 50 docs weighted by length, unbiased w_hat ==")
from clickhouse_datafusion_spark.operators.sampling import priority_sample_k

ps = priority_sample_k(docs.select("doc_id", "n_chars"), 50, "n_chars")
print("sum(w_hat) estimates total chars:",
      ps.agg(F.sum("w_hat")).first()[0], "vs true",
      docs.agg(F.sum("n_chars")).first()[0])

print("== whole-doc bin packing at budget 2048 (SFT, no mid-example cuts) ==")
from clickhouse_datafusion_spark.operators.packing import bin_pack_documents

bin_pack_documents(docs, budget=2048).orderBy("bin_id", "bin_offset").show(5)

print("== per-source length quantiles (drift monitor) ==")
from clickhouse_datafusion_spark.operators.profile import group_quantiles

group_quantiles(docs.select("source", "n_chars"), "n_chars", "source") \
    .orderBy("source", "q_permille").show(9)

print("== snapshot MERGE: refresh 200-399, delete <50, pin v2 ==")
import tempfile

from clickhouse_datafusion_spark.operators.layout import (
    read_snapshot, upsert_snapshot, write_snapshot)

snap = tempfile.mkdtemp(prefix="corpus_snap_")
write_snapshot(docs.filter(F.col("doc_id") < 300)
               .select("doc_id", "source", "text"), snap)
upsert_snapshot(
    spark, snap,
    docs.filter(F.col("doc_id").between(200, 399))
    .select("doc_id", F.lit("refreshed").alias("source"), "text"),
    deletes=docs.filter(F.col("doc_id") < 50).select("doc_id"))
print("v2 rows:", read_snapshot(spark, snap, version=2).count())

print("== near-dup eval contamination (broadcast eval, no train shuffle) ==")
from clickhouse_datafusion_spark.operators.dedup import near_contamination

evalset = docs.filter(F.col("doc_id") % 100 == 0) \
    .select("doc_id", F.expr(
        "array_join(slice(split(text, ' '), 1,"
        " (size(split(text, ' ')) * 4) DIV 5), ' ')").alias("text"))
near_contamination(docs, evalset, threshold_permille=300).show(5)

print("== hard negatives for contrastive training (top-2 per anchor) ==")
from clickhouse_datafusion_spark.operators.similarity import hard_negatives

hard_negatives(emb.limit(200), k=2, threshold=0.4, dim=64) \
    .orderBy("anchor", "rank").show(6)

print("== snapshot diff v1->v2 (the incremental re-embedding feed) ==")
from clickhouse_datafusion_spark.operators.layout import (
    compact_snapshot, snapshot_diff)

snapshot_diff(spark, snap, 1, 2).groupBy("status").count().show()

print("== compact the snapshot's small files ==")
v = compact_snapshot(spark, snap)
print("compacted into version", v)

print("== retention cohorts + window funnel (CH aggregate analogs) ==")
from clickhouse_datafusion_spark.operators.funnel import funnel_depths, retention

ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
retention(ev, [F.col("event_type") == "signup",
               F.col("event_type") == "purchase",
               F.col("event_type") == "click"]) \
    .agg(F.sum("r_1").alias("signed_up"), F.sum("r_2").alias("purchased"),
         F.sum("r_3").alias("clicked")).show()
funnel_depths(ev, [F.col("event_type") == "signup",
                   F.col("event_type") == "view",
                   F.col("event_type") == "purchase"],
              window=F.expr("INTERVAL 7 DAYS")) \
    .groupBy("depth").count().orderBy("depth").show()

print("== key-skew report before an expensive join ==")
from clickhouse_datafusion_spark.operators.profile import key_skew

key_skew(ev, "user_id", top_k=5).show()

print("== nested 1%/10%/100% scaling-law draws ==")
from clickhouse_datafusion_spark.operators.sampling import nested_subsamples

nested_subsamples(docs.select("doc_id")).groupBy("tier").count() \
    .orderBy("tier").show()
