"""The corpus-creation pipeline — the reference's second flagship job
(createCorpus.main, SURVEY.md §3.2) composed end-to-end from the library
operators, Spark-first:

  reference step (createCorpus.scala)        here
  1 Lucene scan + >0.1 + top-2000 (:286-309) relevance.search_topk
    (or BM25 — Lucene's actual model)        relevance.bm25_topk
  3-4 content fetch join (:314-329)          relevance.fetch_content_for_topk
                                             (broadcast ids, content never
                                             shuffles)
  5 shingle + split short docs (:337-345)    stopword_anchored_shingles size
  6-9 feature space → MinHashLSH →
      bucket pairs (:351-412)                dedup.minhash_dedup (explode +
                                             codegen'd min-aggs; no driver
                                             feature-space collect)
  10-11 per-set winner by relevance,
      driver-side (:416-442)                 distributed dominance edges
                                             (winner = highest relevance,
                                             ties smaller id) — no collect
  12 union short docs (:451-465)             unionByName
  13 export (:476)                           exports.corpus_records rows

Every driver exit in the reference (feature-space collect+broadcast,
id→relevance map, winner closure, discard set) is replaced by a
distributed equivalent — at 10^8 corpus candidates the driver holds
nothing but the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from commoncrawlscalatools_spark.cachehooks import own_caches
from commoncrawlscalatools_spark.functions import text as TX
from commoncrawlscalatools_spark.operators import dedup as DD
from commoncrawlscalatools_spark.operators import relevance as RV


def create_corpus(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 2000,
    min_relevance: float = 0.1,
    ngram: int = 3,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket: int | None = 1000,
    shingle_window: int = 6,
    tld_col: str | None = None,
) -> DataFrame:
    """search → top-K → content join → near-dup winner-by-relevance →
    union short docs → export rows. Returns
    (doc_id, relevance, n_shingles, filename) — the corpus manifest; pipe
    through exports.write_corpus_text / write_jdbc for the reference's
    sinks (S12/S9)."""
    topk = RV.search_topk(docs, query_terms, text_col, id_col, k, min_relevance)
    content = RV.fetch_content_for_topk(topk, docs, id_col)
    flagged = content.withColumn(
        "__n_sh", F.size(TX.stopword_anchored_shingles(F.col(text_col), shingle_window))
    )
    # the reference's complement set (createCorpus.scala:343-345): docs too
    # short to shingle skip dedup and rejoin the corpus at the end
    shingled = flagged.filter(F.col("__n_sh") > 0)
    short = flagged.filter(F.col("__n_sh") == 0)
    survivors = DD.minhash_dedup(
        shingled, text_col, id_col, relevance_col="relevance",
        ngram=ngram, threshold=threshold, num_perm=num_perm, bands=bands,
        max_bucket=max_bucket,
    )
    kept = shingled.join(
        survivors.select(id_col), id_col, "left_semi"
    ).unionByName(short)
    tld = F.col(tld_col) if tld_col else F.lit("unknown")
    # adopt minhash_dedup's internal caches (shingle/banded tables) so they
    # live until the composed manifest is consumed, then release
    return own_caches(kept.select(
        F.col(id_col),
        F.col("relevance"),
        F.col("__n_sh").alias("n_shingles"),
        # F11 filename derivation, same formula as exports.corpus_records
        # (tldn-hash.txt; SaveResultsToFile.scala:34-40)
        F.concat(tld, F.lit("-"), F.md5(F.col(text_col)), F.lit(".txt")).alias(
            "filename"
        ),
    ), adopt_from=(survivors,))
