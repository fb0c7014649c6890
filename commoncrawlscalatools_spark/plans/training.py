"""The composed training-data pipeline — the LLM-extension analog of
plans/corpus.py's createCorpus composition: every stage a web-scale
training-data run performs between raw documents and tokenizer batches,
chained end-to-end with zero driver exits (the packing stage's two O(1)
scalars excepted):

    quality gate (lang-neutral: token range + repetition profile)
      → exact dedup (winner per content hash)
        → benchmark decontamination (held-out split, broadcast grams)
          → PII redaction (codegen'd regex chain)
            → deterministic stratified sampling by language
              → GPT-style sequence packing into fixed-budget chunks

Each stage is the already-oracled operator; the composed DuckDB oracle
(queries.py) nests the same fragments, so the pipeline is value-verified
end-to-end, not just stage-by-stage. No reference counterpart — this is
the extension-family flagship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from commoncrawlscalatools_spark.cachehooks import own_caches
from commoncrawlscalatools_spark.functions.pii import redact_pii
from commoncrawlscalatools_spark.functions.text import (
    quality_gates,
    token_count_ws,
)
from commoncrawlscalatools_spark.operators.dedup import decontaminate
from commoncrawlscalatools_spark.operators.sampling import (
    pack_sequences,
    stratified_sample,
)


def training_data_pipeline(
    docs: DataFrame,
    gate_params: dict,
    permille: dict[str, int],
    default_permille: int = 500,
    bench_mod: int = 11,
    decon_n: int = 8,
    budget: int = 500,
    n_buckets: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """documents → (chunk_id, doc_id, n_tokens) packed training chunks.

    Stage order is the real-pipeline order: cheap narrow gates first
    (volume drops before anything shuffles), content dedup before the
    gram-heavy decontamination pass, redaction before token counting
    (budgets must count what ships). The lang-neutral gate conjunction
    (pass_len AND pass_repetition) keeps the stratified stage meaningful
    across languages; the full Gopher conjunction is the gated
    quality_gate_docs query's job."""
    # Persist the (narrow: id + booleans) gate frame BEFORE filtering on
    # it: quality_gates is a zero-shuffle projection chain, and Catalyst
    # pushes a filter on its computed booleans through every projection
    # down to the SCAN side of the parallelism-spreading exchange — the
    # whole gate evaluation would then run inside the filter on the
    # unsplit single-file scan partition (measured 2× the pipeline wall
    # at sf1.0). The cache is a hard pushdown barrier: the chain runs
    # once, post-spread, full-width; the filter reads cached booleans.
    # At cluster scale this is the written gate-verdict table every
    # pipeline materializes anyway.
    g = quality_gates(docs, text_col, id_col, **gate_params).persist()
    keep = g.where(F.col("pass_len") & F.col("pass_repetition")).select(id_col)
    base = docs.join(keep, id_col)

    winners = (
        base.groupBy(F.md5(F.col(text_col)).alias("__k"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    deduped = base.join(winners, id_col)

    # corpus feeds TWO branches of one action (the decontamination gram
    # pass and the left-anti survivor join) — persist it so the
    # gate-join + dedup-join upstream runs once, not per branch
    corpus = deduped.where(F.col(id_col) % bench_mod != 0).persist()
    bench = docs.where(F.col(id_col) % bench_mod == 0)
    contaminated = decontaminate(corpus, bench, text_col, id_col, n=decon_n).select(
        id_col
    )
    clean = corpus.join(contaminated, id_col, "left_anti")

    redacted = clean.select(
        id_col, lang_col, redact_pii(F.col(text_col)).alias(text_col)
    )
    sampled = stratified_sample(
        redacted, lang_col, id_col, permille, default_permille
    )
    packed = pack_sequences(
        sampled.select(id_col, token_count_ws(F.col(text_col)).alias("__tok")),
        id_col,
        F.col("__tok"),
        budget=budget,
        n_buckets=n_buckets,
    )
    return own_caches(packed, cached=(g, corpus))
