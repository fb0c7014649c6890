"""Stream filter (fast keyword gate) and topic filter (categorizer).

Reference semantics:
  * Stream filter — FourForumsWARCStreamFilter.scala:130-269. Two phases,
    cheap→expensive, short-circuiting:
      (1) total case-insensitive mentions of any keyword ≥ minmentions;
      (2) detailCheck: split content into chunks on newlines and '. ',
          keep chunks with 7 < words < 50, scan at most
          `max_chunks_to_check` (5000) chunks for ≥1 keyword mention.
    Catalyst does not cost-reorder opaque predicates, so we keep the phase
    ordering explicit as two chained filters (SURVEY.md §4).
  * Topic filter — FourForumsWARCTopicFilter.scala:216-357. Per category:
    sum of core-keyword mentions ≥ min_core AND sum of secondary-keyword
    mentions ≥ min_secondary (defaults: number of keywords of that kind).
    Token-separator policy per (category, kind): 0 = substring match,
    1 = a non-word char (or string boundary) on at least one side,
    2 = on both sides (FourForumsWARCTopicFilter.scala:370-404).

Everything is native Catalyst expressions (regexp_count is JVM-side and
codegen'd) — the reference's first-char dispatch trick
(FourForumsWARCTopicFilter.scala:417-511) is obsolete under vectorized
regex counting (SURVEY.md §4).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# FourForums configuration (FourForumsWARCTopicFilter.scala:55-68)
CORE_KEYWORDS: dict[str, list[str]] = {
    "guncontrol": ["gun", "guns"],
    "abortion": ["abortion"],
    "evolution": ["evolution"],
    "existenceofgod": ["god"],
}
SECONDARY_KEYWORDS: dict[str, list[str]] = {
    "guncontrol": ["strict", "control"],
    "abortion": ["pro-life", "pro-choice"],
    "evolution": ["natural", "mechanism", "intelligent", "design"],
    "existenceofgod": ["atheist", "theist", "exist"],
}
STREAM_KEYWORDS = ["abortion", "gun", "evolution", "god"]  # FourForumsWARCStreamFilter.scala:30
MAX_CHUNKS_TO_CHECK = 5000  # FourForumsWARCStreamFilter.scala:41


def keyword_pattern(keyword: str, separator_level: int = 0) -> str:
    """Case-insensitive match pattern under the token-separator policy."""
    kw = re.escape(keyword)
    if separator_level == 0:
        return f"(?i){kw}"
    if separator_level == 1:
        return f"(?i)(?:(?<![a-zA-Z0-9]){kw}|{kw}(?![a-zA-Z0-9]))"
    if separator_level == 2:
        return f"(?i)(?<![a-zA-Z0-9]){kw}(?![a-zA-Z0-9])"
    raise ValueError(f"separator_level must be 0/1/2, got {separator_level}")


def mention_count(text: Column, keywords: list[str], separator_level: int = 0) -> Column:
    """Total case-insensitive mentions of any keyword (reference ciMatch sum)."""
    counts = [
        F.regexp_count(text, F.lit(keyword_pattern(k, separator_level)))
        for k in keywords
    ]
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    return total


@dataclass
class TopicFilterConfig:
    core: dict[str, list[str]] = field(default_factory=lambda: dict(CORE_KEYWORDS))
    secondary: dict[str, list[str]] = field(
        default_factory=lambda: dict(SECONDARY_KEYWORDS)
    )
    # min mentions; default = number of keywords of that kind
    # (FourForumsWARCTopicFilter.scala create_criteria_structures)
    min_core: dict[str, int] | None = None
    min_secondary: dict[str, int] | None = None
    separator_level: dict[str, dict[str, int]] | None = None  # cat -> kind -> 0/1/2

    def thresholds(self, cat: str) -> tuple[int, int]:
        mc = (self.min_core or {}).get(cat, len(self.core[cat]))
        ms = (self.min_secondary or {}).get(cat, len(self.secondary[cat]))
        return mc, ms

    def sep(self, cat: str, kind: str) -> int:
        return ((self.separator_level or {}).get(cat) or {}).get(kind, 0)


def category_counts(text: Column, config: TopicFilterConfig | None = None) -> dict[str, tuple[Column, Column]]:
    """(core_count, secondary_count) columns per category."""
    config = config or TopicFilterConfig()
    out = {}
    for cat in sorted(config.core):
        core = mention_count(text, config.core[cat], config.sep(cat, "core"))
        sec = mention_count(text, config.secondary[cat], config.sep(cat, "secondary"))
        out[cat] = (core, sec)
    return out


def categories_expr(text: Column, config: TopicFilterConfig | None = None) -> Column:
    """`array<string>` of categories the document qualifies for, sorted —
    the reference's Set[String] (FourForumsWARCTopicFilter.scala:305-357)."""
    config = config or TopicFilterConfig()
    counts = category_counts(text, config)
    members = []
    for cat, (core, sec) in counts.items():
        mc, ms = config.thresholds(cat)
        members.append(F.when((core >= mc) & (sec >= ms), F.lit(cat)))
    arr = F.array(*members)
    return F.array_sort(F.filter(arr, lambda x: x.isNotNull()))


def decode_category_string(col: Column) -> Column:
    """Legacy category-string codec (F7): the reference stored category
    sets as "{'existenceofgod','guncontrol'}" and decoded them by hand
    (getSubwordsFromWETRecords.scala get_list_of_categories / refilterWET
    Records.scala:42-50: split on "','", strip [}{']). Same two steps as a
    codegen'd expression; empty/null strings decode to an empty array."""
    parts = F.split(col, "','")
    decoded = F.transform(parts, lambda x: F.regexp_replace(x, r"[}{']", ""))
    decoded = F.filter(decoded, lambda x: x != "")
    return F.when(col.isNotNull(), decoded).otherwise(
        F.array().cast("array<string>")
    )


def encode_category_string(categories: Column) -> Column:
    """Inverse codec: array<string> → the reference's storage format."""
    return F.concat(
        F.lit("{'"), F.array_join(categories, "','"), F.lit("'}")
    )


def category_counts_map(text: Column, config: TopicFilterConfig | None = None) -> Column:
    """`map<string, struct<core:int, secondary:int>>` of raw counts."""
    config = config or TopicFilterConfig()
    counts = category_counts(text, config)
    kvs = []
    for cat, (core, sec) in counts.items():
        kvs.append(F.lit(cat))
        kvs.append(F.struct(core.alias("core"), sec.alias("secondary")))
    return F.create_map(*kvs)


def topic_categorize(
    df: DataFrame, text_col: str = "text", config: TopicFilterConfig | None = None
) -> DataFrame:
    text = F.col(text_col)
    return df.withColumn("categories", categories_expr(text, config)).withColumn(
        "category_counts", category_counts_map(text, config)
    )


# ----- stream filter ---------------------------------------------------------


def _chunks(text: Column) -> Column:
    """Chunk on newlines and sentence breaks ('. '), as detailCheck does
    (FourForumsWARCStreamFilter.scala:168-229)."""
    return F.split(F.regexp_replace(text, r"\. ", "\n"), "\n")


def detail_check_expr(
    text: Column,
    keywords: list[str] = STREAM_KEYWORDS,
    max_chunks: int = MAX_CHUNKS_TO_CHECK,
) -> Column:
    """True iff any of the first `max_chunks` well-sized chunks
    (7 < words < 50) mentions a keyword."""
    sized = F.filter(
        _chunks(text),
        lambda c: (F.size(F.filter(F.split(c, r"\s+"), lambda x: x != "")) > 7)
        & (F.size(F.filter(F.split(c, r"\s+"), lambda x: x != "")) < 50),
    )
    bounded = F.slice(sized, 1, max_chunks)
    pat = "(?i)(?:" + "|".join(re.escape(k) for k in keywords) + ")"
    return F.exists(bounded, lambda c: c.rlike(pat))


def stream_filter(
    df: DataFrame,
    text_col: str = "text",
    keywords: list[str] = STREAM_KEYWORDS,
    minmentions: int = 1,
    max_chunks: int = MAX_CHUNKS_TO_CHECK,
) -> DataFrame:
    """Two-phase keyword gate; phase order is load-bearing (cheap count
    first — ~0.1% selectivity expected at crawl scale, BASELINE.md)."""
    text = F.col(text_col)
    phase1 = mention_count(text, keywords) >= minmentions
    return df.filter(phase1).filter(detail_check_expr(text, keywords, max_chunks))


# ----- filter stats side-output (W7 depth) -----------------------------------


def stream_filter_stats(
    df: DataFrame,
    text_col: str = "text",
    keywords: list[str] = STREAM_KEYWORDS,
    minmentions: int = 1,
    max_chunks: int = MAX_CHUNKS_TO_CHECK,
) -> DataFrame:
    """Per-batch aggregated stream-filter stats side-output. The reference
    wrote one async Cassandra row PER RECORD with (accepted,
    rejected_detail, rejected_no_detail, processing_time)
    (StreamFilterStatsWriter.scala:12-68); at 100 TB a per-record RPC per
    document is the anti-pattern, so the same measurements ride one
    aggregation in the same pass shape as stream_filter: one output row
    per outcome with the doc count and total keyword mentions. `accepted`
    here reconciles exactly with stream_filter's survivor count (pinned in
    tests/test_filters.py)."""
    text = F.col(text_col)
    mentions = mention_count(text, keywords)
    outcome = (
        F.when(mentions < minmentions, F.lit("rejected_no_detail"))
        .when(~detail_check_expr(text, keywords, max_chunks), F.lit("rejected_detail"))
        .otherwise(F.lit("accepted"))
    )
    return (
        df.select(outcome.alias("outcome"), mentions.alias("__m"))
        .groupBy("outcome")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("__m").cast("long")).alias("total_mentions"),
        )
    )


def timed_batch_stats(df: DataFrame, sum_cols: list[str]) -> DataFrame:
    """Per-batch timing for a stats pass (W7 depth, VERDICT r3 #7): the
    reference's stats writers recorded a processing-time measurement per
    record (StreamFilterStatsWriter.scala:12-68); at 100 TB a per-row
    clock is the anti-pattern, so the measurement rides the Arrow batch.
    The OUTCOME columns stay upstream JVM expressions (codegen'd regexp —
    the hot path never enters Python); this stage only times how long the
    upstream pipeline takes to produce each Arrow batch (iterator pull →
    batch arrival) and sums a handful of numeric columns per batch. One
    output row per batch: (part_id, batch, n_docs, <sums…>, batch_ms)."""
    import time as _time

    from pyspark import TaskContext
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("part_id", T.IntegerType(), False),
            T.StructField("batch", T.IntegerType(), False),
            T.StructField("n_docs", T.LongType(), False),
        ]
        + [T.StructField(c, T.LongType(), True) for c in sum_cols]
        + [T.StructField("batch_ms", T.DoubleType(), False)]
    )

    def run(it):
        import pandas as pd

        pid = TaskContext.get().partitionId()
        t_prev = _time.perf_counter()
        for b, pdf in enumerate(it):
            t_now = _time.perf_counter()  # upstream production + transfer
            row = {"part_id": pid, "batch": b, "n_docs": len(pdf)}
            for c in sum_cols:
                row[c] = int(pdf[c].sum())
            row["batch_ms"] = (t_now - t_prev) * 1000.0
            yield pd.DataFrame([row])
            t_prev = _time.perf_counter()

    return df.mapInPandas(run, out_schema)


STREAM_OUTCOME_COLS = ["accepted", "rejected_detail", "rejected_no_detail"]


def stream_filter_stats_timed(
    df: DataFrame,
    text_col: str = "text",
    keywords: list[str] = STREAM_KEYWORDS,
    minmentions: int = 1,
    max_chunks: int = MAX_CHUNKS_TO_CHECK,
) -> DataFrame:
    """Stream-filter stats WITH per-batch processing-time measurements —
    one row per Arrow batch carrying the outcome counts, total mentions,
    and the batch wall. Counts reconcile exactly with
    `stream_filter_stats` (pinned in tests/test_filters.py); the timing
    columns are measurement, not oracle-able values."""
    text = F.col(text_col)
    mentions = mention_count(text, keywords)
    detail = detail_check_expr(text, keywords, max_chunks)
    phase1 = mentions >= minmentions
    outcomes = {
        "accepted": phase1 & detail,
        "rejected_detail": phase1 & ~detail,
        "rejected_no_detail": ~phase1,
    }
    # per-outcome mention sums ride along so the untimed outcome table is
    # fully DERIVABLE from these per-batch rows (one regexp pass serves
    # both stats tables — ADVICE r4 #5; stream_stats_from_timed below)
    pre = df.select(
        *[cond.cast("long").alias(name) for name, cond in outcomes.items()],
        mentions.cast("long").alias("total_mentions"),
        *[
            F.when(cond, mentions).otherwise(F.lit(0))
            .cast("long").alias(f"mentions_{name}")
            for name, cond in outcomes.items()
        ],
    )
    return timed_batch_stats(
        pre,
        STREAM_OUTCOME_COLS
        + ["total_mentions"]
        + [f"mentions_{n}" for n in STREAM_OUTCOME_COLS],
    )


def stream_stats_from_timed(per_batch: DataFrame) -> DataFrame:
    """Derive the untimed `stream_filter_stats` outcome table (outcome,
    n_docs, total_mentions) from the timed per-batch rows — the counts are
    sums of sums, so ONE regexp pass feeds both the oracle-gated outcome
    aggregate and the timing table (ADVICE r4 #5; equality with the direct
    one-pass table pinned in tests/test_filters.py). Zero-doc outcomes are
    absent, matching the direct groupBy."""
    rows = []
    for name in STREAM_OUTCOME_COLS:
        rows.append(
            F.struct(
                F.lit(name).alias("outcome"),
                F.sum(name).alias("n_docs"),
                F.sum(f"mentions_{name}").alias("total_mentions"),
            )
        )
    agg = per_batch.agg(F.array(*rows).alias("__rows"))
    return (
        agg.select(F.explode("__rows").alias("r"))
        .select("r.outcome", "r.n_docs", "r.total_mentions")
        .filter(F.col("n_docs") > 0)
    )


def topic_filter_stats_timed(
    df: DataFrame,
    text_col: str = "text",
    config: TopicFilterConfig | None = None,
) -> DataFrame:
    """Topic-filter stats with per-batch timing: per-category accepted /
    core-mention / secondary-mention sums per Arrow batch plus the batch
    wall. Same JVM-upstream discipline as stream_filter_stats_timed."""
    config = config or TopicFilterConfig()
    text = F.col(text_col)
    counts = category_counts(text, config)
    cols, sum_cols = [], []
    for cat, (core, sec) in counts.items():
        mc, ms = config.thresholds(cat)
        cols += [
            ((core >= mc) & (sec >= ms)).cast("long").alias(f"accepted_{cat}"),
            core.cast("long").alias(f"core_{cat}"),
            sec.cast("long").alias(f"sec_{cat}"),
        ]
        sum_cols += [f"accepted_{cat}", f"core_{cat}", f"sec_{cat}"]
    return timed_batch_stats(df.select(*cols), sum_cols)


def topic_stats_from_timed(
    per_batch: DataFrame, config: TopicFilterConfig | None = None
) -> DataFrame:
    """Derive the untimed `topic_filter_stats` per-category table from the
    timed per-batch rows (ADVICE r4 #5 — one regexp pass per family):
    checked = Σ n_docs (every doc is checked for every category), the
    rest are sums of the per-batch category sums. Equality with the
    direct table pinned in tests/test_filters.py."""
    config = config or TopicFilterConfig()
    rows = []
    for cat in config.core:
        rows.append(
            F.struct(
                F.lit(cat).alias("category"),
                F.sum("n_docs").alias("checked"),
                F.sum(f"accepted_{cat}").alias("accepted"),
                F.sum(f"core_{cat}").alias("total_core_mentions"),
                F.sum(f"sec_{cat}").alias("total_secondary_mentions"),
            )
        )
    agg = per_batch.agg(F.array(*rows).alias("__rows"))
    return agg.select(F.explode("__rows").alias("r")).select(
        "r.category", "r.checked", "r.accepted",
        "r.total_core_mentions", "r.total_secondary_mentions",
    )


def summarize_timed_stats(per_batch: DataFrame) -> DataFrame:
    """Collapse a timed per-batch stats table to one row: total counts +
    the min/max/sum ms aggregate the reference's stats consumers read
    (timings vary run to run — rows-only territory; the count columns are
    exact and reconcile with the untimed stats tables)."""
    skip = {"part_id", "batch", "batch_ms", "n_docs"}
    sums = [F.sum(c).alias(c) for c in per_batch.columns if c not in skip]
    return per_batch.agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("n_docs").alias("n_docs"),
        *sums,
        F.round(F.sum("batch_ms"), 1).alias("time_ms_sum"),
        F.round(F.min("batch_ms"), 1).alias("time_ms_min"),
        F.round(F.max("batch_ms"), 1).alias("time_ms_max"),
    )


def topic_filter_stats(
    df: DataFrame,
    text_col: str = "text",
    config: TopicFilterConfig | None = None,
) -> DataFrame:
    """Per-batch aggregated topic-filter stats: one row per category with
    docs checked, docs accepted, and total core/secondary mention counts
    (TopicFilterStatsWriter parity, aggregated instead of per-record).
    The per-category structs are built BEFORE the explode so the regexp
    counting runs once per (doc, category), then tiny structs shuffle."""
    config = config or TopicFilterConfig()
    text = F.col(text_col)
    counts = category_counts(text, config)
    structs = []
    for cat, (core, sec) in counts.items():
        mc, ms = config.thresholds(cat)
        structs.append(
            F.struct(
                F.lit(cat).alias("category"),
                core.alias("core"),
                sec.alias("secondary"),
                ((core >= mc) & (sec >= ms)).alias("accepted"),
            )
        )
    ex = df.select(F.explode(F.array(*structs)).alias("s"))
    return ex.groupBy(F.col("s.category").alias("category")).agg(
        F.count(F.lit(1)).alias("checked"),
        F.sum(F.col("s.accepted").cast("long")).alias("accepted"),
        F.sum(F.col("s.core").cast("long")).alias("total_core_mentions"),
        F.sum(F.col("s.secondary").cast("long")).alias("total_secondary_mentions"),
    )
