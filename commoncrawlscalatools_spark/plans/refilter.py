"""The refilter pipeline — the reference's third table-to-table job,
composed end-to-end from the library operators, Spark-first:

  reference step                              here
  refilterWETRecords.scala:84-105             TopicFilterConfig (mentions +
    new FourForumsWARCTopicFilter with          separator requirements are
    setMentions / setRequireTokenSeparator      constructor args)
  refilterWETRecords.scala:101-114            categories_expr → legacy
    get_category_string: categorize, "{}" →     encode; empty set → NULL
    None else Some(cat_string)                  (the reference's Option)
  refilterWETRecords.scala:155-163            refilter_records: recompute
    map over full source + filter               categories from content,
    nonempty categories                         keep nonempty
  refilterWETRecords.scala:166-170            refilter_index +
    write wetrecord_refiltered +                SnapshotStore writes
    wetrecord_index_refiltered
  deleteRefilteredWETRecordsFromSource        split_source_for_delete:
    .scala:71-86: decode STORED category        decode the stored legacy
    string, keep rows containing the            string (NOT the recomputed
    target category, deleteFromCassandra        one), anti-join rewrite

The reference runs this as two separate spark-submit programs against a
mutable Cassandra table: refilter writes the new tables first, then the
delete program removes the migrated rows from the source. Here the same
ordering is one job over SnapshotStore versions with the SOURCE publish
as the final atomic commit point: a crash anywhere before it leaves the
source table's published version untouched (readers still see every
row), and a re-run overwrites the same target versions idempotently —
the delete is all-or-nothing, which Cassandra's row-at-a-time
deleteFromCassandra cannot promise.

Scale notes (100 TB): the whole job is one scan of the source table —
category recompute is codegen'd regexp_count per row, the delete is a
filter (NOT a join; the predicate is a function of the row itself), and
each sink is a straight columnar write. Nothing shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from commoncrawlscalatools_spark.operators import filters as FL
from commoncrawlscalatools_spark.plans.state import SnapshotStore


def legacy_category_string(text: Column, config: FL.TopicFilterConfig) -> Column:
    """Recomputed category set in the reference's storage codec:
    "{'cat1','cat2'}", or NULL for the empty set (get_category_string's
    None, refilterWETRecords.scala:101-114)."""
    cats = FL.categories_expr(text, config)
    return F.when(F.size(cats) > 0, FL.encode_category_string(cats))


def refilter_records(
    src: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    config: FL.TopicFilterConfig | None = None,
) -> DataFrame:
    """Source rows re-categorized from content under `config`, keeping only
    rows that still qualify for ≥1 category (refilterWETRecords.scala:
    155-163). The stored category column is replaced by the recomputed
    legacy-codec string."""
    config = config or FL.TopicFilterConfig()
    out = src.withColumn(
        "categories", legacy_category_string(F.col(text_col), config)
    )
    return out.filter(F.col("categories").isNotNull())


def refilter_index(refiltered: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, categories) index rows (WARCIndexCassandraBindWithCategories
    String, refilterWETRecords.scala:164-170)."""
    return refiltered.select(id_col, "categories")


def split_source_for_delete(
    src: DataFrame,
    old_categories_col: str = "categories",
    delete_categories: list[str] | tuple[str, ...] = ("guncontrol",),
) -> tuple[DataFrame, DataFrame]:
    """(to_delete, remaining) by decoding the STORED legacy category string
    — deleteRefilteredWETRecordsFromSource.scala:71-84 keys the delete on
    what the table says, not on a recompute. Returns a row-local filter
    split (no join): at 100 TB the delete predicate costs one scan."""
    old = FL.decode_category_string(F.col(old_categories_col))
    hit = F.arrays_overlap(old, F.lit(list(delete_categories)))
    return src.filter(hit), src.filter(~hit)


def refilter_outcomes(
    src: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    config: FL.TopicFilterConfig | None = None,
    old_categories_col: str = "categories",
    delete_categories: list[str] | tuple[str, ...] = ("guncontrol",),
) -> DataFrame:
    """The logical join of both reference programs as one per-row outcome
    table: (id, new_categories, refiltered, deleted_from_source) for every
    row that is refiltered and/or deleted. This is the oracle surface the
    gated `refilter_pipeline` query exposes; `refilter_job` is the same
    composition with store sinks."""
    from commoncrawlscalatools_spark.cachehooks import own_caches
    from commoncrawlscalatools_spark.spread import spread

    config = config or FL.TopicFilterConfig()
    new_cats = legacy_category_string(F.col(text_col), config)
    # r7 shape: the recomputed category string is a ~|keywords|-regex
    # battery per row. The r6 single projection referenced it TWICE
    # (value + isNotNull) and the outcome filter's pushdown substituted
    # it a third time — all on the unsplit source scan partition. Now:
    # spread the scan, materialize the battery ONCE per row behind a
    # projection, and persist the narrow outcome surface before the
    # filter (the cache is the pushdown barrier; without it the
    # substituted predicate lands below the spread exchange on the
    # single-partition scan side). At store scale this surface is the
    # outcome table the job writes anyway.
    base = spread(src.select(id_col, text_col, old_categories_col), id_col)
    step = base.select(
        F.col(id_col),
        new_cats.alias("new_categories"),
        FL.decode_category_string(F.col(old_categories_col)).alias("__old"),
    )
    out = step.select(
        F.col(id_col),
        F.col("new_categories"),
        F.col("new_categories").isNotNull().alias("refiltered"),
        F.arrays_overlap(
            F.col("__old"), F.lit(list(delete_categories))
        ).alias("deleted_from_source"),
    ).persist()
    return own_caches(
        out.filter(F.col("refiltered") | F.col("deleted_from_source")),
        cached=(out,),
    )


def refilter_job(
    store: SnapshotStore,
    source_table: str = "wetrecord",
    text_col: str = "text",
    id_col: str = "doc_id",
    config: FL.TopicFilterConfig | None = None,
    delete_categories: list[str] | tuple[str, ...] = ("guncontrol",),
    coalesce: int | None = None,
) -> dict:
    """Composed store job: read source → write `<src>_refiltered` +
    `<src>_index_refiltered` → rewrite source minus the deleted rows.

    Commit protocol (write/publish split, cf. the crawl round): all three
    data writes land unpublished, the two target tables publish first, and
    the SOURCE publish is last — the single atomic commit point for the
    delete. Crash before it: published source is untouched (no partial
    delete is ever visible), targets may hold published-but-superseded
    data that an idempotent re-run overwrites in place. Versions advance
    the source snapshot chain; targets are written at the same version for
    lineage."""
    config = config or FL.TopicFilterConfig()
    src = store.read(source_table)
    version = (store.latest_version(source_table) or 0) + 1

    refiltered = refilter_records(src, text_col, id_col, config)
    index = refilter_index(refiltered, id_col)
    _, remaining = split_source_for_delete(
        src, "categories", delete_categories
    )

    store.write_unpublished(refiltered, f"{source_table}_refiltered", version, coalesce)
    store.write_unpublished(index, f"{source_table}_index_refiltered", version, coalesce)
    store.write_unpublished(remaining, source_table, version, coalesce)

    store.publish(f"{source_table}_refiltered", version)
    store.publish(f"{source_table}_index_refiltered", version)
    # the delete becomes visible HERE, atomically, or not at all
    store.publish(source_table, version)
    return {
        "version": version,
        "refiltered": store.read(f"{source_table}_refiltered").count(),
        "source_rows": store.read(source_table).count(),
    }
