"""Frontier scheduling: host-keyed priority queue + politeness delays.

Reference analog: the `wetpaths` scheduling table with started/finished
state and random sampling (GetWETPaths.scala:40-114), politeness via
random sleeps (ProcessWETPaths.scala:70,110). Re-expressed declaratively
per SURVEY.md §7: politeness is *computed* as a `not_before_ms` logical
timestamp per scheduled URL, never an executor sleep; random sampling
becomes a deterministic (priority, url_hash) order.

Determinism contract (north rule: identical crawl order at any
parallelism): every ordering key is data-derived — priority desc, then
url_hash — no zipWithIndex, no monotonically_increasing_id, no
partition-order dependence. The total crawl order is
(round, host, fetch_seq).

Scale notes:
  * The per-host ranking is one shuffle on `host`. Hot hosts are bounded
    by `per_host_cap` BEFORE any global operation, so a host with 10^7
    pending URLs contributes at most `cap` rows per round — the politeness
    constraint itself is the skew guard (salting within a host would break
    its fetch sequencing; SURVEY.md §7.4).
  * The global budget is a top-K (TakeOrderedAndProject), not a full sort.
    At 10^10-URL scale replace with a priority-threshold computed from
    approx quantiles; `budget=None` skips it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from commoncrawlscalatools_spark.functions import urls as U
from commoncrawlscalatools_spark.operators.robots import DEFAULT_CRAWL_DELAY_MS

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("state", T.StringType(), False),  # pending|scheduled|fetched|failed
        T.StructField("round", T.IntegerType(), False),  # round added
        T.StructField("retries", T.IntegerType(), False),
        T.StructField("log_message", T.StringType(), True),
    ]
)


def canonicalize_seeds(seeds: DataFrame, url_col: str = "url") -> DataFrame:
    """Seeds → canonical frontier candidates. Duplicate canonical URLs
    collapse to the highest-priority row (ties: first by url_hash) —
    deterministic, one hash-aggregate. The canonicalizer expression tree
    is memoized per SparkContext (it runs on every outlink every round;
    rebuilding it cost ~0.2 s of py4j per call — exprcache)."""
    from commoncrawlscalatools_spark.exprcache import cached_expr

    c = cached_expr("canonical_url", lambda: U.canonical_url(F.col(url_col)), url_col)
    # host is re-derived from the CANONICAL form, which is structurally
    # `scheme://host[:port][/path...]` by construction — a substring_index
    # chain gives the identical host without url_host's three regex passes
    # (this expression runs on every outlink every round)
    host = F.substring_index(
        F.substring_index(F.substring_index(F.col("url"), "://", -1), "/", 1),
        ":",
        1,
    )
    cand = (
        seeds.select(
            c.alias("url"),
            F.col("priority").cast("double").alias("priority"),
        )
        .filter(F.col("url").isNotNull())
        .withColumn("url_hash", U.url_hash(F.col("url")))
        .withColumn("host", host)
    )
    return cand.groupBy("url", "url_hash", "host").agg(
        F.max("priority").alias("priority")
    )


def as_frontier_rows(cand: DataFrame, round_no: int) -> DataFrame:
    return cand.select(
        "url",
        "url_hash",
        "host",
        "priority",
        F.lit("pending").alias("state"),
        F.lit(round_no).cast("int").alias("round"),
        F.lit(0).cast("int").alias("retries"),
        F.lit(None).cast("string").alias("log_message"),
    )


def schedule_round(
    frontier: DataFrame,
    host_state: DataFrame | None,
    robots_delays: DataFrame | None,
    round_no: int,
    per_host_cap: int = 10,
    budget: int | None = None,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Pick this round's fetch set from pending frontier rows.

    Returns (url, url_hash, host, priority, round, fetch_seq, not_before_ms,
    crawl_delay_ms): fetch_seq is the politeness sequence within the host;
    not_before_ms = host_ready_ms + (fetch_seq-1)·crawl_delay_ms.
    """
    pending = frontier.filter(F.col("state") == "pending")
    if shuffle_partitions is not None:
        # explicit per-round shuffle tuning (north rule); AQE coalesces tails
        pending = pending.repartition(shuffle_partitions, "host")
    if robots_delays is not None:
        pending = pending.join(F.broadcast(robots_delays), "host", "left")
    else:
        pending = pending.withColumn("crawl_delay_ms", F.lit(None).cast("long"))
    pending = pending.withColumn(
        "crawl_delay_ms",
        F.coalesce(F.col("crawl_delay_ms"), F.lit(DEFAULT_CRAWL_DELAY_MS)),
    )
    if host_state is not None:
        pending = pending.join(host_state, "host", "left")
    else:
        pending = pending.withColumn("host_ready_ms", F.lit(None).cast("long"))
    pending = pending.withColumn(
        "host_ready_ms", F.coalesce(F.col("host_ready_ms"), F.lit(0))
    )

    w = W.partitionBy("host").orderBy(F.desc("priority"), F.col("url_hash"))
    ranked = pending.withColumn("fetch_seq", F.row_number().over(w)).filter(
        F.col("fetch_seq") <= per_host_cap
    )
    if budget is not None:
        ranked = ranked.orderBy(F.desc("priority"), F.col("url_hash")).limit(budget)
        # re-rank inside the surviving set so fetch_seq stays dense per host
        ranked = ranked.withColumn("fetch_seq", F.row_number().over(w))
    return ranked.select(
        "url",
        "url_hash",
        "host",
        "priority",
        F.lit(round_no).cast("int").alias("round"),
        "fetch_seq",
        (
            F.col("host_ready_ms")
            + (F.col("fetch_seq") - 1) * F.col("crawl_delay_ms")
        ).alias("not_before_ms"),
        "crawl_delay_ms",
    )


def advance_host_state(scheduled: DataFrame) -> DataFrame:
    """Next round's host_ready_ms = last scheduled slot + one delay."""
    return scheduled.groupBy("host").agg(
        (F.max("not_before_ms") + F.max("crawl_delay_ms")).alias("host_ready_ms")
    )


# Typed failure classes with the reference's per-exception retry budgets
# (ProcessWETPaths.scala:111-191): name -> (max_retries, priority backoff
# factor). max_retries counts RE-attempts after the first failure — a URL
# whose failures all land in one class is attempted at most 1 + max_retries
# times. The backoff factor is the priority-space analog of the reference's
# linear sleep (retry_ms * (retries+1)): smaller factor = longer effective
# delay before the scheduler picks the URL again.
#   socket — java.net.SocketException (:112-130): "once we fail twice we
#            never seem to succeed" — no retry.
#   dns    — java.net.UnknownHostException (:131-150): "try harder" — 10.
#   slow   — ParserTooSlowException (:151-169): one more try.
#   http   — java.io.IOException / HTTP 503 (:170-191): 8 retries.
FAILURE_CLASSES: dict[str, tuple[int, float]] = {
    "socket": (0, 0.5),
    "dns": (10, 0.9),
    "slow": (1, 0.5),
    "http": (8, 0.75),
}
_CLASS_NAMES = ["socket", "dns", "slow", "http"]


def fetch_outcome(scheduled: DataFrame, round_no: int, fail_permille: int = 0) -> DataFrame:
    """Adds `fetch_failed boolean` and `fail_class string` (null on
    success) — the sandbox's deterministic stand-in for HTTP fetch errors
    (reference: typed failure handling + requeue in
    ProcessWETPaths.scala:111-191). A URL fails iff an md5-derived permille
    of (url, round) is below `fail_permille`; the round in the key means a
    retry in a later round can succeed — exactly the transient-error model.
    The failure CLASS comes from an independent bit slice of the same hash
    ((fh >> 10) mod 4), so class mix is uniform and reproducible. md5 (not
    xxhash64) so a DuckDB oracle can reproduce both predicates."""
    fh = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col("url"), F.lit(str(round_no)))), 1, 8),
        16,
        10,
    ).cast("long")
    failed = F.pmod(fh, F.lit(1000)) < F.lit(int(fail_permille))
    cls = F.element_at(
        F.lit(_CLASS_NAMES), (F.pmod(F.shiftright(fh, 10), F.lit(4)) + 1).cast("int")
    )
    return scheduled.withColumn("fetch_failed", failed).withColumn(
        "fail_class", F.when(failed, cls)
    )


def apply_fetch_results(
    frontier: DataFrame,
    outcome: DataFrame,
    round_no: int,
    max_retries: int = 3,
    backoff: float = 0.5,
) -> DataFrame:
    """Frontier state transitions from a round's fetch outcomes (reference:
    ProcessWETPaths.scala:111-191 — failed paths requeue with a typed,
    per-exception-class retry budget). One broadcast-or-shuffle join on
    url_hash, no driver loop; under Iceberg this is a single MERGE INTO.

    Retry accounting: the `retries` column counts FAILED ATTEMPTS; the cap
    counts RE-attempts after the first failure, so a URL is attempted at
    most 1 + cap times and the give-up log reports cap (= failures - 1)
    retries. When `outcome` carries a `fail_class` column (fetch_outcome
    emits one), the cap and backoff come from FAILURE_CLASSES per row;
    `max_retries`/`backoff` are the fallback for untyped outcomes.

      success              → state=fetched, log
      failure, r2 ≤ cap    → state=pending, retries+1, priority·backoff, log
      failure, r2 > cap    → state=failed, log (gave up after r2-1 retries)
    """
    typed = "fail_class" in outcome.columns
    cols = ["url_hash", "fetch_failed"] + (["fail_class"] if typed else [])
    o = outcome.select(*cols)
    j = frontier.join(o, "url_hash", "left")
    ok = F.col("fetch_failed") == F.lit(False)
    bad = F.col("fetch_failed") == F.lit(True)
    r2 = F.when(bad, F.col("retries") + 1).otherwise(F.col("retries"))
    if typed:
        cap = F.lit(max_retries)
        bo = F.lit(backoff)
        for name, (class_cap, class_backoff) in FAILURE_CLASSES.items():
            cap = F.when(F.col("fail_class") == name, F.lit(class_cap)).otherwise(cap)
            bo = F.when(F.col("fail_class") == name, F.lit(class_backoff)).otherwise(bo)
        cls_str = F.coalesce(F.col("fail_class"), F.lit("error"))
    else:
        cap = F.lit(max_retries)
        bo = F.lit(backoff)
        cls_str = F.lit("error")
    state2 = (
        F.when(ok, F.lit("fetched"))
        .when(bad & (r2 <= cap), F.lit("pending"))
        .when(bad, F.lit("failed"))
        .otherwise(F.col("state"))
    )
    prio2 = F.when(bad, F.col("priority") * bo).otherwise(F.col("priority"))
    log2 = (
        F.when(ok, F.concat(F.lit(f"fetched round {round_no}")))
        .when(
            bad & (r2 <= cap),
            F.format_string(
                f"fetch failed round {round_no} (%s failure %d, retrying)", cls_str, r2
            ),
        )
        .when(
            bad,
            F.format_string(
                f"gave up round {round_no} (%s) after %d retries", cls_str, r2 - 1
            ),
        )
        .otherwise(F.col("log_message"))
    )
    return j.select(
        "url",
        "url_hash",
        "host",
        prio2.alias("priority"),
        state2.alias("state"),
        "round",
        r2.cast("int").alias("retries"),
        log2.alias("log_message"),
    )


def mark_fetched(frontier: DataFrame, scheduled: DataFrame, round_no: int) -> DataFrame:
    """Frontier state transition pending→fetched for scheduled URLs — the
    all-success special case of apply_fetch_results."""
    outcome = scheduled.select("url_hash", F.lit(False).alias("fetch_failed"))
    return apply_fetch_results(frontier, outcome, round_no)


def crawl_order(scheduled: DataFrame) -> DataFrame:
    """The deterministic total crawl order for invariant checks: ordering
    is fully data-derived (round, host, fetch_seq)."""
    return scheduled.select(
        "round", "host", "fetch_seq", "url", "priority", "not_before_ms"
    ).orderBy("round", "host", "fetch_seq")
