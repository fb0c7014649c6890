"""Dedup pipeline tests on known duplicate clusters (FIXTURES.md §8):
exact dups, ~90%-overlap mutations, unrelated docs; one winner per cluster
by relevance (createCorpus.scala:205-219 semantics)."""

from pyspark.sql import functions as F

from commoncrawlscalatools_spark.operators.dedup import (
    exact_dedup,
    jaccard_for_pairs,
    minhash_candidates,
    minhash_dedup,
    simhash_near_pairs,
    with_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the spark engine "
    "shuffles partitions across the cluster and the optimizer prunes columns "
    "for every scan in the pipeline today"
)
MUT = BASE.replace("lazy dog", "sleepy cat")  # near-dup (~90% shingle overlap)
OTHER = (
    "completely different content about cooking recipes with tomatoes basil "
    "olive oil garlic onions and a pinch of salt simmered slowly for hours "
    "until the sauce thickens nicely in the pan"
)


def _docs(spark):
    rows = [
        (1, BASE, 0.9),
        (2, BASE, 0.5),  # exact dup of 1, lower relevance
        (3, MUT, 0.7),  # near dup of 1
        (4, OTHER, 0.8),
        (5, "tiny", 0.1),  # too short to shingle
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "relevance"])


def test_exact_dedup_winner_by_relevance(spark):
    out = exact_dedup(_docs(spark), "text", "doc_id", "relevance")
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert ids == [1, 3, 4, 5]  # doc 2 loses to doc 1 (lower relevance)


def test_exact_dedup_winner_by_min_id(spark):
    out = exact_dedup(_docs(spark), "text", "doc_id")
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert ids == [1, 3, 4, 5]


def test_minhash_candidates_catch_exact_and_near(spark):
    sh = with_shingles(_docs(spark), "text", "doc_id", 3)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidates(sh, "shingles", "doc_id", 64, 16).collect()
    }
    assert (1, 2) in pairs  # exact dup always collides
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup should collide


def test_jaccard_for_pairs_values(spark):
    sh = with_shingles(_docs(spark), "text", "doc_id", 3)
    pairs = spark.createDataFrame([(1, 2), (1, 4)], ["id_a", "id_b"])
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_for_pairs(pairs, sh, "doc_id").collect()}
    assert out[(1, 2)] == 1.0  # identical docs
    assert out[(1, 4)] < 0.05  # unrelated


def test_minhash_dedup_one_winner_per_cluster(spark):
    out = minhash_dedup(
        _docs(spark), "text", "doc_id", relevance_col="relevance", threshold=0.5
    )
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # cluster {1,2,3}: winner is 1 (relevance 0.9); 4 unrelated survives;
    # 5 has no shingles → never considered a duplicate → survives
    assert ids == [1, 4, 5]


def test_minhash_dedup_deterministic_across_partitioning(spark):
    d = _docs(spark)
    a = sorted(
        r["doc_id"]
        for r in minhash_dedup(d.repartition(1), "text", "doc_id").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in minhash_dedup(d.repartition(7), "text", "doc_id").collect()
    )
    assert a == b


def test_simhash_identical_distance_zero(spark):
    d = _docs(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(d, "text", "doc_id", max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0  # identical text → identical simhash
    assert (1, 4) not in pairs  # unrelated docs don't appear


def test_simhash_32bit_geometry_still_supported(spark):
    d = _docs(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(
            d, "text", "doc_id", max_hamming=3, bits=32, bands=4, max_bucket=None
        ).collect()
    }
    assert pairs.get((1, 2)) == 0


def test_simhash_hot_bucket_cap_bounds_fanout(spark):
    """A boilerplate cluster larger than max_bucket must NOT self-join:
    identical docs share every segment, so with cluster size > cap all
    `bands` buckets are dropped and the cluster yields zero pairs, while
    small clusters below the cap still pair. The accounting view pins the
    dropped-bucket count (the r4 simhash fix: 64-bit fingerprints +
    minhash-style cap, VERDICT r4 'What's wrong #1')."""
    from commoncrawlscalatools_spark.operators.dedup import simhash_dropped_buckets

    hot = [(i, BASE, 0.5) for i in range(1, 21)]  # 20 identical docs
    cold = [(100, OTHER, 0.5), (101, OTHER, 0.5)]  # a 2-doc cluster
    d = spark.createDataFrame(hot + cold, ["doc_id", "text", "relevance"])

    capped = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            d, "text", "doc_id", max_hamming=3, max_bucket=10
        ).collect()
    }
    assert (100, 101) in capped  # small cluster survives the cap
    assert not any(a < 100 for a, _ in capped)  # hot cluster fully dropped

    dropped = simhash_dropped_buckets(d, "text", "doc_id", max_bucket=10).collect()
    # the 20-doc identical cluster occupies exactly one bucket in each of
    # the 4 bands; nothing else exceeds the cap
    assert len(dropped) == 4
    assert all(r["count"] == 20 for r in dropped)

    uncapped = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            d, "text", "doc_id", max_hamming=3, max_bucket=None
        ).collect()
    }
    assert sum(1 for a, _ in uncapped if a < 100) == 20 * 19 // 2


def test_jaccard_pairs_df_cap_bounds_fanout(spark):
    """A boilerplate shingle shared by every doc must NOT join all pairs:
    with max_df below the corpus size the hot shingle is dropped from the
    pair join (numerator only — denominators stay full-set)."""
    from commoncrawlscalatools_spark.operators.dedup import jaccard_pairs

    n = 30
    # every doc carries boilerplate shingle 0; docs 2k/2k+1 share a private
    # shingle (100+k); nothing else overlaps
    rows = [(i, [0, 100 + i // 2, 1000 + i]) for i in range(n)]
    sh = spark.createDataFrame(rows, ["doc_id", "shingles"])

    uncapped = jaccard_pairs(sh, "shingles", "doc_id", max_df=None)
    assert uncapped.count() == n * (n - 1) // 2  # hot key → quadratic pairs

    capped = jaccard_pairs(sh, "shingles", "doc_id", max_df=5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped.collect()}
    assert set(got) == {(2 * k, 2 * k + 1) for k in range(n // 2)}
    # 1 shared (private) shingle over full union 3+3-1=5
    assert all(abs(v - 0.2) < 1e-9 for v in got.values())


# ----- Connected components / transitive dedup -------------------------------


def test_connected_components_chain_ring_pair(spark):
    from commoncrawlscalatools_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)],
        "id_a long, id_b long",
    )
    got = sorted(
        (r["node"], r["comp"]) for r in connected_components(edges).collect()
    )
    assert got == [
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    ]


def test_connected_components_partitioning_invariant(spark):
    from commoncrawlscalatools_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)] + [(100, 200), (200, 300)],
        "id_a long, id_b long",
    )
    a = sorted(map(tuple, connected_components(edges).collect()))
    b = sorted(map(tuple, connected_components(edges.repartition(7)).collect()))
    assert a == b
    # one long chain 1..40 plus one 3-node component
    assert {c for _, c in a} == {1, 100}


def test_minhash_dedup_cc_transitive_chain(spark):
    """a~b and b~c but a!~c: per-edge dominance can keep two of the
    chain; CC keeps exactly one survivor from {a,b,c}."""
    from commoncrawlscalatools_spark.operators.dedup import minhash_dedup_cc

    mid = BASE.replace("lazy dog", "sleepy cat")
    far = mid.replace("quick brown", "slow grey")
    rows = [(1, BASE, 0.5), (2, mid, 0.9), (3, far, 0.4), (4, OTHER, 0.8)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "relevance"])
    got = sorted(
        r["doc_id"]
        for r in minhash_dedup_cc(
            df, "text", "doc_id", relevance_col="relevance", threshold=0.4
        ).collect()
    )
    # 2 wins its whole component (highest relevance); 4 untouched
    assert got == [2, 4]


def test_minhash_dedup_cc_no_relevance_keeps_min_id(spark):
    from commoncrawlscalatools_spark.operators.dedup import minhash_dedup_cc

    rows = [(7, BASE, 0.0), (3, BASE, 0.0), (9, MUT, 0.0), (4, OTHER, 0.0)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "relevance"])
    got = sorted(
        r["doc_id"]
        for r in minhash_dedup_cc(df, "text", "doc_id", threshold=0.4).collect()
    )
    assert got == [3, 4]


# --- benchmark decontamination (decontaminate) ------------------------------


def _gram(words):
    return " ".join(words)


def test_decontaminate_flags_shared_ngram_docs(spark):
    from commoncrawlscalatools_spark.operators.dedup import decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # doc 1 embeds the bench's first 8-gram verbatim; doc 2 is clean; doc 3
    # shares only a 7-token run (below n=8) — must NOT be flagged.
    contaminated = "noise " + _gram(bench_text.split()[:8]) + " more noise"
    near_miss = "noise " + _gram(bench_text.split()[:7]) + " unrelated tail words here"
    corpus = spark.createDataFrame(
        [(1, contaminated), (2, OTHER), (3, near_miss)], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([(100, bench_text)], ["doc_id", "text"])
    got = {r["doc_id"]: r["n_hit_ngrams"] for r in decontaminate(corpus, bench).collect()}
    assert got == {1: 1}


def test_decontaminate_counts_distinct_hit_grams(spark):
    from commoncrawlscalatools_spark.operators.dedup import decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # embedding the bench's first NINE tokens yields two overlapping 8-grams
    doc = "x " + _gram(bench_text.split()[:9]) + " y"
    corpus = spark.createDataFrame([(1, doc)], ["doc_id", "text"])
    bench = spark.createDataFrame([(100, bench_text)], ["doc_id", "text"])
    got = {r["doc_id"]: r["n_hit_ngrams"] for r in decontaminate(corpus, bench).collect()}
    assert got == {1: 2}


def test_decontaminate_bench_side_broadcasts(spark):
    from commoncrawlscalatools_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame([(1, BASE)], ["doc_id", "text"])
    bench = spark.createDataFrame([(2, OTHER)], ["doc_id", "text"])
    plan = decontaminate(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# --- corpus-wide line dedup (dedup_lines) -----------------------------------


def _line_docs(spark):
    rows = [
        (1, ["unique one", "shared boilerplate", "", "unique two"]),
        (2, ["shared boilerplate", "only in two", ""]),
        (3, ["shared boilerplate", "shared boilerplate"]),  # in-doc repeat too
    ]
    return spark.createDataFrame(rows, ["doc_id", "lines"])


def test_dedup_lines_keeps_first_occurrence_only(spark):
    from commoncrawlscalatools_spark.operators.dedup import dedup_lines
    from pyspark.sql import functions as F

    got = {
        r["doc_id"]: (r["n_lines_kept"], r["clean_text"])
        for r in dedup_lines(_line_docs(spark), F.col("lines")).collect()
    }
    # doc 1 has the global first occurrence of the boilerplate (id order)
    assert got[1] == (4, "unique one\nshared boilerplate\n\nunique two")
    # doc 2 loses it but keeps its empty line (layout, not content)
    assert got[2] == (2, "only in two\n")
    # doc 3 was ONLY duplicate lines -> nothing kept, doc drops out
    assert 3 not in got


def test_dedup_lines_deterministic_under_partitioning(spark):
    from commoncrawlscalatools_spark.operators.dedup import dedup_lines
    from pyspark.sql import functions as F

    a = sorted(map(tuple, dedup_lines(_line_docs(spark), F.col("lines")).collect()))
    b = sorted(
        map(
            tuple,
            dedup_lines(_line_docs(spark).repartition(7), F.col("lines")).collect(),
        )
    )
    assert a == b


def _dedup_lines_reference(docs):
    """Naive single-threaded reference: first (id, pos) occurrence wins;
    empty lines always kept."""
    seen, out = set(), {}
    for doc_id, lines in sorted(docs):
        kept = []
        for line in lines:
            if line == "" or line not in seen:
                kept.append(line)
                if line != "":
                    seen.add(line)
        if kept:
            out[doc_id] = (len(kept), "\n".join(kept))
    return out


def test_dedup_lines_property_vs_reference(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from commoncrawlscalatools_spark.operators.dedup import dedup_lines
    from pyspark.sql import functions as F

    # tiny alphabet so cross-doc collisions are dense
    line_st = st.sampled_from(["", "a", "b", "c d", "e f g"])

    @settings(max_examples=8, deadline=None)
    @given(
        docs=st.lists(
            st.lists(line_st, min_size=0, max_size=6), min_size=1, max_size=8
        )
    )
    def run(docs):
        rows = [(i, lines) for i, lines in enumerate(docs)]
        df = spark.createDataFrame(rows, schema="doc_id long, lines array<string>")
        got = {
            r["doc_id"]: (r["n_lines_kept"], r["clean_text"])
            for r in dedup_lines(df.repartition(3), F.col("lines")).collect()
        }
        assert got == _dedup_lines_reference(rows)

    run()


def test_dedup_lines_skew_plan_has_no_window(spark):
    """VERDICT r5 weak #1: empty lines and viral boilerplate must NOT
    funnel through a single window partition. The winner is a map-side-
    combinable min(struct) aggregate — assert the executed plan carries no
    WindowExec at all, and that a corpus where one line appears in every
    doc (plus many empty lines) still dedups correctly."""
    from pyspark.sql import functions as F

    from commoncrawlscalatools_spark.operators.dedup import dedup_lines

    rows = [
        (i, ["Subscribe to our newsletter", "", f"unique {i}", ""])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, lines array<string>")
    out = dedup_lines(df.repartition(8), F.col("lines"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    got = {r["doc_id"]: (r["n_lines_kept"], r["clean_text"]) for r in out.collect()}
    assert got == _dedup_lines_reference(rows)
    # the viral line survives exactly once, in the smallest doc
    assert got[0][1].startswith("Subscribe to our newsletter")
    assert all("Subscribe" not in got[i][1] for i in range(1, 300))


def test_connected_components_string_ids(spark):
    """ADVICE r5 #1: string-keyed edges (the engine's own 'urn:doc:<hex>'
    ids) must run natively, not be silently dropped by a lossy long cast."""
    from commoncrawlscalatools_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [("urn:doc:b", "urn:doc:a"), ("urn:doc:b", "urn:doc:c"),
         ("urn:doc:x", "urn:doc:y")],
        schema="id_a string, id_b string",
    )
    comp = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert comp == {
        "urn:doc:a": "urn:doc:a",
        "urn:doc:b": "urn:doc:a",
        "urn:doc:c": "urn:doc:a",
        "urn:doc:x": "urn:doc:x",
        "urn:doc:y": "urn:doc:x",
    }


def test_minhash_dedup_cc_string_ids_dedups(spark):
    """End-to-end regression for the ADVICE r5 #1 failure mode:
    minhash_dedup_cc over a string-keyed corpus must actually drop
    near-duplicates (the r5 long-cast returned the input unchanged)."""
    from commoncrawlscalatools_spark.operators.dedup import minhash_dedup_cc

    text = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            ("urn:doc:a", text),
            ("urn:doc:b", text + " extra"),
            ("urn:doc:z", "completely different words about spark and parquet files"),
        ],
        schema="doc_id string, text string",
    )
    surv = minhash_dedup_cc(docs, "text", "doc_id", threshold=0.3)
    assert sorted(r["doc_id"] for r in surv.collect()) == ["urn:doc:a", "urn:doc:z"]
