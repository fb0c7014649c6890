"""Driver-contract sanity: every queries() entry runs and matches its
DuckDB oracle on a fast subset (the full sweep is tools/check_oracle.py)."""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SUBSET = [
    "q1_pricing_summary",
    "topic_filter_docs",
    "exact_dedup_docs",
    "url_canonicalize",
    "frontier_schedule",
    "ann_cosine_topk",
    "windowed_event_agg",
    # oracled entries the driver's 50-query gate cap drops (the
    # no-reference-counterpart extras yield first): value-checked HERE so
    # every oracled entry is either driver-gated or CI-gated (VERDICT r3 #6)
    "rollup_lineitem",
    "cube_orders",
    "pivot_status_by_priority",
    "ann_lsh_topk",
    "corpus_filenames",
    "running_value_per_user",
    # composed createCorpus flagship (gated too; checked here for fast CI)
    "create_corpus_pipeline",
    # round-4 oracles for the WET golden-fixture paths (VERDICT r3 #8)
    "wet_fixture_records",
    "wet_fixture_lifecycle",
    # round-4 depth adds (oracled + gated; checked here too for fast CI)
    "ann_ivf_topk",
    "relevance_bm25_topk",
    # round-5: composed refilter flagship + re-geometried simhash
    "refilter_pipeline",
    "simhash_pairs",
    # knn_join_lsh_topk yields to its bucketed twin under the driver cap
    # (identical oracle); both value-checked here
    "knn_join_lsh_topk",
    "knn_join_lsh_topk_bucketed",
    # r5 cap yields (redundant driver anchors — see _YIELD_FIRST_UNDER_CAP
    # notes in queries.py): value-checked here instead
    "minhash_dedup_survivors",
    "tld_counts",
    "customers_without_orders",
    # r5 report jobs over the engine's own frozen store tables
    "parse_progress_report",
    "docs_by_category_report",
    # r5 trained-quantizer IVF (oracle joins the frozen centroid table)
    "ann_ivf_topk_trained",
    # r5 connected-components dedup (gated) + the two anchors that
    # yielded the cap slots for it (value-checked here instead)
    "minhash_cc_components",
    "minhash_dedup_cc_survivors",
    "winner_per_lang",
    "media_metadata_stats",
    # r5 Gopher-style repetition gates + the composed quality-gate recipe
    # (both gated) + the anchors that yielded their cap slots
    "repetition_scores",
    "quality_gate_docs",
    "q3_top_orders",
    "suppliers_of_large_parts",
    # r5 duplicate-span dedup family (gated) + the two anchors that
    # yielded their cap slots (value-checked here instead)
    "dup_span_stats",
    "dup_span_removal",
    "knn_join_labels",
    "event_props_extract",
    # r5: the write-time-partitioned IVF gained the fixed-quantizer
    # oracle and gates; multi_field_relevance_topk yielded its slot
    "ann_ivf_topk_partitioned",
    "multi_field_relevance_topk",
    # r5 second wave: LLM-pipeline extensions (the 4 new-semantics entries
    # gate; all 6 checked here) + the four redundant anchors that yielded
    # their cap slots (value-checked here instead — see the yield-list
    # notes in queries.py)
    "pii_redaction",
    "decontaminate_docs",
    "line_dedup_docs",
    "stratified_sample_docs",
    "reservoir_sample_docs",
    "pack_sequences_chunks",
    "top_orders_per_customer",
    "order_priority_report",
    "topic_filter_stats",
    "minhash_dedup_pairs",
    # r5: bigram-LM perplexity scorer (gated) + the md5 anchor that
    # yielded its cap slot
    "lm_perplexity_scores",
    "doc_fingerprints",
    # r5: the composed extension-family flagship (gated; checked here for
    # fast CI like create_corpus_pipeline)
    "training_data_pipeline",
    # r5: multimodal resize/frame-sample plumbing (cap yields — the binary
    # mapInPandas path stays gated via media_payload_metadata)
    "media_resize_plan",
    "media_frame_samples",
    # r5: embedding-space transitive dedup clusters (cap yield — CC is
    # double-gated in the minhash family)
    "embedding_cc_components",
    # r6: the four reference-job twins (gated; checked here for fast CI)
    # + the four redundant anchors that yielded their cap slots
    # (value-checked here instead — see the r6 yield-list notes)
    "classifier_statistics",
    "classified_docs_report",
    "content_length_table",
    "evaluate_topic_filter_stats",
    "lang_id_counts",
    "stopword_shingle_counts",
    "random_wetpaths_sample",
    # r6 late adds: frozen-LR quality scoring (gated; fast-CI here too)
    # and token-budget mixing (yield, CI-checked); windowed_event_agg —
    # the anchor that yielded its slot — is already in the list above
    "quality_classifier_scores",
    "corpus_mix_plan",
    "minhash_recall_report",
]

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    import math

    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6f}"
    return str(v)


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "spans" in df.columns and "doc_id" in df.columns


def test_every_query_has_oracle():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    sdf = qs[name](spark, sf_dir)
    s_cols = sdf.columns
    res = duck.execute(oracles[name])
    d_cols = [d[0] for d in res.description]
    assert sorted(s_cols) == sorted(d_cols)
    order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    s_rows = sorted(tuple(_norm(r[i]) for i in order_s) for r in sdf.collect())
    d_rows = sorted(tuple(_norm(r[i]) for i in order_d) for r in res.fetchall())
    assert s_rows == d_rows
