"""PII scrub tests (functions/pii.py): per-kind detection, redaction-chain
order, count-on-original semantics. LLM-pipeline extension — no reference
counterpart."""

from pyspark.sql import functions as F

from commoncrawlscalatools_spark.functions.pii import (
    PII_PATTERNS,
    REDACT_TOKENS,
    with_pii_redaction,
)


def _rows(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _one(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_each_kind_detected_and_redacted(spark):
    out = _one(
        with_pii_redaction(
            _rows(
                spark,
                [
                    "mail me at jane.doe+spam@sub.example.co.uk today",
                    "ssn is 123-45-6789 ok",
                    "call 415-555-0143 or 415.555.0143",
                    "server at 10.0.0.255 responded",
                    "no pii here at all",
                ],
            )
        )
    )
    assert out[0]["n_email"] == 1 and "<EMAIL>" in out[0]["redacted_text"]
    assert "jane.doe" not in out[0]["redacted_text"]
    assert out[1]["n_ssn"] == 1 and "<SSN>" in out[1]["redacted_text"]
    assert out[2]["n_phone"] == 2
    assert out[2]["redacted_text"].count("<PHONE>") == 2
    assert out[3]["n_ipv4"] == 1 and "<IP>" in out[3]["redacted_text"]
    assert out[4]["n_pii"] == 0
    assert out[4]["redacted_text"] == "no pii here at all"


def test_counts_taken_on_original_text(spark):
    # The email's host looks nothing like later patterns, but an SSN right
    # before an email must still count as 1 each: counts are computed on
    # the ORIGINAL text, so earlier redactions can't create or destroy
    # later matches.
    out = _one(_rows(spark, ["id 123-45-6789 via a@b.io"]).transform(with_pii_redaction))
    assert out[0]["n_ssn"] == 1 and out[0]["n_email"] == 1
    assert out[0]["n_pii"] == 2
    assert out[0]["redacted_text"] == "id <SSN> via <EMAIL>"


def test_chain_order_is_patterns_order(spark):
    # A dotted phone must NOT be eaten by the ipv4 pass: phone precedes
    # ipv4 in PII_PATTERNS, and the ipv4 pattern caps octets at 3 digits.
    kinds = [k for k, _ in PII_PATTERNS]
    assert kinds.index("phone") < kinds.index("ipv4")
    out = _one(_rows(spark, ["dial 555.867.5309 from 1.2.3.4"]).transform(with_pii_redaction))
    assert out[0]["n_phone"] == 1 and out[0]["n_ipv4"] == 1
    assert out[0]["redacted_text"] == "dial <PHONE> from <IP>"


def test_total_is_sum_of_kinds(spark):
    out = _one(
        _rows(spark, ["a@b.io c@d.io 123-45-6789 9.9.9.9"]).transform(
            with_pii_redaction
        )
    )
    assert out[0]["n_pii"] == out[0]["n_email"] + out[0]["n_ssn"] + out[0][
        "n_phone"
    ] + out[0]["n_ipv4"] == 4
    assert set(REDACT_TOKENS) == {k for k, _ in PII_PATTERNS}


def test_no_python_in_row_path(spark):
    # The whole operator must stay JVM-side: no BatchEvalPython / ArrowEval
    # nodes in the plan (it's regexp_count/regexp_replace only).
    plan = with_pii_redaction(
        _rows(spark, ["x"])
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "ArrowEval" not in plan
