"""WET/WARC record parsing — the reference's 850-line FSA
(Parser.scala:69-915) re-expressed as a vectorized split-and-extract.

Record boundaries are syntactic ("WARC/1.0" header + blank-line
separators), so the long-lived parser state collapses to: split archive
text on the version line, regexp-extract the header fields, and gate
emission on completeness predicates (SURVEY.md §3.3 note). Corruption
recovery (the FSA's sink states S3/S6) becomes declarative routing:
records failing the required-field set go to a quarantine DataFrame and
valid siblings still parse — matching ParserSpec's "return 4 WARCRecord
objects skipping corrupt record".

Required fields: WARCInfo — WARC-Type, WARC-Date, WARC-Filename,
WARC-Record-ID, Content-Type, Content-Length, Content
(WARCInfo.scala:13-20); WARCConversion — WARC-Type, WARC-Target-URI,
WARC-Date, WARC-Record-ID, WARC-Refers-To, WARC-Block-Digest,
Content-Type, Content-Length, Content (WARCConversion.scala:49-58).
WARCInfo fields are denormalized onto each conversion row (the reference
itself does this when persisting — ProcessWETPaths.scala:30-43).
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from commoncrawlscalatools_spark.functions.urls import url_tld

CONVERSION_REQUIRED = [
    "warc_type",
    "warc_target_uri",
    "warc_date",
    "warc_record_id",
    "warc_refers_to",
    "warc_block_digest",
    "content_type",
    "content_length",
    "content",
]

_HEADERS = {
    "warc_type": "WARC-Type",
    "warc_target_uri": "WARC-Target-URI",
    "warc_date": "WARC-Date",
    "warc_record_id": "WARC-Record-ID",
    "warc_refers_to": "WARC-Refers-To",
    "warc_block_digest": "WARC-Block-Digest",
    "warc_filename": "WARC-Filename",
    "content_type": "Content-Type",
    "content_length": "Content-Length",
}


def gunzip_concat(data: bytes) -> tuple[str, int, bool]:
    """Decompress a (possibly multi-member, possibly truncated) gzip blob.

    Reference analog: Reader.GZIPCompatibilityWrapper (Reader.scala:25-61)
    exists solely to keep GZIPInputStream reading CONCATENATED gzip members
    — CommonCrawl WET files are written that way — and the parser treats an
    unexpected EOF in the last member as end-of-archive, keeping every
    record already extracted (ParserSpec: appended_zip_fragment_unexpected_eof).

    Returns (text, complete_members, truncated). A truncated final member's
    partial plaintext IS included — the record-completeness gate downstream
    quarantines any half record it contains."""
    out: list[bytes] = []
    n_members = 0
    truncated = False
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)  # gzip framing
        try:
            chunk = d.decompress(data[pos:])
        except zlib.error:
            truncated = True  # corrupt member: keep what prior members gave
            break
        out.append(chunk)
        if not d.eof:
            truncated = True  # ran out of compressed bytes mid-member
            break
        n_members += 1
        rest = d.unused_data
        if not rest:
            break
        pos = len(data) - len(rest)
    return b"".join(out).decode("utf-8", errors="replace"), n_members, truncated


WET_ARCHIVE_SCHEMA = T.StructType(
    [
        T.StructField("wet_path", T.StringType(), False),
        T.StructField("archive_text", T.StringType(), False),
        T.StructField("n_members", T.IntegerType(), False),
        T.StructField("truncated", T.BooleanType(), False),
    ]
)


def read_wet_gz(spark: SparkSession, path: str) -> DataFrame:
    """Real `.wet.gz` bytes → (wet_path, archive_text, n_members, truncated).

    spark.read.format('binaryFile') gives one row per archive (gzip is not
    splittable, so one-file-per-task is the correct parallel unit — the
    reference assigns whole WET paths to tasks the same way,
    ProcessWETPaths.scala); decompression is an Arrow-batched mapInPandas
    (per-blob zlib work, no per-row Python in any row path). At cluster
    scale a ~150 MB .wet.gz inflates to <1 GB per task — well inside
    executor memory; parallelism comes from the number of archives."""
    bin_df = spark.read.format("binaryFile").load(path).select("path", "content")

    def inflate(batches):
        for pdf in batches:
            texts, members, trunc = [], [], []
            for blob in pdf["content"]:
                t, n, tr = gunzip_concat(bytes(blob))
                texts.append(t)
                members.append(n)
                trunc.append(tr)
            yield pd.DataFrame(
                {
                    "wet_path": pdf["path"],
                    "archive_text": texts,
                    "n_members": members,
                    "truncated": trunc,
                }
            )

    return bin_df.mapInPandas(inflate, WET_ARCHIVE_SCHEMA)


def _header(block: Column, name: str) -> Column:
    v = F.regexp_extract(block, rf"(?m)^{name}:[ \t]*(.*?)\r?$", 1)
    return F.when(v != "", v)


def parse_wet_archive(
    archives: DataFrame, content_col: str = "archive_text", path_col: str = "wet_path"
) -> DataFrame:
    """Archive text → one row per WARC record, headers extracted.

    The split on the version line is an in-row array op (narrow, codegen'd);
    exploding keeps lineage to the source archive. `is_complete` mirrors
    WARCRecord.isComplete (WARCRecord.scala:68-101): all required headers
    present + content non-empty.
    """
    recs = F.split(F.col(content_col), r"(?m)^WARC/1\.0\r?\n")
    exploded = archives.select(
        F.col(path_col),
        F.posexplode(recs).alias("record_pos", "block"),
    ).filter((F.col("block") != "") & (F.col("record_pos") > 0))

    cols = [F.col(path_col), F.col("record_pos")]
    for col_name, header in _HEADERS.items():
        cols.append(_header(F.col("block"), header).alias(col_name))
    # body = everything after the first blank line. The reference TRIMS
    # record content with Java String.trim() — both ends, every char
    # ≤ U+0020 (Parser.scala:315 reads Content-Length+2 bytes then
    # .trim()) — so trailing spaces/tabs go too, not just the record
    # separator CRLFs. (r5: the raw-bytes golden pin in test_wet_gz
    # caught the earlier [\r\n]+$-only form keeping a trailing space.)
    raw_body = F.regexp_extract(F.col("block"), r"(?s)\r?\n\r?\n(.*)$", 1)
    body = F.regexp_replace(raw_body, r"^[\x00-\x20]+|[\x00-\x20]+$", "")
    cols.append(F.when(body != "", body).alias("content"))
    # the reference reads exactly Content-Length bytes and hits EOF on a
    # truncated record (Parser FSA → incomplete, dropped): a record is
    # length-complete iff the raw body carries at least that many bytes
    cols.append(F.octet_length(raw_body).alias("__body_bytes"))
    parsed = exploded.select(*cols)

    # an unparseable Content-Length can't drive the byte check — the record
    # model treats it as headers-complete (WARCConversionSpec garbage-URI
    # case carries "my content length" and is still complete)
    parsed_len = F.col("content_length").try_cast("long")
    length_ok = parsed_len.isNull() | (F.col("__body_bytes") >= parsed_len)
    info_ok = (
        (F.col("warc_type") == "warcinfo")
        & F.col("warc_date").isNotNull()
        & F.col("warc_filename").isNotNull()
        & F.col("warc_record_id").isNotNull()
        & F.col("content_type").isNotNull()
        & F.col("content_length").isNotNull()
        & F.col("content").isNotNull()
    )
    conv_ok = (F.col("warc_type") == "conversion") & F.lit(True)
    for c in CONVERSION_REQUIRED:
        conv_ok = conv_ok & F.col(c).isNotNull()
    return parsed.withColumn(
        "record_kind",
        F.when(info_ok & length_ok, "warcinfo")
        .when(conv_ok & length_ok, "conversion")
        .otherwise("corrupt"),
    ).drop("__body_bytes")


def conversions_with_info(
    parsed: DataFrame, path_col: str = "wet_path", strict_info: bool = False
) -> DataFrame:
    """Valid conversion records with archive-level warcinfo fields
    denormalized on (WARCInfo fallback semantics,
    WARCConversion.scala:90-114) + derived TLD column
    (WARCConversion.scala:175-185).

    strict_info=True reproduces the reference FSA's gate exactly: the FIRST
    record of the file must be a valid warcinfo or the file yields NO
    records at all (Parser Sink1; ParserSpec: corrupt_starts_with_conversion
    — a later warcinfo does not rescue it — and corrupt_warcinfo_1 → 0
    records). Default False keeps the lenient salvage behavior
    (conversions survive a lost warcinfo)."""
    info_src = parsed.filter(F.col("record_kind") == "warcinfo")
    if strict_info:
        info_src = info_src.filter(F.col("record_pos") == 1)
    info = (
        info_src
        .groupBy(path_col)
        .agg(
            F.min_by("warc_filename", "record_pos").alias("info_filename"),
            F.min_by("warc_date", "record_pos").alias("info_date"),
        )
    )
    conv = parsed.filter(F.col("record_kind") == "conversion")
    how = "inner" if strict_info else "left"
    return (
        conv.join(F.broadcast(info), path_col, how)
        .withColumn("warc_tldn", url_tld(F.col("warc_target_uri")))
        .withColumn("content_length_int", F.col("content_length").try_cast("int"))
    )


def quarantine(parsed: DataFrame) -> DataFrame:
    """Corrupt records routed to quarantine instead of FSA sink states."""
    return parsed.filter(F.col("record_kind") == "corrupt")


def archive_lifecycle(parsed: DataFrame, path_col: str = "wet_path") -> DataFrame:
    """Per-archive started/finished/records/log rows — the reference's
    parser lifecycle triggers as DATA (MyFinishTrigger.scala:92-111 fields
    fileid/recordcount/logmessage; message strings from Parser.scala via
    ParserSpec:288,331,347,361). One row per archive:

      (wet_path, file_id, records_extracted, corrupt_records, log_message)

    where log_message is exactly the reference's finish-trigger string:
      * no valid first warcinfo   → "File Parse Error - Corruption
        detected, was not able to find complete WARCInfo record"
      * corruption, 0 conversions → "File Parse Error - Corruption
        detected and no WARC Conversion records were extracted"
      * corruption, >0            → "File Parsed - Some corruption detected"
      * clean                     → "File Parsed Normally"
    """
    per = parsed.groupBy(path_col).agg(
        F.sum((F.col("record_kind") == "conversion").cast("long")).alias(
            "records_extracted"
        ),
        F.sum((F.col("record_kind") == "corrupt").cast("long")).alias(
            "corrupt_records"
        ),
        F.max(
            F.when(
                (F.col("record_kind") == "warcinfo") & (F.col("record_pos") == 1),
                F.col("warc_filename"),
            )
        ).alias("file_id"),
    )
    no_info = F.col("file_id").isNull()
    corrupted = F.col("corrupt_records") > 0
    log = (
        F.when(
            no_info,
            F.lit(
                "File Parse Error - Corruption detected, was not able to "
                "find complete WARCInfo record"
            ),
        )
        .when(
            corrupted & (F.col("records_extracted") == 0),
            F.lit(
                "File Parse Error - Corruption detected and no WARC "
                "Conversion records were extracted"
            ),
        )
        .when(corrupted, F.lit("File Parsed - Some corruption detected"))
        .otherwise(F.lit("File Parsed Normally"))
    )
    # strict gate: archives without a valid first warcinfo extract nothing
    records = F.when(no_info, F.lit(0)).otherwise(F.col("records_extracted"))
    return per.select(
        path_col,
        "file_id",
        records.alias("records_extracted"),
        "corrupt_records",
        log.alias("log_message"),
    )


def validate_fixture_records(records: DataFrame) -> DataFrame:
    """FIXTURES.md §6 wet_records table → validity routing: adds
    `record_kind` (warcinfo/conversion/corrupt) + `warc_tldn`. The
    record-type guard (WARCRecordTypeException, WARCInfo.scala:44-47)
    becomes a 'corrupt' route, not an exception."""
    conv_ok = F.col("warc_type") == "conversion"
    for c in ["warc_record_id", "warc_target_uri", "warc_date", "content_length", "content"]:
        conv_ok = conv_ok & F.col(c).isNotNull() & (F.col(c) != "")
    kind = (
        F.when(F.col("warc_type") == "warcinfo", "warcinfo")
        .when(conv_ok, "conversion")
        .otherwise("corrupt")
    )
    return records.withColumn("record_kind", kind).withColumn(
        "warc_tldn", url_tld(F.col("warc_target_uri"))
    )
