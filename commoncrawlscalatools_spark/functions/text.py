"""Text analysis column functions: keyword counting, tokenization, shingles,
quality scoring, language-ID heuristic, fingerprints.

Reference semantics re-expressed as native Catalyst expressions:
  * ciMatch (case-insensitive substring count,
    FourForumsWARCStreamFilter.scala:294-323) → F.regexp_count with (?i).
  * stopword-anchored murmur shingles (createCorpus.scala:70-152) →
    word-window shingles hashed JVM-side; see also operators/dedup.py.
  * subword counter (getSubwordsFromWETRecords.scala:21-59) → explode +
    startswith/endswith.

All hashes that must be reproducible in an external oracle use an
md5-derived 32-bit integer (`md5_hash32`) — md5 is bit-identical across
engines; xxhash64 is used where only Spark-internal determinism matters
(it is faster and JVM-native).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Lucene-style stopword list used ONLY by the quality-score heuristic
# (an engine addition, not a reference behavior).
STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with",
]

# The reference shingler's exact 24-word stopword list
# (createCorpus.scala:118-125: articles + be/have/do forms + modals).
SHINGLE_STOPWORDS = [
    "the", "a", "an",
    "be", "is", "are", "am", "was", "were", "being", "been",
    "can", "could",
    "will", "would",
    "have", "had", "having", "has",
    "do", "did", "done", "doing", "does",
]

# BPE-ish word/number/punct tokenizer (public GPT-2-style pattern, simplified
# to what both Spark and an ANSI-SQL oracle can run).
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

MOD = 1_000_000_007


def ci_count(text: Column, keyword: str) -> Column:
    """Case-insensitive substring occurrence count (reference ciMatch)."""
    import re as _re

    return F.regexp_count(text, F.lit("(?i)" + _re.escape(keyword)))


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization; drops empty tokens."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def token_count_ws(text: Column) -> Column:
    return F.size(ws_tokens(text))


def token_count_bpe(text: Column) -> Column:
    """Token count under the BPE-ish regex tokenizer."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0))


def md5_hash32(s: Column) -> Column:
    """Deterministic 32-bit-range hash reproducible in any engine with md5:
    first 8 hex chars of md5 as a bigint. Used only where an external SQL
    oracle must reproduce the value; hot paths use xxhash64."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def word_ngrams(text: Column, n: int = 3) -> Column:
    """All word n-grams as strings, in document order. (sequence(1,0) is
    DESCENDING in Spark, so short docs need the explicit empty guard.)"""
    toks = ws_tokens(text)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def ngram_shingles(text: Column, n: int = 3) -> Column:
    """Distinct hashed word n-gram shingles (oracle-reproducible hash)."""
    return F.array_distinct(F.transform(word_ngrams(text, n), md5_hash32))


def stopword_anchored_shingles(text: Column, width: int = 6) -> Column:
    """Reference shingler shingle_six (createCorpus.scala:111-152), exact
    semantics: scan token positions 0,2,4,… (the reference advances 2 tokens
    per step, :148); at a position whose token lowercases to one of the
    24 SHINGLE_STOPWORDS emit the full `width`-token window; STOP when
    fewer than `width` tokens remain (full windows only, :138); distinct.

    Divergences kept deliberately: whitespace tokenization (reference
    split(" ") — identical on single-spaced text) and xxhash64 in place of
    MurmurHash3 seed 0 (any stable 64-bit hash preserves dedup semantics;
    the hash value itself is never compared to reference output)."""
    return F.transform(
        stopword_anchored_windows(text, width), lambda w: F.xxhash64(w, F.lit(0))
    )


def stopword_anchored_windows(text: Column, width: int = 6) -> Column:
    """The distinct anchored window STRINGS behind
    stopword_anchored_shingles — hash-free so tests and oracles can check
    the exact reference semantics."""
    toks = ws_tokens(text)
    sw = F.lit(SHINGLE_STOPWORDS)  # Literal, not CreateArray (constant-folded)
    # 1-based anchors 1,3,5,…  ≤ size-width+1  ⇔ 0-based even positions with
    # a full window remaining
    idx = F.when(
        F.size(toks) >= width,
        F.sequence(F.lit(1), F.size(toks) - (width - 1), F.lit(2)),
    ).otherwise(F.array().cast("array<int>"))
    windows = F.transform(
        idx,
        lambda i: F.when(
            F.array_contains(sw, F.lower(F.element_at(toks, i))),
            F.array_join(F.slice(toks, i, width), " "),
        ),
    )
    return F.array_distinct(F.filter(windows, lambda w: w.isNotNull()))


def subword_token_counts(text: Column, keyword: str) -> Column:
    """Reference subword counter (getSubwordsFromWETRecords.scala:21-59):
    lowercase each space-split token, strip punctuation, keep tokens that
    START or END with the (lowercased) keyword — INCLUDING the bare keyword
    itself — and return the token list (callers aggregate token→count maps).

    Divergence from the cited code, on purpose: the reference's
    remove_punctuation returns match group 1 — the *leading punctuation* —
    which is a bug (the intent, per the surrounding code, is the token
    without punctuation). We implement the intent: strip leading AND
    trailing \\p{Punct}, then lowercase."""
    kw = keyword.lower()
    toks = F.split(text, " ")
    cleaned = F.transform(
        toks, lambda t: F.lower(F.regexp_replace(t, r"^\p{Punct}+|\p{Punct}+$", ""))
    )
    return F.filter(
        cleaned, lambda t: t.startswith(kw) | t.endswith(kw)
    )


def alpha_ratio(text: Column) -> Column:
    n = F.length(text)
    a = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    return F.when(n > 0, a.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def digit_ratio(text: Column) -> Column:
    n = F.length(text)
    d = F.length(F.regexp_replace(text, "[^0-9]", ""))
    return F.when(n > 0, d.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    toks = ws_tokens(F.lower(text))
    sw = F.lit(STOPWORDS)  # Literal, not CreateArray (constant-folded)
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite document quality in [0,1]: favors alphabetic, lightly
    numeric text of reasonable length with a natural stopword ratio —
    the same signals the reference cleaner keys on
    (PrepareDocument.scala keepLine: >5 tokens, >65% alnum, <30% numeric)."""
    ntok = token_count_ws(text).cast("double")
    len_score = F.least(ntok / F.lit(100.0), F.lit(1.0))
    alpha = alpha_ratio(text)
    digit_pen = F.greatest(F.lit(0.0), F.lit(1.0) - digit_ratio(text) * 3)
    sw = stopword_ratio(text)
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.4)) / F.lit(0.4)
    sw_score = F.greatest(F.lit(0.0), F.least(sw_score, F.lit(1.0)))
    return F.round(
        len_score * 0.25 + alpha * 0.35 + digit_pen * 0.15 + sw_score * 0.25, 6
    )


# Marker function words per language for the n-gram-free language-ID
# heuristic (deterministic, oracle-reproducible).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "with"],
    "es": ["el", "la", "los", "las", "que", "de", "una"],
    "fr": ["le", "les", "des", "une", "est", "dans", "avec"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit"],
}


def lang_scores_from_tokens(toks_lower: Column) -> dict[str, Column]:
    """Marker-hit counts per language over an already-lowered token array
    (callers that tokenize once should prefer this over lang_scores)."""
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marr = F.lit(markers)
        out[lang] = F.size(
            F.filter(toks_lower, lambda t: F.array_contains(marr, t))
        )
    return out


def lang_scores(text: Column) -> dict[str, Column]:
    return lang_scores_from_tokens(ws_tokens(F.lower(text)))


def lang_id_from_scores(scores: dict[str, Column]) -> Column:
    """Argmax language with deterministic tie-break (alphabetical language
    code order; 'und' when no marker matches). Callers should pass
    MATERIALIZED score columns — each score is referenced several times in
    the argmax CASE chain, and a non-materialized score re-runs its token
    filter per reference."""
    langs = sorted(scores)
    best = scores[langs[0]]
    for lg in langs[1:]:
        best = F.greatest(best, scores[lg])
    expr = F.lit("und")
    for lg in reversed(langs):
        expr = F.when((scores[lg] > 0) & (scores[lg] == best), F.lit(lg)).otherwise(expr)
    return expr


def lang_id(text: Column) -> Column:
    return lang_id_from_scores(lang_scores(text))


def doc_fingerprint(text: Column) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    whitespace tokens (reference F3 used per-line md5 for dup detection —
    PrepareDocument.scala:66-72)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(ws_tokens(text))), " "))


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash over whitespace tokens, mod 1e9+7. Each token
    contributes its oracle-reproducible md5_hash32; the fold is
    acc = (acc*31 + h(tok)) % MOD — expressible in ANSI SQL via list_reduce."""
    toks = ws_tokens(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + md5_hash32(x)) % MOD,
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", Table A1 —
# public paper). The reference has no repetition filter; these are the
# standard training-data quality gates a 100 TB pipeline runs alongside
# the reference's cleaner. Token-level variants (the corpus here is
# single-line); the formulas generalize to lines/paragraphs unchanged.
# ---------------------------------------------------------------------------


def dup_token_frac(tokens: Column) -> Column:
    """Fraction of tokens that are repeats of an earlier token:
    1 - distinct/total, over an already-tokenized array (ws_tokens(text)).
    Pure native array ops — zero shuffle, zero HOF."""
    n = F.size(tokens)
    return F.when(
        n > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(tokens)).cast("double") / n.cast("double"),
    ).otherwise(F.lit(0.0))


def dup_token_char_frac(tokens: Column) -> Column:
    """Fraction of token characters carried by repeat occurrences:
    (chars(all tokens) - chars(distinct tokens)) / chars(all tokens)."""
    tch = F.length(F.array_join(tokens, ""))
    dch = F.length(F.array_join(F.array_distinct(tokens), ""))
    return F.when(
        tch > 0, (tch - dch).cast("double") / tch.cast("double")
    ).otherwise(F.lit(0.0))


def _word_ngrams(toks: Column, n: int) -> Column:
    """Sliding word n-grams joined by ' ' (the with_shingles window shape;
    toks must be a materialized column — HOF lambdas re-evaluate captured
    subexpressions per element)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def _char_cover_frac(chars_col: str) -> Column:
    """`chars / len(text)` capped at 1 (gram occurrences overlap), rounded;
    0 for empty text (total — real corpora have empty rows even though the
    sandbox tables don't, and ANSI-mode division must never see tc=0)."""
    return F.when(
        F.col("__tc") > 0,
        F.round(
            F.least(
                F.lit(1.0),
                F.coalesce(F.col(chars_col), F.lit(0)).cast("double")
                / F.col("__tc").cast("double"),
            ),
            6,
        ),
    ).otherwise(F.lit(0.0))


def _gram_fold(sg: Column) -> Column:
    """(top_chars, dup_chars) from a SORTED gram array in ONE fold.

    Equal grams are adjacent after array_sort, so a single left-to-right
    scan tracks the open run and folds each closed run into
      * the best (count, len, gram) struct — struct comparison gives the
        identical tie-break to a grouped max(struct(c, l, g)): max count,
        then longest, then lexicographically largest gram;
      * the duplicated-chars sum Σ count·len over runs with count > 1.

    The fold references `sg` EXACTLY ONCE, deliberately: Catalyst pushes
    filters through deterministic Projects by substituting alias trees
    into the predicate, and any formulation whose per-element lambda
    re-reads the gram array (e.g. index lookups against run starts) goes
    quadratic per row once the array alias is inlined — measured as a
    >80× blowup when a downstream `.where(pass_repetition)` pushed
    through the chain. A fold's lambda touches only (acc, element), so
    worst-case inlining costs one linear re-evaluation."""
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("bc"),
        F.lit(0).alias("bl"),
        F.lit("").alias("bg"),
        F.lit(0).cast("long").alias("dup"),
    )

    def _close(acc):
        """Fold the open run into (bc, bl, bg, dup); no-op when run == 0."""
        cand = F.struct(
            acc["run"].alias("c"),
            F.length(acc["prev"]).alias("l"),
            acc["prev"].alias("g"),
        )
        cur = F.struct(
            acc["bc"].alias("c"), acc["bl"].alias("l"), acc["bg"].alias("g")
        )
        better = (acc["run"] > 0) & (cand > cur)
        return (
            F.when(better, acc["run"]).otherwise(acc["bc"]),
            F.when(better, F.length(acc["prev"])).otherwise(acc["bl"]),
            F.when(better, acc["prev"]).otherwise(acc["bg"]),
            acc["dup"]
            + F.when(
                acc["run"] > 1, acc["run"] * F.length(acc["prev"])
            ).otherwise(F.lit(0)),
        )

    def merge(acc, g):
        bc, bl, bg, dup = _close(acc)
        return F.when(
            (acc["run"] > 0) & (g == acc["prev"]),
            F.struct(
                acc["prev"].alias("prev"),
                (acc["run"] + 1).alias("run"),
                acc["bc"].alias("bc"),
                acc["bl"].alias("bl"),
                acc["bg"].alias("bg"),
                acc["dup"].alias("dup"),
            ),
        ).otherwise(
            F.struct(
                g.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                bc.alias("bc"),
                bl.alias("bl"),
                bg.alias("bg"),
                dup.alias("dup"),
            )
        )

    def finish(acc):
        bc, bl, bg, dup = _close(acc)
        return F.struct(
            F.when(bc > 0, bc * bl).alias("top_chars"),
            dup.alias("dup_chars"),
        )

    return F.aggregate(sg, init, merge, finish)


def _rep_chain(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_n: int,
    dup_n: int,
    extra_cols=None,
    base_tmp=None,
    tok_extra=None,
):
    """The shared single-scan projection chain behind repetition_scores /
    quality_gates: tokenization, sorted n-gram run-length scan, and the
    raw profile columns — all in-row, ZERO exchanges.
      * extra_cols: {name: fn(text)} computed in the first projection and
        carried through;
      * base_tmp: {name: fn(text)} computed in the first projection,
        visible to tok_extra, DROPPED after the second (e.g. a lowered
        token array consumed by several counters);
      * tok_extra: {name: Column} evaluated in the second projection
        (may reference `__toks`, `__tc` and base_tmp columns) and carried
        through.
    quality_gates rides the same scan instead of re-scanning and
    joining. Each intermediate is its own projection so the non-cheap
    array expressions are materialized once per row (CollapseProject
    keeps multi-referenced non-cheap aliases at a project boundary;
    HOF lambdas would otherwise re-evaluate captured subexpressions).

    Returns the profiled frame carrying
    [id, __tc, n_tokens, raw dup fracs, __top_chars, __dup_chars] +
    extra column names."""
    from commoncrawlscalatools_spark.spread import spread

    extra_cols = extra_cols or {}
    tok_extra = tok_extra or {}
    base_tmp = base_tmp or {}
    text = F.col(text_col)
    base = spread(df.select(id_col, text_col), id_col).select(
        F.col(id_col),
        F.length(text).alias("__tc"),
        ws_tokens(text).alias("__toks"),
        *[c(text).alias(nm) for nm, c in extra_cols.items()],
        *[c(text).alias(nm) for nm, c in base_tmp.items()],
    )
    toks = F.col("__toks")
    extras = list(extra_cols) + list(tok_extra)
    inrow = base.select(
        id_col,
        "__tc",
        F.size(toks).alias("n_tokens"),
        dup_token_frac(toks).alias("dup_token_frac"),
        dup_token_char_frac(toks).alias("dup_token_char_frac"),
        F.array_sort(_word_ngrams(toks, top_n)).alias("__sgt"),
        F.array_sort(_word_ngrams(toks, dup_n)).alias("__sgd"),
        *list(extra_cols),
        *[c.alias(nm) for nm, c in tok_extra.items()],
    )
    keep = [id_col, "__tc", "n_tokens", "dup_token_frac", "dup_token_char_frac"]
    profiled = inrow.select(
        *keep,
        _gram_fold(F.col("__sgt"))["top_chars"].alias("__top_chars"),
        _gram_fold(F.col("__sgd"))["dup_chars"].alias("__dup_chars"),
        *extras,
    )
    return profiled


def repetition_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Per-document repetition profile:
      * dup_token_frac / dup_token_char_frac — in-row native array ops;
      * top_{top_n}gram_char_frac — chars covered by the single most
        frequent n-gram: count * len(gram) / len(text), capped at 1
        (occurrences overlap). Tie-break pinned: max count, then longest
        gram, then lexicographically largest;
      * dup_{dup_n}gram_char_frac — chars covered by ALL n-grams occurring
        more than once: sum(count * len(gram)) / len(text), capped at 1.

    Scale shape (r7): the gram counts are keyed by doc_id only, so they
    never need a shuffle at all — sort each doc's gram array in-row and
    scan adjacent runs (run count = gram count; max struct = the grouped
    max; Σ over runs = the dup sum). ONE narrow projection chain, ZERO
    exchanges, no join-back (the r6 shape — tagged explode + two
    aggregates + join — shuffled every gram string twice and fell into
    SortAggregate for the struct max). At 100 TB this is a pure map."""
    profiled = _rep_chain(df, text_col, id_col, top_n, dup_n)
    return profiled.select(
        id_col,
        "n_tokens",
        F.round("dup_token_frac", 6).alias("dup_token_frac"),
        F.round("dup_token_char_frac", 6).alias("dup_token_char_frac"),
        _char_cover_frac("__top_chars").alias(f"top_{top_n}gram_char_frac"),
        _char_cover_frac("__dup_chars").alias(f"dup_{dup_n}gram_char_frac"),
    )


def mean_word_len(tokens: Column) -> Column:
    """Mean characters per token; 0 for empty docs."""
    n = F.size(tokens)
    return F.when(
        n > 0,
        F.length(F.array_join(tokens, "")).cast("double") / n.cast("double"),
    ).otherwise(F.lit(0.0))


def stopword_hits(tokens_lower: Column) -> Column:
    """Count of tokens that are stopwords (Gopher's 'at least two of a
    small stopword list' gate counts HITS, not distinct words)."""
    sw = F.lit(STOPWORDS)
    return F.size(F.filter(tokens_lower, lambda t: F.array_contains(sw, t)))


def quality_gates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 90,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.82,
    min_stopword_hits: int = 2,
    max_dup_token_frac: float = 0.60,
    max_top_2gram_char_frac: float = 0.20,
    max_dup_5gram_char_frac: float = 0.30,
    lang: str = "en",
) -> DataFrame:
    """The composed training-data quality gate — the Gopher/C4-style
    filter recipe (Rae et al. 2021 Table A1; Raffel et al. 2020 §2.2 —
    public papers) over this engine's own primitives: token-count range,
    mean-word-length range, alphabetic fraction, minimum stopword hits,
    the repetition profile, and language-ID. Returns one row per document
    with each gate's boolean and the conjunction `passed` — keeping the
    per-gate verdicts is what lets a pipeline report WHICH gate rejected
    how much (the reference's filter-stats side-output shape,
    StreamFilterStatsWriter.scala:12-68, applied to quality filtering).

    Scale shape (r7): ONE narrow projection chain, ZERO exchanges — the
    repetition profile is computed in-row by _rep_chain (sorted-run scan)
    and every other gate rides the same scan as tok_extra columns, so the
    r6 shape's self-join (and its two exchanges) is gone entirely. The
    language argmax runs over four MATERIALIZED marker-count columns —
    the inline lang_id(text) expression re-tokenized the text per CASE
    branch reference (~28 splits/row)."""
    lt = F.col("__lt")
    profiled = _rep_chain(
        df,
        text_col,
        id_col,
        2,
        5,
        extra_cols={"__alpha": alpha_ratio},
        base_tmp={"__lt": lambda text: ws_tokens(F.lower(text))},
        tok_extra={
            "__mwl": mean_word_len(F.col("__toks")),
            "__sw": stopword_hits(lt),
            **{
                f"__s_{lg}": sc
                for lg, sc in lang_scores_from_tokens(lt).items()
            },
        },
    )
    lang_expr = lang_id_from_scores(
        {lg: F.col(f"__s_{lg}") for lg in LANG_MARKERS}
    )
    return profiled.select(
        id_col,
        "n_tokens",
        F.col("n_tokens").between(min_tokens, max_tokens).alias("pass_len"),
        F.col("__mwl")
        .between(min_mean_word_len, max_mean_word_len)
        .alias("pass_word_len"),
        (F.col("__alpha") >= min_alpha_frac).alias("pass_alpha"),
        (F.col("__sw") >= min_stopword_hits).alias("pass_stopwords"),
        (
            (F.round("dup_token_frac", 6) <= max_dup_token_frac)
            & (_char_cover_frac("__top_chars") <= max_top_2gram_char_frac)
            & (_char_cover_frac("__dup_chars") <= max_dup_5gram_char_frac)
        ).alias("pass_repetition"),
        (lang_expr == lang).alias("pass_lang"),
    ).select(
        "*",
        (
            F.col("pass_len")
            & F.col("pass_word_len")
            & F.col("pass_alpha")
            & F.col("pass_stopwords")
            & F.col("pass_repetition")
            & F.col("pass_lang")
        ).alias("passed"),
    )
