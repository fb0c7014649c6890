"""Document cleaner — reimplementation of the reference's PrepareDocument
pipeline (Laippala & Ginter 2014-style boilerplate removal).

Reference: /root/reference/createcorpus/.../commoncrawlimport/PrepareDocument.scala
  * keepLine (:451-491): keep lines with >5 tokens, >65% alphanumeric tokens,
    <30% numeric tokens; short lines kept if they end the current block's
    sentence.
  * detect_sentence_ending (:493-514): '.', '?', '!' (but not '..'), or a
    closing quote preceded by one of those.
  * cleanTextBlock (:423-449): trim each block to [first sentence start,
    last sentence end]; reject blocks whose first sentence ending comes
    after 70 tokens, or with no valid start/end.

Two tiers:
  * `keep_lines` — the line-level predicate as a pure Catalyst expression
    (array filter over split lines); whole-stage-codegen'd, oracle-checkable.
  * `clean_documents` — the full block/sentence state machine as an
    Arrow-vectorized pandas UDF (one string in, one string out; inherently
    sequential within a document, embarrassingly parallel across documents).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# A token "counts as alphanumeric" if it contains any alnum char
# (PrepareDocument.scala:39-44); "numeric" if it has a digit and no letters.
_ALNUM_RE = r"[a-zA-Z0-9]"
_NUMERIC_RE = r"^[^a-zA-Z]*[0-9][^a-zA-Z]*$"

MAX_TOKENS_BEFORE_SENTENCE_END = 70  # PrepareDocument.scala:32


def _line_tokens(line: Column) -> Column:
    return F.filter(F.split(F.trim(line), r"\s+"), lambda x: x != "")


def keep_line_expr(line: Column) -> Column:
    """keepLine predicate as a Catalyst expression (no sentence-ending
    exception — that needs cross-line state, handled in clean_documents)."""
    toks = _line_tokens(line)
    n = F.size(toks)
    alnum = F.size(F.filter(toks, lambda t: t.rlike(_ALNUM_RE)))
    numeric = F.size(F.filter(toks, lambda t: t.rlike(_NUMERIC_RE)))
    return (
        (n > 5)
        & (alnum.cast("double") / n.cast("double") > 0.65)
        & (numeric.cast("double") / n.cast("double") < 0.3)
    )


def keep_lines(text: Column) -> Column:
    """Filter a document's lines by keepLine; rejoin with newlines."""
    lines = F.split(text, "\n")
    return F.array_join(F.filter(lines, keep_line_expr), "\n")


# ----- full cleaner (pandas UDF) --------------------------------------------

_SENT_END = (".", "?", "!")
_QUOTES = ("'", '"', "”")


def _is_url_token(tok: str) -> bool:
    return "://" in tok or tok.lower().startswith("www.")


def _detect_sentence_ending(line: str) -> bool:
    line = line.rstrip()
    if not line:
        return False
    last = line[-1]
    if last in _SENT_END:
        return not line.endswith("..") or line.endswith("...")
    if last in _QUOTES and len(line) >= 2:
        return line[-2] in _SENT_END
    return False


def _token_ends_sentence(tok: str) -> bool:
    if _is_url_token(tok):
        return False
    if len(tok) == 2 and tok[1] == "." and tok[0].isalpha():
        # single-letter-plus-period (initials like "J.") is not an ending
        return False
    return _detect_sentence_ending(tok)


def _token_starts_sentence(tok: str) -> bool:
    t = tok.lstrip("'\"“(")
    return bool(t) and (t[0].isupper() or t[0].isdigit())


def _keep_line_py(line: str, in_textblock: bool) -> bool:
    toks = line.split()
    if in_textblock and _detect_sentence_ending(line):
        return True  # short sentence-final line of an open block
    if len(toks) <= 5:
        return False
    alnum = sum(1 for t in toks if re.search(_ALNUM_RE, t))
    if alnum / len(toks) <= 0.65:
        return False
    numeric = sum(1 for t in toks if re.match(_NUMERIC_RE, t))
    return numeric / len(toks) < 0.3


def _clean_textblock(block: str) -> str | None:
    toks = block.split()
    if not toks:
        return None
    start_i = next((i for i, t in enumerate(toks) if _token_starts_sentence(t)), None)
    end_is = [i for i, t in enumerate(toks) if _token_ends_sentence(t)]
    if start_i is None or not end_is:
        return None
    first_end = next((i for i in end_is if i >= start_i), None)
    if first_end is None or first_end - start_i >= MAX_TOKENS_BEFORE_SENTENCE_END:
        return None
    last_end = max(i for i in end_is if i >= start_i)
    return " ".join(toks[start_i : last_end + 1])


def clean_document_py(text: str | None) -> str | None:
    """Pure-Python cleaner for one document (unit-testable; wrapped below)."""
    if text is None:
        return None
    blocks: list[str] = []
    current: list[str] = []
    for line in text.split("\n"):
        if _keep_line_py(line, in_textblock=bool(current)):
            current.append(line.strip())
            if _detect_sentence_ending(line):
                blocks.append(" ".join(current))
                current = []
        else:
            if current:
                blocks.append(" ".join(current))
                current = []
    if current:
        blocks.append(" ".join(current))
    cleaned = [c for b in blocks if (c := _clean_textblock(b))]
    return "\n".join(cleaned) if cleaned else None


@F.pandas_udf(T.StringType())
def clean_documents(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized full cleaner: one Python call per ~10k-row batch."""
    return texts.map(clean_document_py)
