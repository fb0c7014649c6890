"""Document cleaner — faithful reimplementation of the reference's
PrepareDocument pipeline (Laippala & Ginter 2014-style boilerplate
removal).

Reference: /root/reference/createcorpus/.../commoncrawlimport/PrepareDocument.scala
  * keepLine (:451-491): >5 tokens, >65% alphanumeric tokens, <30% numeric
    tokens; any short line kept if it ends the current block's sentence.
  * keepMiddleLine (:518-531): a rejected line between two kept lines
    survives if it has ≥2 tokens and ≥1 alphanumeric token; TWO rejected
    lines in a row end the block.
  * detect_sentence_ending (:493-514): '.', '?', '!' (bug-compatible
    ".."-check: takeRight(3) == ".."), or a quote preceded by one of those.
  * cleanTextBlock (:423-449): tokenize, find the sentence start (first
    ^[A-Z] token, plus preceding quote/bracket run), require the first
    bare ./!/? TOKEN within 70 tokens, scan CHARACTERS backward for the
    last valid ending (no adjacent periods, no abbreviation endings like
    "Mr."/"Ret.", must be followed by space/end unless closing
    quotes/brackets absorb it), slice the ORIGINAL block text [start..end]
    — newlines and trailing whitespace inside the block are PRESERVED.
  * prepare (:532-700): line loop with last_dropped_line resurrection (a
    dropped capitalized line prepends a block that doesn't start with a
    capital), interstitial-line tolerance, ≤4-token block discard, blocks
    joined with "\\n".

The only deliberate divergence: tokenize_line uses a regex PTB
approximation (splits punctuation, keeps abbreviations/initials/URLs/
decimals together, original text forms) instead of Stanford CoreNLP's
PTBTokenizer, which is not installable here. The ~25 document-level
goldens from PrepareDocumentSpec.scala pass against this tokenizer
(tests/test_cleaner_goldens.py).

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

# A token "counts as alphanumeric" if it contains [A-Za-z0-9'`]
# (PrepareDocument.scala:25); "numeric" if it contains a digit (:32).
_ALNUM_RE = re.compile(r"[A-Za-z0-9'`]")
_NUMERIC_RE = re.compile(r"[0-9]")
_UPPER_RE = re.compile(r"^[A-Z]")  # upper_pattern "^[A-Z].*" (:26)

MAX_TOKENS_BEFORE_SENTENCE_END = 70  # PrepareDocument.scala:33


# ----- line-level tier (Catalyst expression; unchanged contract) -------------

_SQL_ALNUM_RE = r"[a-zA-Z0-9]"
_SQL_NUMERIC_RE = r"^[^a-zA-Z]*[0-9][^a-zA-Z]*$"


def _line_tokens(line: Column) -> Column:
    return F.filter(F.split(F.trim(line), r"\s+"), lambda x: x != "")


def keep_line_expr(line: Column) -> Column:
    """keepLine predicate as a Catalyst expression (no sentence-ending
    exception — that needs cross-line state, handled in clean_documents)."""
    toks = _line_tokens(line)
    n = F.size(toks)
    alnum = F.size(F.filter(toks, lambda t: t.rlike(_SQL_ALNUM_RE)))
    numeric = F.size(F.filter(toks, lambda t: t.rlike(_SQL_NUMERIC_RE)))
    return (
        (n > 5)
        & (alnum.cast("double") / n.cast("double") > 0.65)
        & (numeric.cast("double") / n.cast("double") < 0.3)
    )


def keep_lines(text: Column) -> Column:
    """Filter a document's lines by keepLine; rejoin with newlines."""
    lines = F.split(text, "\n")
    return F.array_join(F.filter(lines, keep_line_expr), "\n")


# ----- PTB-approximating tokenizer -------------------------------------------

# Abbreviations PTB keeps welded to their period (superset of the spec's
# Mr./Ms./Jr./Sr./Ret. cases).
_ABBREVS = {
    "mr.", "mrs.", "ms.", "jr.", "sr.", "dr.", "prof.", "rep.", "rev.",
    "ret.", "sen.", "gov.", "gen.", "col.", "sgt.", "st.", "mt.", "vs.",
    "etc.", "inc.", "ltd.", "co.", "corp.", "dept.", "univ.", "assn.",
    "jan.", "feb.", "mar.", "apr.", "jun.", "jul.", "aug.", "sep.",
    "sept.", "oct.", "nov.", "dec.",
}

_OPEN_PUNCT = "\"'`“‘([{"
_CLOSE_PUNCT = "\"'’”)]}"
_TERMINALS = ".!?,;:"

# PTB emits treebank forms for brackets and quotes — and the reference's
# alphanumeric class [A-Za-z0-9'`]+ deliberately matches them (``, '', `,
# ', -LSB- …), so quote/bracket tokens count as "alphanumeric" in keepLine.
_PTB_OPEN = {
    "(": "-LRB-", "[": "-LSB-", "{": "-LCB-",
    '"': "``", "“": "``", "‘": "`", "'": "`", "`": "`",
}
_PTB_CLOSE = {
    ")": "-RRB-", "]": "-RSB-", "}": "-RCB-",
    '"': "''", "”": "''", "’": "'", "'": "'",
}


def _is_url(tok: str) -> bool:
    return "://" in tok or tok.lower().startswith("www.")


def _split_chunk(chunk: str, out: list[str]) -> None:
    """One whitespace-delimited chunk → PTB-ish original-text tokens."""
    if not chunk:
        return
    if _is_url(chunk):
        out.append(chunk)
        return
    # peel leading opening quotes/brackets as treebank-form tokens
    i = 0
    while i < len(chunk) and chunk[i] in _OPEN_PUNCT:
        out.append(_PTB_OPEN[chunk[i]])
        i += 1
    core = chunk[i:]
    if not core:
        return
    # peel trailing punctuation (closing quotes/brackets, terminals, runs
    # of periods) into a stack of tokens
    tail: list[str] = []
    while core:
        if core.lower() in _ABBREVS or (
            len(core) == 2 and core[1] == "." and core[0].isalpha()
        ):
            break  # abbreviation / single-letter initial keeps its period
        last = core[-1]
        if last == "." and core.endswith(".."):
            m = re.search(r"\.+$", core)
            tail.append(m.group(0))  # "..."/".." is one token
            core = core[: -len(m.group(0))]
        elif last in _TERMINALS:
            tail.append(last)
            core = core[:-1]
        elif last in _CLOSE_PUNCT:
            tail.append(_PTB_CLOSE[last])
            core = core[:-1]
        else:
            break
    if core:
        # split internal hard punctuation (!?;) that PTB always separates,
        # e.g. "ThisBlogThis!Share" → ThisBlogThis ! Share
        parts = re.split(r"([!?;])", core)
        for p in parts:
            if p:
                out.append(p)
    out.extend(reversed(tail))


def tokenize_line(line: str) -> list[str]:
    """Regex PTB approximation returning ORIGINAL-text tokens
    (tokenize_line, PrepareDocument.scala:75-86)."""
    out: list[str] = []
    for chunk in line.split():
        _split_chunk(chunk, out)
    return out


# ----- character-level sentence machinery (direct ports) ---------------------


def detect_sentence_ending(line: str) -> bool:
    """PrepareDocument.scala:493-514, bug-compatible takeRight(3) check."""
    last = line[-1:]
    penultimate = line[-2:-1]
    if last in ".?!":
        return line[-3:] != ".."  # fires only for the 2-char line ".."
    if last in ("'", '"', "”"):
        return penultimate in ".?!"
    return False


def _ends_with_invalid(s: str, invalid_endings: list[str]) -> bool:
    return any(s.endswith(e) for e in invalid_endings)


def _has_period_previous(tb: str, i: int) -> bool:
    return i > 0 and tb[i - 1] == "."


def _has_period_next(tb: str, i: int) -> bool:
    return i + 1 < len(tb) and tb[i + 1] == "."


def _has_space_or_ending_next(tb: str, i: int) -> bool:
    return i + 1 == len(tb) or tb[i + 1] == " "


def is_valid_sentence_ending(tb: str, i: int, invalid_endings: list[str]) -> bool:
    """PrepareDocument.scala:308-324."""
    if tb[i] in "?!":
        return True
    if tb[i] == ".":
        if _has_period_previous(tb, i) or _has_period_next(tb, i):
            return False
        if _ends_with_invalid(tb[: i + 1], invalid_endings):
            return False
        return True
    return False


def adjust_index_for_additional_characters(tb: str, ending_index: int) -> int:
    """Closing quotes/brackets (and spaces between them) extend the ending
    (PrepareDocument.scala:259-283)."""
    valid_additional = "”’\"'])"
    i = ending_index
    j = ending_index + 1
    while j < len(tb):
        c = tb[j]
        if c in valid_additional:
            i = j
        elif c != " ":
            break
        j += 1
    return i


def find_sentence_end_index(tb: str, tokens: list[str]) -> int | None:
    """Backward character scan for the last valid sentence ending
    (PrepareDocument.scala:363-405)."""
    if not tb:
        return None
    invalid_endings = [t for t in tokens if len(t) > 1 and t[-1] == "."]
    invalid_endings.append("Ret.")
    index = len(tb) - 1
    while index != 0:
        if is_valid_sentence_ending(tb, index, invalid_endings):
            new_index = adjust_index_for_additional_characters(tb, index)
            if new_index == index and not _has_space_or_ending_next(tb, index):
                index -= 1
                continue
            return new_index
        index -= 1
    return None


_VALID_OPENING_BRACKETS = {"-LRB-", "-LSB-", "-LCB-"}
_VALID_QUOTES = {"`", "'", "''", "``"}

# translateTreebankToken (PrepareDocument.scala:104-114)
_TREEBANK_TO_CHAR = {
    "-LRB-": "(", "-LSB-": "[", "-LCB-": "{",
    "'": "'", "''": '"', "``": '"', "`": "‘",
}


def _sentence_additional_start_chars(previous_tokens: list[str]) -> str | None:
    """getSentenceAdditionalStartCharacters (PrepareDocument.scala:117-153):
    previous_tokens is nearest-first; accept one opening bracket (only
    immediately before the capital) then one quote, building the character
    string that precedes the sentence-start token."""
    start = ""
    for h in previous_tokens:
        if h in _VALID_OPENING_BRACKETS and start == "":
            start = _TREEBANK_TO_CHAR[h] + start
        elif h in _VALID_QUOTES:
            return _TREEBANK_TO_CHAR[h] + start
        else:
            return start if start else None
    return None


_QUOTE_CLASSES = [
    set("`‘"),
    set("'’"),
    set('"“”'),
]


def _match_two_characters(a: str, b: str) -> bool:
    """matchTwoCharacters (PrepareDocument.scala:228-257): unicode and
    ASCII quote forms are interchangeable."""
    if a == b:
        return True
    return any(a in cls and b in cls for cls in _QUOTE_CLASSES)


def get_start_index_with_additional_chars(
    tb: str, previous_chars: str, start_token: str
) -> int | None:
    """getStartIndexWithAdditionalStartCharacters
    (PrepareDocument.scala:160-222): locate previous_chars (spaces allowed
    between, quote classes interchangeable) immediately preceding
    start_token; return the index of the first previous char."""
    n = len(tb)
    i = 0
    while i < n:
        if len(tb) - i < len(start_token):
            return None
        # try to match previous_chars starting at i (skipping spaces)
        j = i
        k = 0
        first = -1
        while k < len(previous_chars) and j < n:
            if tb[j] == " ":
                j += 1
                continue
            if _match_two_characters(tb[j], previous_chars[k]):
                if k == 0:
                    first = j
                k += 1
                j += 1
            else:
                break
        if k == len(previous_chars):
            # skip spaces, then the start token must follow
            while j < n and tb[j] == " ":
                j += 1
            if tb.startswith(start_token, j):
                return first if previous_chars else j
        if not previous_chars and tb.startswith(start_token, i):
            return i
        i += 1
    return None


def find_sentence_start_index(tb: str, tokens: list[str]) -> int | None:
    """findSentenceStartIndex (PrepareDocument.scala:156-181): first token
    starting [A-Z]; preceding quote/bracket tokens may belong to it."""
    previous: list[str] = []
    for h in tokens:
        if _UPPER_RE.match(h):
            other = _sentence_additional_start_chars(previous)
            if other is not None:
                return get_start_index_with_additional_chars(tb, other, h)
            idx = tb.find(h)
            return idx if idx >= 0 else None
        previous.insert(0, h)
    return None


def _find_index_of_first_sentence_ending_token(tokens: list[str]) -> int | None:
    """First index among tokens equal to '.', '!' or '?'
    (PrepareDocument.scala:407-417)."""
    hits = [tokens.index(x) for x in (".", "!", "?") if x in tokens]
    return min(hits) if hits else None


def clean_textblock(tb: str) -> str | None:
    """cleanTextBlock (PrepareDocument.scala:423-449)."""
    tokens = tokenize_line(tb)
    if not tokens:
        return None
    start = find_sentence_start_index(tb, tokens)
    earliest = _find_index_of_first_sentence_ending_token(tokens)
    if start is None or earliest is None or earliest >= MAX_TOKENS_BEFORE_SENTENCE_END:
        return None
    end = find_sentence_end_index(tb, tokens)
    if end is None or start > end:
        return None
    return tb[start : end + 1]


# ----- line predicates --------------------------------------------------------


def keep_line(line: str, in_textblock: bool) -> bool:
    """keepLine (PrepareDocument.scala:451-491)."""
    if in_textblock and detect_sentence_ending(line):
        return True
    tokens = tokenize_line(line)
    if len(tokens) <= 5:
        return False
    alnum = sum(1 for t in tokens if _ALNUM_RE.search(t))
    if alnum / len(tokens) <= 0.65:
        return False
    numeric = sum(1 for t in tokens if _NUMERIC_RE.search(t))
    return numeric / len(tokens) < 0.3


def keep_middle_line(line: str) -> bool:
    """keepMiddleLine (PrepareDocument.scala:518-531)."""
    tokens = tokenize_line(line)
    return len(tokens) >= 2 and any(_ALNUM_RE.search(t) for t in tokens)


# ----- the prepare() state machine (PrepareDocument.scala:532-700) ------------


def prepare_document_py(document: str | None) -> str | None:
    if document is None:
        return None
    textblocks: list[str] = []
    builder: list[str] = []  # kept lines of the current block
    in_textblock = False
    last_dropped_line: str | None = None
    potential_middle_line: str | None = None

    def build_textblock() -> str:
        # a dropped capitalized line resurrects onto a block that does not
        # itself start with a capital (buildTextBlock, :545-556)
        body = "\n".join(builder)
        if (
            last_dropped_line is not None
            and _UPPER_RE.match(last_dropped_line)
            and not _UPPER_RE.match(body)
        ):
            return last_dropped_line + "\n" + body
        return body

    def append_to_textblocks(tb: str) -> None:
        # appendToTextblock (:563-570): ≤4 whitespace tokens → discard
        if len(tb.split()) > 4:
            textblocks.append(tb)

    def close_block() -> None:
        nonlocal builder, in_textblock
        cleaned = clean_textblock(build_textblock())
        if cleaned is not None:
            append_to_textblocks(cleaned)
        builder = []
        in_textblock = False

    for line in re.split(r"\r?\n", document):
        if keep_line(line, in_textblock):
            if not builder:
                builder.append(line)
                in_textblock = True
            else:
                if potential_middle_line is not None:
                    builder.append(potential_middle_line)
                    potential_middle_line = None
                builder.append(line)
            if detect_sentence_ending(line):
                close_block()
                last_dropped_line = None
        else:
            if builder and potential_middle_line is not None:
                # second questionable line in a row: drop both, end block
                potential_middle_line = None
                close_block()
            elif builder and keep_middle_line(line):
                potential_middle_line = line
            elif builder:
                close_block()
                potential_middle_line = None
            if potential_middle_line is None:
                in_textblock = False
                last_dropped_line = line if _UPPER_RE.match(line) else None

    if builder:
        # document didn't end on a complete sentence (:692-698); NOTE: the
        # reference cleans builder WITHOUT the last_dropped_line here
        cleaned = clean_textblock("\n".join(builder))
        if cleaned is not None:
            append_to_textblocks(cleaned)

    return "\n".join(textblocks)


# kept name for backward compatibility with round-1 callers/tests
def clean_document_py(text: str | None) -> str | None:
    return prepare_document_py(text)


@F.pandas_udf(T.StringType())
def clean_documents(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized full cleaner: one Python call per ~10k-row batch."""
    return texts.map(prepare_document_py)
