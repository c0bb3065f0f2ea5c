"""Quote-aware scanning over SQL statement text (r17, ADVICE r16):
one literal-masking tokenizer shared by the DML facade's parser
(``sql_dml``) and the predicate-envelope extractor
(``operators/dml``), so keywords, separators, and alias rewrites can
never fire inside a string literal or a backtick identifier.

The prior round's helpers each tracked quote state independently and
each tracked only ``'`` — Spark's default parser also accepts
double-quoted string literals (``spark.sql.ansi.doubleQuotedIdentifiers``
is off) and backtick identifiers, so ``WHERE note = "x AND y"`` split
at the AND inside the literal. Everything here builds on ONE primitive:
``mask_literals`` returns a same-length copy of the text with every
character of every quoted span (quotes included) replaced by ``\\x00``
— scans run over the mask, spans slice the ORIGINAL text, and
positions map 1:1 by construction.

Escape handling inside literals: backslash escapes (Spark's default
non-ANSI string escape) and doubled quotes (``''``, ``""``, and
doubled backticks in identifiers) both stay inside the span. An
unterminated literal masks to end-of-string — conservative: the
caller sees no keywords past it and refuses rather than mis-splitting.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

#: the placeholder every literal character becomes in the mask; NUL
#: cannot appear in a Python ``str`` coming from a SQL statement the
#: user typed, so mask positions are unambiguous.
MASK_CHAR = "\x00"

_QUOTES = ("'", '"', "`")


def mask_literals(text: str) -> str:
    """Same-length copy of ``text`` with every quoted span —
    single-quoted / double-quoted string literals and backtick
    identifiers, quote characters included — replaced by
    ``MASK_CHAR``. All other characters are verbatim, so a regex
    match on the mask gives positions directly usable on ``text``."""
    out = list(text)
    i, n = 0, len(text)
    while i < n:
        q = text[i]
        if q not in _QUOTES:
            i += 1
            continue
        out[i] = MASK_CHAR
        i += 1
        while i < n:
            c = text[i]
            out[i] = MASK_CHAR
            if c == "\\" and q != "`" and i + 1 < n:
                # backslash escape: consume the escaped char too
                out[i + 1] = MASK_CHAR
                i += 2
                continue
            if c == q:
                if i + 1 < n and text[i + 1] == q:
                    # doubled-quote escape ('' / "" / ``): still inside
                    out[i + 1] = MASK_CHAR
                    i += 2
                    continue
                i += 1
                break
            i += 1
    return "".join(out)


def iter_quoted_spans(
    text: str, quote: str = "`"
) -> Iterator[tuple[int, int, str]]:
    """Yield ``(start, end, content)`` for every TOP-LEVEL span quoted
    with ``quote`` — ``start``/``end`` bracket the span including the
    quote characters, ``content`` is the unquoted inside (doubled
    quotes collapsed). A span opened inside a DIFFERENT quote style
    does not count: ``'a `b` c'`` yields nothing for backticks. The
    facade's query front door uses this to find backtick-quoted
    manifest paths in arbitrary statement text without ever matching
    one inside a string literal."""
    i, n = 0, len(text)
    while i < n:
        q = text[i]
        if q not in _QUOTES:
            i += 1
            continue
        start = i
        i += 1
        while i < n:
            c = text[i]
            if c == "\\" and q != "`" and i + 1 < n:
                i += 2
                continue
            if c == q:
                if i + 1 < n and text[i + 1] == q:
                    i += 2
                    continue
                i += 1
                break
            i += 1
        if q == quote:
            inner = text[start + 1 : i - 1].replace(q + q, q)
            yield (start, i, inner)


def iter_keyword_spans(
    text: str,
    keywords: list[str],
    mask: str | None = None,
) -> Iterator[tuple[int, int, str]]:
    """Yield ``(start, end, KEYWORD_UPPER)`` for every TOP-LEVEL
    occurrence of the given keywords: word-bounded, case-insensitive,
    outside literals (via the mask) and outside parentheses (depth
    tracked on the mask, so parens inside literals don't count)."""
    if mask is None:
        mask = mask_literals(text)
    pat = re.compile(
        r"[()]|\b(?:" + "|".join(keywords) + r")\b", re.I
    )
    depth = 0
    for m in pat.finditer(mask):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            yield m.start(), m.end(), tok.upper()


def find_keyword(
    text: str, keyword: str, mask: str | None = None
) -> tuple[int, int] | None:
    """``(start, end)`` of the first top-level occurrence of
    ``keyword``, or None."""
    for s, e, _ in iter_keyword_spans(text, [keyword], mask=mask):
        return s, e
    return None


def split_keyword(text: str, keyword: str) -> list[str]:
    """Split ``text`` at every top-level occurrence of ``keyword``
    (the keyword itself is dropped). Always returns at least one
    segment — the leading one may be empty when the text starts with
    the keyword."""
    segs, last = [], 0
    for s, e, _ in iter_keyword_spans(text, [keyword]):
        segs.append(text[last:s])
        last = e
    segs.append(text[last:])
    return segs


def split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on a single-character separator outside literals and
    parentheses; empty/whitespace-only pieces are dropped (SET lists
    and IN lists tolerate trailing separators)."""
    mask = mask_literals(text)
    out, depth, last = [], 0, 0
    for i, ch in enumerate(mask):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            out.append(text[last:i])
            last = i + 1
    out.append(text[last:])
    return [p.strip() for p in out if p.strip()]


def sub_qualified_aliases(
    text: str | None, mapping: dict[str, str]
) -> str | None:
    """Rewrite qualified alias references (``alias.`` -> ``canon.``)
    for EVERY alias in ``mapping`` in ONE simultaneous pass, skipping
    matches inside literals. Simultaneity matters (ADVICE r16): with
    target alias ``x`` and source alias ``t``, sequential rewrites
    collapse both to ``s.`` (``x.``->``t.`` then ``t.``->``s.``);
    here each occurrence maps by which alias it WAS. Mapping keys are
    matched case-insensitively (SQL identifiers); only ``alias .``
    followed by a dot rewrites — bare words and literal content never
    do."""
    if text is None:
        return None
    mask = mask_literals(text)
    lower = {a.lower(): c for a, c in mapping.items()}
    pat = re.compile(
        r"\b("
        + "|".join(re.escape(a) for a in sorted(lower, key=len, reverse=True))
        + r")\s*\.",
        re.I,
    )

    def repl(m: re.Match) -> str:
        if MASK_CHAR in mask[m.start() : m.end()]:
            return m.group(0)
        return lower[m.group(1).lower()] + "."

    return pat.sub(repl, text)
