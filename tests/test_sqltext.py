"""The shared quote-aware SQL text tokenizer (``sqltext.py``, r17 —
ADVICE r16's root-cause fix): literal masking, top-level keyword and
separator scanning, and simultaneous alias rewriting. Pure Python —
no Spark session."""

from __future__ import annotations

from redis_lsm_timeseries_spark.sqltext import (
    MASK_CHAR,
    find_keyword,
    iter_keyword_spans,
    mask_literals,
    split_keyword,
    split_top_level,
    sub_qualified_aliases,
)


def masked(s: str) -> str:
    return mask_literals(s)


class TestMaskLiterals:
    def test_same_length_and_quote_styles(self):
        for text, span in [
            ("a = 'x AND y'", 9),
            ('a = "x AND y"', 9),
            ("`weird AND col` = 1", 15),
        ]:
            m = masked(text)
            assert len(m) == len(text)
            assert m.count(MASK_CHAR) == span

    def test_doubled_quote_escape_stays_inside(self):
        m = masked("a = 'it''s ok' AND b")
        assert m == "a = " + MASK_CHAR * 10 + " AND b"
        m = masked('a = "he said ""hi""" AND b')
        assert m.endswith(" AND b") and "hi" not in m

    def test_backslash_escape_stays_inside(self):
        m = masked(r"a = 'it\'s' AND b")
        assert m == "a = " + MASK_CHAR * 7 + " AND b"

    def test_backtick_has_no_backslash_escape(self):
        # inside backticks a backslash is a plain character
        m = masked(r"`a\` = 1")
        assert m.startswith(MASK_CHAR * 4)

    def test_unterminated_literal_masks_to_end(self):
        m = masked("a = 'oops AND b")
        assert m == "a = " + MASK_CHAR * 11

    def test_adjacent_literals(self):
        m = masked("'a'||'b'")
        assert m == MASK_CHAR * 3 + "||" + MASK_CHAR * 3


class TestKeywordScanning:
    def test_keywords_inside_literals_never_match(self):
        assert find_keyword("x = 'WHERE'", "WHERE") is None
        assert find_keyword('x = "no where"', "WHERE") is None
        assert find_keyword("`where` = 1", "WHERE") is None

    def test_keywords_inside_parens_are_not_top_level(self):
        assert find_keyword("f(CASE x)", "CASE") is None
        spans = list(
            iter_keyword_spans("a AND (b AND c) AND d", ["AND"])
        )
        assert len(spans) == 2

    def test_word_boundaries(self):
        assert find_keyword("android = 1", "AND") is None
        assert find_keyword("band AND orchestra", "AND") == (5, 8)

    def test_split_keyword(self):
        segs = split_keyword("WHEN a THEN b WHEN c THEN d", "WHEN")
        assert [s.strip() for s in segs] == [
            "", "a THEN b", "c THEN d"
        ]

    def test_case_insensitive(self):
        assert find_keyword("x where y", "WHERE") == (2, 7)


class TestSplitTopLevel:
    def test_commas_in_literals_and_calls_do_not_split(self):
        parts = split_top_level("a = f(1, 2), b = 'x, y', c = 3")
        assert parts == ["a = f(1, 2)", "b = 'x, y'", "c = 3"]

    def test_trailing_separator_tolerated(self):
        assert split_top_level("a, b, ") == ["a", "b"]


class TestSubQualifiedAliases:
    def test_simultaneous_swap(self):
        # ADVICE r16: AS x ... AS t collapsed both aliases to s.
        out = sub_qualified_aliases(
            "x.k = t.k", {"x": "t", "t": "s"}
        )
        assert out == "t.k = s.k"

    def test_full_swap(self):
        out = sub_qualified_aliases(
            "s.k = t.k", {"s": "t", "t": "s"}
        )
        assert out == "t.k = s.k"

    def test_literal_content_untouched(self):
        out = sub_qualified_aliases(
            "s.note = 'x.tag'", {"x": "t", "s": "s"}
        )
        assert out == "s.note = 'x.tag'"

    def test_bare_words_untouched(self):
        # only alias-DOT rewrites: a bare 'x' and the 'x' inside
        # 'tx.x' both stay; 'x.k' rewrites
        out = sub_qualified_aliases("x + tx.x + x.k", {"x": "t"})
        assert out == "x + tx.x + t.k"

    def test_case_insensitive_and_spacing(self):
        out = sub_qualified_aliases("X . k", {"x": "t"})
        assert out == "t. k"  # trailing spacing after the dot kept

    def test_none_passthrough(self):
        assert sub_qualified_aliases(None, {"a": "t"}) is None

    def test_longest_alias_wins(self):
        out = sub_qualified_aliases(
            "tt.k = t.k", {"tt": "t", "t": "s"}
        )
        assert out == "t.k = s.k"
