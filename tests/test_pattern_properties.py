"""Hypothesis property tests for pure-Python pattern construction —
the pieces whose correctness the Spark/DuckDB parity tests consume but
cannot themselves falsify cheaply. Verified against Python re — the
same \\b/escape semantics the Java-regex and RE2 engines apply to
these constructs."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pac_spark.operators.scrub import _denylist_pattern

_WORD = st.text(alphabet="ab1_", min_size=1, max_size=4)
_EDGY = st.text(alphabet="ab+@.", min_size=1, max_size=4)


@settings(max_examples=200, deadline=None)
@given(
    terms=st.lists(_WORD, min_size=1, max_size=3, unique=True),
    tokens=st.lists(_WORD, min_size=0, max_size=8),
)
def test_word_terms_match_whole_words_exactly(terms, tokens):
    """For word-character terms over word-character tokens, the built
    pattern matches a token iff it equals a term — never substrings
    ('j' must not hit inside 'ja'), never wildcards."""
    text = " ".join(tokens)
    got = len(re.findall(_denylist_pattern(tuple(terms)), text))
    want = sum(1 for t in tokens if t in terms)
    assert got == want, (terms, text, got, want)


@settings(max_examples=200, deadline=None)
@given(
    terms=st.lists(st.one_of(_WORD, _EDGY), min_size=1, max_size=3, unique=True),
    tokens=st.lists(st.one_of(_WORD, _EDGY), min_size=0, max_size=8),
)
def test_every_standalone_term_occurrence_is_redacted(terms, tokens):
    """Recall, for ANY term shape (word- or symbol-edged): a
    whitespace-delimited token equal to a term always produces at
    least one match inside that token. (Symbol-edged terms may
    additionally substring-match — RE2 has no lookbehind to forbid
    it; the scrubber documents that as over-redaction, the safe
    direction for PII.)"""
    text = " ".join(tokens)
    got = len(re.findall(_denylist_pattern(tuple(terms)), text))
    want_at_least = sum(1 for t in tokens if t in terms)
    assert got >= want_at_least, (terms, text, got, want_at_least)
