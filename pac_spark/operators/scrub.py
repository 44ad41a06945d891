"""PII / denylist scrubbing over the ``documents`` corpus — the
redaction pass every training-data pipeline runs before anything else
(part of the driver-contract LLM extension, ``SURVEY.md §2.10``; the
reference ships no redaction).

Shape: a single narrow projection — ``regexp_count`` over the original
text for per-class hit counts, then a sequential ``regexp_replace``
chain for the scrubbed payload. Zero shuffles, whole-stage codegen,
streams through a 100 TB scan exactly like :mod:`.text`'s stats
projections. Patterns are deliberately RE2-compatible (character
classes, bounded quantifiers, ``\\b`` — no lookaround, no
backreferences) so the DuckDB oracle runs the *same* pattern strings,
making the parity check a real cross-engine regex-semantics test
rather than a tautology.

The synthetic corpus carries no emails/phones/IPs (the per-class
counts stay honest zeros, not forced hits); the denylist path is the
one the fixture exercises end-to-end — ``customer`` stands in for the
user-identifier terms a production denylist would hold.
``tests/test_scrub.py`` drives the regex classes against crafted PII
rows on BOTH engines, so email/phone/IP redaction is verified
non-vacuously even though the corpus is clean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pac_spark import catalog

__all__ = [
    "PII_PATTERNS",
    "DENYLIST_TERMS",
    "scrub_frame",
    "pii_scrub_docs",
    "SCRUB_SQL",
]

# (class, pattern, replacement). Replacements apply in this order, so
# the narrower IPv4 pattern must precede the phone pattern (an IP is a
# digits-and-dots run the phone class would otherwise swallow); counts
# are taken per-class on the ORIGINAL text, so overlapping classes
# (an IP also counts as a phone-shaped digit run) count independently —
# identical semantics on both engines.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-. ]{6,}[0-9]", "<PHONE>"),
)

# fixture stand-in for a production user-identifier denylist
DENYLIST_TERMS: tuple[str, ...] = ("customer",)


def _is_word_char(ch: str) -> bool:
    """ASCII word chars ONLY — the \\b of both execution engines
    (Java regex and RE2) is ASCII [A-Za-z0-9_], while Python's
    str.isalnum() is Unicode-aware. Anchoring on the Python notion
    made any term with a non-ASCII edge letter (e.g. 'josé')
    silently UNMATCHABLE in both engines — under-redaction, the
    unsafe direction (code-review r8; demonstrated live in DuckDB).
    Non-ASCII-edged terms now get no boundary and may substring-match
    — over-redaction, the same safe trade symbol-edged terms take."""
    return ("a" <= ch <= "z") or ("A" <= ch <= "Z") or ("0" <= ch <= "9") or ch == "_"


def _denylist_pattern(terms: tuple[str, ...]) -> str:
    if not terms:
        # \b()\b would match the empty string at every word boundary
        # and spray replacements through every document
        raise ValueError("denylist must contain at least one term")
    import re

    # terms are data, not patterns: escape metacharacters so 'j.doe'
    # doesn't match 'jxdoe' and 'c++fan' doesn't blow up the parser
    # (re.escape output is valid in both Java regex and RE2). The \b
    # anchors are PER-TERM and conditional on the term's edge chars:
    # \b between a non-word edge char and anything never matches, so
    # an unconditional \b would make 'c++' or '@handle' silently
    # unmatchable. The trade (property-tested in
    # tests/test_pattern_properties.py): word-edged terms match
    # whole-word-exactly; symbol-edged terms have no expressible
    # boundary in lookaround-free RE2, so they may substring-match —
    # over-redaction, the safe direction for PII.
    alts = []
    for t in terms:
        if not t:
            raise ValueError("denylist terms must be non-empty")
        head = r"\b" if _is_word_char(t[0]) else ""
        tail = r"\b" if _is_word_char(t[-1]) else ""
        alts.append(head + re.escape(t) + tail)
    return "(?:" + "|".join(alts) + ")"


def scrub_frame(
    docs: DataFrame, denylist: tuple[str, ...] = DENYLIST_TERMS
) -> DataFrame:
    """Project any frame carrying (doc_id, ..., text) to per-class
    redaction counts + the scrubbed text. Pure Column expressions —
    composable into a curation pipeline without a second scan."""
    text = F.col("text")
    deny_pat = _denylist_pattern(denylist)
    classes = [*PII_PATTERNS, ("denylist", deny_pat, "<REDACTED>")]
    counts = [
        F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in classes
    ]
    scrubbed = text
    for _, pat, repl in classes:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    total = None
    for name, _, _ in classes:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    keep = [c for c in docs.columns if c != "text"]
    return docs.select(*keep, *counts, scrubbed.alias("scrubbed_text")).select(
        *keep,
        *[f"n_{name}" for name, _, _ in classes],
        (total == F.lit(0)).alias("is_clean"),
        "scrubbed_text",
    )


def pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: scrub the ``documents`` corpus."""
    docs = catalog.load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return scrub_frame(docs).orderBy("doc_id")


def SCRUB_SQL(
    source: str = "documents", denylist: tuple[str, ...] = DENYLIST_TERMS
) -> str:
    """DuckDB oracle over ``source(doc_id, lang, text)`` running the
    SAME pattern strings (DuckDB does not backslash-process regular
    single-quoted literals, so patterns embed verbatim; a single quote
    inside a denylist term — 'o''brien' — is SQL-escaped, the one
    character that IS literal-significant)."""
    deny = _denylist_pattern(denylist)
    classes = [
        *[(n, p.replace("'", "''"), r) for n, p, r in PII_PATTERNS],
        ("denylist", deny.replace("'", "''"), "<REDACTED>"),
    ]
    count_cols = [
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in classes
    ]
    total = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))" for _, pat, _ in classes
    )
    scrub_expr = "text"
    for _, pat, repl in classes:
        scrub_expr = f"regexp_replace({scrub_expr}, '{pat}', '{repl}', 'g')"
    return f"""
SELECT doc_id, lang,
       {", ".join(count_cols)},
       ({total}) = 0 AS is_clean,
       {scrub_expr} AS scrubbed_text
FROM {source} ORDER BY doc_id
"""
