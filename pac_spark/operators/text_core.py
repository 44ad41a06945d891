"""Shared text primitives: tokenization and n-gram shingling.

All JVM-side expressions (split / transform / array ops) — the hot path
of every dedup and text-analysis operator, so nothing here drops into
Python. Shingling uses ``transform(sequence(...))`` over the token
array: O(tokens) per row, no explode until an operator actually needs
inverted-index shape.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "shingles_of_tokens",
    "distinct_shingled",
    "TOKENS_SQL",
    "SHINGLES_SQL",
]


def tokens(text: Column) -> Column:
    """Whitespace tokens (the testdata corpus is single-space joined)."""
    return F.split(text, " ")


def shingles_of_tokens(toks_col: str, n: int = 3) -> Column:
    """Overlapping n-word shingles over an already-materialized token
    array column; empty array when the document has fewer than n
    tokens — INCLUDING a NULL token array (NULL text): without the
    explicit isNull arm, ``size(NULL) < n`` is NULL, the when() falls
    through, and the transform yields a NULL array — a row the SQL
    mirror never materializes, so size()/is-empty consumers would
    diverge from the oracle on NULL-text docs.

    ``toks_col`` MUST be a bound column (``.select(tokens(...).alias(
    "toks"))`` first): inlining ``split(text, ' ')`` here would
    re-tokenize the document on every subscript access inside the
    lambda — O(tokens²) per row instead of O(tokens)."""
    parts = ", ".join(f"{toks_col}[i + {k}]" for k in range(n))
    return F.when(
        F.col(toks_col).isNull() | (F.size(F.col(toks_col)) < n),
        F.array().cast("array<string>"),
    ).otherwise(
        F.expr(
            f"transform(sequence(0, size({toks_col}) - {n}), i -> concat_ws(' ', {parts}))"
        )
    )


def distinct_shingled(df, text_col: str = "text", out_col: str = "sh", n: int = 3):
    """Project ``df`` to its non-text columns + the distinct-shingle
    set of ``text_col`` — the two-phase (tokenize, then shingle) form
    every caller should use."""
    keep = [c for c in df.columns if c != text_col]
    toked = df.select(*keep, tokens(F.col(text_col)).alias("__toks"))
    return toked.select(
        *keep, F.array_distinct(shingles_of_tokens("__toks", n)).alias(out_col)
    )


# DuckDB mirrors (over a relation named ``docs(doc_id, text)``)
TOKENS_SQL = "string_split(text, ' ')"


def SHINGLES_SQL(n: int = 3, distinct: bool = True) -> str:
    """CTE fragment producing (doc_id, shingle) rows — distinct sets
    by default (the Jaccard/minhash tiers), or one row per POSITION
    with ``distinct=False`` (the span-coverage tier, where repeats of
    a gram inside one document each count as a covered position)."""
    joins = []
    concat = ["t0.tok"]
    for k in range(1, n):
        joins.append(
            f"JOIN toks t{k} ON t{k}.doc_id = t0.doc_id AND t{k}.pos = t0.pos + {k}"
        )
        concat.append(f"t{k}.tok")
    return f"""
toks AS (
    SELECT doc_id, unnest({TOKENS_SQL}) AS tok,
           generate_subscripts({TOKENS_SQL}, 1) AS pos
    FROM docs
),
shingle_rows AS (
    SELECT {"DISTINCT " if distinct else ""}t0.doc_id, {" || ' ' || ".join(concat)} AS shingle
    FROM toks t0 {" ".join(joins)}
)
"""
