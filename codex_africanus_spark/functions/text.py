"""Text-analysis primitives for large-scale training-data pipelines.

All primitives are engine-portable: built on md5 (identical hex in Spark
and DuckDB), integer arithmetic, and length/replace counting — so every
operator built from them is exactly oracle-checkable. No Python UDFs:
everything stays JVM-side for 100 TB scans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^31 - 1 (Mersenne prime) — modulus for portable integer hashing
HASH_P = 2147483647


def hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5.
    Engine-portable (DuckDB: CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def hash31(col: Column) -> Column:
    """Hash reduced mod 2^31-1 — safe operand for k-permutation minhash
    (a·h+b stays < 2^63)."""
    return hash60(col) % HASH_P


def hash31_sql(expr: str) -> str:
    return f"({hash60_sql(expr)} % {HASH_P})"


def tokens(col: Column) -> Column:
    """Whitespace tokenization (documents are single-space separated)."""
    return F.split(col, " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def occurrences(col: Column, needle: str) -> Column:
    """Exact substring occurrence count via length/replace arithmetic
    (portable; avoids regex engine differences)."""
    n = len(needle)
    return ((F.length(col) - F.length(F.replace(col, F.lit(needle)))) / n).cast("long")


def occurrences_sql(expr: str, needle: str) -> str:
    esc = needle.replace("'", "''")
    return f"((len({expr}) - len(replace({expr}, '{esc}', ''))) // {len(needle)})"


# Stopword marker sets for the n-gram language-ID heuristic. Applied to
# ' ' || text || ' ' so word boundaries are uniform.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "fr": [" le ", " la ", " et "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " los ", " y "],
}


def word_3gram_shingles(text_col: str = "text") -> Column:
    """Word 3-gram shingle array (MinHash input). Callers must filter to
    documents with ≥ 3 tokens (the SQL mirror yields an empty list below
    that, Spark an empty array — consistent, but empty docs add no rows)."""
    return F.expr(
        f"transform(sequence(1, size(split({text_col}, ' ')) - 2), "
        f"j -> concat_ws(' ', slice(split({text_col}, ' '), j, 3)))"
    )


# DuckDB mirror, over `w = string_split(text, ' ')`
WORD_3GRAM_SQL = (
    "[concat_ws(' ', w[j], w[j+1], w[j+2]) for j in generate_series(1, len(w)-2)]"
)
