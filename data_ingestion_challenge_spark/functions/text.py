"""Text expressions: tokenization, shingling, quality signals.

All pure Catalyst expressions (split/transform/slice/filter) so they run
inside whole-stage codegen — no Python in the hot path.  Each helper has
an exact DuckDB-SQL counterpart used by the correctness oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny stopword list present in the synthetic corpus vocabulary; at
# production scale this would be a broadcast set per language.
STOPWORDS = ("the", "a", "of", "and", "in", "to")


def words(text: Column) -> Column:
    """Whitespace tokens (corpus is single-space separated)."""
    return F.split(text, " ")


def alpha_tokens(text: Column) -> Column:
    """Letter-run tokens via vectorized regexp — robust tokenizer."""
    return F.regexp_extract_all(text, F.lit("[a-z]+"), 0)


def shingles(wcol: Column, n: int = 3) -> Column:
    """Distinct word n-grams as space-joined strings.

    ``sequence(1, size-n+1)`` counts ascending only when the doc has ≥ n
    words; guard short docs to an empty array (Spark's sequence counts
    DOWN when start > stop, which would corrupt the shingle set).
    """
    gen = F.transform(
        F.sequence(F.lit(1), F.size(wcol) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(wcol, i, n)),
    )
    return F.when(F.size(wcol) >= n, F.array_distinct(gen)) \
            .otherwise(F.array().cast("array<string>"))


def stopword_count(wcol: Column) -> Column:
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return F.size(F.filter(wcol, lambda t: t.isin(*STOPWORDS)))


def bag_of_words_fingerprint(text: Column) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set.  Catches shuffled/reordered near-duplicates exactly."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words(text)))))
