"""Text analysis operators (SURVEY.md §2C): language ID heuristic.

Most text stats are pure Catalyst expressions registered directly in
plans/llm.py; language ID is the one genuinely-custom op — a character
n-gram cosine classifier against fixed language profiles, run as an
Arrow-batched mapInPandas (numpy inside, one pass over the corpus).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# Tiny fixed char-bigram profiles per language.  Real deployments learn
# these from labeled corpora; fixed profiles keep the op deterministic.
_PROFILES = {
    "en": ["th", "he", "in", "er", "an"],
    "de": ["en", "er", "ch", "de", "ei"],
    "fr": ["es", "le", "de", "re", "en"],
    "es": ["de", "en", "el", "la", "os"],
    "zh": ["zh", "sh", "ng", "ia", "ua"],
}
_LANGS = sorted(_PROFILES)
_BIGRAMS = sorted({b for v in _PROFILES.values() for b in v})
_BG_IDX = {b: i for i, b in enumerate(_BIGRAMS)}

_PROFILE_MAT = np.zeros((len(_LANGS), len(_BIGRAMS)))
for _li, _lang in enumerate(_LANGS):
    for _rank, _bg in enumerate(_PROFILES[_lang]):
        _PROFILE_MAT[_li, _BG_IDX[_bg]] = len(_PROFILES[_lang]) - _rank
_PROFILE_MAT /= np.linalg.norm(_PROFILE_MAT, axis=1, keepdims=True)

LANG_ID_SCHEMA = "doc_id bigint, predicted_lang string, confidence double"


def lang_id_oracle_sql() -> str:
    """DuckDB twin of lang_id: the profile matrix is a fixed constant,
    so it embeds as literals; the doc vector is the count of each
    profiled bigram over all positions (overlap-correct via unnest),
    L2-normalized; argmax ties resolve to the alphabetically first
    language (numpy argmax = first index over sorted _LANGS)."""
    rows = []
    for li, lang in enumerate(_LANGS):
        for bi, bg in enumerate(_BIGRAMS):
            w = _PROFILE_MAT[li, bi]
            if w != 0.0:
                rows.append(f"('{lang}', '{bg}', {w!r})")
    vals = ", ".join(rows)
    bgl = ", ".join(f"'{b}'" for b in _BIGRAMS)
    langs = ", ".join(f"('{l}')" for l in _LANGS)
    return f"""
    WITH prof(lang, bg, w) AS (VALUES {vals}),
    langs(lang) AS (VALUES {langs}),
    pos AS (SELECT doc_id,
                   unnest(list_transform(range(1, len(text)),
                          i -> substr(text, i, 2))) AS bg
            FROM documents),
    cnt AS (SELECT doc_id, bg, count(*)::DOUBLE AS c
            FROM pos WHERE bg IN ({bgl}) GROUP BY doc_id, bg),
    nrm AS (SELECT doc_id, sqrt(sum(c * c)) AS n FROM cnt
            GROUP BY doc_id),
    score AS (
        SELECT d.doc_id, l.lang,
               coalesce(sum((c.c / nrm.n) * p.w), 0.0) AS s
        FROM documents d
        CROSS JOIN langs l
        LEFT JOIN cnt c ON c.doc_id = d.doc_id
        LEFT JOIN nrm ON nrm.doc_id = d.doc_id
        LEFT JOIN prof p ON p.lang = l.lang AND p.bg = c.bg
        GROUP BY d.doc_id, l.lang
    )
    SELECT doc_id, lang AS predicted_lang, round(s, 4) AS confidence
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY round(s, 6) DESC, lang) AS rn FROM score)
    WHERE rn = 1
    """


def _doc_vector(text: str) -> np.ndarray:
    v = np.zeros(len(_BIGRAMS))
    for i in range(len(text) - 1):
        j = _BG_IDX.get(text[i:i + 2])
        if j is not None:
            v[j] += 1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def lang_id(documents: DataFrame) -> DataFrame:
    """Char-bigram cosine language classifier (deterministic)."""

    def _classify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.stack([_doc_vector(t) for t in pdf["text"]])
            scores = vecs @ _PROFILE_MAT.T          # (docs, langs)
            # Tie-break on a 1e-6 grid: scores that are mathematically
            # equal pick up engine-specific summation-order ulps; the
            # rounded argmax resolves those ties alphabetically in
            # BOTH engines (oracle ranks by round(s, 6) DESC, lang).
            best = np.round(scores, 6).argmax(axis=1)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "predicted_lang": [_LANGS[i] for i in best],
                "confidence": scores[np.arange(len(best)), best],
            })

    return documents.select("doc_id", "text").mapInPandas(
        _classify, LANG_ID_SCHEMA)


def split_sentences_udtf(spark, documents: DataFrame) -> DataFrame:
    """Python UDTF (Spark 4 API): one input row → N sentence rows.

    Coverage demo for the lateral table-function surface; note this is
    row-at-a-time Python — for a production explode use the relational
    split+posexplode (JVM codegen, ~10× faster).  The semantics here
    are deliberately simple (split on '. ', drop empties) so the DuckDB
    oracle reproduces them exactly."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, sent_idx int, sentence string")
    class _SplitSentences:
        def eval(self, doc_id: int, text: str):
            idx = 0
            for s in (text or "").split(". "):
                if s:
                    yield doc_id, idx, s
                idx += 1

    spark.udtf.register("split_sentences_udtf", _SplitSentences)
    documents.createOrReplaceTempView("_docs_for_udtf")
    return spark.sql(
        "SELECT s.doc_id, s.sent_idx, s.sentence "
        "FROM _docs_for_udtf d, LATERAL split_sentences_udtf(d.doc_id, d.text) s")
