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
            best = scores.argmax(axis=1)
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
