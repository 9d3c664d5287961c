"""Embedding-space diagnostics: per-dimension covariance structure.

Before building a PQ codebook or an IVF index over an embedding
column, a pipeline audits the dimensions themselves: strongly
covarying dimension PAIRS mean redundant axes (PQ subspaces should not
split them; PCA/OPQ rotation would help), and the audit is also the
cheapest detector of a degenerate encoder (whole blocks of correlated
dims).  This operator reports the top-k |covariance| dimension pairs.

Parity discipline: per-row products round to 1e-9 and sum as
DECIMAL(30,9) (the repo's exact-sum pattern), so every cov value is
independent of Spark-vs-DuckDB summation order; the final covariance
is one double expression over exact decimal sums, rounded at 6dp, and
the rank orders by the ROUNDED |cov| with (i, j) as the unique
tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window


def embedding_dim_covariance(embeddings: DataFrame,
                             k: int = 25) -> DataFrame:
    """Top-``k`` dimension pairs (i < j, 0-based) by |cov(i, j)| where
    cov = E[v_i·v_j] − E[v_i]·E[v_j] over all vectors.

    Scale shape: one posexplode (n·d rows), a self-equi-join on vec_id
    (co-partitioned — one shuffle each side, never a cartesian)
    producing the n·d(d−1)/2 upper-triangle products, then two
    map-side-combined groupBys (d² and d rows).  The d²-row result is
    model-sized: the join-back of per-dim means broadcasts, and the
    top-k is TakeOrdered over d² rows.  At very large d the
    upper-triangle blowup (d²/2 per vector) would move to a blocked
    gemm (operators/similarity's pattern) — at embedding dims ≤ ~1k
    the declarative join IS the right plan (d=64 here: 2016 products
    per vector)."""
    e = embeddings.select(
        "vec_id", F.posexplode(col("embedding")).alias("i", "v"))
    e = e.select("vec_id", "i", col("v").cast("double").alias("v"))

    prods = (e.alias("a").join(e.alias("b"), "vec_id")
             .where(col("a.i") < col("b.i"))
             .select(col("a.i").alias("i"), col("b.i").alias("j"),
                     F.round(col("a.v") * col("b.v"), 9)
                     .cast("decimal(30,9)").alias("p")))
    g = (prods.groupBy("i", "j")
         .agg(F.sum("p").alias("sp"), F.count("*").alias("n")))

    m = (e.groupBy("i")
         .agg(F.sum(F.round(col("v"), 9).cast("decimal(30,9)"))
              .alias("sv"),
              F.count("*").alias("nm")))
    mi = m.select(col("i"), col("sv").alias("svi"),
                  col("nm").alias("ni"))
    mj = m.select(col("i").alias("j"), col("sv").alias("svj"),
                  col("nm").alias("nj"))

    cov = (g.join(F.broadcast(mi), "i").join(F.broadcast(mj), "j")
           .select(
               "i", "j",
               F.round(
                   col("sp").cast("double") / col("n")
                   - (col("svi").cast("double") / col("ni"))
                   * (col("svj").cast("double") / col("nj")),
                   6).alias("cov")))
    top = cov.orderBy(F.abs(col("cov")).desc(), "i", "j").limit(k)
    rk = Window.orderBy(F.abs(col("cov")).desc(), "i", "j")
    return (top.withColumn("rank", F.row_number().over(rk))
            .select("rank", "i", "j", "cov"))


def dim_covariance_oracle_sql(k: int = 25) -> str:
    """DuckDB twin of embedding_dim_covariance: generate_subscripts/
    unnest pair off positions exactly like posexplode (0-based after
    the −1), same 1e-9-rounded DECIMAL(30,9) sums, same final double
    expression and (|cov| desc, i, j) rank."""
    return f"""
    WITH e AS (SELECT vec_id,
                      generate_subscripts(embedding, 1) - 1 AS i,
                      CAST(unnest(embedding) AS DOUBLE) AS v
               FROM embeddings),
    m AS (SELECT i, sum(CAST(round(v, 9) AS DECIMAL(30,9))) AS sv,
                 CAST(count(*) AS BIGINT) AS nm
          FROM e GROUP BY i),
    g AS (SELECT a.i AS i, b.i AS j,
                 sum(CAST(round(a.v * b.v, 9) AS DECIMAL(30,9)))
                     AS sp,
                 CAST(count(*) AS BIGINT) AS n
          FROM e a JOIN e b
            ON a.vec_id = b.vec_id AND a.i < b.i
          GROUP BY a.i, b.i),
    c AS (SELECT g.i, g.j,
                 round(CAST(g.sp AS DOUBLE) / g.n
                       - (CAST(mi.sv AS DOUBLE) / mi.nm)
                       * (CAST(mj.sv AS DOUBLE) / mj.nm),
                       6) AS cov
          FROM g JOIN m mi ON g.i = mi.i
                 JOIN m mj ON g.j = mj.i)
    SELECT rank, i, j, cov FROM (
        SELECT *, CAST(row_number() OVER (
            ORDER BY abs(cov) DESC, i, j) AS INT) AS rank
        FROM c)
    WHERE rank <= {k}
    """


# --------------------------------------------- label-outlier audit

_MU = 1_000_000  # element quantization: integer micros


def label_outlier_vectors(embeddings: DataFrame,
                          k: int = 25) -> DataFrame:
    """Bottom-``k`` vectors by cosine to their OWN label centroid —
    the embedding-space mislabel/outlier audit (the geometric
    complement of the text-side source_outlier_score): a vector far
    from its class centroid is either mislabeled or a genuine
    outlier worth a curation look.

    EXACT cross-engine parity via the label_centroid_drift recipe:
    elements quantize to integer micros, the centroid is represented
    by its un-normalized integer SUM vector (cosine is scale
    invariant, so dividing by n_vecs is unnecessary — and skipping
    it keeps every cross-row/cross-dim product integer), and the
    cosine is one double expression over exact integer sums, rounded
    at 6dp with vec_id as the unique tie-break.

    Scale shape: posexplode is a narrow map (d rows/vector);
    per-(label, pos) sums partial-aggregate to |labels|·d model rows
    and broadcast back onto the element stream; the per-vector dot
    collapses map-side on vec_id (d rows → 1).  Bottom-k is
    TakeOrdered (orderBy + limit); the rank window sees only k rows.
    One shuffle over n·d quantized elements — linear at 100 TB."""
    el = (embeddings
          .select("vec_id", "label",
                  F.posexplode(col("embedding")).alias("pos", "e"))
          .select("vec_id", "label", "pos",
                  F.round(col("e").cast("double") * _MU)
                  .cast("bigint").alias("q")))
    lab = (el.groupBy("label", "pos")
           .agg(F.sum("q").cast("decimal(18,0)").alias("s")))
    nc = (lab.groupBy("label")
          .agg(F.sum(col("s") * col("s"))
               .cast("decimal(38,0)").alias("nc")))
    per_vec = (el.join(F.broadcast(lab), ["label", "pos"])
               .groupBy("vec_id", "label")
               .agg(F.sum(col("q") * col("s"))
                    .cast("decimal(38,0)").alias("dot"),
                    F.sum(col("q") * col("q"))
                    .cast("decimal(38,0)").alias("nv")))
    cos = F.round(
        col("dot").cast("double")
        / (F.sqrt(col("nv").cast("double"))
           * F.sqrt(col("nc").cast("double"))), 6)
    scored = (per_vec.join(F.broadcast(nc), "label")
              .where((col("nv") > 0) & (col("nc") > 0))
              .select("vec_id", "label", cos.alias("cos_centroid")))
    bottom = scored.orderBy("cos_centroid", "vec_id").limit(k)
    rk = Window.orderBy("cos_centroid", "vec_id")
    return (bottom.withColumn("rank", F.row_number().over(rk))
            .select("rank", "vec_id", "label", "cos_centroid"))


def label_outlier_oracle_sql(k: int = 25) -> str:
    """DuckDB twin of label_outlier_vectors: same integer-micro
    quantization, same un-normalized centroid-sum formulation, same
    single double cosine expression and (cos asc, vec_id) rank."""
    return f"""
    WITH el AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS pos,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * {_MU})
                    AS BIGINT) AS q
        FROM embeddings),
    lab AS (SELECT label, pos, CAST(sum(q) AS DECIMAL(18,0)) AS s
            FROM el GROUP BY label, pos),
    nc AS (SELECT label, CAST(sum(s * s) AS DECIMAL(38,0)) AS nc
           FROM lab GROUP BY label),
    pv AS (SELECT el.vec_id, el.label,
                  CAST(sum(el.q * lab.s) AS DECIMAL(38,0)) AS dot,
                  CAST(sum(el.q * el.q) AS DECIMAL(38,0)) AS nv
           FROM el JOIN lab
             ON el.label = lab.label AND el.pos = lab.pos
           GROUP BY el.vec_id, el.label),
    scored AS (
        SELECT pv.vec_id, pv.label,
               round(CAST(pv.dot AS DOUBLE)
                     / (sqrt(CAST(pv.nv AS DOUBLE))
                        * sqrt(CAST(nc.nc AS DOUBLE))), 6)
                   AS cos_centroid
        FROM pv JOIN nc ON pv.label = nc.label
        WHERE pv.nv > 0 AND nc.nc > 0)
    SELECT rank, vec_id, label, cos_centroid FROM (
        SELECT *, CAST(row_number() OVER (
            ORDER BY cos_centroid, vec_id) AS INT) AS rank
        FROM scored)
    WHERE rank <= {k}
    """


# --------------------------------------------- PQ subspace audit

def pq_subspace_variance(embeddings: DataFrame, m: int = 8
                         ) -> DataFrame:
    """Per-PQ-subspace total variance: split the d dims into ``m``
    contiguous blocks (the product-quantization layout ann_pq_topk
    trains on) and report Σ_dims var(dim) per block — the codebook
    design audit: a subspace carrying 10× the variance of another
    needs its centroids more than the dead one does (the classic
    argument for an OPQ rotation before training).  Pairs with
    embedding_dim_covariance: that flags redundant AXES, this prices
    the SUBSPACES the splitter actually produces.

    Exact parity: elements quantize to integer micros (the
    label_centroid_drift recipe); per-dim Σq and Σq² are exact
    integer sums; the variance is one double expression over them,
    summed across a block's dims as 1e-9-rounded DECIMAL(30,9) so
    the per-subspace total is summation-order independent.

    Scale shape: posexplode → one map-side-combined groupBy(dim) to
    d model rows; everything after is driver-trivial."""
    el = (embeddings
          .select(F.posexplode(col("embedding")).alias("pos", "e"))
          .select("pos",
                  F.round(col("e").cast("double") * _MU)
                  .cast("bigint").alias("q")))
    d = (el.groupBy("pos")
         .agg(F.count("*").alias("n"),
              F.sum("q").cast("decimal(38,0)").alias("sq"),
              F.sum(col("q") * col("q")).cast("decimal(38,0)")
              .alias("sqq")))
    # var in ORIGINAL units: integer-micro moments divided back by
    # _MU² — one double expression, rounded 1e-9 before the
    # cross-dim decimal sum.
    var = F.round(
        (col("sqq").cast("double") / col("n")
         - F.pow(col("sq").cast("double") / col("n"), 2))
        / (float(_MU) * float(_MU)), 9).cast("decimal(30,9)")
    dims = embeddings.select(F.size("embedding").alias("d")).limit(1)
    return (d.crossJoin(F.broadcast(dims))
            .groupBy((col("pos") / (col("d") / m)).cast("int")
                     .alias("subspace"))
            .agg(F.count("*").alias("n_dims"),
                 F.round(F.sum(var).cast("double"), 6)
                 .alias("var_total"))
            .orderBy("subspace"))


def pq_subspace_oracle_sql(m: int = 8) -> str:
    """DuckDB twin of pq_subspace_variance: same integer-micro
    moments, same block assignment pos // (d/m), same 1e-9-rounded
    decimal cross-dim sum."""
    return f"""
    WITH el AS (
        SELECT generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(round(CAST(unnest(embedding) AS DOUBLE)
                          * {_MU}) AS BIGINT) AS q
        FROM embeddings),
    d AS (SELECT pos, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(q) AS DECIMAL(38,0)) AS sq,
                 CAST(sum(q * q) AS DECIMAL(38,0)) AS sqq
          FROM el GROUP BY pos),
    dim AS (SELECT len(embedding) AS dd FROM embeddings LIMIT 1),
    v AS (SELECT CAST(floor(pos / (dd / {m})) AS INT) AS subspace,
                 CAST(round((CAST(sqq AS DOUBLE) / n
                             - pow(CAST(sq AS DOUBLE) / n, 2))
                            / ({_MU}.0 * {_MU}.0), 9)
                      AS DECIMAL(30,9)) AS var
          FROM d CROSS JOIN dim)
    SELECT subspace, CAST(count(*) AS BIGINT) AS n_dims,
           round(CAST(sum(var) AS DOUBLE), 6) AS var_total
    FROM v GROUP BY subspace ORDER BY subspace
    """


def embedding_norm_percentiles_by_label(
        embeddings: DataFrame) -> DataFrame:
    """Norm-distribution health per label: n_vecs + interpolated
    p50/p90 of the L2 norm — the first audit before cosine-based
    dedup or ANN over a labeled corpus (a label whose norm
    distribution collapses toward 0 came from a degenerate encoder
    run; a fat p90/p50 ratio says normalize before IVF seeding).

    Parity discipline: each norm rounds to 4dp FIRST (einsum vs
    list_sum summation order differs in final ulps; the registered
    embedding_norms query pins 4dp as the stable grid), then both
    engines run the same linear-interpolation percentile (Spark
    `percentile` == DuckDB quantile_cont, the
    order_value_percentiles-pinned equivalence) over identical
    inputs, rounded 4dp.  Scale shape: one Arrow pass for the norms,
    map-side-combined groupBy to labels-sized output."""
    from data_ingestion_challenge_spark.functions import vectors as V
    norms = embeddings.select(
        "label", F.round(V.norm2_batch(col("embedding")), 4)
        .alias("_n"))
    return (norms.groupBy("label")
            .agg(F.count("*").alias("n_vecs"),
                 F.round(F.percentile("_n", F.lit(0.5)), 4)
                 .alias("p50_norm"),
                 F.round(F.percentile("_n", F.lit(0.9)), 4)
                 .alias("p90_norm")))


EMBEDDING_NORM_PERCENTILES_ORACLE = """
    WITH n AS (
        SELECT label,
               round(sqrt(list_sum(list_transform(
                   embedding::DOUBLE[], x -> x*x))), 4) AS _n
        FROM embeddings)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(quantile_cont(_n, 0.5), 4) AS p50_norm,
           round(quantile_cont(_n, 0.9), 4) AS p90_norm
    FROM n GROUP BY label
"""


def embedding_clip_bounds(embeddings: DataFrame) -> DataFrame:
    """Per-dimension calibration table for CLIPPED int8 quantization:
    exact p1/p99 (the clip bounds that beat min/max scaling when a
    dimension has outliers) next to the raw min/max and the implied
    outlier clip rate — read before embedding_quantize_int8 decides
    its scale.  Strongly-tailed dims (wide max vs p99) are where
    min/max int8 wastes its range.

    Exact interpolated percentiles (Spark `percentile` ==
    quantile_cont on identical doubles), rounded 6dp.  Scale shape:
    posexplode to (dim, value) — dims × vectors rows — then ONE
    map-side-combinable groupBy per dim; at 100 TB the approx path
    swaps in approx_percentile with the same schema."""
    e = embeddings.select(
        F.posexplode("embedding").alias("i", "v"))
    e = e.select("i", col("v").cast("double").alias("v"))
    return (e.groupBy("i")
            .agg(F.round(F.min("v"), 6).alias("v_min"),
                 F.round(F.percentile("v", F.lit(0.01)), 6)
                 .alias("p01"),
                 F.round(F.percentile("v", F.lit(0.99)), 6)
                 .alias("p99"),
                 F.round(F.max("v"), 6).alias("v_max")))


EMBEDDING_CLIP_BOUNDS_ORACLE = """
    WITH e AS (SELECT generate_subscripts(embedding, 1) - 1 AS i,
                      CAST(unnest(embedding) AS DOUBLE) AS v
               FROM embeddings)
    SELECT i,
           round(min(v), 6) AS v_min,
           round(quantile_cont(v, 0.01), 6) AS p01,
           round(quantile_cont(v, 0.99), 6) AS p99,
           round(max(v), 6) AS v_max
    FROM e GROUP BY i
"""


def label_centroid_confusion(embeddings: DataFrame) -> DataFrame:
    """Label confusability map: cosine similarity between every pair
    of LABEL CENTROIDS (a < b) — two labels whose centroids sit close
    are the ones a classifier (or knn_label_vote) will confuse, and
    the pair list is what a curation pass reads before merging or
    re-annotating classes (label_centroid_drift watches one label
    move; this is the cross-label geometry at a point in time).

    Parity discipline (the dim_covariance pattern end to end):
    per-(label, dim) element sums round to 1e-9 and accumulate as
    DECIMAL(30,9) — exact and order-free on both engines — the mean
    is one double divide rounded 1e-9; the dot / norm accumulations
    over the MEANS round each product to 1e-9 into DECIMAL(30,9)
    again, so the final cosine is one double expression over exact
    decimals, rounded 6dp.  Scale shape: one posexplode (n·d rows),
    ONE map-side-combined groupBy to the |labels|·d centroid frame —
    everything after is model-sized (broadcast self-join over
    |labels|·d rows, |labels|² output)."""
    e = embeddings.select(
        "label", F.posexplode("embedding").alias("i", "v"))
    cent = (e.groupBy("label", "i")
            .agg(F.sum(F.round(col("v").cast("double"), 9)
                       .cast("decimal(30,9)")).alias("sv"),
                 F.count("*").alias("n"))
            .select("label", "i",
                    F.round(col("sv").cast("double") / col("n"), 9)
                    .alias("m")))
    cent = F.broadcast(cent)
    nsq = (cent.groupBy("label")
           .agg(F.sum(F.round(col("m") * col("m"), 9)
                      .cast("decimal(30,9)")).alias("nsq")))
    a, b = [cent.select(col("label").alias(f"label_{x}"), "i",
                        col("m").alias(f"m_{x}")) for x in "ab"]
    dots = (a.join(b, "i")
            .where(col("label_a") < col("label_b"))
            .groupBy("label_a", "label_b")
            .agg(F.sum(F.round(col("m_a") * col("m_b"), 9)
                       .cast("decimal(30,9)")).alias("dot")))
    na = nsq.select(col("label").alias("label_a"),
                    col("nsq").alias("_na"))
    nb = nsq.select(col("label").alias("label_b"),
                    col("nsq").alias("_nb"))
    cos = (col("dot").cast("double")
           / (F.sqrt(col("_na").cast("double"))
              * F.sqrt(col("_nb").cast("double"))))
    return (dots.join(F.broadcast(na), "label_a")
            .join(F.broadcast(nb), "label_b")
            .select("label_a", "label_b",
                    F.round(cos, 6).alias("centroid_cos")))


LABEL_CENTROID_CONFUSION_ORACLE = """
    WITH e AS (SELECT label,
                      generate_subscripts(embedding, 1) - 1 AS i,
                      CAST(unnest(embedding) AS DOUBLE) AS v
               FROM embeddings),
    cent AS (SELECT label, i,
                    round(CAST(sum(CAST(round(v, 9) AS DECIMAL(30,9)))
                               AS DOUBLE) / count(*), 9) AS m
             FROM e GROUP BY label, i),
    nsq AS (SELECT label,
                   sum(CAST(round(m * m, 9) AS DECIMAL(30,9))) AS nsq
            FROM cent GROUP BY label),
    dots AS (SELECT a.label AS label_a, b.label AS label_b,
                    sum(CAST(round(a.m * b.m, 9) AS DECIMAL(30,9)))
                        AS dot
             FROM cent a JOIN cent b
               ON a.i = b.i AND a.label < b.label
             GROUP BY a.label, b.label)
    SELECT label_a, label_b,
           round(CAST(dot AS DOUBLE)
                 / (sqrt(CAST(na.nsq AS DOUBLE))
                    * sqrt(CAST(nb.nsq AS DOUBLE))), 6)
               AS centroid_cos
    FROM dots
    JOIN nsq na ON dots.label_a = na.label
    JOIN nsq nb ON dots.label_b = nb.label
"""


def embedding_sparsity_by_label(embeddings: DataFrame,
                                eps: float = 0.01) -> DataFrame:
    """Near-zero coordinate fraction per label — the encoder-health
    twin of the norm percentiles: a label whose vectors suddenly
    carry many ~0 coordinates points at a truncation/quantization
    bug or dead dimensions in the upstream encoder.

    Exact integers end to end: per vector the near-zero COUNT and
    the dimension count (both ints), per label their BIGINT sums;
    the fraction is ONE 6dp divide.  The float-vs-threshold compare
    promotes the stored float32 to double identically in both
    engines.  Scale shape: one linear scan (the lambda walks each
    vector once), map-side-combined groupBy to |labels| rows."""
    nz = F.size(F.filter("embedding", lambda x: F.abs(x) < eps))
    return (embeddings
            .groupBy("label")
            .agg(F.count("*").alias("n_vecs"),
                 F.sum(F.size("embedding")).alias("n_coords"),
                 F.sum(nz).alias("n_near_zero"))
            .withColumn("near_zero_frac",
                        F.round(col("n_near_zero")
                                / col("n_coords"), 6)))


def embedding_sparsity_oracle_sql(eps: float = 0.01) -> str:
    """DuckDB twin: list_filter + len mirror the Spark lambda."""
    return f"""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(len(embedding)) AS BIGINT) AS n_coords,
           CAST(sum(len(list_filter(embedding,
                                    x -> abs(x) < {eps})))
                AS BIGINT) AS n_near_zero,
           round(CAST(sum(len(list_filter(embedding,
                                          x -> abs(x) < {eps})))
                      AS DOUBLE)
                 / sum(len(embedding)), 6) AS near_zero_frac
    FROM embeddings GROUP BY label
    """
