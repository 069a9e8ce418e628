"""IVF_FLAT vector index, Spark-first (SURVEY.md §2.8 V3/V4).

The reference builds a Milvus IVF_FLAT index (nlist=128 k-means cells,
/root/reference/src/coldata/vdb/vdb.py:196-212, config.yml:79-82) and probes
nprobe cells per search (vdb.py:88-100).  Spark-native re-expression:

  build:  MLlib KMeans fit on (a sample of) the vectors -> assign every
          vector its centroid_id -> write the vector table AS PARQUET
          PARTITIONED BY centroid_id.  Milvus's in-memory cell skip becomes
          parquet partition pruning — the scan literally never reads the
          cells a query doesn't probe.  Rebuild (renew, vdb.py:199-201) is
          mode("overwrite").

  search: score queries against the (tiny, collected) centroid table ->
          pick nprobe cells per query -> scan ONLY those partitions
          (pushed-down centroid_id IN (...) filter) -> exact distance
          within cells -> per-query top-k window.

At 100 TB: the KMeans fit runs on a bounded sample (not the full corpus);
the assign pass is one shuffle-free map; search IO drops by ~nprobe/nlist.
nprobe == nlist degenerates to the exact path, matching the reference's own
operating point (config.yml:81-82) — recall 1.0 by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coldata_spark.functions import vector as V
from coldata_spark.operators.similarity import knn_join


def build_ivf(
    vectors: DataFrame,
    nlist: int = 16,
    vec_col: str = "embedding",
    sample_fraction: float = 1.0,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Fit KMeans(nlist) and return (assigned_vectors, centroids).

    assigned_vectors = input + centroid_id int column;
    centroids = (centroid_id, cvec array<double>).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    ml_df = vectors.withColumn(
        "_features", array_to_vector(V.as_double(F.col(vec_col)))
    )
    fit_df = ml_df.sample(sample_fraction, seed=seed) if sample_fraction < 1.0 else ml_df
    model = KMeans(
        k=nlist, seed=seed, featuresCol="_features", predictionCol="centroid_id"
    ).fit(fit_df)
    assigned = model.transform(ml_df).drop("_features")
    centroids = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    spark = vectors.sparkSession
    cdf = spark.createDataFrame(centroids, ["centroid_id", "cvec"])
    return assigned, cdf


def write_ivf(assigned: DataFrame, path: str) -> None:
    """Persist the index: parquet partitioned by centroid_id (S9's Milvus
    insert+flush; renew = overwrite)."""
    (
        assigned.repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )


def assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    metric: str = "COSINE",
) -> DataFrame:
    """Assign each vector to its nearest FIXED centroid — pure DataFrame
    op (broadcast centroid table + per-vector arg-best), no MLlib refit."""
    from pyspark.sql import Window as W

    desc = V.METRIC_DESCENDING[metric.upper()]
    cents = centroids.select(
        F.col("centroid_id").alias("_cid"), F.col("cvec").alias("_cvec")
    )
    score = V.score_expr(metric, V.as_double(F.col(vec_col)), F.col("_cvec"))
    w = W.partitionBy(F.col("_row")).orderBy(
        score.desc() if desc else score.asc(), F.col("_cid")
    )
    withrow = vectors.withColumn("_row", F.monotonically_increasing_id())
    return (
        withrow.join(F.broadcast(cents))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .withColumnRenamed("_cid", "centroid_id")
        .drop("_cvec", "_rn", "_row")
    )


def append_to_index(
    new_vectors: DataFrame,
    centroids: DataFrame,
    path: str,
    vec_col: str = "embedding",
    metric: str = "COSINE",
) -> None:
    """Incremental index growth: assign new vectors to the EXISTING
    centroids and append into their partitions.  The reference can only
    drop-and-rebuild (renew, vdb.py:199-201); partition-append makes
    ingest incremental — cells drift only if the data distribution does,
    at which point build_ivf refits (the standard IVF maintenance trade)."""
    assigned = assign_to_centroids(new_vectors, centroids, vec_col, metric)
    (
        assigned.repartition("centroid_id")
        .write.mode("append")
        .partitionBy("centroid_id")
        .parquet(path)
    )


def search_ivf(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 4,
    nprobe: int = 4,
    metric: str = "COSINE",
) -> DataFrame:
    """ANN top-k: probe the nprobe best cells per query, exact search inside.

    The centroid scoring runs on the tiny centroid table; the resulting
    centroid_id IN (...) filter prunes index partitions at scan time.
    """
    probe = knn_join(
        queries,
        centroids.select(
            F.col("centroid_id").alias("vec_id"), F.col("cvec").alias("embedding")
        ),
        k=nprobe,
        metric=metric,
        score_decimals=None,
    ).select(F.col("q_id"), F.col("vec_id").alias("centroid_id"))

    cells = [r.centroid_id for r in probe.select("centroid_id").distinct().collect()]
    index = spark.read.parquet(index_path).filter(F.col("centroid_id").isin(cells))

    # exact distance within each query's own probed cells only: the
    # (q_id, centroid_id) probe table is tiny -> broadcast equi-join keys
    # the scan rows to exactly the queries probing that cell.
    from pyspark.sql import Window as W

    desc = V.METRIC_DESCENDING[metric.upper()]
    pairs = index.join(F.broadcast(probe), "centroid_id").join(
        F.broadcast(queries), "q_id"
    )
    score = F.round(
        V.score_expr(
            metric, V.as_double(F.col("q_vec")), V.as_double(F.col("embedding"))
        ),
        6,
    )
    scored = pairs.select("q_id", "vec_id", score.alias("score"))
    order = [
        F.col("score").desc() if desc else F.col("score").asc(),
        F.col("vec_id").asc(),
    ]
    w = W.partitionBy("q_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def search_exact(
    queries: DataFrame, vectors: DataFrame, k: int = 4, metric: str = "COSINE"
) -> DataFrame:
    """Brute-force baseline used for recall measurement."""
    return knn_join(queries, vectors.select("vec_id", "embedding"), k=k, metric=metric)
