"""Approximate-nearest-neighbor search over an embedding column.

- ``ann_bruteforce``: exact top-k cosine for a query set — the correctness
  baseline. Query side is tiny → broadcast; the corpus side streams narrow.
- ``ann_ivf``: IVF-style two-stage search — assign every vector to its
  nearest of C deterministic centroids (the first C vectors by id, so the
  oracle can reproduce it), then answer queries by scanning only the
  ``n_probe`` closest cells. At 100 TB the cell assignment is a one-off
  bucketed write; queries touch ~n_probe/C of the corpus.

All arithmetic is `F.zip_with`/`F.aggregate` over array<float> — JVM-side,
no Python. Scores are rounded to 6dp for engine-portable comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dbl(vec_col):
    return F.transform(vec_col, lambda x: x.cast("double"))


def _norm(vec_col):
    return F.sqrt(
        F.aggregate(
            F.transform(_dbl(vec_col), lambda x: x * x),
            F.lit(0.0), lambda acc, x: acc + x,
        )
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )


def ann_bruteforce(emb: DataFrame, query_ids: list[int], k: int = 5,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).
    Deterministic tie-break: (cos desc, neighbor id asc)."""
    base = emb.select(F.col(id_col), F.col(vec_col),
                      _norm(vec_col).alias("_n"))
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.col("_n").alias("qn"),
    )
    c = base.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        F.col("_n").alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(_dot("qv", "cv") / (F.col("qn") * F.col("cn")), 6))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_assignments(emb: DataFrame, n_centroids: int = 8,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """Assign each vector to its nearest centroid. Centroids are the first
    ``n_centroids`` vectors by id — deterministic, no training pass, and
    reproducible by the SQL oracle. Ties break to the lower centroid id."""
    base = emb.select(F.col(id_col), F.col(vec_col), _norm(vec_col).alias("_n"))
    cents = base.orderBy(id_col).limit(n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec"),
        F.col("_n").alias("cnorm"),
    )
    scored = base.crossJoin(F.broadcast(cents)).withColumn(
        "sim", F.round(_dot(vec_col, "cvec") / (F.col("_n") * F.col("cnorm")), 9)
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), F.col("centroid_id").alias("cell"))
    )


def ann_ivf(emb: DataFrame, query_ids: list[int], k: int = 5,
            n_centroids: int = 8, n_probe: int = 2,
            vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF search: per query, scan only the n_probe nearest cells."""
    base = emb.select(F.col(id_col), F.col(vec_col), _norm(vec_col).alias("_n"))
    cents = base.orderBy(id_col).limit(n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec"),
        F.col("_n").alias("cnorm"),
    )
    assign = ivf_assignments(emb, n_centroids, vec_col, id_col)
    corpus = base.join(assign, on=id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        F.col("_n").alias("cn"), "cell",
    )
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.col("_n").alias("qn"),
    )
    from pyspark.sql import Window

    qc = q.crossJoin(F.broadcast(cents)).withColumn(
        "sim", F.round(_dot("qv", "cvec") / (F.col("qn") * F.col("cnorm")), 9)
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "qn", F.col("centroid_id").alias("cell"))
    )
    scored = (
        corpus.join(F.broadcast(probes), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(_dot("qv", "cv") / (F.col("qn") * F.col("cn")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
