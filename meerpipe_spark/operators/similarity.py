"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k against a query vector — a single
map-side pass (the query vector is a broadcast literal), expressible with
JVM array intrinsics (zip_with + aggregate), no Python, no shuffle until
the final top-k (which is a tiny global sort of per-partition top-ks —
Spark's TakeOrderedAndProject).

Scale path: LSH bucketing via random hyperplane signs — each vector maps
to a small signature; candidate search only within matching buckets, so
the join is equi on the bucket key. IVF-style variants follow the same
shape (centroid assignment = argmin over a broadcast centroid table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: F.Column, b: F.Column) -> F.Column:
    """cos(a,b) as a pure column expression over array<numeric> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k vs a literal query vector.

    The per-row score is whole-stage-codegen'd; orderBy(...).limit(k)
    compiles to TakeOrderedAndProject (per-partition heap + driver merge),
    so no full sort and no full shuffle even at 10^9 rows.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scored = embeddings.select(
        F.col(id_col),
        cosine_similarity(cast, q).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)


def hyperplane_lsh_buckets(
    embeddings: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Random-hyperplane LSH: bucket = bit-packed signs of <v, plane_i>.

    ``planes`` is a small literal matrix (broadcast as expressions).
    Vectors in the same bucket are ANN candidates; a bucket equi-join
    replaces the O(n²) cross join at scale.
    """
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = [
        F.when(
            _dot(cast, F.array(*[F.lit(float(x)) for x in p])) >= 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i, p in enumerate(planes)
    ]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket.bitwiseOR(b)
    return embeddings.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def centroid_by_label(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid via posexplode + groupBy(label, dim) — the
    vector-aggregation pattern (partial aggregation applies per dim)."""
    exploded = embeddings.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("dim", "v")
    )
    return exploded.groupBy(label_col, "dim").agg(F.avg(F.col("v").cast("double")).alias("centroid_v"))
