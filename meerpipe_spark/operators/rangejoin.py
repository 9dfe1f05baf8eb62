"""Binned range join: point-in-interval joins without the O(|P|·|I|)
theta-join blowup.

Spark (like every hash-join engine) executes ``p.t BETWEEN i.s AND i.e``
as BroadcastNestedLoopJoin or a cartesian product — fine for a broadcast
dim, fatal when both sides are facts. The classic fix is binning: pick a
bucket width ~ the typical interval length, explode each interval to the
buckets it overlaps, give each point its single bucket, equi-join on the
bucket, then re-apply the exact range predicate. The join becomes a
hash join on a well-distributed key; each true (point, interval) match
is produced exactly once because the point lives in exactly one bucket.

Cost model: the interval side inflates by ceil(len/width)+1 rows; the
point side does not inflate at all. At 100 TB pick ``bucket_width`` ≥
the median interval length so interval inflation stays ~2×, and the
equi-join shuffles on a key whose cardinality grows with the time span —
no hot keys unless the data genuinely concentrates in one bucket (then
AQE skew-split applies, since the skew is partition-sized, not
join-cell-quadratic).

Reference parity: meerpipe matches observations to delay/config epochs
by scanning rule files per observation (delay_rules evaluation); this
operator is the general form for fact-to-fact interval matching the
pipeline needs at scale (e.g. subint time-ranges against RFI windows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
    keys: list[str] | None = None,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts < end`` (half-open, the standard window convention).

    ``point_ts``/``start_col``/``end_col`` are BIGINT columns in the
    same unit (e.g. microseconds); ``bucket_width`` is in that unit.
    ``keys`` adds equi-join columns alongside the bucket (the
    point-in-time dimension-lookup shape: intervals are per entity, a
    point must only see its OWN entity's intervals — the composite
    (entity, bucket) key also spreads the shuffle further). Returns
    points' columns + intervals' columns. ``how='inner'`` keeps
    matched pairs only.

    The bucket key never leaks into the output; callers can project
    freely. Column-name collisions between the two inputs are the
    caller's responsibility (rename before joining), same as
    ``DataFrame.join`` on an expression.
    """
    if how != "inner":
        raise ValueError("binned_interval_join supports how='inner' only")
    p = points.withColumn("_bucket", (F.col(point_ts) / bucket_width).cast("bigint"))
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(start_col) / bucket_width).cast("bigint"),
                (F.col(end_col) / bucket_width).cast("bigint"),
            )
        ),
    )
    out = p.join(i, ["_bucket", *(keys or [])]).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    )
    return out.drop("_bucket")
