"""As-of (most-recent-match) join — a time-series operator Spark lacks
natively.

Reference parity: meerpipe repeatedly matches an observation to the most
recent preceding configuration state — delay-config epochs applying to
every later observation until superseded (``dlyfix.py`` rule epochs),
fluxcal sessions, template updates. The general form is the backward
as-of join (and its forward mirror).

Spark-first design: NO range join, NO per-row subquery. Union-tag both
sides, window-fill within the key partition:

    right rows carry their payload, left rows carry null;
    sort by (ts, side) inside each key partition (right sorts first on
    ties, giving the standard ``<=`` / ``>=`` as-of semantics);
    ``last(payload, ignorenulls=True)`` over the preceding frame fills
    each left row with the nearest right payload;
    keep only left rows.

Cost: ONE shuffle on the join key + one sort per partition — exactly the
work a native AsOfJoin physical operator (sort both sides, merge) would
do, linear in |left| + |right|. A naive range-join formulation
(``l.ts >= r.ts`` + row_number) explodes to |left| × |right per key|
pairs before pruning; this form never materializes them.

Skew note: a hot join key concentrates one partition, same class as any
window — at 100 TB pass ``bucket_width`` to sub-bucket each key by a
coarse time bucket: the window then partitions on (key, bucket), and
correctness is restored by carrying each earlier bucket's LAST right
row (the "tail") into every later bucket as a synthetic right row — the
as-of only ever needs the single most recent preceding right row, so
one carried row per (key, bucket) is sufficient. The carry itself is a
window over the per-key DISTINCT bucket list (rows/bucket_width — tiny),
so a hot key's cost drops from O(n log n) in one task to
O(n/buckets log n/buckets) across `buckets` tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    ts_col: str,
    value_cols: list[str],
    direction: str = "backward",
    suffix: str = "_asof",
    tiebreak_col: str | None = None,
    bucket_width: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the largest
    ``right.ts_col <= left.ts_col`` (direction="backward") or smallest
    ``>=`` (direction="forward") within the same ``on`` key group.

    Returns every left column plus, for each ``c`` in ``value_cols``,
    ``c + suffix``, and ``ts_col + suffix`` (the matched right
    timestamp). Left rows with no match get nulls (LEFT as-of).

    If several right rows share (key, ts), the winner is the one with
    the greatest ``tiebreak_col`` (deterministic); without a tiebreak
    the caller must guarantee (key, ts) uniqueness on the right side.

    ``bucket_width`` (hot-key pre-split, see module skew note): when
    set, the fill window partitions on (key, floor(ts/bucket_width))
    instead of (key) alone, with each earlier bucket's last right row
    carried into later buckets — identical results, but a single hot
    key spreads over ~time_span/bucket_width tasks instead of one.
    Requires non-null ``ts_col`` on both sides (a null ts cannot be
    assigned a bucket); timestamps are bucketed on epoch seconds.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if bucket_width is not None and not bucket_width > 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width!r}")
    keys = [on] if isinstance(on, str) else list(on)
    reserved = {"_ts", "_side", "_rn", "_bkt"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"asof_join reserves column names {sorted(clash)}")
    carry = [ts_col] + [c for c in value_cols if c != ts_col]

    r = right
    if tiebreak_col is not None:
        w_dedup = Window.partitionBy(*keys, ts_col).orderBy(F.desc(tiebreak_col))
        r = (
            r.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    right_types = {f.name: f.dataType for f in r.schema.fields}
    r_tagged = r.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns if c not in keys],
        *[F.col(c).alias(f"_r_{c}") for c in carry],
    )
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns if c not in keys],
        *[F.lit(None).cast(right_types[c]).alias(f"_r_{c}") for c in carry],
    )
    unioned = r_tagged.unionByName(l_tagged)

    part_keys = list(keys)
    if bucket_width is not None:
        # Hot-key pre-split: window on (key, coarse time bucket), with
        # each earlier bucket's tail right-row carried into every later
        # bucket that appears in the data (see module skew note).
        bkt = (
            F.floor(F.col("_ts").cast("double") / F.lit(float(bucket_width)))
            .cast("long")
        )
        unioned = unioned.withColumn("_bkt", bkt)
        carry_cols = [f"_r_{c}" for c in carry]
        # per-(key, bucket) tail: the single right row an as-of from any
        # later (earlier, for forward) bucket would pick
        w_tail = Window.partitionBy(*keys, "_bkt").orderBy(
            F.desc("_ts") if direction == "backward" else F.asc("_ts")
        )
        tails = (
            unioned.filter(F.col("_side") == 0)
            .withColumn("_rn", F.row_number().over(w_tail))
            .filter(F.col("_rn") == 1)
            .select(*keys, "_bkt", "_ts", *carry_cols)
        )
        # propagate the nearest preceding tail onto EVERY bucket present
        # in the data: a window over the per-key DISTINCT bucket list —
        # O(span/bucket_width) rows per key, tiny next to the fact side.
        # The tail row is carried as ONE struct so per-column ignorenulls
        # can never mix payload columns from different right rows.
        buckets = unioned.select(*keys, "_bkt").distinct()
        w_carry = (
            Window.partitionBy(*keys)
            .orderBy(F.asc("_bkt") if direction == "backward" else F.desc("_bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        tail_struct = F.when(
            F.col("_ts").isNotNull(),
            F.struct(F.col("_ts"), *[F.col(c) for c in carry_cols]),
        )
        carried = (
            buckets.join(tails, [*keys, "_bkt"], "left")
            .select(
                *keys, "_bkt",
                F.last(tail_struct, ignorenulls=True).over(w_carry).alias("_tail"),
            )
            .filter(F.col("_tail").isNotNull())
        )
        synth = carried.select(
            *[F.col(k) for k in keys],
            F.col("_tail._ts").alias("_ts"),
            F.lit(0).alias("_side"),
            *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
              for c in left.columns if c not in keys],
            *[F.col(f"_tail.{c}").alias(c) for c in carry_cols],
            F.col("_bkt"),
        )
        # the carried row's _ts lies strictly outside the bucket on the
        # preceding side, so it sorts first within its (key, bucket)
        # partition under either direction's ordering
        unioned = unioned.unionByName(synth)
        part_keys = [*keys, "_bkt"]

    ts_order = F.asc("_ts") if direction == "backward" else F.desc("_ts")
    w = (
        Window.partitionBy(*part_keys)
        .orderBy(ts_order, F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *keys,
        "_side",
        *[F.col(f"_l_{c}") for c in left.columns if c not in keys],
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in carry],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    for c in left.columns:
        if c not in keys:
            out = out.withColumnRenamed(f"_l_{c}", c)
    for c in carry:
        out = out.withColumnRenamed(f"_r_{c}", c + suffix)
    return out


def cogrouped_asof_residuals(
    events: DataFrame,
    refs: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    ref_ts_col: str = "ref_ts",
    value_col: str = "value",
    ref_value_col: str = "ref_value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key as-of alignment via COGROUPED pandas (the
    ``groupBy().cogroup().applyInPandas`` lane — the one Arrow UDF
    surface the window/join forms don't exercise): for each key, both
    sides arrive as in-memory pandas frames; a searchsorted aligns each
    event to the latest reference at-or-before it and emits
    value − ref as the residual (NULL when no reference precedes).

    Equivalent to the relational as-of join (asof.py::asof_join) — and
    hash-checked against that as-of's SQL form — but the cogrouped
    shape is the right tool when the per-key logic outgrows window
    algebra (interpolation, Kalman updates, per-key model state):
    both sides shuffle ONCE on the key, arrive sorted-locally, and the
    Python kernel is Arrow-batched per group, never row-at-a-time.
    Skew note: a hyperactive key's whole history lands in one task —
    cap per-key rows upstream or salt-split keys with associative
    kernels.

    Residuals are floor-rounded at 1e6 (identical IEEE ops to the SQL
    twin) so the column is engine-exact.
    """
    import math

    import pandas as pd

    def align(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.sort_values([ts_col, id_col])
        right = right.sort_values(ref_ts_col)
        lt = left[ts_col].astype("int64").to_numpy()
        rt = right[ref_ts_col].astype("int64").to_numpy()
        rv = right[ref_value_col].to_numpy()
        import numpy as np

        idx = np.searchsorted(rt, lt, side="right") - 1
        res = []
        for i, val in zip(idx, left[value_col].to_numpy()):
            if i < 0:
                res.append(None)
            else:
                res.append(
                    math.floor((float(val) - float(rv[i])) * 1e6 + 0.5) / 1e6
                )
        return pd.DataFrame(
            {
                key: left[key].to_numpy(),
                id_col: left[id_col].to_numpy(),
                "residual": pd.array(res, dtype="Float64"),
            }
        )

    return (
        events.groupBy(key)
        .cogroup(refs.groupBy(key))
        .applyInPandas(align, f"{key} BIGINT, {id_col} BIGINT, residual DOUBLE")
    )
