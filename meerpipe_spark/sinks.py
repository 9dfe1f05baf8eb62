"""Sinks (K1-K4): partitioned parquet writers and an idempotent upsert.

Scale discipline encoded here:
- The cube table is written partitioned by ``obs_date`` (derived) so both
  per-observation reprocessing and date-range queries prune partitions at
  the scan; within a partition, files are sized by
  ``spark.sql.files.maxPartitionBytes``-friendly repartitioning.
- Results/metadata tables are small and append-only with a key-based
  idempotent upsert (read-merge-rewrite on parquet; on Delta/Iceberg this
  becomes a real MERGE — the call-site contract is identical, and this is
  the one piece that changes when a transactional table format is
  available).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_cube(
    cube: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("obs_id",),
    files_per_partition: int = 1,
    mode: str = "append",
) -> None:
    """K1: long-form cube → parquet partitioned by observation.

    ``repartition(partition_cols)`` aligns the shuffle with the output
    partitioning so each Hive partition is written by a bounded number of
    tasks (no thousand-small-files problem at 1000 executors)."""
    (
        cube.repartition(*[F.col(c) for c in partition_cols])
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def upsert_by_key(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: tuple[str, ...],
) -> None:
    """K4: idempotent keyed upsert — new rows win over existing rows with
    the same key. Parquet implementation: anti-join existing vs updates,
    union, atomic directory swap. Delta/Iceberg swap-in: MERGE ON key."""
    tmp = path.rstrip("/") + "__staged"
    try:
        existing = spark.read.parquet(path)
        keep = existing.join(updates.select(*key_cols).distinct(), list(key_cols), "left_anti")
        merged = keep.unionByName(updates)
    except Exception:
        merged = updates
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(path)
    # best-effort cleanup of the staging dir
    try:
        import shutil

        shutil.rmtree(tmp.replace("file:", ""), ignore_errors=True)
    except Exception:
        pass


def write_results_json(results: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K2: results documents as JSON lines."""
    results.write.mode(mode).json(path)


def _stub_resize(payload: bytes, factor: float) -> bytes:
    # deterministic stand-in: byte count scales like the area
    # (factor applies to BOTH dimensions in the reference)
    return payload[: max(1, int(len(payload) * factor * factor))]


def default_image_resize(payload: bytes, factor: float) -> bytes:
    """Real-where-possible ``resize(payload, factor) -> bytes``:

    1. PIL if importable — LANCZOS resample, re-encode in the source
       format (JPEG at quality=85, the reference's exact settings in
       generate_images_results.py:178-191);
    2. else the pure-numpy PNG codec for PNG payloads
       (``functions.png.png_resize_reencode`` — real pixels, stdlib zlib);
    3. else the proportional-truncation stub (opaque/unknown formats).
    """
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]

        img = Image.open(io.BytesIO(payload))
        fmt = img.format or "PNG"
        nw = max(1, int(img.width * factor))
        nh = max(1, int(img.height * factor))
        out = io.BytesIO()
        resized = img.resize((nw, nh), Image.LANCZOS)
        if fmt.upper() in ("JPEG", "JPG"):
            resized.save(out, format="JPEG", quality=85)
        else:
            resized.save(out, format=fmt)
        return out.getvalue()
    except ImportError:
        pass
    from meerpipe_spark.functions.png import PNG_SIGNATURE, png_resize_reencode

    if payload.startswith(PNG_SIGNATURE):
        return png_resize_reencode(payload, factor)
    return _stub_resize(payload, factor)


def cap_image_sizes(
    images: DataFrame,
    cap_bytes: int = 1_000_000,
    target_bytes: int = 800_000,
    resize=None,
    payload_col: str = "payload",
    max_rounds: int = 8,
) -> DataFrame:
    """K3: the reference's 1 MB image-size contract
    (generate_images_results.py:176-190): while an image exceeds
    ``cap_bytes``, scale its dimensions by ``target_bytes / size`` and
    re-encode, iterating until it fits.

    Spark side: one mapInPandas over the binary payload column — the loop
    runs per row inside the task, Arrow-batched, failure-isolated (a
    payload that cannot be re-encoded passes through with
    ``resized=False`` rather than failing the task). ``resize(payload,
    factor) -> bytes`` is the pluggable encoder; the default
    :func:`default_image_resize` performs a REAL decode-resize-reencode
    for PNG payloads (pure-numpy codec) or any PIL-supported format where
    PIL is importable, falling back to a proportional-truncation stub for
    opaque formats.

    Returns (original columns…, final payload, n_bytes, resized).
    """
    import pandas as pd
    from pyspark.sql import types as T

    fn = resize or default_image_resize
    cols = images.columns
    out_schema = T.StructType(
        [images.schema[c] for c in cols if c != payload_col]
        + [
            T.StructField(payload_col, T.BinaryType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("resized", T.BooleanType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            outs, sizes, flags = [], [], []
            for payload in pdf[payload_col]:
                buf = bytes(payload)
                did = False
                try:
                    rounds = 0
                    while len(buf) > cap_bytes and rounds < max_rounds:
                        buf = fn(buf, target_bytes / len(buf))
                        did = True
                        rounds += 1
                except Exception:
                    buf, did = bytes(payload), False
                outs.append(buf)
                sizes.append(len(buf))
                flags.append(did)
            res = pdf.drop(columns=[payload_col]).reset_index(drop=True)
            res[payload_col] = pd.Series(outs, dtype=object)
            res["n_bytes"] = sizes
            res["resized"] = flags
            yield res

    return images.mapInPandas(run, out_schema)


def write_profile_movie(
    frames: DataFrame,
    out_dir: str,
    obs_col: str = "obs_id",
    frame_col: str = "frame_idx",
    bin_col: str = "bin",
    value_col: str = "value",
    residual_col: str = "residual",
    height: int = 64,
    delay_cs: int = 50,
    max_bytes: int = 1024 * 1024,
) -> DataFrame:
    """K3 tail: per-frame normalized profile + residual rows → one
    animated GIF per observation (make_stokes_movie.py:79-102 parity:
    500 ms/frame default, profile trace over residual trace).

    ``applyInPandas`` on the observation key — one task per movie, the
    same fan-out as the image-cap sink; the GIF assembles executor-side
    with the pure-python codec (functions/gif.py, canonical-test-vector
    validated) and lands under ``out_dir``. Movies above ``max_bytes``
    are dropped with ``written=false`` in the manifest (the 1 MB cap
    contract of K3). Returns the manifest; run an action to drive it.
    """
    import os as _os

    from pyspark.sql import types as T

    from meerpipe_spark.functions.gif import encode_gif, render_profile_frame

    _os.makedirs(out_dir, exist_ok=True)
    schema = T.StructType(
        [
            T.StructField("obs_id", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("nbytes", T.LongType()),
            T.StructField("written", T.BooleanType()),
        ]
    )

    def assemble(pdf):
        import numpy as np
        import pandas as pd

        obs = str(pdf[obs_col].iloc[0])
        imgs = []
        for _, g in sorted(pdf.groupby(frame_col), key=lambda kv: kv[0]):
            g = g.sort_values(bin_col)
            imgs.append(
                render_profile_frame(
                    np.asarray(g[value_col], dtype=np.float64),
                    np.asarray(g[residual_col], dtype=np.float64),
                    height=height,
                )
            )
        data = encode_gif(imgs, delay_cs=delay_cs)
        ok = len(data) <= max_bytes
        path = _os.path.join(out_dir, f"{obs}.gif")
        if ok:
            with open(path, "wb") as f:
                f.write(data)
        return pd.DataFrame(
            [{"obs_id": obs, "path": path, "n_frames": len(imgs),
              "nbytes": len(data), "written": ok}]
        )

    return frames.groupBy(obs_col).applyInPandas(assemble, schema)
