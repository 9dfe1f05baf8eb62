"""Declarative curation recipes: a data-driven step list compiled to ONE
lazy DataFrame chain, with per-step quarantine lanes.

The training-data pipeline counterpart of :mod:`plans.pipeline` (the
observation DAG): production corpus builds are CONFIG, not code — a
recipe is an ordered list of (step, params) dicts, each step a registered
pure function DataFrame → (kept, dropped). The compiler folds them into
one logical plan, so Catalyst still fuses filters into the scan and
shares shuffles across steps — declaring the pipeline as data costs no
plan quality. Every step's rejects are tagged with the step name and
unioned into ONE quarantine frame: at 100 TB you never re-run a corpus
build to learn why a document vanished; the quarantine table IS the
audit log (write it next to the corpus).

Recipes are JSON-serializable (versionable, diffable, attachable to the
output as provenance). Steps registered here deliberately wrap the
operators the registry already oracle-checks — the recipe layer adds
composition + audit, never new semantics.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, functions as F

#: step name -> fn(df, **params) -> (kept, dropped_with_reason)
_STEPS: dict[str, Callable[..., tuple[DataFrame, DataFrame]]] = {}


def step(name: str):
    def deco(fn):
        _STEPS[name] = fn
        return fn

    return deco


def _split(df: DataFrame, keep_cond) -> tuple[DataFrame, DataFrame]:
    return df.filter(keep_cond), df.filter(~keep_cond)


@step("min_length")
def _min_length(df: DataFrame, chars: int = 100, text_col: str = "text"):
    return _split(df, F.length(text_col) >= chars)


@step("quality_gate")
def _quality_gate(df: DataFrame, id_col: str = "doc_id"):
    from meerpipe_spark.operators.curation import quality_gate

    verdict = quality_gate(df).select(id_col, "keep")
    j = df.join(verdict, id_col, "left")
    keep = F.coalesce(F.col("keep"), F.lit(False))
    return j.filter(keep).drop("keep"), j.filter(~keep).drop("keep")


@step("language")
def _language(df: DataFrame, allow: tuple = ("en",), lang_col: str = "lang"):
    return _split(df, F.col(lang_col).isin(*allow))


@step("exact_dedup")
def _exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id"):
    from meerpipe_spark.operators.dedup import exact_dedup

    keepers = exact_dedup(df, text_col=text_col, id_col=id_col).select(
        F.col("keep_id").alias(id_col)
    )
    kept = df.join(keepers, id_col, "left_semi")
    dropped = df.join(keepers, id_col, "left_anti")
    return kept, dropped


@step("pii_redact")
def _pii_redact(df: DataFrame, text_col: str = "text"):
    from meerpipe_spark.operators.curation import pii_redact

    # transform-only step: nothing is dropped, the text is rewritten
    return df.withColumn(text_col, pii_redact(F.col(text_col))), df.limit(0)


@step("hash_sample")
def _hash_sample(df: DataFrame, hex_lt: str = "80", key_col: str = "doc_id"):
    h = F.substring(F.md5(F.col(key_col).cast("string")), 1, 2)
    return _split(df, h < F.lit(hex_lt))


def compile_recipe(
    docs: DataFrame,
    recipe: list[dict[str, Any]],
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Fold the recipe into one lazy plan.

    Returns (corpus, quarantine): the surviving documents, and every
    rejected row tagged with ``rejected_by`` = the step that dropped it
    (id + step only — the quarantine frame must stay cheap to retain;
    join back to the source for payloads).
    """
    cur = docs
    quarantines: list[DataFrame] = []
    for entry in recipe:
        entry = dict(entry)
        name = entry.pop("step")
        if name not in _STEPS:
            raise ValueError(f"unknown recipe step: {name!r} (have {sorted(_STEPS)})")
        cur, dropped = _STEPS[name](cur, **entry)
        quarantines.append(
            dropped.select(F.col(id_col), F.lit(name).alias("rejected_by"))
        )
    if quarantines:
        q = quarantines[0]
        for d in quarantines[1:]:
            q = q.unionByName(d)
    else:
        q = docs.limit(0).select(F.col(id_col), F.lit("").alias("rejected_by"))
    return cur, q
