"""Batch model inference over ``mapInPandas`` — the retrieve→RERANK seam.

Every production search/curation pipeline ends with a model pass the
built-in operators can't express: a cross-encoder reranking (query, doc)
candidates, a reward/toxicity model scoring documents, an embedding model
refreshing vectors.  The Spark-side shape is always the same and is what
this module owns:

- candidates arrive as ordinary rows; the scorer sees Arrow-batched
  ``pandas.DataFrame`` chunks (vectorized — never row-at-a-time Python);
- batch memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- the model is a pluggable callable serialized with the kernel closure
  (importable/picklable, must not capture a SparkSession) — the
  ``multimodal.binary_ops`` codec-seam pattern applied to inference;
- the default scorer is a deterministic FAKE (md5-derived in [0, 1)) so
  the plumbing is testable and ORACLE-REPLAYABLE without model weights;
  it warns once at construction, and ``strict=True`` raises instead —
  the substitution is never invisible in production.

Scale shape: scoring is embarrassingly parallel (one map over candidate
partitions, zero shuffle); only the downstream rank is a per-query window
over ≤ candidates-per-query rows.
"""

from __future__ import annotations

import hashlib
import warnings
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: scorer contract for :func:`score_candidates`: a pandas DataFrame with
#: the candidate columns -> a float Series of scores, same length/order.
Scorer = Callable[[pd.DataFrame], pd.Series]

_FAKE_MOD = 1_000_000


def _warn_fake() -> None:
    warnings.warn(
        "score_candidates: no scorer injected and strict=False — using the "
        "built-in deterministic FAKE scorer; its scores are md5 noise, not "
        "model output. Pass scorer= or set strict=True for production.",
        RuntimeWarning,
        stacklevel=3,
    )


def fake_pair_scorer(key_cols: list[str]) -> Scorer:
    """The deterministic placeholder: md5 of the ':'-joined key columns,
    first 15 hex digits mod 1e6, scaled to [0, 1).  Pure arithmetic on the
    row's own keys — exactly replayable in oracle SQL via
    :func:`sql_fake_pair_score`.

    Keys must be NON-NULL: pandas would stringify a NULL as ``'None'`` /
    ``'nan'`` while the SQL twin's ``md5(NULL)`` propagates NULL — a
    silent cross-engine divergence — so a NULL key raises instead.
    COALESCE nullable keys to a sentinel (in BOTH engines) before
    scoring."""

    def score(batch: pd.DataFrame) -> pd.Series:
        keys = batch[key_cols]
        if keys.isna().any().any():
            null_cols = [c for c in key_cols if keys[c].isna().any()]
            raise ValueError(
                f"fake_pair_scorer: NULL key value in {null_cols}; the fake's "
                "md5-of-string contract is defined for non-null keys only "
                "(sql_fake_pair_score's md5(NULL) propagates NULL) — COALESCE "
                "keys to a sentinel in both engines first"
            )
        joined = keys.astype(str).agg(":".join, axis=1)
        return joined.map(
            lambda s: (int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % _FAKE_MOD)
            / _FAKE_MOD
        )

    return score


def sql_fake_pair_score(key_exprs: list[str]) -> str:
    """DuckDB twin of :func:`fake_pair_scorer`'s arithmetic.  Same
    non-null-key contract: ``md5(NULL)`` here yields NULL where the
    kernel raises — never feed nullable keys without a COALESCE."""
    joined = " || ':' || ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    return (
        f"CAST(CAST(('0x' || substr(md5({joined}), 1, 15)) AS BIGINT)"
        f" % {_FAKE_MOD} AS DOUBLE) / {_FAKE_MOD}"
    )


def score_candidates(
    candidates: DataFrame,
    key_cols: list[str],
    scorer: Scorer | None = None,
    strict: bool = False,
    out_col: str = "model_score",
) -> DataFrame:
    """Append a model score to every candidate row through one Arrow-
    batched map — the inference seam.

    ``key_cols`` are passed to the default fake scorer (and define the
    determinism contract); an injected ``scorer`` sees the WHOLE batch
    frame and may read any column.  Scores are rounded to 6dp (the fake's
    grid is already coarser).
    """
    if scorer is None:
        if strict:
            raise NotImplementedError(
                "score_candidates(strict=True): inject a scorer= callable "
                "(no model runtime is linked in this environment)"
            )
        _warn_fake()
        scorer = fake_pair_scorer(key_cols)
    # never .add() on candidates.schema: StructType.add MUTATES the cached
    # schema object, silently corrupting the input frame's resolution
    from pyspark.sql.types import DoubleType, StructField, StructType

    names = [f.name for f in candidates.schema.fields]
    schema = StructType(
        list(candidates.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = b[names].copy()
            out[out_col] = scorer(b).astype(float).round(6)
            yield out

    return candidates.mapInPandas(run, schema)


def rerank_topk(
    candidates: DataFrame,
    query_col: str,
    id_col: str,
    topk: int,
    key_cols: list[str] | None = None,
    scorer: Scorer | None = None,
    strict: bool = False,
) -> DataFrame:
    """Model-scored rerank: score every candidate through the inference
    seam, keep the top ``topk`` per query by (score desc, id asc).

    The retrieve→rerank composition: a cheap first stage (BM25 / ANN /
    RRF fusion) bounds candidates per query, so this window is over a
    bounded frame no matter the corpus size."""
    scored = score_candidates(
        candidates, key_cols or [query_col, id_col], scorer, strict
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("model_score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("model_rank", F.row_number().over(w).cast("int"))
        .where(F.col("model_rank") <= topk)
    )
