"""Sequence packing: concatenate-then-chunk documents into fixed token bins.

LLM pretraining consumes fixed-length token sequences (e.g. 2048/4096/8192
tokens), not variable-length documents.  The standard data-pipeline step is
GPT-style packing: lay the corpus out as one long token stream (documents
in a deterministic order, separated implicitly), then slice the stream
into capacity-sized bins; a document that straddles a bin boundary is
split across the adjacent bins.  Compared with greedy first-fit (which is
inherently sequential per bin), concat-then-chunk is a pure prefix-sum —
embarrassingly parallel and exactly reproducible, which is why the big
pretraining pipelines use it.

Distributed shape: one window prefix-sum of token counts PARTITIONED BY
``part_col`` (here: the document ``source``) — each source packs its own
bin sequence, so no global single-partition sort exists anywhere in the
plan; at 100 TB each source's prefix sum is an independent range-sorted
window.  The boundary-crossing explode emits at most
``ceil(n_tok / capacity) + 1`` rows per document.

Output grain: one row per (document × bin it touches), with the half-open
token slice ``[tok_start, tok_end)`` of the document that lands in that
bin.  ``SUM(tok_end - tok_start)`` over a bin = bin fill (== capacity for
every bin except each source's last).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.functions.hashing import (
    md5_prefix_int,
    sql_md5_prefix_int,
)


def pack_sequences(
    docs: DataFrame,
    part_col: str,
    id_col: str,
    text_col: str,
    capacity: int = 2048,
) -> DataFrame:
    """Assign whitespace-token slices of each document to fixed-size bins.

    Columns out: ``part_col``, ``doc_id``, ``n_tok``, ``bin_id``,
    ``tok_start``, ``tok_end`` (slice of the doc in that bin, half-open).
    """
    return pack_token_counts(
        docs.select(
            F.col(part_col),
            F.col(id_col),
            F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("__nt"),
        ),
        part_col,
        id_col,
        "__nt",
        capacity,
    )


def pack_token_counts(
    docs: DataFrame,
    part_col: str,
    id_col: str,
    n_tok_col: str,
    capacity: int = 2048,
) -> DataFrame:
    """The packing core over PRECOMPUTED per-document token counts —
    what a real tokenizer feeds it (``bpe_encode``'s n_tokens, q195);
    :func:`pack_sequences` is this with the whitespace approximation
    inlined.  Same output contract."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    # Explicit ROWS frame: orderBy without one defaults to RANGE, which
    # sums PEER rows together — duplicate ids would share a start offset
    # (overlapping slices) and diverge from the oracle's ROWS frame.
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = docs.select(
        F.col(part_col),
        F.col(id_col).alias("doc_id"),
        F.col(n_tok_col).cast("bigint").alias("n_tok"),
    )
    o = t.withColumn("start_off", F.sum("n_tok").over(w) - F.col("n_tok"))
    cap = F.lit(capacity).cast("bigint")
    first_bin = F.expr("start_off DIV " + str(capacity))
    last_bin = F.expr(f"(start_off + n_tok - 1) DIV {capacity}")
    b = o.select(
        part_col,
        "doc_id",
        "n_tok",
        "start_off",
        F.explode(F.sequence(first_bin, last_bin)).alias("bin_id"),
    )
    return b.select(
        part_col,
        "doc_id",
        "n_tok",
        F.col("bin_id").cast("bigint").alias("bin_id"),
        (F.greatest(F.col("start_off"), F.col("bin_id") * cap) - F.col("start_off"))
        .cast("bigint")
        .alias("tok_start"),
        (
            F.least(F.col("start_off") + F.col("n_tok"), (F.col("bin_id") + 1) * cap)
            - F.col("start_off")
        )
        .cast("bigint")
        .alias("tok_end"),
    )


def sql_pack_sequences(
    src: str, part_col: str, id_col: str, text_col: str, capacity: int = 2048
) -> str:
    """DuckDB oracle for :func:`pack_sequences` (generate_series is
    inclusive on both ends, matching Spark's ``sequence``)."""
    return sql_pack_token_counts(
        src,
        part_col,
        id_col,
        f"len(string_split({text_col}, ' '))",
        capacity,
    )


def sql_pack_token_counts(
    src: str, part_col: str, id_col: str, n_tok_expr: str, capacity: int = 2048
) -> str:
    """DuckDB oracle for :func:`pack_token_counts` — the packing core
    over an arbitrary token-count expression."""
    return f"""
WITH t AS (
  SELECT {part_col},
         {id_col} AS doc_id,
         CAST({n_tok_expr} AS BIGINT) AS n_tok
  FROM {src}
),
o AS (
  SELECT {part_col}, doc_id, n_tok,
         CAST(SUM(n_tok) OVER (PARTITION BY {part_col} ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT)
           AS start_off
  FROM t
),
e AS (
  SELECT {part_col}, doc_id, n_tok, start_off,
         unnest(generate_series(start_off // {capacity},
                                (start_off + n_tok - 1) // {capacity})) AS b
  FROM o
)
SELECT {part_col}, doc_id, n_tok,
       CAST(b AS BIGINT) AS bin_id,
       CAST(GREATEST(start_off, b * {capacity}) - start_off AS BIGINT) AS tok_start,
       CAST(LEAST(start_off + n_tok, (b + 1) * {capacity}) - start_off AS BIGINT) AS tok_end
FROM e
"""


def shard_assignments(
    docs: DataFrame, id_col: str, n_shards: int, salt: str = ":shard"
) -> DataFrame:
    """Deterministic global-shuffle shard layout for training output.

    Training consumers need the corpus in (a) a pseudo-random order that is
    (b) exactly reproducible and (c) writable as N independent shard files.
    Assign each document ``shard = md5(id || salt) mod n_shards`` and an
    in-shard position by the md5 order (id tiebreak) — together a
    deterministic permutation of the corpus, with no global sort anywhere:
    the only shuffle keys on ``shard`` and each shard orders independently.

    At 100 TB ``n_shards`` is sized so a shard fits an output file
    (corpus_bytes / ~256 MB), keeping every in-shard window bounded; the
    fixed small value here exists only so the oracle stays readable.

    Output: (id, shard, pos) — ``pos`` is 1-based within the shard.
    """
    h = md5_prefix_int(F.col(id_col), nhex=15, salt=salt)
    w = Window.partitionBy("shard").orderBy("shard_hash", id_col)
    return (
        docs.select(
            F.col(id_col),
            (h % n_shards).cast("int").alias("shard"),
            h.alias("shard_hash"),
        )
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select(id_col, "shard", "pos")
    )


def sql_shard_assignments(src: str, id_col: str, n_shards: int, salt: str = ":shard") -> str:
    h = sql_md5_prefix_int(id_col, nhex=15, salt=salt)
    return f"""
SELECT {id_col},
       CAST({h} % {n_shards} AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY {h} % {n_shards}
                               ORDER BY {h}, {id_col}) AS BIGINT) AS pos
FROM ({src})
"""


def token_budget_selection(
    scored: DataFrame,
    part_col: str,
    id_col: str,
    quality_col: str,
    tokens_col: str,
    budget: int | Column,
) -> DataFrame:
    """Greedy per-source data selection under a token budget.

    The selection step of quality-filtered pretraining mixes: within each
    ``part_col`` stratum, take documents best-first (``quality_col``
    descending, ``id_col`` tiebreak) until the budget is spent — a
    document is kept when the tokens BEFORE it are still under budget, so
    the boundary document may overshoot (deterministic, and the usual
    choice: a budget cut mid-document is the packer's job, q92, not the
    selector's).

    ``budget`` is a scalar (same budget per stratum, q112) or a Column
    resolving per row (per-domain budgets, the mixture cut q125) — ONE
    definition of the ordering and keep rule, so a tiebreak or boundary
    change can never diverge the two selectors.

    One window per stratum (quality sort + running token sum), parallel
    across sources — the same no-global-sort shape as :func:`pack_sequences`;
    a stratum's window is bounded by that source's catalog, not the corpus.

    Output: input columns + ``cum_tokens`` (inclusive running sum over the
    kept prefix order).
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(F.col(quality_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col).cast("bigint")).over(w)
    b = F.lit(budget) if isinstance(budget, int) else budget
    return (
        scored.withColumn("cum_tokens", cum)
        .where(F.col("cum_tokens") - F.col(tokens_col) < b)
    )


def sql_token_budget_selection(
    scored_sql: str,
    part_col: str,
    id_col: str,
    quality_col: str,
    tokens_col: str,
    budget: int | str,
) -> str:
    """``budget`` mirrors the Spark twin: an int literal, or a SQL
    expression over the scored rows (e.g. a per-domain budget column)."""
    return f"""
SELECT * FROM (
  SELECT s.*,
         CAST(SUM(CAST({tokens_col} AS BIGINT)) OVER (
           PARTITION BY {part_col}
           ORDER BY {quality_col} DESC, {id_col}
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM ({scored_sql}) s
)
WHERE cum_tokens - {tokens_col} < {budget}
"""


_MIXTURE_NAME = re.compile(r"^[A-Za-z0-9_.-]+$")


def _check_mixture(weights: dict[str, float]) -> None:
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"mixture weights must be positive: {weights}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"mixture weights must sum to 1, got {total}")
    # domain names land inside single-quoted SQL literals in the DuckDB
    # twin; a quote would break (or inject into) the oracle while the
    # Column-API twin sails on — same guard class as sampling's split
    # names and hashing's salt escaping
    bad = [d for d in weights if not _MIXTURE_NAME.match(d)]
    if bad:
        raise ValueError(f"domain names must match {_MIXTURE_NAME.pattern}: {bad}")


def mixture_budgets(total_budget: int, weights: dict[str, float]) -> dict[str, int]:
    """Per-domain token budgets: floor(total * weight), computed ONCE in
    Python and inlined as literals on BOTH engines — so float rounding of
    a weight can never diverge the Spark plan from the SQL oracle.

    A weight small enough to floor to a ZERO budget is rejected: a
    zero-budget domain would be silently excluded — indistinguishable
    from an unlisted one — which is a mixture distortion the caller
    explicitly weighted against, not a selection."""
    _check_mixture(weights)
    budgets = {dom: int(total_budget * w) for dom, w in weights.items()}
    zeroed = [d for d, b in budgets.items() if b == 0]
    if zeroed:
        raise ValueError(
            f"domains {zeroed} floor to a zero budget at total_budget="
            f"{total_budget}; raise the total or drop the domain explicitly"
        )
    return budgets


def _mixture_budget_col(budgets: dict[str, int], part_col: str) -> Column:
    """The literal (domain -> budget) map resolved row-locally — model
    state inlined like k-means centroids; NULL for unlisted domains."""
    pairs: list[Column] = []
    for dom, b in budgets.items():
        pairs += [F.lit(dom), F.lit(b)]
    return F.element_at(F.create_map(*pairs), F.col(part_col))


def mixture_budget_selection(
    scored: DataFrame,
    part_col: str,
    id_col: str,
    quality_col: str,
    tokens_col: str,
    total_budget: int,
    weights: dict[str, float],
) -> DataFrame:
    """:func:`token_budget_selection` with a target DOMAIN MIXTURE: each
    domain gets ``floor(total_budget * weight)`` tokens and fills it
    best-first (quality desc, id tiebreak); domains absent from
    ``weights`` are excluded entirely.  This is the static
    mixture-reweighting step of pretraining-data curation (Pile-style
    hand weights, DoReMi-style learned weights): the mixture is enforced
    at selection time instead of hoping the corpus proportions happen to
    match.

    The budget table is a handful of (domain, budget) pairs — model
    state, like k-means centroids — so it is inlined as a literal map
    and resolved row-locally in the scan: no join, no broadcast, and the
    unlisted-domain filter prunes rows BEFORE the per-domain window.
    The cut itself IS :func:`token_budget_selection` with the per-row
    budget column — one definition of the ordering and keep rule.

    Output: input columns + ``domain_budget`` + ``cum_tokens`` (the
    boundary document may overshoot its domain budget, exactly as in
    :func:`token_budget_selection`).
    """
    budgets = mixture_budgets(total_budget, weights)
    budget_col = _mixture_budget_col(budgets, part_col)
    kept = scored.where(budget_col.isNotNull()).withColumn(
        "domain_budget", budget_col.cast("bigint")
    )
    return token_budget_selection(
        kept, part_col, id_col, quality_col, tokens_col,
        budget=F.col("domain_budget"),
    )


def sql_mixture_budget_selection(
    scored_sql: str,
    part_col: str,
    id_col: str,
    quality_col: str,
    tokens_col: str,
    total_budget: int,
    weights: dict[str, float],
) -> str:
    """DuckDB twin of :func:`mixture_budget_selection` (same Python-
    computed budget literals, and the cut is the shared
    :func:`sql_token_budget_selection` with the budget column)."""
    budgets = mixture_budgets(total_budget, weights)
    arms = " ".join(f"WHEN '{dom}' THEN {b}" for dom, b in budgets.items())
    case = f"CASE {part_col} {arms} END"
    annotated = f"""
SELECT s.*, CAST({case} AS BIGINT) AS domain_budget
FROM ({scored_sql}) s
WHERE {case} IS NOT NULL
"""
    return sql_token_budget_selection(
        annotated, part_col, id_col, quality_col, tokens_col,
        budget="domain_budget",
    )


def rendezvous_shard(
    key: Column, n_shards: int, salt: str = ":hrw"
) -> Column:
    """Highest-random-weight (rendezvous) shard for a key: ``argmax over
    s in [0, n_shards) of md5(key || ':' || s || salt)`` — the
    MINIMAL-MOVE layout for shard-count growth.  The modulo layout
    (:func:`shard_assignments`) rehomes ~(1 − 1/lcm-ish) of ALL keys when
    n changes; under HRW a key moves only if one of the NEW shards wins
    its argmax, so growing n → n+m relocates exactly the expected
    m/(n+m) fraction, and every move lands ON a new shard — no old→old
    churn (property-pinned in tests; the classic Thaler–Ravishankar
    result).  Row-local: an argmax fold over an n_shards-literal array
    (the k-means inline-argmin idiom), no shuffle, exactly replayable in
    SQL.  Cost is O(n_shards) hashes per row — size it for shard COUNTS
    (files), not partition counts.
    """
    from spark_hadoop_automation_in_cloud_spark.functions.hashing import (
        md5_prefix_int,
    )

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    md5_prefix_int(
                        F.concat(key.cast("string"), F.lit(f":{s}")),
                        nhex=15,
                        salt=salt,
                    ).alias("w"),
                    F.lit(s).cast("int").alias("shard"),
                )
                for s in range(n_shards)
            ]
        )
    )
    return best["shard"]


def sql_rendezvous_shard(key_expr: str, n_shards: int, salt: str = ":hrw") -> str:
    """DuckDB twin of :func:`rendezvous_shard` — identical per-shard
    weights (the shared md5 integer prefix), argmax by (weight, shard)
    struct order like Spark's array_max."""
    from spark_hadoop_automation_in_cloud_spark.functions.hashing import (
        sql_md5_prefix_int,
    )

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    structs = ", ".join(
        "{'w': "
        + sql_md5_prefix_int(
            f"(CAST({key_expr} AS VARCHAR) || ':{s}')", nhex=15, salt=salt
        )
        + f", 'shard': {s}}}"
        for s in range(n_shards)
    )
    return f"CAST(list_max([{structs}]).shard AS INT)"
