"""Data-quality profiling: per-column health metrics in ONE aggregation
pass — the pipeline guardrail layer the reference lacks entirely (its only
defenses are scattered ``isNotNull`` filters, SURVEY §1.2).

Every metric is a conditional aggregate over the same scan, so profiling N
columns costs one job with map-side partial aggregation — at 100 TB this is
the same single-pass shape as any grouped count, not N table scans.  The
output is a tall (column, metric, value) frame: append it per run and alert
on deltas (row-count collapse, null-ratio spikes, cardinality drift).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Per column: null count, null ratio, distinct count — plus the table
    row count under the pseudo-column ``*``.

    Output: col_name, n_nulls, null_ratio (6dp), n_distinct, n_rows.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.round(F.col(f"__nulls_{c}") / F.col("__n"), 6).alias("null_ratio"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col("__n").alias("n_rows"),
            )
            for c in columns
        ]
    )
    return row.select(F.explode(per_col).alias("m")).select("m.*")


def distribution_drift_tv(
    df: DataFrame, bucket_col: str, cat_col: str
) -> DataFrame:
    """Per-bucket categorical drift vs the EARLIEST bucket, as total-
    variation distance — the distribution-shift monitor of a data-quality
    dashboard (did this week's event mix move away from the baseline?).

    TV = ½ Σ_cat |p_cat − q_cat| is computed ENTIRELY in integer
    arithmetic before one final division: with c = bucket count, N =
    bucket total, d = baseline count, M = baseline total,

        TV = Σ |c·M − d·N| / (2·N·M)

    so unlike a PSI/KL score there is no per-category log whose libm
    rounding could diverge across engines, and the Σ runs in exact
    DECIMAL(38,0) — the products reach count·total, which overflows a
    silent-wrapping int64 once both pass ~3e9 rows (a real bucket size at
    the 100 TB target), while decimal stays exact to 1e38 on both
    engines.  Order-independent, bit-identical in the DuckDB oracle.
    Categories missing from either side enter with count 0 (the grid is
    buckets × all categories).

    Scale shape: the input shuffles ONCE into (bucket, cat) counts;
    everything after — totals, the baseline slice, the bucket×category
    grid and its joins — operates on aggregate-sized frames (|buckets| ·
    |categories| rows).  Output: ``bucket_col``, n_rows (bucket size),
    tv_drift (round 6dp; the baseline bucket itself scores 0).

    ``cat_col`` must be non-null: a NULL category counts toward n_rows
    but its mass cannot re-enter through the equi-joined grid (NULL never
    equi-matches — identically on both engines, so parity would hide the
    silent drop).  Coalesce NULLs to a sentinel category, or filter them,
    before calling.
    """
    counts = df.groupBy(bucket_col, cat_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    totals = counts.groupBy(bucket_col).agg(F.sum("c").alias("n_rows"))
    base_b = counts.agg(F.min(bucket_col).alias("__bb"))
    base = (
        counts.join(F.broadcast(base_b), F.col(bucket_col) == F.col("__bb"))
        .select(F.col(cat_col).alias("__cat"), F.col("c").alias("d"))
    )
    base_total = base.agg(F.sum("d").alias("m_rows"))
    grid = totals.crossJoin(counts.select(cat_col).distinct())
    g = (
        grid.join(counts, [bucket_col, cat_col], "left")
        .join(F.broadcast(base), F.col(cat_col) == F.col("__cat"), "left")
        .crossJoin(F.broadcast(base_total))
    )
    dec = "decimal(38,0)"
    term = F.abs(
        F.coalesce(F.col("c"), F.lit(0)).cast(dec) * F.col("m_rows")
        - F.coalesce(F.col("d"), F.lit(0)).cast(dec) * F.col("n_rows")
    )
    return (
        g.groupBy(bucket_col, "n_rows", "m_rows")
        .agg(F.sum(term).alias("__num"))
        .select(
            bucket_col,
            F.col("n_rows"),
            F.round(
                F.col("__num").cast("double")
                / (F.lit(2.0) * F.col("n_rows") * F.col("m_rows")),
                6,
            ).alias("tv_drift"),
        )
    )


def sql_distribution_drift_tv(src: str, bucket_expr: str, cat_col: str, bucket_out: str) -> str:
    """DuckDB oracle twin of :func:`distribution_drift_tv` — identical
    integer numerator, identical final division and rounding."""
    return f"""
WITH rows_ AS (SELECT {bucket_expr} AS b, {cat_col} AS cat FROM {src}),
counts AS (SELECT b, cat, CAST(COUNT(*) AS BIGINT) AS c FROM rows_ GROUP BY 1, 2),
totals AS (SELECT b, CAST(SUM(c) AS BIGINT) AS n_rows FROM counts GROUP BY 1),
bb AS (SELECT MIN(b) AS bb FROM counts),
base AS (SELECT cat, c AS d FROM counts, bb WHERE b = bb),
mt AS (SELECT CAST(SUM(d) AS BIGINT) AS m_rows FROM base),
grid AS (SELECT t.b, t.n_rows, cats.cat
         FROM totals t CROSS JOIN (SELECT DISTINCT cat FROM counts) cats),
g AS (
  SELECT grid.b, grid.n_rows, m.m_rows,
         ABS(CAST(COALESCE(c.c, 0) AS DECIMAL(38,0)) * m.m_rows
             - CAST(COALESCE(ba.d, 0) AS DECIMAL(38,0)) * grid.n_rows)
           AS term
  FROM grid
  LEFT JOIN counts c ON c.b = grid.b AND c.cat = grid.cat
  LEFT JOIN base ba ON ba.cat = grid.cat
  CROSS JOIN mt m
)
SELECT b AS {bucket_out}, n_rows,
       round(CAST(SUM(term) AS DOUBLE) / (2.0 * n_rows * m_rows), 6) AS tv_drift
FROM g GROUP BY b, n_rows, m_rows
"""


def numeric_psi(
    df: DataFrame,
    group_cols: Sequence[str],
    seg_col: str,
    a_label: str,
    b_label: str,
    value_col: str,
    eps: float = 0.01,
) -> DataFrame:
    """Population Stability Index of a NUMERIC column between two segments,
    per group — the numeric half of the drift dashboard
    (:func:`distribution_drift_tv` covers the categorical half): did this
    group's value distribution move between segment ``a`` and segment
    ``b``?  PSI < 0.1 is the conventional "stable" line.

    Bins are the mergeable quantile sketch's integer bucket codes
    (``sketches.value_bucket`` at ``eps`` relative resolution) — log-scale
    equi-RESOLUTION bins that need no training pass, are identical across
    engines (pure integer arithmetic), and make the PSI of two runs
    comparable.  NULL/non-finite values carry no bin and drop (the sketch
    family's skip rule); rows outside the two segments are filtered.

    Laplace-smoothed shares over the group's bin UNION (B bins):
    ``p = (c_a + 0.5) / (n_a + 0.5·B)`` — a bin empty on one side
    contributes a finite term instead of an infinite log.  Each bin's
    ``(p − q)·ln(p/q)`` snaps to a 1e-9 integer grid before the exact
    sum (the engine's ln idiom), so the score is partition-order-
    independent and oracle-replayable.

    Scale shape: ONE shuffle into (group, bin) rows with conditional
    per-segment counts (map-side combined, bounded by groups × occupied
    bins); totals re-aggregate those rows; the term math is row-local.

    Output: group_cols..., n_bins (bigint), n_a, n_b (bigint),
    psi (double, 6dp).
    """
    from spark_hadoop_automation_in_cloud_spark.operators.sketches import (
        value_bucket,
    )

    gs = list(group_cols)
    seg = F.col(seg_col)
    b = value_bucket(F.col(value_col), eps)
    counts = (
        df.where(seg.isin(a_label, b_label))
        .withColumn("__bin", b)
        .where(F.col("__bin").isNotNull())
        .groupBy(*gs, "__bin")
        .agg(
            F.sum(F.when(seg == a_label, 1).otherwise(0)).cast("bigint").alias("ca"),
            F.sum(F.when(seg == b_label, 1).otherwise(0)).cast("bigint").alias("cb"),
        )
    )
    totals = counts.groupBy(*gs).agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
    )
    j = counts.join(F.broadcast(totals), gs)
    p = (F.col("ca").cast("double") + 0.5) / (
        F.col("na").cast("double") + 0.5 * F.col("n_bins").cast("double")
    )
    q = (F.col("cb").cast("double") + 0.5) / (
        F.col("nb").cast("double") + 0.5 * F.col("n_bins").cast("double")
    )
    term = F.round((p - q) * F.log(p / q) * 1_000_000_000).cast("bigint")
    return (
        j.select(*gs, "n_bins", "na", "nb", term.alias("__t"))
        .groupBy(*gs, "n_bins", "na", "nb")
        .agg(
            F.round(F.sum("__t").cast("double") / 1_000_000_000.0, 6).alias("psi")
        )
        .select(
            *gs,
            "n_bins",
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            "psi",
        )
    )


def sql_numeric_psi(
    src_sql: str,
    group_cols: Sequence[str],
    seg_expr: str,
    a_label: str,
    b_label: str,
    value_col: str,
    eps: float = 0.01,
) -> str:
    """DuckDB twin of :func:`numeric_psi`.  ``src_sql`` yields the input
    rows; ``seg_expr`` computes the segment label; identical bucket
    arithmetic, smoothing, and 1e-9 term grid."""
    from spark_hadoop_automation_in_cloud_spark.operators.sketches import (
        sql_value_bucket,
    )

    gs = ", ".join(group_cols)
    bucket = sql_value_bucket(value_col, eps)
    return f"""
WITH src AS ({src_sql}),
tagged AS (
  SELECT {gs}, ({seg_expr}) AS seg, {bucket} AS bin FROM src
),
counts AS (
  SELECT {gs}, bin,
         CAST(SUM(CASE WHEN seg = '{a_label}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN seg = '{b_label}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM tagged
  WHERE seg IN ('{a_label}', '{b_label}') AND bin IS NOT NULL
  GROUP BY {gs}, bin
),
totals AS (
  SELECT {gs}, CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
         CAST(COUNT(*) AS BIGINT) AS n_bins
  FROM counts GROUP BY {gs}
),
terms AS (
  SELECT c.*, t.na, t.nb, t.n_bins,
         CAST(round(
           ((CAST(c.ca AS DOUBLE) + 0.5) / (CAST(t.na AS DOUBLE) + 0.5 * CAST(t.n_bins AS DOUBLE))
            - (CAST(c.cb AS DOUBLE) + 0.5) / (CAST(t.nb AS DOUBLE) + 0.5 * CAST(t.n_bins AS DOUBLE)))
           * ln(((CAST(c.ca AS DOUBLE) + 0.5) / (CAST(t.na AS DOUBLE) + 0.5 * CAST(t.n_bins AS DOUBLE)))
                / ((CAST(c.cb AS DOUBLE) + 0.5) / (CAST(t.nb AS DOUBLE) + 0.5 * CAST(t.n_bins AS DOUBLE))))
           * 1000000000) AS BIGINT) AS t
  FROM counts c JOIN totals t USING ({gs})
)
SELECT {gs}, n_bins, na AS n_a, nb AS n_b,
       round(CAST(SUM(t) AS DOUBLE) / 1000000000.0, 6) AS psi
FROM terms
GROUP BY {gs}, n_bins, na, nb
"""


def ks_statistic(
    df: DataFrame,
    group_cols: Sequence[str],
    seg_col: str,
    a_label: str,
    b_label: str,
    value_col: str,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic of a numeric column
    between two segments, per group — the order-statistic complement to
    :func:`numeric_psi` (PSI sees binned mass shifts; KS catches a pure
    location/shape shift at full resolution and is the classic
    distribution-equality test a drift dashboard quotes a p-value from).

    ``KS = max_x |F_a(x) − F_b(x)|`` over the pooled distinct values,
    computed with an EXACT integer numerator: with cumulative counts
    ``A(x)``, ``B(x)`` and totals ``n_a``, ``n_b``,

        KS = max |A(x)·n_b − B(x)·n_a| / (n_a·n_b)

    so the max runs over exact DECIMAL(38,0) products (order-independent,
    no per-row float drift) and ONE final division produces the score —
    bit-identical in the DuckDB oracle.  NULL values drop; rows outside
    the two segments are filtered.

    Scale shape: ONE shuffle into (group, value) rows with conditional
    per-segment counts (map-side combined — ties collapse at the
    combiner); the cumulative sums AND the group totals both come from
    windows over that single partitioning (Spark chains the two Window
    specs over one exchange — no second scan, no rejoin; the grouped-
    window idiom q140's percentile calibration already uses: groups
    parallelize, nothing runs single-partition).  At petabyte per-group
    cardinalities, quantize values first (``sketches.value_bucket``) —
    the same statistic on the sketch grid — or read the PSI monitor
    instead; the exact form is the auditor's tool.

    Output: group_cols..., n_a, n_b (bigint), ks_stat (double, 6dp).
    """
    from pyspark.sql import Window

    gs = list(group_cols)
    seg = F.col(seg_col)
    counts = (
        df.where(seg.isin(a_label, b_label))
        .where(F.col(value_col).isNotNull())
        .groupBy(*gs, value_col)
        .agg(
            F.sum(F.when(seg == a_label, 1).otherwise(0)).cast("bigint").alias("ca"),
            F.sum(F.when(seg == b_label, 1).otherwise(0)).cast("bigint").alias("cb"),
        )
    )
    w = (
        Window.partitionBy(*gs)
        .orderBy(F.col(value_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dec = "decimal(38,0)"
    # totals ride a full-frame window over the SAME partitioning as the
    # cumulative window (one exchange, two chained Window operators — an
    # earlier form re-aggregated `counts` into a broadcast-joined totals
    # frame, re-deriving the whole input DAG a second time)
    tw = Window.partitionBy(*gs)
    cum = counts.select(
        *gs,
        F.sum("ca").over(w).cast(dec).alias("cum_a"),
        F.sum("cb").over(w).cast(dec).alias("cum_b"),
        F.sum("ca").over(tw).cast(dec).alias("n_a"),
        F.sum("cb").over(tw).cast(dec).alias("n_b"),
    )
    # Groups with either segment EMPTY are dropped (KS is undefined — the
    # division by n_a·n_b would hit zero, and Spark's Infinity vs the
    # oracle's division semantics could silently diverge): both engines
    # filter identically, so absence is the cross-engine answer.
    term = F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
    return (
        cum.where((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .groupBy(*gs, "n_a", "n_b")
        .agg(F.max(term).alias("__num"))
        .select(
            *gs,
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("__num").cast("double")
                / F.col("n_a").cast("double")
                / F.col("n_b").cast("double"),
                6,
            ).alias("ks_stat"),
        )
    )


def sql_ks_statistic(
    src_sql: str,
    group_cols: Sequence[str],
    seg_expr: str,
    a_label: str,
    b_label: str,
    value_col: str,
) -> str:
    """DuckDB twin of :func:`ks_statistic`: identical conditional counts,
    cumulative window, exact HUGEINT numerator and single final
    division; same degenerate-group filter."""
    gs = ", ".join(group_cols)
    return f"""
WITH src AS ({src_sql}),
tagged AS (
  SELECT {gs}, ({seg_expr}) AS seg, {value_col} AS v FROM src
),
counts AS (
  SELECT {gs}, v,
         CAST(SUM(CASE WHEN seg = '{a_label}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN seg = '{b_label}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM tagged
  WHERE seg IN ('{a_label}', '{b_label}') AND v IS NOT NULL
  GROUP BY {gs}, v
),
cum AS (
  SELECT {gs},
         CAST(SUM(ca) OVER (PARTITION BY {gs} ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cum_a,
         CAST(SUM(cb) OVER (PARTITION BY {gs} ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cum_b
  FROM counts
),
totals AS (
  SELECT {gs}, CAST(SUM(ca) AS HUGEINT) AS n_a, CAST(SUM(cb) AS HUGEINT) AS n_b
  FROM counts GROUP BY {gs}
  HAVING SUM(ca) > 0 AND SUM(cb) > 0
)
SELECT {gs},
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       round(CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS DOUBLE)
             / CAST(n_a AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS ks_stat
FROM cum JOIN totals USING ({gs})
GROUP BY {gs}, n_a, n_b
"""


def k_anonymity_report(
    df: DataFrame,
    qi_cols: Sequence[str],
    k_threshold: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination — the
    privacy gate a training corpus carrying user-derived records needs
    before release: a row whose QI combination is shared by fewer than
    ``k_threshold`` records is re-identifiable and must be suppressed
    or generalized.

    Reports the GROUP-SIZE HISTOGRAM, not the groups: one output row
    per distinct anonymity-set size ``k`` with how many QI groups and
    records sit at that size and whether that size falls below the
    threshold — the summary a release decision reads, without the
    report itself re-leaking the rare QI combinations it flags.

    Scale shape: two map-side-combined aggregates, each strictly
    smaller than its input (corpus → QI groups → size histogram);
    shares are one double division of exact bigints.  Output:
    k (bigint), n_groups, n_rows (bigint), suppressed (int 0/1),
    row_share (double 6dp), ordered by k.
    """
    groups = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("k"))
    hist = groups.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        (F.count(F.lit(1)) * F.col("k")).cast("bigint").alias("n_rows"),
    )
    total = hist.agg(F.sum("n_rows").alias("__tot"))
    return (
        hist.crossJoin(F.broadcast(total))
        .select(
            F.col("k").cast("bigint").alias("k"),
            "n_groups",
            "n_rows",
            F.when(F.col("k") < k_threshold, 1).otherwise(0).alias("suppressed"),
            F.round(F.col("n_rows").cast("double") / F.col("__tot"), 6).alias(
                "row_share"
            ),
        )
        .orderBy("k")
    )


def sql_k_anonymity_report(
    src_sql: str, qi_cols: Sequence[str], k_threshold: int = 5
) -> str:
    """DuckDB twin of :func:`k_anonymity_report`."""
    qi = ", ".join(qi_cols)
    return f"""
WITH groups AS (
  SELECT {qi}, COUNT(*) AS k FROM ({src_sql}) GROUP BY {qi}
),
hist AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(COUNT(*) * k AS BIGINT) AS n_rows
  FROM groups GROUP BY k
)
SELECT CAST(k AS BIGINT) AS k, n_groups, n_rows,
       CASE WHEN k < {k_threshold} THEN 1 ELSE 0 END AS suppressed,
       round(CAST(n_rows AS DOUBLE) / (SELECT SUM(n_rows) FROM hist), 6)
         AS row_share
FROM hist ORDER BY k
"""


def rolling_volume_anomaly(
    df: DataFrame,
    group_cols: Sequence[str],
    day_col: str,
    window_days: int = 7,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Daily-volume anomaly detection per group: each day's row count
    against a rolling z-score over the previous ``window_days`` days —
    the ingest monitor that catches a source going dark (z << 0) or a
    crawler loop flooding one partition (z >> 0) before either skews
    the training mix.  The ops-side sibling of the distribution
    monitors (PSI q146, KS q155): those watch WHAT arrives, this
    watches HOW MUCH.

    Exact arithmetic: daily counts are integers; the trailing window
    carries (n, Σx, Σx²) as exact sums and the sample variance uses
    the integer numerator ``n·Σx² − (Σx)²`` — z-scores come from ONE
    shared double recipe, engine-identical.  Only days with a FULL
    trailing window and nonzero variance report (both engines filter
    identically; a constant-volume history has no scale for surprise).

    Scale shape: the corpus collapses to (group, day) counts in one
    map-side-combined shuffle; the rolling window runs over that
    day-granular frame partitioned per group — bounded by days ×
    groups, never corpus-sized.

    Output: group_cols..., day (string yyyy-MM-dd), n (bigint),
    z (double 6dp), is_anomaly (int 0/1).
    """
    gs = list(group_cols)
    daily = df.groupBy(*gs, F.col(day_col).alias("__d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return zscore_from_daily(daily, gs, window_days, z_threshold)


def zscore_from_daily(
    daily: DataFrame,
    group_cols: Sequence[str],
    window_days: int = 7,
    z_threshold: float = 2.0,
    max_span_days: int = 3700,
) -> DataFrame:
    """The window half of :func:`rolling_volume_anomaly`, over an
    already-aggregated (group_cols..., __d, n) daily frame — exposed so
    the streaming-maintained daily-count index (q174) feeds the SAME
    kernel the batch monitor uses; daily counts are plain additive
    sums, so merged batch partitions are bit-identical to the one-shot
    aggregate and the two rows share one oracle.

    The daily frame DENSIFIES onto each group's observed calendar
    (min..max day, one row per day, zero-filled) before the window —
    a dark day emits NO aggregate row, and a ROWS frame over observed
    days only would silently skip it: the monitor could never fire on
    the outage it exists to catch (z << 0), and gaps would stretch
    "trailing 7 days" across arbitrary calendar spans.  The spine is
    |groups × calendar-span days|; because a single corrupt date (an
    epoch-1970 default, a year-9999 sentinel) would explode that span
    into decades of synthetic days, the kernel RAISES when any group's
    span exceeds ``max_span_days`` — a bounded check on the |groups|
    frame, the components-convergence fail-loud convention.  ``__d``
    must be a DATE (``sequence`` generates the spine); NULL group keys
    are one group (null-safe join — GROUP BY semantics, same as the
    pre-densification window partitioning)."""
    gs = list(group_cols)
    bounds = daily.groupBy(*gs).agg(
        F.min("__d").alias("__d0"), F.max("__d").alias("__d1")
    )
    worst = bounds.agg(
        F.max(F.datediff(F.col("__d1"), F.col("__d0"))).alias("__span")
    ).first()["__span"]
    if worst is not None and worst > max_span_days:
        raise ValueError(
            f"zscore_from_daily: a group spans {worst} days (> "
            f"{max_span_days}) — a corrupt date would densify into years "
            "of synthetic rows; clean the day domain or raise max_span_days"
        )
    spine = bounds.select(
        *gs, F.explode(F.sequence(F.col("__d0"), F.col("__d1"))).alias("__d")
    )
    cond = F.col("__sp.__d") == F.col("__ob.__d")
    for c in gs:
        cond = cond & F.col(f"__sp.{c}").eqNullSafe(F.col(f"__ob.{c}"))
    daily = (
        spine.alias("__sp")
        .join(daily.alias("__ob"), cond, "left")
        .select(
            *[F.col(f"__sp.{c}").alias(c) for c in gs],
            F.col("__sp.__d").alias("__d"),
            F.coalesce(F.col("__ob.n"), F.lit(0)).alias("n"),
        )
    )
    w = (
        Window.partitionBy(*gs)
        .orderBy(F.col("__d").asc())
        .rowsBetween(-window_days, -1)
    )
    dec = "decimal(38,0)"
    wd = F.lit(window_days).cast(dec)
    stats = daily.select(
        *gs,
        "__d",
        "n",
        F.count(F.lit(1)).over(w).alias("__wn"),
        F.sum("n").over(w).cast(dec).alias("__ws"),
        F.sum(F.col("n").cast(dec) * F.col("n").cast(dec)).over(w).alias("__wss"),
    )
    var_num = wd * F.col("__wss") - F.col("__ws") * F.col("__ws")
    mean = F.col("__ws").cast("double") / float(window_days)
    std = F.sqrt(
        var_num.cast("double") / float(window_days * (window_days - 1))
    )
    z = (F.col("n").cast("double") - mean) / std
    return (
        stats.where((F.col("__wn") == window_days) & (var_num > 0))
        .select(
            *gs,
            F.date_format(F.col("__d"), "yyyy-MM-dd").alias("day"),
            F.col("n").cast("bigint").alias("n"),
            (F.round(z, 6) + F.lit(0.0)).alias("z"),
            F.when(F.abs(z) > z_threshold, 1).otherwise(0).alias("is_anomaly"),
        )
    )


def sql_rolling_volume_anomaly(
    src_sql: str,
    group_cols: Sequence[str],
    day_expr: str,
    window_days: int = 7,
    z_threshold: float = 2.0,
) -> str:
    """DuckDB twin of :func:`rolling_volume_anomaly`: identical daily
    counts, the identical per-group calendar densification (dark days
    zero-fill — see the kernel docstring), trailing-window exact
    moments, variance numerator, and the one shared z recipe."""
    gs = list(group_cols)
    g = ", ".join(gs)
    gp = f"{g}, " if gs else ""
    gq = ", ".join(f"b.{c}" for c in gs)
    gqp = f"{gq}, " if gs else ""
    on = (
        " AND ".join(f"o.{c} IS NOT DISTINCT FROM b.{c}" for c in gs)
        or "TRUE"
    )
    group_by = f"GROUP BY {g}" if gs else ""
    part = f"PARTITION BY {g}" if gs else ""
    wd = window_days
    return f"""
WITH observed AS (
  SELECT {gp}{day_expr} AS d, COUNT(*) AS n FROM ({src_sql}) GROUP BY {gp}d
),
bounds AS (
  SELECT {gp}MIN(d) AS d0, MAX(d) AS d1 FROM observed {group_by}
),
daily AS (
  SELECT {gqp}CAST(s.sd AS DATE) AS d, COALESCE(o.n, 0) AS n
  FROM bounds b
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS sd) s
  LEFT JOIN observed o ON {on} AND o.d = CAST(s.sd AS DATE)
),
stats AS (
  SELECT {gp}d, n,
         COUNT(*) OVER ({part} ORDER BY d ASC
           ROWS BETWEEN {wd} PRECEDING AND 1 PRECEDING) AS wn,
         CAST(SUM(n) OVER ({part} ORDER BY d ASC
           ROWS BETWEEN {wd} PRECEDING AND 1 PRECEDING) AS HUGEINT) AS ws,
         CAST(SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) OVER ({part}
           ORDER BY d ASC ROWS BETWEEN {wd} PRECEDING AND 1 PRECEDING)
           AS HUGEINT) AS wss
  FROM daily
)
SELECT {gp}strftime(d, '%Y-%m-%d') AS day,
       CAST(n AS BIGINT) AS n,
       round((CAST(n AS DOUBLE) - CAST(ws AS DOUBLE) / {float(wd)})
             / sqrt(CAST({wd} * wss - ws * ws AS DOUBLE)
                    / {float(wd * (wd - 1))}), 6) + 0.0 AS z,
       CASE WHEN abs((CAST(n AS DOUBLE) - CAST(ws AS DOUBLE) / {float(wd)})
                     / sqrt(CAST({wd} * wss - ws * ws AS DOUBLE)
                            / {float(wd * (wd - 1))})) > {z_threshold}
            THEN 1 ELSE 0 END AS is_anomaly
FROM stats
WHERE wn = {wd} AND {wd} * wss - ws * ws > 0
"""
