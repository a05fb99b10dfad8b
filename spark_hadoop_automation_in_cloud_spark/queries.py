"""Query registry: every implemented operator exposed as a (Spark callable,
DuckDB oracle SQL) pair over the driver's synthetic tables.

This is the correctness surface the driver checks (``__spark_entry__.py``
re-exports it).  Each entry maps a SURVEY §2 operator (or §7.3-step-9
extension) onto ``/root/testdata/sf*/`` tables; the oracle SQL computes the
identical result in DuckDB.

Cross-engine determinism rules applied throughout:
- every aggregate / computed column is aliased identically on both sides;
- double-typed sums go through DECIMAL (exact, order-independent) and are
  cast back to double;
- every ranking has a unique tiebreaker;
- raw transcendental outputs (distances, similarities) are rounded before
  comparison so libm last-ulp differences cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.functions import geo, hashing
from spark_hadoop_automation_in_cloud_spark.functions.timeutils import epoch_us
from spark_hadoop_automation_in_cloud_spark.io import read_table
from spark_hadoop_automation_in_cloud_spark.operators import changes as chg
from spark_hadoop_automation_in_cloud_spark.operators import topk as topk_ops
from spark_hadoop_automation_in_cloud_spark.operators.nearest import nearest_neighbor_agg
from spark_hadoop_automation_in_cloud_spark.operators.rollup import weekly_with_month_window


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None → non-SQL-expressible (driver does rows-only check)
    doc: str = ""


_REGISTRY: list[QuerySpec] = []


def register(name: str, sql: str | None, doc: str = ""):
    def deco(fn):
        _REGISTRY.append(QuerySpec(name, fn, sql, doc))
        return fn

    return deco


# WINDOW NOTE FIRST — read this before touching _ROTATE_FIRST.
#
# ROUND NUMBERING: the driver's counter restarted after r05 (see
# memory/driver-round-numbering).  CORRECTNESS_r10 landed 2026-08-18,
# 50/50 tri-green, exactly on the previous allocation (26 changed +
# q204 + the oldest 23).  This file now allocates the NEXT
# verification, CORRECTNESS_r11.
#
# THE ALLOCATION IS GENERATED, NOT HAND-TRANSCRIBED (r08 verdict item
# 1): the tuple below is the verbatim output of
#
#   python tools/stamps.py --emit q39_neardup_clusters,\
#     q40_corpus_curation,q69_pagerank,q96_kmeans_clusters,\
#     q107_semantic_cluster_dedup,q116_cluster_canonicals_by_quality,\
#     q124_leakage_safe_split,q128_incremental_components,\
#     q132_incremental_cluster_maintenance,q143_dedup_audit,\
#     q185_personalized_pagerank,q187_exact_substring_dedup,\
#     q188_copurchase_communities,q189_community_modularity,\
#     q196_community_name_neardup,q197_quality_filter_distillation,\
#     q198_distilled_filter_rates,q201_curated_mix_funnel,\
#     q202_doremi_mixture_weights,q205_learned_mix_funnel
#
# where the --emit argument is the round's CHANGED-KERNEL list — the
# one input not derivable from artifacts.  This is OPTIMIZATION round
# 2 of 2 (see OPTIMIZATION_r11.md); its changed kernels:
#   - q69/q185: the co-purchase prologue re-spreads the 1-partition
#     checkpointed distinct before the pair fanout (2.51 s -> 0.87 s),
#     and pagerank/PPR chain rounds lazily between lineage cuts
#     (small_checkpoint_every=2 on dangling-free broadcast paths;
#     bit-equal, 51->46 / 53->48 scheduler jobs);
#   - q188/q189/q196: LPA's per-round label-update join (a row-wise
#     no-op on the internally symmetric edge list) is removed and
#     rounds chain at cadence 2 (bit-equal, trajectory-test-pinned);
#   - q39/q40/q116/q124/q128/q132/q143: connected_components' per-round
#     changed-labels join became an exact monotone label-sum probe
#     (same convergence decisions by monotonicity);
#   - q96/q107: kmeans_assign floors per-task work (corpus coalesced to
#     ceil(cells/min_cells_per_task), capped at the existing partition
#     count — 3.48 -> 2.14 / 4.39 -> 2.91 s, row-identical);
#   - q187: exact_substring_dedup applies removals ROW-LOCALLY after a
#     per-doc removal-set aggregate (token-grain anti-join +
#     collect_list re-assembly gone; shuffle records 2.3x down);
#   - q197/q198/q201/q202/q205: exp_gradient_weights runs the WHOLE
#     reweight trajectory as one chained-fold query (was one query per
#     round; property-pinned vs the DuckDB chain), _gd_loop
#     backtick-quotes interpolated names (plain identifiers parse
#     identically), and q201/q205 fuse their readout collects.
# The ledger remains OVERSUBSCRIBED (83 age>=2 rows spill), so the
# window is 20 changed + the oldest 30 (r06 rows in registration
# order); leftover r06/r07 rows MUST lead the next round — re-run
# stamps.py --emit then.  All left-out rows are sf0.001-parity-green on
# HEAD via tests/test_oracle_parity.py (every run) and sf0.01-green in
# this round's full sweep.
#
# The driver's CORRECTNESS run verifies a bounded window (50 entries)
# taken in registration order, so queries() exposes the registry ROTATED
# per the allocation above.  Local pytest parity
# (tests/test_oracle_parity.py) still covers every registered query
# regardless of position.
_ROTATE_FIRST: tuple[str, ...] = (
    # --- changed kernel this round
    "q39_neardup_clusters",  # r10
    "q40_corpus_curation",  # r10
    "q69_pagerank",  # r10
    "q96_kmeans_clusters",  # r06
    "q107_semantic_cluster_dedup",  # r09
    "q116_cluster_canonicals_by_quality",  # r10
    "q124_leakage_safe_split",  # r10
    "q128_incremental_components",  # r10
    "q132_incremental_cluster_maintenance",  # r10
    "q143_dedup_audit",  # r10
    "q185_personalized_pagerank",  # r10
    "q187_exact_substring_dedup",  # r08
    "q188_copurchase_communities",  # r10
    "q189_community_modularity",  # r10
    "q196_community_name_neardup",  # r10
    "q197_quality_filter_distillation",  # r10
    "q198_distilled_filter_rates",  # r10
    "q201_curated_mix_funnel",  # r10
    "q202_doremi_mixture_weights",  # r10
    "q205_learned_mix_funnel",  # r10
    # --- oldest stamped rows (stamp round asc, registration order)
    "q71_map_explode",  # r06
    "q72_conversion_funnel",  # r06
    "q73_retention_cohorts",  # r06
    "q74_scd2_intervals",  # r06
    "q79_growth_accounting",  # r06
    "q80_next_event_features",  # r06
    "q89_session_intervals",  # r06
    "q95_containment_dups",  # r06
    "q108_incremental_dedup",  # r06
    "q111_streaming_incremental_dedup",  # r06
    "q112_token_budget_selection",  # r06
    "q113_incremental_minhash_dedup",  # r06
    "q115_frame_sampling",  # r06
    "q117_upsert_replay",  # r06
    "q118_repeated_span_coverage",  # r06
    "q119_ann_ivf_persisted",  # r06
    "q120_quality_threshold_for_budget",  # r06
    "q121_event_mix_drift",  # r06
    "q122_projected_rerank_topk",  # r06
    "q123_stratified_sample",  # r06
    "q125_mixture_budget_selection",  # r06
    "q126_heavy_hitter_parts",  # r06
    "q127_curation_funnel",  # r06
    "q129_weighted_sample",  # r06
    "q130_per_source_quality_cut",  # r06
    "q131_source_overlap_matrix",  # r06
    "q12_active_user_segments",  # r07
    "q13_order_priority_sets",  # r07
    "q15_top_parts_global",  # r07
    "q18_zone_activity",  # r07
)


def specs() -> list[QuerySpec]:
    rotated = set(_ROTATE_FIRST)
    by_name = {s.name: s for s in _REGISTRY}
    first = [by_name[n] for n in _ROTATE_FIRST if n in by_name]
    return first + [s for s in _REGISTRY if s.name not in rotated]


# --- helpers ----------------------------------------------------------------

DEC = "decimal(38,0)"  # exact, order-independent accumulator


def dsum(col: str) -> F.Column:
    """Sum an exact-2-decimal double column (money) exactly: integer cents
    into a DECIMAL accumulator, back to double at the end.  Order-independent
    and bit-identical across engines (plain double sums are neither)."""
    cents = F.round(F.col(col) * 100).cast("bigint")
    return (F.sum(cents.cast(DEC)).cast("double") / 100.0)


def sql_dsum(expr: str) -> str:
    return (
        f"CAST(SUM(CAST(CAST(round(({expr}) * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE)"
        " / 100.0"
    )


# City dimension derived deterministically from `nation` (testdata has no
# geo dim — FIXTURES.md §B note): city_id = n_nationkey, synthetic coords.
def city_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = read_table(spark, sf_dir, "nation")
    return n.select(
        F.col("n_nationkey").cast("int").alias("city_id"),
        F.col("n_name").alias("city_name"),
        geo.synth_city_lat(F.col("n_nationkey")).alias("city_lat"),
        geo.synth_city_lon(F.col("n_nationkey")).alias("city_lon"),
        # integer UTC offset standing in for the reference's tz name column
        (F.col("n_nationkey").cast("bigint") % 27 - 12).cast("int").alias("tz_offset_hours"),
    )


SQL_CITY_DIM = f"""
SELECT CAST(n_nationkey AS INT) AS city_id,
       n_name AS city_name,
       {geo.SQL_CITY_LAT.format(k="n_nationkey")} AS city_lat,
       {geo.SQL_CITY_LON.format(k="n_nationkey")} AS city_lon,
       CAST(n_nationkey % 27 - 12 AS INT) AS tz_offset_hours
FROM nation
"""

# Events with synthetic coordinates (the geo fact table).  parallelize=True:
# every consumer fans out per row (×n_cities 1-NN candidates), so the
# single-row-group scan must not stay a single task.
def geo_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events", parallelize=True)
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        "value",
        geo.synth_event_lat(F.col("user_id"), F.col("event_id")).alias("lat"),
        geo.synth_event_lon(F.col("user_id"), F.col("event_id")).alias("lon"),
    )


SQL_GEO_EVENTS = f"""
SELECT event_id, user_id, event_type, ts, value,
       {geo.SQL_EVENT_LAT.format(u="user_id", e="event_id")} AS lat,
       {geo.SQL_EVENT_LON.format(u="user_id", e="event_id")} AS lon
FROM events
"""

# Nearest-city assignment as a SQL CTE (oracle side of J2): rank cities per
# event by (distance, city_id), keep rank 1.
SQL_NEAREST = f"""
WITH city AS ({SQL_CITY_DIM}),
ev AS ({SQL_GEO_EVENTS}),
cand AS (
  SELECT ev.*, city.city_id, city.city_name, city.tz_offset_hours,
         {geo.SQL_HAVERSINE.format(lat1="ev.lat", lon1="ev.lon", lat2="city.city_lat", lon2="city.city_lon")} AS dist,
         row_number() OVER (PARTITION BY ev.event_id ORDER BY
           {geo.SQL_HAVERSINE.format(lat1="ev.lat", lon1="ev.lon", lat2="city.city_lat", lon2="city.city_lon")} ASC,
           city.city_id ASC) AS rnk
  FROM ev CROSS JOIN city
)
SELECT * FROM cand WHERE rnk = 1
"""


def nearest_city_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event with its nearest city attached (shared building block)."""
    ev = geo_events(spark, sf_dir)
    return nearest_neighbor_agg(
        ev,
        city_dim(spark, sf_dir),
        fact_keys=["event_id", "user_id", "event_type", "ts", "value", "lat", "lon"],
        fact_lat="lat",
        fact_lon="lon",
        dim_id="city_id",
        dim_lat="city_lat",
        dim_lon="city_lon",
        dim_payload=["city_name", "tz_offset_hours"],
    )


# ============================================================================
# Scans / projections / aggregations (SURVEY §2.1, §2.2, §2.4)
# ============================================================================


@register(
    "q01_pricing_summary",
    """
WITH cents AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity) AS BIGINT)            AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(round(l_discount * 100) AS BIGINT)      AS disc_c,
         CAST(round(l_tax * 100) AS BIGINT)           AS tax_c
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
)
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(qty AS DECIMAL(38,0))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(price_c AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(SUM(CAST(price_c * (100 - disc_c) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(SUM(CAST(price_c * (100 - disc_c) * (100 + tax_c) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sum_charge,
       CAST(SUM(CAST(qty AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(price_c AS DECIMAL(38,0))) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
       CAST(SUM(CAST(disc_c AS DECIMAL(38,0))) AS DOUBLE) / 100.0 / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM cents
GROUP BY l_returnflag, l_linestatus
""",
    doc="Flagship scan→filter→hash-aggregate (A1/P1/P2; TPC-H Q1 shape). "
    "Money columns are exact 2-decimal values, so sums run on integer "
    "cents inside exact DECIMAL accumulators: order-independent, "
    "bit-identical across engines, overflow-safe at 100 TB. Filter pushes "
    "to the parquet scan; partial aggregation combines map-side.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    f = l.where(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
    qty = F.round(F.col("l_quantity")).cast("bigint")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_c = F.round(F.col("l_discount") * 100).cast("bigint")
    tax_c = F.round(F.col("l_tax") * 100).cast("bigint")
    big = "decimal(38,0)"
    n = F.count(F.lit(1))
    return (
        f.select(
            "l_returnflag",
            "l_linestatus",
            qty.alias("qty"),
            price_c.alias("price_c"),
            disc_c.alias("disc_c"),
            tax_c.alias("tax_c"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("qty").cast(big)).cast("double").alias("sum_qty"),
            (F.sum(F.col("price_c").cast(big)).cast("double") / 100.0).alias("sum_base_price"),
            (
                F.sum((F.col("price_c") * (100 - F.col("disc_c"))).cast(big)).cast("double")
                / 10000.0
            ).alias("sum_disc_price"),
            (
                F.sum(
                    (F.col("price_c") * (100 - F.col("disc_c")) * (100 + F.col("tax_c"))).cast(big)
                ).cast("double")
                / 1000000.0
            ).alias("sum_charge"),
            (F.sum(F.col("qty").cast(big)).cast("double") / n).alias("avg_qty"),
            (F.sum(F.col("price_c").cast(big)).cast("double") / 100.0 / n).alias("avg_price"),
            (F.sum(F.col("disc_c").cast(big)).cast("double") / 100.0 / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "q02_regional_revenue",
    f"""
SELECT r_name AS region_name, n_name AS nation_name,
       COUNT(*) AS order_cnt,
       {sql_dsum("o_totalprice")} AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderstatus <> 'F'
GROUP BY r_name, n_name
""",
    doc="Multi-way star join (J5) + grouped agg. nation/region broadcast; "
    "orders⋈customer shuffles on the key once.",
)
def q02_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") != "F")
    c = read_table(spark, sf_dir, "customer")
    n = F.broadcast(read_table(spark, sf_dir, "nation"))
    r = F.broadcast(read_table(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(F.count(F.lit(1)).alias("order_cnt"), dsum("o_totalprice").alias("revenue"))
    )


@register(
    "q03_top_order_per_customer",
    """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate
FROM ranked WHERE rnk = 1
""",
    doc="Top-1-per-group via row_number (W1/O2) with deterministic tiebreak.",
)
def q03_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"
    )
    return topk_ops.topk_per_group(
        o,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=1,
    )


@register(
    "q04_customers_without_orders",
    """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    doc="Left-anti join (J7).",
)
def q04_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "q05_nearest_city",
    f"""
WITH best AS ({SQL_NEAREST})
SELECT event_id, user_id, city_id, city_name,
       round(dist, 4) AS distance_km
FROM best
""",
    doc="Spatial 1-NN assignment (J1/J2/W1): broadcast nested-loop join + "
    "map-side min_by — the fact table is never shuffled in full width.",
)
def q05_nearest_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    ne = nearest_city_events(spark, sf_dir)
    return ne.select(
        "event_id",
        "user_id",
        "city_id",
        "city_name",
        F.round("distance_km", 4).alias("distance_km"),
    )


@register(
    "q06_event_rollup",
    """
WITH weekly AS (
  SELECT event_type,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
         CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
         COUNT(*) AS week_cnt
  FROM events
  GROUP BY 1, 2, 3
)
SELECT event_type, week, month, week_cnt,
       CAST(SUM(week_cnt) OVER (PARTITION BY event_type, month) AS BIGINT) AS month_cnt
FROM weekly
""",
    doc="Week/month rollup (A1/A4/W5): grouped count + unbounded window sum, "
    "the reference Q2 shape (collector.py:668-674).",
)
def q06_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return weekly_with_month_window(
        e, ["event_type"], "ts", count_alias="week_cnt", month_alias="month_cnt"
    )


@register(
    "q07_event_dedup",
    """
SELECT user_id, event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       MIN(event_id) AS first_event_id, COUNT(*) AS n_dups
FROM events
GROUP BY 1, 2, 3
""",
    doc="Dedup-by-key-subset (P7) made deterministic: keep min id per key "
    "instead of dropDuplicates' arbitrary row.",
)
def q07_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return (
        e.withColumn("day", F.date_trunc("day", F.col("ts")))
        .groupBy("user_id", "event_type", "day")
        .agg(F.min("event_id").alias("first_event_id"), F.count(F.lit(1)).alias("n_dups"))
    )


@register(
    "q08_conditional_enrichment",
    """
SELECT event_id, user_id,
       COALESCE(NULLIF(event_type, 'error'), 'recovered') AS effective_type,
       CASE WHEN value >= 50 THEN 'high' ELSE 'low' END AS value_band,
       round(CAST(value AS DOUBLE) / 100.0, 6) AS value_norm
FROM events
WHERE user_id IS NOT NULL
""",
    doc="COALESCE fallback + conditional column (P5/P6) + null guard (P2).",
)
def q08_conditional_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    return e.select(
        "event_id",
        "user_id",
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("recovered")).alias(
            "effective_type"
        ),
        F.when(F.col("value") >= 50, "high").otherwise("low").alias("value_band"),
        F.round(F.col("value").cast("double") / 100.0, 6).alias("value_norm"),
    )


@register(
    "q09_user_sessions",
    """
WITH seq AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN prev_type IS NULL OR event_type <> prev_type THEN 1 ELSE 0 END) AS BIGINT) AS n_type_changes
FROM seq
GROUP BY user_id
""",
    doc="Lag-based change detection (W4, travel-detection shape).",
)
def q09_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    marked = chg.detect_changes(e, "user_id", "ts", "event_type", "event_id", "is_change")
    return marked.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("is_change").cast("bigint").alias("n_type_changes"),
    )


@register(
    "q10_first_last_value",
    """
WITH f AS (
  SELECT user_id, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)  AS rnk_first,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rnk_last
  FROM events
)
SELECT a.user_id,
       a.ts AS first_ts, round(a.value, 6) AS first_value,
       b.ts AS last_ts,  round(b.value, 6) AS last_value
FROM f a JOIN f b ON a.user_id = b.user_id
WHERE a.rnk_first = 1 AND b.rnk_last = 1
""",
    doc="First/last-per-group endpoints (W2/W3) via min_by/max_by with "
    "struct tiebreak — single shuffle, map-side combine.",
)
def q10_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.round(
            F.min_by(F.col("value"), F.struct(F.col("ts"), F.col("event_id"))), 6
        ).alias("first_value"),
        F.max("ts").alias("last_ts"),
        F.round(
            F.max_by(F.col("value"), F.struct(F.col("ts"), F.col("event_id"))), 6
        ).alias("last_value"),
    )


@register(
    "q11_travel_history",
    """
WITH best AS (%s),
seq AS (
  SELECT user_id, event_id, ts, city_name,
         lag(city_name) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_city
  FROM best
),
travels AS (
  SELECT user_id, ts, event_id, city_name
  FROM seq WHERE prev_city IS NULL OR city_name <> prev_city
)
SELECT user_id,
       COUNT(*) AS travel_count,
       string_agg(city_name, ',' ORDER BY ts, event_id) AS travel_list
FROM travels
GROUP BY user_id
"""
    % SQL_NEAREST,
    doc="Q1-datamart travel core: nearest city per event → lag change "
    "detection → ordered collect_list (A2/A3, made deterministic via "
    "sort keys; emitted as CSV string for cross-engine comparison).",
)
def q11_travel_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ne = nearest_city_events(spark, sf_dir)
    marked = chg.detect_changes(ne, "user_id", "ts", "city_name", "event_id", "is_change")
    travels = marked.where(F.col("is_change") == 1)
    return travels.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("travel_count"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("city_name")))
                ),
                lambda s: s["city_name"],
            ),
            ",",
        ).alias("travel_list"),
    )


@register(
    "q12_active_user_segments",
    """
SELECT c_mktsegment AS segment, COUNT(*) AS n_customers
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
GROUP BY c_mktsegment
""",
    doc="Left-semi join (complement of J7's anti; SURVEY notes semi absent "
    "in reference — first-class here).",
)
def q12_active_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "q13_order_priority_sets",
    """
SELECT 'urgent_only' AS label, COUNT(*) AS n FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
)
UNION ALL
SELECT 'urgent_and_low' AS label, COUNT(*) AS n FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
)
""",
    doc="Set operators union/intersect/except (SURVEY §2.7: absent in the "
    "reference, first-class here).",
)
def q13_order_priority_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    low = o.where(F.col("o_orderpriority") == "5-LOW").select("o_custkey").distinct()
    a = urgent.exceptAll(low).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("urgent_only").alias("label"), "n"
    )
    b = urgent.intersect(low).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("urgent_and_low").alias("label"), "n"
    )
    return a.unionByName(b)


@register(
    "q14_local_time",
    f"""
WITH best AS ({SQL_NEAREST})
SELECT event_id, user_id, city_id,
       ts + tz_offset_hours * INTERVAL 1 HOUR AS local_ts
FROM best
""",
    doc="Per-row timezone shift (reference from_utc_timestamp with a column "
    "tz, collector.py:361-366; offset-hours dim keeps the oracle exact).",
)
def q14_local_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ne = nearest_city_events(spark, sf_dir)
    return ne.select(
        "event_id",
        "user_id",
        "city_id",
        (
            F.col("ts")
            + F.make_interval(hours=F.col("tz_offset_hours"))
        ).alias("local_ts"),
    )


@register(
    "q15_top_parts_global",
    """
SELECT p_partkey, p_name, p_retailprice
FROM part
ORDER BY p_retailprice DESC, p_partkey ASC
LIMIT 25
""",
    doc="Global sort + limit (O1/O3) — TakeOrderedAndProject, no full sort "
    "at scale.",
)
def q15_top_parts_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    return (
        p.select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey").asc())
        .limit(25)
    )


# ============================================================================
# Datamart composites (SURVEY §3.4 Q1/Q2/Q3)
# ============================================================================

from spark_hadoop_automation_in_cloud_spark.plans.activity_rollup import (  # noqa: E402
    require_all_classes,
    zone_week_month_rollup,
)
from spark_hadoop_automation_in_cloud_spark.plans.demographics import (  # noqa: E402
    user_demographics,
)
from spark_hadoop_automation_in_cloud_spark.plans.recommendations import (  # noqa: E402
    friend_recommendations,
)

EVENT_CLASSES = ("click", "view", "purchase", "signup")

# Latest position per user (rank desc by ts, event_id) as a SQL CTE.
SQL_LAST_POS = f"""
ranked_pos AS (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rnk
  FROM events
),
last_pos AS (
  SELECT user_id,
         {geo.SQL_EVENT_LAT.format(u="user_id", e="event_id")} AS lat,
         {geo.SQL_EVENT_LON.format(u="user_id", e="event_id")} AS lon
  FROM ranked_pos WHERE rnk = 1
)
"""


@register(
    "q16_friend_recommendations",
    f"""
WITH subs AS (
  SELECT DISTINCT user_id,
         CAST(json_extract_string(props, '$.k') AS INT) % 20 AS channel
  FROM events WHERE event_type = 'signup'
),
cand AS (
  SELECT DISTINCT a.user_id AS left_user_id, b.user_id AS right_user_id
  FROM subs a JOIN subs b
    ON a.channel = b.channel AND a.user_id < b.user_id
),
contact_src AS (
  SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, user_id
  FROM events WHERE event_type = 'purchase'
),
contacts AS (
  SELECT DISTINCT least(a.user_id, b.user_id) AS ua, greatest(a.user_id, b.user_id) AS ub
  FROM contact_src a JOIN contact_src b ON a.k = b.k AND a.user_id <> b.user_id
),
{SQL_LAST_POS},
pairs AS (
  SELECT c.left_user_id, c.right_user_id,
         {geo.SQL_HAVERSINE.format(lat1="p1.lat", lon1="p1.lon", lat2="p2.lat", lon2="p2.lon")} AS dist
  FROM cand c
  JOIN last_pos p1 ON c.left_user_id = p1.user_id
  JOIN last_pos p2 ON c.right_user_id = p2.user_id
  WHERE NOT EXISTS (
    SELECT 1 FROM contacts x
    WHERE x.ua = c.left_user_id AND x.ub = c.right_user_id
  )
)
SELECT left_user_id, right_user_id, round(dist, 4) AS distance_km
FROM pairs WHERE dist <= 500
""",
    doc="Q3 datamart composite: self equi-join pair generation (J6) + "
    "canonical-pair anti join (J7) + distance-threshold join (J9). "
    "Channel/contact keys come from the JSON props column "
    "(get_json_object — the raw layer the reference's upstream parsed).",
)
def q16_friend_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-row JSON extraction + self-join fanout → don't leave the
    # unsplittable scan single-task
    e = read_table(spark, sf_dir, "events", parallelize=True)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    subs = e.where(F.col("event_type") == "signup").select(
        "user_id", (k % 20).alias("channel")
    )
    contact_src = e.where(F.col("event_type") == "purchase").select(
        k.alias("k"), "user_id"
    )
    # "in contact" = shares a purchase key — pass the membership relation
    # itself; the plan tests key-set overlap per candidate instead of
    # materializing the quadratic contact-pair list (exclude_pairs_by_
    # shared_key). Semantics identical to the pair-join + anti-join form.
    last_pos = (
        geo_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.max_by(
                F.struct(F.col("lat"), F.col("lon")),
                F.struct(F.col("ts"), F.col("event_id")),
            ).alias("__p")
        )
        .select("user_id", F.col("__p.lat").alias("lat"), F.col("__p.lon").alias("lon"))
    )
    return friend_recommendations(
        subs, None, last_pos, max_km=500.0, contact_memberships=contact_src
    )


@register(
    "q17_user_demographics",
    f"""
WITH best AS ({SQL_NEAREST}),
latest AS (
  SELECT user_id, city_name AS act_city,
         ts + tz_offset_hours * INTERVAL 1 HOUR AS local_ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rnk
  FROM best
),
seq AS (
  SELECT user_id, event_id, ts, city_name,
         lag(city_name) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_city
  FROM best
),
travels AS (
  SELECT user_id, ts, event_id, city_name,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM seq WHERE prev_city IS NULL OR city_name <> prev_city
),
history AS (
  SELECT user_id, COUNT(*) AS travel_count,
         string_agg(city_name, ',' ORDER BY ts, event_id) AS travel_list
  FROM travels GROUP BY user_id
),
home_ranked AS (
  SELECT user_id, city_name,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rnk
  FROM travels WHERE date_diff('day', CAST(ts AS DATE), CAST(next_ts AS DATE)) > 7
)
SELECT l.user_id, l.act_city,
       COALESCE(h.city_name, 'Couldn''t determine') AS home_city,
       hist.travel_count, hist.travel_list, l.local_ts
FROM latest l
LEFT JOIN history hist ON l.user_id = hist.user_id
LEFT JOIN home_ranked h ON l.user_id = h.user_id AND h.rnk = 1
WHERE l.rnk = 1
""",
    doc="Q1 datamart composite: actual city (latest event), home city "
    "(latest stay > 7 days), ordered travel history, per-row tz-shifted "
    "local time — reference collector.py:378-560 semantics with "
    "deterministic ordering.",
)
def q17_user_demographics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_demographics(nearest_city_events(spark, sf_dir), min_stay_days=7)


def _sql_rollup_branch(t: str) -> str:
    return f"""
SELECT city_id AS zone_id,
       CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
       CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
       COUNT(*) AS week_{t}
FROM best WHERE event_type = '{t}'
GROUP BY 1, 2, 3
"""


@register(
    "q18_zone_activity",
    f"""
WITH best AS ({SQL_NEAREST}),
{", ".join(f'''b_{t} AS (
  SELECT zone_id, week, month, week_{t},
         CAST(SUM(week_{t}) OVER (PARTITION BY zone_id, month) AS BIGINT) AS month_{t}
  FROM ({_sql_rollup_branch(t)})
)''' for t in EVENT_CLASSES)}
SELECT b_click.zone_id, b_click.week, b_click.month,
       week_click, month_click, week_view, month_view,
       week_purchase, month_purchase, week_signup, month_signup
FROM b_click
JOIN b_view     USING (zone_id, week, month)
JOIN b_purchase USING (zone_id, week, month)
JOIN b_signup   USING (zone_id, week, month)
""",
    doc="Q2 datamart composite: per-zone week/month rollup of 4 event "
    "classes with month totals windowed onto week rows, inner-join "
    "parity semantics (collector.py:819-823). Spark side runs the "
    "single-pass pivot form (1 shuffle) instead of 4 aggs + 3 joins.",
)
def q18_zone_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ez = nearest_city_events(spark, sf_dir).withColumnRenamed("city_id", "zone_id")
    piv = zone_week_month_rollup(ez, EVENT_CLASSES)
    out = require_all_classes(piv, EVENT_CLASSES)
    cols = ["zone_id", "week", "month"]
    for t in EVENT_CLASSES:
        cols += [f"week_{t}", f"month_{t}"]
    return out.select(*cols)


# ============================================================================
# Training-data pipeline extensions (SURVEY §7.3 step 9): dedup, similarity,
# text analysis over documents/embeddings
# ============================================================================

from spark_hadoop_automation_in_cloud_spark.operators import dedup as dd  # noqa: E402
from spark_hadoop_automation_in_cloud_spark.operators import textops as tx  # noqa: E402
from spark_hadoop_automation_in_cloud_spark.operators.similarity import (  # noqa: E402
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_topk,
    quantize_embeddings,
    sql_ann_ivf_topk,
    sql_ann_lsh_topk,
    sql_cosine_topk,
    sql_quantize_embeddings,
)


@register(
    "q20_exact_dedup",
    dd.SQL_EXACT_DEDUP.format(t="text", i="doc_id", src="documents"),
    doc="Exact dedup: md5 content-hash groups, canonical = min doc_id. "
    "One shuffle on the hash with map-side combine.",
)
def q20_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return dd.exact_dedup_groups(d, "doc_id", "text")


_SHINGLE_SQL = dd.sql_shingle_rows("documents", "doc_id", "text", n=2)


@register(
    "q21_minhash_lsh_pairs",
    dd.sql_lsh_candidate_pairs(dd.sql_minhash_signatures(_SHINGLE_SQL)),
    doc="MinHash+LSH near-dup candidates: 2-word shingles → 16 portable "
    "minhash permutations in ONE aggregation pass → 4 LSH bands → "
    "equi-join on band key. The scale path for dedup at 100 TB "
    "(shuffle-bounded, no quadratic blowup outside colliding buckets).",
)
def q21_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    sh = dd.shingle_rows(d, "doc_id", "text", n=2)
    return dd.lsh_candidate_pairs(dd.minhash_signatures(sh))


@register(
    "q22_ngram_jaccard_dups",
    dd.sql_jaccard_pairs(_SHINGLE_SQL, min_jaccard=0.35),
    doc="Exact 2-gram Jaccard similarity via LOSSLESS prefix filtering "
    "(PPJoin): the inverted-index self-join runs only on each doc's "
    "rarest n-ceil(t*n)+1 shingles, then candidates are verified with "
    "an exact intersection count — identical output to the naive full "
    "index (the oracle runs the naive form; a property test pins the "
    "equivalence) with fan-out bounded by PREFIX document frequency.",
)
def q22_ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    sh = dd.shingle_rows(d, "doc_id", "text", n=2)
    return dd.jaccard_pairs_prefix(sh, min_jaccard=0.35)


@register(
    "q23_simhash",
    dd.sql_simhash("documents", "doc_id", "text"),
    doc="Weighted 60-bit SimHash fingerprint per document (token-count "
    "weights, portable md5-derived bit hashes, single aggregation pass).",
)
def q23_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return dd.simhash(d, "doc_id", "text")


@register(
    "q24_cosine_topk",
    sql_cosine_topk("embeddings", "vec_id < 10", k=5),
    doc="Brute-force cosine top-k similarity search: broadcast query set × "
    "corpus scan (never shuffled), rank per query. Similarities rounded "
    "to 6dp before ranking; ties break on neighbor id.",
)
def q24_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    return cosine_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


@register(
    "q25_ann_lsh_topk",
    sql_ann_lsh_topk("embeddings", "vec_id < 10", k=5, dim=64, planes=4, tables=6),
    doc="LSH-bucketed approximate nearest neighbors: random-hyperplane "
    "bucket signatures (pure projection), equi-join on (table, bucket), "
    "exact cosine rank within candidates. Operating point planes=4 x "
    "6 tables with Hamming-1 multi-probe: recall@5 = 0.84 on this "
    "corpus, measured and recorded in RECALL.json. The 100 TB path: "
    "corpus scanned once, bucketed storage prunes future queries.",
)
def q25_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    return ann_lsh_topk(
        emb, emb.where(F.col("vec_id") < 10), k=5, dim=64, planes=4, tables=6
    )


@register(
    "q19_embedding_neardup",
    dd.sql_embedding_neardup_pairs_lsh("embeddings", threshold=0.4, dim=64),
    doc="Embedding-cosine near-duplicate pairs, LSH-bucketed (the 100 TB "
    "path): random-hyperplane bucket signature on both sides, candidate "
    "pairs from an equi-join on the bucket id (NO cross product — "
    "shuffle-bounded like MinHash LSH), exact cosine verifies inside "
    "buckets. The hyperplanes are deterministic integer-LCG weights, so "
    "the DuckDB oracle reproduces the bucket assignment bit-for-bit and "
    "checks the SAME candidate set; the recall trade vs the exact "
    "all-pairs form is measured in tests/test_operators.py, which keeps "
    "the exact form as the small-block verifier.",
)
def q19_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    return dd.embedding_neardup_pairs(emb, threshold=0.4, lsh_dim=64)


@register(
    "q30_ann_ivf_topk",
    sql_ann_ivf_topk("embeddings", "vec_id < 10", k=5, centroid_mod=37, nprobe=10),
    doc="IVF approximate nearest neighbors: deterministic coarse centroids, "
    "broadcast assignment pass + one reduce to build inverted lists, "
    "nprobe-cell probing as an equi-join on cell_id. Alternate scale "
    "path to q25's LSH (cell-pruned storage instead of bucket hashing). "
    "nprobe=10 of ~13 cells: recall@5 = 0.90 on this corpus "
    "(RECALL.json) — isotropic random vectors force a generous probe "
    "budget; clustered real embeddings prune far harder.",
)
def q30_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    return ann_ivf_topk(emb, emb.where(F.col("vec_id") < 10), k=5, nprobe=10)


@register(
    "q26_language_id",
    tx.sql_language_id("documents", "doc_id", "text"),
    doc="Heuristic language ID: per-language marker-token occurrence "
    "counts, argmax with deterministic tie-break.",
)
def q26_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return tx.language_id(d, "doc_id", "text")


@register(
    "q27_quality_score",
    tx.sql_quality_score("documents", "doc_id", "text"),
    doc="Document quality scoring: length/alpha-ratio/token-shape/stopword "
    "heuristics composed into a [0,1] score — pure projections.",
)
def q27_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return tx.quality_score(d, "doc_id", "text")


@register(
    "q28_token_stats",
    tx.sql_token_stats("documents", "doc_id", "text"),
    doc="Token counting three ways: whitespace, BPE-ish regex pieces, "
    "distinct tokens.",
)
def q28_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return tx.token_stats(d, "doc_id", "text")


@register(
    "q29_fingerprint",
    tx.sql_fingerprint("documents", "doc_id", "text"),
    doc="Winnowing fingerprint: 8-char shingle hashes, min-hash per 4-wide "
    "position window, distinct count + global min per doc.",
)
def q29_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return tx.fingerprint(d, "doc_id", "text")


# ============================================================================
# Multimodal + streaming surfaces (SURVEY §2.9 extension, §7.3 step 9)
# ============================================================================

from spark_hadoop_automation_in_cloud_spark.multimodal.binary_ops import (  # noqa: E402
    extract_features,
)
from spark_hadoop_automation_in_cloud_spark.streaming.rollup_stream import (  # noqa: E402
    run_available_now,
    stream_events,
    weekly_counts_stream,
)
from spark_hadoop_automation_in_cloud_spark.streaming.stateful import (  # noqa: E402
    user_session_totals,
)

# hex-pair → int, for reproducing the md5-derived fake-decoder outputs in SQL
_SQL_HEXDIG = "(strpos('0123456789abcdef', substr(hx, {p}, 1)) - 1)"
_SQL_BYTE = f"({_SQL_HEXDIG.format(p='2*{i}+1')} * 16 + {_SQL_HEXDIG.format(p='2*{i}+2')})"


@register(
    "q31_multimodal_features",
    f"""
WITH h AS (
  SELECT doc_id AS media_id, source AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS hx
  FROM documents
)
SELECT media_id, media_type, n_bytes,
       CAST(16 + {_SQL_BYTE.format(i='0')} % 240 AS INT) AS width,
       CAST(16 + {_SQL_BYTE.format(i='1')} % 240 AS INT) AS height,
       CAST(list_sum(list_transform(generate_series(0, 15),
            i -> {_SQL_BYTE.format(i='i')})) AS BIGINT) AS feat_checksum
FROM h
""",
    doc="Multimodal decode/feature-extract plumbing: binary payload column → "
    "Arrow-batched mapInPandas kernel → typed feature rows; the payload "
    "never crosses a shuffle. The decode kernel is a deterministic "
    "md5-derived stand-in (codec libs absent here — multimodal/binary_ops "
    "gates the real path behind strict=True), which makes even this "
    "Python-side operator oracle-checkable: DuckDB recomputes the fake "
    "decoder's width/height/feature-checksum from md5 arithmetic.",
)
def q31_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.col("source").alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
    )
    feats = extract_features(media)
    checksum = F.aggregate(
        F.col("features"),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.round(x * 255).cast("bigint"),
    )
    return feats.select(
        "media_id", "media_type", "n_bytes", "width", "height",
        checksum.alias("feat_checksum"),
    )


# Monday-aligned tumbling week arithmetic on integer epoch seconds (the
# streaming window's startTime='4 days' offset; epoch day 0 was a Thursday).
_WEEK_OFF = 4 * 86400
_SQL_WEEK = (
    f"make_timestamp((((CAST(floor(epoch(ts)) AS BIGINT) - {_WEEK_OFF}) // 604800)"
    f" * 604800 + {_WEEK_OFF}) * 1000000)"
)


@register(
    "q32_streaming_weekly_rollup",
    f"""
SELECT event_type, {_SQL_WEEK} AS week, COUNT(*) AS week_cnt
FROM events
GROUP BY 1, 2
""",
    doc="Structured Streaming twin of the Q2 rollup: readStream over the "
    "event table → watermark → tumbling Monday-aligned 7-day windows → "
    "counts, drained with an availableNow trigger into a memory sink. "
    "A full replay must equal the batch answer exactly, so the batch SQL "
    "IS the oracle — the stream/batch equivalence the reference never "
    "had (SURVEY §2.9: its 'incremental' is re-reading N partitions).",
)
def q32_streaming_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, f"{sf_dir}/events.parquet")
    result = weekly_counts_stream(ev)
    run_available_now(result, "q32_weekly_sink")
    return spark.table("q32_weekly_sink").select("event_type", "week", "week_cnt")


@register(
    "q33_stateful_sessions",
    """
WITH seq AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM seq
GROUP BY user_id
""",
    doc="Custom stateful streaming operator (applyInPandasWithState): "
    "per-user running event totals with 30-min inactivity session "
    "splitting — arbitrary per-key state machines windowed aggregation "
    "can't express. Gap math on integer epoch-micros, so a full "
    "availableNow replay is bit-equal to the batch lag() oracle.",
)
def q33_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, f"{sf_dir}/events.parquet")
    result = user_session_totals(ev)
    run_available_now(result, "q33_sessions_sink", output_mode="update")
    return (
        spark.table("q33_sessions_sink")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("n_sessions").alias("n_sessions"),
        )
    )


@register(
    "q34_raw_event_flatten",
    """
SELECT event_id,
       user_id,
       event_type,
       CAST(json_extract_string(props, '$.k') AS INT) AS media_k,
       date_trunc('second', ts) AS msg_ts,
       strftime(ts, '%Y-%m-%d') AS event_date
FROM events
""",
    doc="Raw→staging flatten (S7, mover.py:49-105 semantics): rows are first "
    "packed into the reference's nested event(media) struct shape — with "
    "the JSON props parsed via from_json and the timestamp serialized to "
    "a string — then flattened back out with nested-field access, "
    "fractional seconds stripped with split().getItem(0), the string "
    "re-parsed with to_timestamp, and the date partition key derived. "
    "Exercises struct build/flatten, JSON, and the string/date scalar "
    "family end-to-end; the oracle computes the equivalent direct form.",
)
def q34_raw_event_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    # pack into the reference's raw shape: nested event struct with a
    # media sub-struct and a string-serialized timestamp
    raw = e.select(
        "event_id",
        F.struct(
            F.col("user_id").alias("user_id"),
            F.col("event_type").alias("event_type"),
            F.from_json(F.col("props"), "k int").alias("media"),
            F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSS").alias("datetime"),
        ).alias("event"),
    )
    # flatten (mover parity): nested access, strip fractional seconds,
    # re-parse, derive the date partition key
    return raw.select(
        "event_id",
        F.col("event.user_id").alias("user_id"),
        F.col("event.event_type").alias("event_type"),
        F.col("event.media.k").alias("media_k"),
        F.to_timestamp(
            F.split(F.col("event.datetime"), r"\.").getItem(0),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("msg_ts"),
        # string partition key, as the reference's mover derives it
        # (mover.py:78 date_format → "yyyy-MM-dd")
        F.col("event.datetime").substr(1, 10).alias("event_date"),
    )


from spark_hadoop_automation_in_cloud_spark.operators.asof import asof_join  # noqa: E402


@register(
    "q35_asof_join",
    """
WITH purchases AS (
  SELECT event_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts,
         max_by(round(value, 6), event_id) AS click_value
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, p.ts,
       c.click_value AS asof_click_value,
       c.ts AS asof_ts
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND c.ts <= p.ts
""",
    doc="As-of join (first-class extension; absent from the reference, "
    "SURVEY §2.3): each purchase event enriched with the user's latest "
    "click value at-or-before purchase time. Union-and-window form — one "
    "shuffle of |left|+|right| rows, linear cost, vs the quadratic "
    "theta-join alternative. Oracle: DuckDB's native ASOF LEFT JOIN.",
)
def q35_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by(F.round("value", 6), F.col("event_id")).alias("click_value"))
    )
    return asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["click_value"],
    )


@register(
    "q36_interval_join",
    """
WITH s AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'
),
p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT s.event_id, s.user_id, s.ts,
       COUNT(p.ts) AS purchases_next_24h
FROM s LEFT JOIN p
  ON s.user_id = p.user_id
 AND p.ts >= s.ts
 AND p.ts < s.ts + INTERVAL 24 HOUR
GROUP BY s.event_id, s.user_id, s.ts
""",
    doc="Interval (range) join: purchases within 24h after each signup, per "
    "user. Equi-key + range predicate — Catalyst plans the equi part as "
    "the join key and evaluates the range inside the matched group, so "
    "cost is Σ per-user(|signups|×|purchases|), bounded by the key "
    "cardinality, not a global range scan. For keyless range joins the "
    "1-D analogue of operators.pairs.geo_bucket_join (time-bucket + "
    "neighbor replication) is the scale path.",
)
def q36_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    s = e.where(F.col("event_type") == "signup").select("event_id", "user_id", "ts")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    joined = s.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("ts"))
        & (F.col("p_ts") < F.col("ts") + F.expr("INTERVAL 24 HOURS")),
        "left",
    )
    return joined.groupBy("event_id", "user_id", "ts").agg(
        F.count("p_ts").alias("purchases_next_24h")
    )


@register(
    "q37_value_quantiles",
    """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 6) AS p99
FROM orders
GROUP BY o_orderpriority
""",
    doc="Exact continuous quantiles per group (SURVEY §2.4 notes the "
    "reference has no distinct/approx/percentile aggregates — added as "
    "first-class). Spark's percentile() and DuckDB's quantile_cont share "
    "the linear-interpolation definition, so results hash-match. The "
    "100 TB path swaps in approx_percentile with a documented error "
    "bound — same plan shape, sketch-mergeable partials.",
)
def q37_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 6).alias("p99"),
    )


@register(
    "q38_moving_average",
    """
SELECT user_id, event_id, ts,
       round(AVG(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS value_ma4
FROM events
""",
    doc="Explicit ROWS frame (the reference only ever uses default frames, "
    "SURVEY §2.5): 4-row trailing moving average of event value per user. "
    "One shuffle on the partition key; the frame is evaluated in a "
    "single pass over each sorted partition.",
)
def q38_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.avg("value").over(w), 6).alias("value_ma4"),
    )


from spark_hadoop_automation_in_cloud_spark.operators.components import (  # noqa: E402
    neardup_clusters,
)

_SQL_NEARDUP_EDGES = dd.sql_embedding_neardup_pairs("embeddings", threshold=0.4)

#: shared recursive transitive-closure CTE chain over the embedding
#: near-dup graph (pairs -> symmetric edges + self-loops -> reachability)
#: — ONE definition of the closure shape, consumed by q39 (cluster
#: labels) and q124 (leakage-safe split on those labels); a change to the
#: self-loop rule or the reach recursion moves both oracles together.
_SQL_NEARDUP_CLOSURE = f"""pairs AS ({{edges}}),
edges AS (
  SELECT left_id AS a, right_id AS b FROM pairs
  UNION
  SELECT right_id AS a, left_id AS b FROM pairs
  UNION
  SELECT vec_id AS a, vec_id AS b FROM embeddings
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)""".format(edges=_SQL_NEARDUP_EDGES)


@register(
    "q39_neardup_clusters",
    f"""
WITH RECURSIVE {_SQL_NEARDUP_CLOSURE}
SELECT a AS vec_id, MIN(b) AS cluster_id
FROM reach
GROUP BY a
""",
    doc="Dedup clusters: connected components over the embedding near-dup "
    "pairs (q19), every vector labeled min-member-id of its component "
    "(singletons label themselves). Distributed label propagation — each "
    "round one join+min-aggregate, lineage cut per round; rounds = graph "
    "diameter. Oracle: DuckDB recursive-CTE transitive closure + MIN, "
    "proving the iterative Spark form computes the same fixpoint.",
)
def q39_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    pairs = dd.embedding_neardup_pairs(emb, threshold=0.4)
    return neardup_clusters(pairs, emb, "vec_id").select("vec_id", "cluster_id")


_SQL_KEPT_SHINGLES = dd.sql_shingle_rows("kept", "doc_id", "text", n=2)
_SQL_KEPT_PAIRS = dd.sql_jaccard_pairs(_SQL_KEPT_SHINGLES, min_jaccard=0.35)


def _curation_clusters(spark: SparkSession, sf_dir: str):
    """Shared q40/q116 pipeline prefix (the Spark twin of
    _SQL_CLUSTER_CTES): quality-filtered docs and their near-dup cluster
    labels.  One definition — a threshold change here moves BOTH the
    full-curation slice and the quality-canonical keep-rule."""
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    qsc = tx.quality_score(d, "doc_id", "text").where(F.col("quality") >= 0.9)
    kept = d.select("doc_id", "text").join(
        qsc.select("doc_id", "quality"), "doc_id"
    )
    sh = dd.shingle_rows(kept, "doc_id", "text", n=2)
    # naive inverted-index Jaccard: at this LOW threshold (0.35) the prefix
    # filter keeps ~65% of shingles and loses to the plain index (measured);
    # jaccard_pairs_prefix wins at high thresholds, MinHash-LSH at scale
    pairs = dd.jaccard_pairs(sh, min_jaccard=0.35).select(
        F.col("left_doc_id").alias("left_id"), F.col("right_doc_id").alias("right_id")
    )
    return kept, neardup_clusters(pairs, kept, "doc_id")


#: shared recursive-closure CTE chain (quality filter → Jaccard pairs →
#: transitive closure → min-id cluster labels) — q40's pipeline prefix,
#: reused verbatim by q116's quality-canonical variant.
_SQL_CLUSTER_CTES = f"""q AS ({tx.sql_quality_score("documents", "doc_id", "text")}),
kept AS (
  SELECT d.doc_id, d.text, q.quality
  FROM documents d JOIN q ON d.doc_id = q.doc_id
  WHERE q.quality >= 0.9
),
pairs AS (SELECT * FROM ({_SQL_KEPT_PAIRS}) jp),
edges AS (
  SELECT left_doc_id AS a, right_doc_id AS b FROM pairs
  UNION
  SELECT right_doc_id AS a, left_doc_id AS b FROM pairs
  UNION
  SELECT doc_id AS a, doc_id AS b FROM kept
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
clus AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a)"""


@register(
    "q40_corpus_curation",
    f"""
WITH RECURSIVE {_SQL_CLUSTER_CTES},
tok AS ({tx.sql_token_stats("kept", "doc_id", "text")})
SELECT k.doc_id, c.cluster_id,
       CASE WHEN c.cluster_id = k.doc_id THEN 1 ELSE 0 END AS is_canonical,
       t.ws_tokens, t.bpe_tokens, k.quality
FROM kept k
JOIN clus c ON k.doc_id = c.doc_id
JOIN tok t ON k.doc_id = t.doc_id
""",
    doc="End-to-end training-corpus curation slice: quality-score filter → "
    "exact n-gram-Jaccard near-dup pairs among survivors → connected- "
    "component clustering → canonical selection (min doc_id) → token "
    "accounting. The composition every LLM data pipeline runs, expressed "
    "as one lazy Spark plan (the iterative clustering step is the only "
    "materialization barrier). At 100 TB, swap the exact Jaccard stage "
    "for the MinHash-LSH candidates (q21) with identical downstream "
    "wiring. Oracle: the same pipeline in SQL with a recursive-CTE "
    "closure for the clustering.",
)
def q40_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept, clusters = _curation_clusters(spark, sf_dir)
    tok = tx.token_stats(kept, "doc_id", "text").select(
        "doc_id", "ws_tokens", "bpe_tokens"
    )
    return (
        kept.select("doc_id", "quality")
        .join(clusters, "doc_id")
        .join(tok, "doc_id")
        .select(
            "doc_id",
            "cluster_id",
            (F.col("cluster_id") == F.col("doc_id")).cast("int").alias("is_canonical"),
            "ws_tokens",
            "bpe_tokens",
            "quality",
        )
    )


from spark_hadoop_automation_in_cloud_spark.streaming.rollup_stream import (  # noqa: E402
    daily_sliding_week_counts_stream,
)


@register(
    "q41_streaming_sliding_window",
    """
WITH days AS (SELECT unnest(generate_series(0, 6)) AS k)
SELECT event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) - k * INTERVAL 1 DAY AS window_start,
       COUNT(*) AS cnt
FROM events CROSS JOIN days
GROUP BY 1, 2
""",
    doc="Sliding-window streaming aggregation: 7-day windows advancing "
    "daily — each event lands in 7 overlapping windows (trailing-week "
    "rollup). availableNow replay ≡ the batch form, which the oracle "
    "expresses as a 7-way day-offset expansion.",
)
def q41_streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, f"{sf_dir}/events.parquet")
    result = daily_sliding_week_counts_stream(ev)
    run_available_now(result, "q41_sliding_sink")
    return spark.table("q41_sliding_sink").select("event_type", "window_start", "cnt")


@register(
    "q42_hash_split",
    f"""
WITH b AS (
  SELECT doc_id,
         {hashing.sql_md5_prefix_int("doc_id", nhex=8, salt=":split")}
           % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc_id
FROM b
GROUP BY 1
""",
    doc="Deterministic train/val/test split (80/10/10) by content-free id "
    "hash — the reproducible alternative to sample(): stable across "
    "runs, partitioners, and engines, no RNG state to ship. A pure "
    "projection + tiny aggregate; at 100 TB the split column is computed "
    "in the scan stage and can partition the write directly.",
)
def q42_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    bucket = hashing.md5_prefix_int(F.col("doc_id"), nhex=8, salt=":split") % 100
    return (
        d.select("doc_id", bucket.alias("bucket"))
        .select(
            "doc_id",
            F.when(F.col("bucket") < 80, "train")
            .when(F.col("bucket") < 90, "val")
            .otherwise("test")
            .alias("split"),
        )
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


@register(
    "q43_session_windows",
    """
WITH seq AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
islands AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_no
  FROM seq
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM islands
GROUP BY user_id, session_no
""",
    doc="Batch session windows (F.session_window, 30-min inactivity gap): "
    "dynamic, data-driven windows — the batch twin of q33's stateful "
    "streaming sessionizer, and the gap-based windowing the reference "
    "lacks entirely. One shuffle on the session keys; window merge is "
    "internal. Oracle: classic gaps-and-islands (lag → flag → running "
    "sum → group).",
)
def q43_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


from spark_hadoop_automation_in_cloud_spark.operators.nearest import (  # noqa: E402
    nearest_neighbor_fold,
)


@register(
    "q44_streaming_geo_rollup",
    f"""
WITH best AS ({SQL_NEAREST})
SELECT city_id,
       {_SQL_WEEK} AS week,
       COUNT(*) AS week_cnt
FROM best
GROUP BY 1, 2
""",
    doc="Streaming geo enrichment + rollup: the signature 1-NN operator "
    "running INSIDE a stream via its stateless fold form (dim inlined as "
    "literal candidates + least() — pure projection, no per-event state), "
    "then watermarked weekly counts per city. The aggregate 1-NN form "
    "would key unbounded state by event on a stream; the fold form is "
    "the streaming-safe twin (equivalence tested in test_operators).",
)
def q44_streaming_geo_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim_rows = [r.asDict() for r in city_dim(spark, sf_dir).collect()]
    ev = stream_events(spark, f"{sf_dir}/events.parquet")
    geo_ev = ev.select(
        "event_id",
        "user_id",
        "ts",
        geo.synth_event_lat(F.col("user_id"), F.col("event_id")).alias("lat"),
        geo.synth_event_lon(F.col("user_id"), F.col("event_id")).alias("lon"),
    )
    ne = nearest_neighbor_fold(
        geo_ev,
        dim_rows,
        fact_lat="lat",
        fact_lon="lon",
        dim_id="city_id",
        dim_lat="city_lat",
        dim_lon="city_lon",
    )
    result = (
        ne.withWatermark("ts", "14 days")
        .groupBy(
            "city_id",
            F.window("ts", "7 days", "7 days", "4 days").alias("win"),
        )
        .agg(F.count(F.lit(1)).alias("week_cnt"))
        .select("city_id", F.col("win.start").alias("week"), "week_cnt")
    )
    run_available_now(result, "q44_geo_sink")
    return spark.table("q44_geo_sink").select("city_id", "week", "week_cnt")


@register(
    "q45_distinct_aggregates",
    """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP)) AS n_active_days,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
""",
    doc="Distinct aggregates (absent from the reference, SURVEY §2.4 note): "
    "multiple COUNT(DISTINCT) in one grouped aggregation — Catalyst "
    "expands to partial de-dup + final count. The sketch path for 100 TB "
    "is approx_count_distinct (HLL, mergeable partials, fixed memory); "
    "its ≤5%-error agreement with these exact counts is asserted in "
    "tests/test_operators.py.",
)
def q45_distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.date_trunc("day", F.col("ts"))).alias("n_active_days"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q46_pivot",
    """
SELECT c_mktsegment,
       COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
       COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS n_medium,
       COUNT(*) FILTER (o_orderpriority = '5-LOW')    AS n_low
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    doc="Pivot (rows→columns reshape) via the DataFrame pivot() API with an "
    "EXPLICIT value list — omitting it triggers a driver-side distinct "
    "scan to discover columns, a hidden extra job at scale. One shuffle, "
    "conditional-count expansion under the hood (same plan as q18's "
    "manual pivot).",
)
def q46_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    piv = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderpriority", ["1-URGENT", "3-MEDIUM", "5-LOW"])
        .count()
        .na.fill(0)
    )
    return piv.select(
        "c_mktsegment",
        F.col("1-URGENT").alias("n_urgent"),
        F.col("3-MEDIUM").alias("n_medium"),
        F.col("5-LOW").alias("n_low"),
    )


@register(
    "q47_unpivot",
    """
SELECT l_orderkey, l_linenumber, charge_kind, round(amount, 6) AS amount
FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_tax
  FROM lineitem WHERE l_orderkey < 1000
)
UNPIVOT (amount FOR charge_kind IN (
  l_extendedprice AS 'price', l_discount AS 'discount', l_tax AS 'tax'
))
""",
    doc="Unpivot/melt (columns→rows reshape, inverse of q46): one wide row "
    "becomes one row per measure — pure projection + generator, no "
    "shuffle; the idiomatic long-format feed for per-measure aggregation "
    "downstream.",
)
def q47_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    return (
        l.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            [("l_extendedprice"), ("l_discount"), ("l_tax")],
            "charge_kind",
            "amount",
        )
        .withColumn(
            "charge_kind",
            F.when(F.col("charge_kind") == "l_extendedprice", "price")
            .when(F.col("charge_kind") == "l_discount", "discount")
            .otherwise("tax"),
        )
        .withColumn("amount", F.round("amount", 6))
    )


@register(
    "q48_ranking_functions",
    """
SELECT o_custkey, o_orderkey,
       CAST(rank()         OVER w AS INT) AS rnk,
       CAST(dense_rank()   OVER w AS INT) AS drnk,
       CAST(ntile(4)       OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS prnk
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY round(o_totalprice, 2) DESC, o_orderkey)
""",
    doc="Ranking-function family the reference never uses (SURVEY §2.5 "
    "note): rank / dense_rank / ntile / percent_rank over one shared "
    "window spec — one shuffle + per-partition sort serves all four.",
)
def q48_ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(
        F.round("o_totalprice", 2).desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
    )


@register(
    "q49_cube",
    f"""
SELECT COALESCE(r_name, '<all>') AS region_name,
       COALESCE(o_orderpriority, '<all>') AS priority,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice")} AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY CUBE (r_name, o_orderpriority)
""",
    doc="CUBE grouping (all 2^n subtotal combinations in one aggregation "
    "pass — absent from the reference, which hand-built its one rollup "
    "level with a window). Null grouping cells are marker-filled so the "
    "oracle comparison distinguishes subtotal rows from data nulls.",
)
def q49_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = F.broadcast(read_table(spark, sf_dir, "nation"))
    r = F.broadcast(read_table(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .cube("r_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("revenue"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("<all>")).alias("region_name"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias("priority"),
            "n_orders",
            "revenue",
        )
    )


@register(
    "q50_fuzzy_name_pairs",
    dd.sql_fuzzy_pairs_exact("customer", max_dist=1),
    doc="Fuzzy-key matching via Levenshtein edit distance — the "
    "entity-resolution primitive (near-identical names/titles) that "
    "complements content dedup. PassJoin pigeonhole blocking over the "
    "FULL customer table: k+1 segments per indexed name, shifted-"
    "substring probes, equi-join on the segment key, exact verify — "
    "LOSSLESS (unlike first-char blocking, a first-character edit is "
    "still found) and robust to template corpora where every name "
    "shares prefix and length (measured 208s -> 26s at sf0.1, dist 2; "
    "the residual cost is output-bound — millions of true pairs). "
    "dist <= 1 registered because TPC-H digit-names make dist <= 2 "
    "result sets degenerate; the first-char blocked form stays as the "
    "documented cheaper-but-lossy alternative.",
)
def q50_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer", parallelize=True).select(
        "c_custkey", "c_name"
    )
    return dd.fuzzy_pairs_passjoin(c, max_dist=1)


from spark_hadoop_automation_in_cloud_spark.operators.checks import (  # noqa: E402
    profile_columns,
)


@register(
    "q51_data_quality_profile",
    """
WITH base AS (
  SELECT COUNT(*) AS n,
         COUNT(*) FILTER (user_id IS NULL)    AS nu,  COUNT(DISTINCT user_id)    AS du,
         COUNT(*) FILTER (event_type IS NULL) AS nt,  COUNT(DISTINCT event_type) AS dt,
         COUNT(*) FILTER (value IS NULL)      AS nv,  COUNT(DISTINCT value)      AS dv,
         COUNT(*) FILTER (props IS NULL)      AS np,  COUNT(DISTINCT props)      AS dp
  FROM events
)
SELECT 'user_id' AS col_name, nu AS n_nulls, round(CAST(nu AS DOUBLE)/n, 6) AS null_ratio, du AS n_distinct, n AS n_rows FROM base
UNION ALL
SELECT 'event_type', nt, round(CAST(nt AS DOUBLE)/n, 6), dt, n FROM base
UNION ALL
SELECT 'value', nv, round(CAST(nv AS DOUBLE)/n, 6), dv, n FROM base
UNION ALL
SELECT 'props', np, round(CAST(np AS DOUBLE)/n, 6), dp, n FROM base
""",
    doc="Data-quality profiling (operators.checks): null counts/ratios and "
    "distinct cardinalities for N columns in ONE aggregation pass over "
    "one scan — the run-over-run guardrail metrics (row-count collapse, "
    "null spikes, cardinality drift) production pipelines alert on; "
    "absent from the reference entirely.",
)
def q51_data_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return profile_columns(e, ["user_id", "event_type", "value", "props"])


@register(
    "q52_above_group_average",
    """
SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS price,
       prio_avg
FROM (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         round(AVG(o_totalprice) OVER (PARTITION BY o_orderpriority), 6) AS prio_avg
  FROM orders
)
WHERE o_totalprice > 2 * prio_avg
""",
    doc="Correlated-scalar-subquery semantics ('orders above twice their "
    "priority class average'), decorrelated into a window aggregate — "
    "one shuffle instead of the subquery-per-row a naive engine runs; "
    "the same rewrite Catalyst applies to the SQL form.",
)
def q52_above_group_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    return (
        # Round the window average to 6dp BEFORE the threshold predicate so a
        # borderline row can't flip inclusion between Spark's and the oracle's
        # float summation order (rounding-before-predicate convention, as in
        # q19/q22).
        o.withColumn("prio_avg", F.round(F.avg("o_totalprice").over(w), 6))
        .where(F.col("o_totalprice") > 2 * F.col("prio_avg"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("price"),
            "prio_avg",
        )
    )


@register(
    "q53_time_range_average",
    """
SELECT user_id, event_id, ts,
       round(AVG(value) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 6) AS value_h1
FROM events
""",
    doc="RANGE frame keyed by event TIME, not row count (complements q38's "
    "ROWS frame): trailing 1-hour average of value per user. Spark "
    "expresses interval frames as a rangeBetween on epoch-micros — "
    "exact integer bounds, so the frame contents match DuckDB's "
    "INTERVAL arithmetic bit-for-bit. Same single-shuffle plan as any "
    "window: partition by user, one sorted pass.",
)
def q53_time_range_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.avg("value").over(w), 6).alias("value_h1"),
    )


@register(
    "q54_repetition_ratio",
    """
SELECT doc_id,
       CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_shingles,
       CAST(CASE WHEN len(toks) >= 2 THEN len(list_distinct(
         list_transform(generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1])))
            ELSE 0 END AS BIGINT) AS n_distinct,
       CASE WHEN len(toks) >= 2 THEN round(1.0 - CAST(len(list_distinct(
         list_transform(generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE)
         / (len(toks) - 1), 6) END AS repetition_ratio
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
""",
    doc="Repetition ratio — the boilerplate/spam quality signal LLM corpus "
    "filters cut on (high duplicate-shingle share ⇒ navigation bars, "
    "keyword stuffing, generated filler): 1 − distinct/total word-"
    "bigrams per document. Pure projection over the token array — no "
    "explode, no shuffle; at 100 TB this runs inside the scan stage "
    "(complements q27's length/punct/stopword scoring).",
)
def q54_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the per-row shingle array build is the cost — don't leave the
    # unsplittable scan single-task
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    toks = F.split(F.col("text"), " ")
    total = F.greatest(F.size(toks) - 1, F.lit(0)).cast("bigint")
    distinct = F.size(dd.word_shingles(F.col("text"), 2)).cast("bigint")
    return d.select(
        "doc_id",
        total.alias("n_shingles"),
        distinct.alias("n_distinct"),
        F.when(
            total > 0,
            F.round(F.lit(1.0) - distinct.cast("double") / total, 6),
        ).alias("repetition_ratio"),
    )


@register(
    "q55_stratified_sample",
    f"""
WITH s AS (
  SELECT lang, doc_id,
         {hashing.sql_md5_prefix_int("doc_id", nhex=8, salt=":strat")}
           % 100 AS bucket
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_sampled,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM s
WHERE bucket < CASE WHEN lang = 'en' THEN 20 ELSE 60 END
GROUP BY lang
""",
    doc="Deterministic stratified sampling — downsample the majority class "
    "(en: 20%) while keeping minority languages at 60%, the standard "
    "corpus-rebalancing move before training. Hash-bucket predicate "
    "(same md5 idiom as the q42 split): reproducible across runs, "
    "engines, and partitionings, unlike sampleBy()'s RNG; a pure "
    "scan-stage filter at 100 TB.",
)
def q55_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    bucket = hashing.md5_prefix_int(F.col("doc_id"), nhex=8, salt=":strat") % 100
    rate = F.when(F.col("lang") == "en", 20).otherwise(60)
    return (
        d.where(bucket < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@register(
    "q56_full_outer_reconciliation",
    """
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
),
l AS (
  SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n_ship
  FROM lineitem GROUP BY 1
)
SELECT CAST(COALESCE(o.d, l.d) AS VARCHAR) AS day,
       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(n_ship, 0) AS BIGINT) AS n_ship,
       CASE WHEN o.d IS NULL THEN 'ship_only'
            WHEN l.d IS NULL THEN 'order_only'
            ELSE 'both' END AS status
FROM o FULL OUTER JOIN l ON o.d = l.d
""",
    doc="FULL OUTER reconciliation (completes the join-type surface next "
    "to inner/left/semi/anti/cross): daily order placements vs daily "
    "shipments, unmatched days kept from BOTH sides and tagged. "
    "Aggregate-then-join: each side reduces to one row per day before "
    "the join, so the full-outer shuffle moves day-level rows, not raw "
    "fact rows — the only sane order at 100 TB.",
)
def q56_full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("od"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_shipdate").cast("date").alias("ld"))
        .agg(F.count(F.lit(1)).alias("n_ship"))
    )
    j = o.join(li, o.od == li.ld, "full_outer")
    return j.select(
        # string day: pandas/arrow round-trips DATE and TIMESTAMP
        # differently across engines; the ISO string is representation-proof
        F.date_format(F.coalesce(F.col("od"), F.col("ld")), "yyyy-MM-dd").alias("day"),
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("n_ship"), F.lit(0)).alias("n_ship"),
        F.when(F.col("od").isNull(), "ship_only")
        .when(F.col("ld").isNull(), "order_only")
        .otherwise("both")
        .alias("status"),
    )


@register(
    "q57_streaming_dedup",
    """
SELECT DISTINCT user_id, event_type FROM events
""",
    doc="Streaming deduplication: dropDuplicates over a keyed stream emits "
    "each (user_id, event_type) exactly once, on first arrival — the "
    "stateful stream counterpart of batch q07/q20 (state = one marker "
    "per key, partitioned across executors; a production stream bounds "
    "it with dropDuplicatesWithinWatermark). An availableNow replay "
    "equals batch DISTINCT, which is the oracle.",
)
def q57_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, f"{sf_dir}/events.parquet")
    deduped = ev.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    run_available_now(deduped, "q57_dedup_sink", output_mode="append")
    return spark.table("q57_dedup_sink").select("user_id", "event_type")


@register(
    "q58_training_sequences",
    """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       array_to_string(list_slice(
         list(event_type ORDER BY ts, event_id), 1, 20), ',') AS seq20
FROM events
GROUP BY user_id
""",
    doc="Ordered training-sequence construction: each user's event-type "
    "history as a deterministic (ts, id)-ordered sequence truncated to "
    "the first 20 steps — the sequence-model feature shape (next-event "
    "prediction, session embeddings). One shuffle on the grouping key; "
    "the sorted-struct collect is the same deterministic idiom as q11, "
    "with slice() bounding row width regardless of user history length.",
)
def q58_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    seq = F.array_join(
        F.transform(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
                ),
                1,
                20,
            ),
            lambda s: s["event_type"],
        ),
        ",",
    )
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), seq.alias("seq20")
    )


@register(
    "q59_upsert_merge",
    """
WITH base AS (
  SELECT user_id, event_type AS last_type, value AS last_value, ts AS last_ts
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-15')
  WHERE rn = 1
),
upd_rows AS (SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-15'),
upd AS (
  SELECT r.user_id, r.event_type AS last_type, r.value AS last_value,
         r.ts AS last_ts, c.n_updates
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM upd_rows) r
  JOIN (SELECT user_id, COUNT(*) AS n_updates FROM upd_rows GROUP BY user_id) c
    USING (user_id)
  WHERE r.rn = 1
)
SELECT COALESCE(u.user_id, b.user_id) AS user_id,
       COALESCE(u.last_type, b.last_type) AS last_type,
       round(COALESCE(u.last_value, b.last_value), 6) AS last_value,
       COALESCE(u.last_ts, b.last_ts) AS last_ts,
       CAST(COALESCE(u.n_updates, 0) AS BIGINT) AS n_updates
FROM base b FULL OUTER JOIN upd u ON b.user_id = u.user_id
""",
    doc="MERGE/upsert semantics without a table format: a keyed snapshot "
    "(state before the cutover date) merged with an update batch, last-"
    "writer-wins per key, unmatched keys kept from both sides — the "
    "Spark-first expression of what Delta MERGE INTO does, usable on "
    "plain parquet. Both sides pre-aggregate to one row per key before "
    "the full-outer join, so the shuffle carries keys, not events; the "
    "(ts, event_id) tiebreak makes the winner deterministic.",
)
def q59_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15").cast("timestamp")
    key = F.struct(F.col("ts"), F.col("event_id"))

    def last_state(df: DataFrame, with_count: bool) -> DataFrame:
        aggs = [
            F.max_by("event_type", key).alias("last_type"),
            F.max_by("value", key).alias("last_value"),
            F.max("ts").alias("last_ts"),
        ]
        if with_count:
            aggs.append(F.count(F.lit(1)).alias("n_updates"))
        return df.groupBy("user_id").agg(*aggs)

    base = last_state(e.where(F.col("ts") < cut), with_count=False)
    upd = last_state(e.where(F.col("ts") >= cut), with_count=True)
    b, u = base.alias("b"), upd.alias("u")
    j = b.join(u, F.col("b.user_id") == F.col("u.user_id"), "full_outer")
    return j.select(
        F.coalesce(F.col("u.user_id"), F.col("b.user_id")).alias("user_id"),
        F.coalesce(F.col("u.last_type"), F.col("b.last_type")).alias("last_type"),
        F.round(
            F.coalesce(F.col("u.last_value"), F.col("b.last_value")), 6
        ).alias("last_value"),
        F.coalesce(F.col("u.last_ts"), F.col("b.last_ts")).alias("last_ts"),
        F.coalesce(F.col("u.n_updates"), F.lit(0)).alias("n_updates"),
    )


_SPLIT_BUCKET_SQL = f"""
SELECT doc_id,
       {hashing.sql_md5_prefix_int("doc_id", nhex=8, salt=":split")}
         % 100 AS bucket
FROM documents
"""


@register(
    "q60_decontamination",
    dd.sql_contamination_overlap(
        dd.sql_shingle_rows("documents", "doc_id", "text", n=3),
        _SPLIT_BUCKET_SQL,
        train_pred="bucket < 80",
        test_pred="bucket >= 90",
        min_shared=2,
        max_test_df=20,
        max_train_df=50,
        hash_shingles=True,
    ),
    doc="Train/test decontamination: flag training documents sharing >= 2 "
    "distinct word-trigrams with the held-out split (same deterministic "
    "id-hash split as q42, so train/test membership is reproducible "
    "across engines). Inverted-index equi-join — shuffle-bounded, never "
    "all-pairs; shingles are md5-compressed to int64 BEFORE the shuffle "
    "(measured 23% faster at sf0.1; at 100 TB the 8-byte key vs ~20-byte "
    "string is shuffle volume, and the 60-bit space makes collisions "
    "negligible while the oracle applies the identical hash). Shingles "
    "present in > 20 held-out docs are dropped from the index first "
    "(boilerplate n-grams carry no contamination signal but dominate "
    "join fanout).",
)
def q60_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    bucket = hashing.md5_prefix_int(F.col("doc_id"), nhex=8, salt=":split") % 100
    d = d.withColumn("__bucket", bucket)
    train = d.where(F.col("__bucket") < 80)
    test = d.where(F.col("__bucket") >= 90)

    def hashed(sh):
        return sh.select("doc_id", hashing.md5_int60(F.col("shingle")).alias("shingle"))

    return dd.contamination_overlap(
        hashed(dd.shingle_rows(train, "doc_id", "text", n=3)),
        hashed(dd.shingle_rows(test, "doc_id", "text", n=3)),
        min_shared=2,
        max_test_df=20,
        max_train_df=50,
    )


_PII_PATTERNS = {
    "id": r"#\d+",
    "longnum": r"\d{6,}",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
}


@register(
    "q61_pii_scrub",
    tx.sql_pii_scrub("customer", "c_custkey", "c_name", _PII_PATTERNS),
    doc="PII / identifier scrubbing over customer names: per-category regex "
    "match counts (id tokens, long digit runs, emails — the email "
    "category intentionally never fires on this corpus, exercising the "
    "all-null negative path), a stable md5 pseudonym for the first "
    "identifier (so scrubbed records still join), and the fully "
    "redacted text. Pure JVM regex projection — runs inside the scan "
    "stage, zero shuffle at any scale.",
)
def q61_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return tx.pii_scrub(c, "c_custkey", "c_name", _PII_PATTERNS)


@register(
    "q62_embedding_quantize",
    sql_quantize_embeddings("embeddings"),
    doc="Embedding L2-normalization + fixed-point int8 quantization: "
    "trunc(x * 128) with a power-of-two scale is EXACT in IEEE floats "
    "(exponent shift, no rounding boundary), so the quantized integers "
    "and their digests (L1 mass, max, position-weighted checksum) are "
    "bit-identical across engines — the one quantizer design that is "
    "hash-checkable with no tie-break risk. Pure array projection, zero "
    "shuffle; the 4x-smaller quantized form is the 100 TB write path.",
)
def q62_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    return quantize_embeddings(emb)


@register(
    "q63_tfidf_top_terms",
    tx.sql_tfidf_top_terms("documents", "doc_id", "text", k=3),
    doc="Top-3 characteristic terms per document by TF-IDF (tf * ln(N/df), "
    "rounded before ranking, term-string tiebreak). Corpus-sized frames "
    "shuffle only on doc or (doc, term); the vocabulary-sized document-"
    "frequency table broadcasts back onto tf, so adding documents never "
    "adds a shuffle — the keyword-extraction primitive for corpus "
    "labeling at 100 TB.",
)
def q63_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return tx.tfidf_top_terms(d, "doc_id", "text", k=3)


@register(
    "q64_document_chunking",
    tx.sql_chunk_documents("documents", "doc_id", "text", chunk_tokens=50, stride=40),
    doc="Overlapping token-window chunking (50-token windows every 40 "
    "tokens): the corpus→training-example transform. Pure generator "
    "projection — sequence + explode + slice, no shuffle, fan-out "
    "bounded by len/stride; chunk rows inherit the parent partitioning "
    "so the downstream write is partition-preserving at 100 TB.",
)
def q64_document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return tx.chunk_documents(d, "doc_id", "text", chunk_tokens=50, stride=40)


from spark_hadoop_automation_in_cloud_spark.streaming.joins import (  # noqa: E402
    interval_join_stream,
    sql_interval_join,
)


@register(
    "q65_stream_stream_join",
    sql_interval_join(
        "events",
        "user_id",
        left_pred="event_type = 'signup'",
        right_pred="event_type = 'purchase'",
        window_hours=24,
    ),
    doc="Stream-stream inner interval join: the signup stream joined to the "
    "purchase stream on user within [signup, signup+24h), both sides "
    "watermarked. For a both-bounded INNER join the watermark only "
    "limits state retention, never which matches emit — so an "
    "availableNow replay equals the batch interval join (q36's inner "
    "form), which is the oracle. State at scale = events/sec x "
    "watermark per side, independent of history length.",
)
def q65_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = stream_events(spark, f"{sf_dir}/events.parquet").where(
        F.col("event_type") == "signup"
    )
    p = stream_events(spark, f"{sf_dir}/events.parquet").where(
        F.col("event_type") == "purchase"
    )
    joined = interval_join_stream(s, p, key="user_id", window="24 hours")
    run_available_now(joined, "q65_ssjoin_sink", output_mode="append")
    return spark.table("q65_ssjoin_sink")


@register(
    "q66_grouped_moments",
    """
WITH c AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100) AS BIGINT) AS q_c,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS p_c
  FROM lineitem
),
s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(q_c AS DECIMAL(38,0))) AS DOUBLE) AS sq,
         CAST(SUM(CAST(p_c AS DECIMAL(38,0))) AS DOUBLE) AS sp,
         CAST(SUM(CAST(q_c * q_c AS DECIMAL(38,0))) AS DOUBLE) AS sqq,
         CAST(SUM(CAST(p_c * p_c AS DECIMAL(38,0))) AS DOUBLE) AS spp,
         CAST(SUM(CAST(q_c * p_c AS DECIMAL(38,0))) AS DOUBLE) AS sqp
  FROM c GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       round(sp / n / 100.0, 6) AS avg_price,
       round(sqrt((spp - sp * sp / n) / (n - 1)) / 100.0, 6) AS std_price,
       round((sqp - sq * sp / n) / (n - 1) / 10000.0, 6) AS covar_qty_price,
       round((n * sqp - sq * sp)
             / (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)), 6)
         AS corr_qty_price
FROM s
""",
    doc="Grouped statistical moments (stddev, covariance, correlation) with "
    "order-INDEPENDENT accumulation: the five raw sums (Σx, Σy, Σx², "
    "Σy², Σxy) accumulate as exact integer-cent DECIMALs (bit-identical "
    "under any partitioning or merge order — built-in stddev/corr merge "
    "doubles, whose result depends on partition boundaries), and only "
    "the closed-form moment formulas run in double, from identical "
    "inputs on every engine. One map-side-combinable aggregation; the "
    "pattern every 100 TB profiling job needs to be reproducible.",
)
def q66_grouped_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    q_c = F.round(F.col("l_quantity") * 100).cast("bigint")
    p_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    s = li.select(
        "l_returnflag", q_c.alias("q_c"), p_c.alias("p_c")
    ).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("q_c").cast(DEC)).cast("double").alias("sq"),
        F.sum(F.col("p_c").cast(DEC)).cast("double").alias("sp"),
        F.sum((F.col("q_c") * F.col("q_c")).cast(DEC)).cast("double").alias("sqq"),
        F.sum((F.col("p_c") * F.col("p_c")).cast(DEC)).cast("double").alias("spp"),
        F.sum((F.col("q_c") * F.col("p_c")).cast(DEC)).cast("double").alias("sqp"),
    )
    n = F.col("n")
    sq, sp, sqq, spp, sqp = (F.col(x) for x in ("sq", "sp", "sqq", "spp", "sqp"))
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.round(sp / n / 100.0, 6).alias("avg_price"),
        F.round(F.sqrt((spp - sp * sp / n) / (n - 1)) / 100.0, 6).alias("std_price"),
        F.round((sqp - sq * sp / n) / (n - 1) / 10000.0, 6).alias("covar_qty_price"),
        F.round(
            (n * sqp - sq * sp)
            / (F.sqrt(n * sqq - sq * sq) * F.sqrt(n * spp - sp * sp)),
            6,
        ).alias("corr_qty_price"),
    )


@register(
    "q67_stream_static_join",
    """
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(CAST(round(e.value * 100) AS BIGINT) AS DECIMAL(38,0)))
            AS DOUBLE) / 100.0 AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
    doc="Stream-static join: the event stream enriched against the static "
    "customer dimension (planned as a broadcast hash join per micro-"
    "batch — the dim is re-resolved each batch, so a slowly-changing "
    "dimension picks up updates without restarting the stream), then a "
    "streaming aggregate per market segment with exact integer-cent "
    "value sums. No watermark needed: stream-static inner joins are "
    "stateless on the stream side. availableNow replay equals the "
    "batch join+aggregate, which is the oracle.",
)
def q67_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, f"{sf_dir}/events.parquet")
    cust = F.broadcast(
        read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    joined = ev.join(cust, ev.user_id == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), cents.alias("v_c")
    )
    agg = joined.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.sum(F.col("v_c").cast(DEC)).cast("double") / 100.0).alias("sum_value"),
    )
    run_available_now(agg, "q67_ssj_sink", output_mode="complete")
    return spark.table("q67_ssj_sink")


from spark_hadoop_automation_in_cloud_spark.operators.pandas_aggs import (  # noqa: E402
    sql_trimmed_mean,
    trimmed_mean,
)


@register(
    "q68_trimmed_mean",
    sql_trimmed_mean("orders", "o_orderpriority", "o_totalprice", trim_pct=10),
    doc="Custom Arrow UDAF (applyInPandas): per-priority 10%-trimmed mean "
    "of order value — the robust-location aggregate built-ins can't "
    "express. Kernel rules that make a pandas aggregate hash-checkable: "
    "integer cents in, int64 sum inside, integer-division cut indices, "
    "rounding done by Spark (Python round is banker's). One shuffle on "
    "the group key; for groups beyond executor memory the same trim "
    "runs on a pre-aggregated value histogram.",
)
def q68_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return trimmed_mean(o, "o_orderpriority", "o_totalprice", trim_pct=10)


from spark_hadoop_automation_in_cloud_spark.operators.components import (  # noqa: E402
    pagerank,
)


def _pagerank_oracle_sql(n_iter: int = 10, damping: float = 0.85) -> str:
    """Iteration-UNROLLED DuckDB PageRank (one CTE per power-iteration
    round) — a recursive CTE can't re-aggregate per round, but a fixed
    round count unrolls mechanically.  Mirrors operators.components.
    pagerank with ``per_iter_round_dp=9``.

    Cross-engine float discipline: every scalar is forced onto the SAME
    IEEE-double operation sequence Spark runs — DuckDB parses bare decimal
    literals as DECIMAL (``1 - 0.85`` would be an exact 0.15, which is NOT
    the double ``1.0 - 0.85`` = 0.15000000000000002 that Python/Spark
    compute), so the base and damping terms are CAST to DOUBLE explicitly.
    The one remaining order-dependent float op is the inflow SUM; snapping
    each round to 9dp bounds that noise (~1e-18 absolute) far away from
    the rounding grid, making a per-round snap disagreement vanishingly
    unlikely (~1e-9 per node-round) rather than merely uncommon.

    The q69 graph is symmetric by construction (both directions of every
    co-purchase pair), so every node has out-degree >= 1 and the operator's
    dangling-mass term is identically zero — the oracle omits it.
    """
    base = f"(CAST(1.0 AS DOUBLE) - CAST({damping} AS DOUBLE)) / (SELECT n FROM nn)"
    damp = f"CAST({damping} AS DOUBLE)"
    prev = "r0"
    rounds = []
    for i in range(1, n_iter + 1):
        rounds.append(
            f"""r{i} AS (
  SELECT n.node,
         round({base}
               + {damp} * COALESCE(i.inflow, CAST(0 AS DOUBLE)), 9) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank / d.deg) AS inflow
    FROM e JOIN {prev} r ON r.node = e.src JOIN deg d ON d.node = e.src
    GROUP BY e.dst) i ON i.node = n.node
)"""
        )
        prev = f"r{i}"
    unrolled = ",\n".join(rounds)
    return f"""
WITH p AS (
  SELECT DISTINCT CAST(json_extract_string(props, '$.k') AS INT) AS k, user_id
  FROM events WHERE event_type = 'purchase'
),
e AS (
  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
  FROM p a JOIN p b USING (k) WHERE a.user_id <> b.user_id
),
nodes AS (SELECT DISTINCT src AS node FROM e),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes),
{unrolled}
SELECT node, round(rank, 6) AS rank FROM {prev}
"""


@register(
    "q69_pagerank",
    _pagerank_oracle_sql(n_iter=10),
    doc="PageRank over the user contact graph (users sharing a purchase "
    "key, edges both directions): 10 damped power-iteration rounds, "
    "each one distributed join+aggregate with per-round localCheckpoint "
    "lineage cuts; dangling mass redistributed via a 1-row broadcast, "
    "no driver-side math. The influence-scoring companion to q39's "
    "connected components on the same iterative-dataflow skeleton. "
    "Oracle: iteration-unrolled CTE chain with identical IEEE-double "
    "scalar arithmetic forced on both engines; ranks snap to a 9dp grid "
    "per round so summation-order noise cannot accumulate.",
)
def q69_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events", parallelize=True)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .select(k.alias("k"), "user_id")
        .distinct()
        # both sides of the self-join consume this frame — checkpoint so
        # the events scan + JSON parse runs once, not twice
        .localCheckpoint()
    )
    # r11: the checkpointed distinct lands in ONE AQE-coalesced partition
    # (18.8k rows), which serialized the self-join's 3.5M-row pair fanout
    # + partial-distinct on a single task (measured 2.5 s of q69's 7 s).
    # Re-spreading the small frame across the cluster's cores (one cheap
    # 19k-row exchange, shared by both join sides via ReusedExchange)
    # parallelizes the fanout: 2.51 s → 0.87 s.  GATED on the pathology
    # (fewer partitions than cores): a corpus-scale purchases table
    # already carries ≥cores partitions and must not pay a redundant
    # exchange — the join then plans its own k-exchange exactly as
    # before.  Both the spread count and the gate read the cluster
    # (defaultParallelism), never a local constant.
    par = spark.sparkContext.defaultParallelism
    pk = (
        purchases.repartition(par, "k")
        if purchases.rdd.getNumPartitions() < par
        else purchases
    )
    edges = (
        pk.alias("a")
        .join(pk.alias("b"), "k")
        .where(F.col("a.user_id") != F.col("b.user_id"))
        .select(F.col("a.user_id").alias("src"), F.col("b.user_id").alias("dst"))
        .distinct()
    )
    # edges are .distinct() two lines up — skip pagerank's defensive
    # re-distinct (a full edge shuffle)
    return pagerank(edges, n_iter=10, per_iter_round_dp=9, assume_distinct_edges=True)


@register(
    "q70_resample_forward_fill",
    """
WITH daily AS (
  SELECT user_id, d, value AS day_value FROM (
    SELECT user_id, CAST(ts AS DATE) AS d, value,
           row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
),
bounds AS (
  SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY user_id
),
spine AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
)
SELECT s.user_id,
       strftime(s.day, '%Y-%m-%d') AS day,
       CASE WHEN daily.day_value IS NULL THEN 1 ELSE 0 END AS gap_filled,
       last_value(daily.day_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS UNBOUNDED PRECEDING) AS value_ff
FROM spine s LEFT JOIN daily ON s.user_id = daily.user_id AND s.day = daily.d
""",
    doc="Time-series resampling to a daily grid with forward fill (LOCF): "
    "per user, a calendar spine from first to last active day "
    "(sequence + explode — the spine is generated distributed, never "
    "on the driver), the last event value of each active day "
    "(deterministic ts/event_id tiebreak), and gaps carried forward "
    "with last(ignorenulls) over an unbounded-preceding frame. One "
    "shuffle on user_id shared by the aggregate, the spine join, and "
    "the fill window; spine length is bounded per key, so the explode "
    "fan-out scales with active span, not corpus size.",
)
def q70_resample_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    daily = (
        e.select(
            "user_id",
            F.to_date("ts").alias("d"),
            F.struct(F.col("ts"), F.col("event_id"), F.col("value")).alias("s"),
        )
        .groupBy("user_id", "d")
        .agg(F.max("s").alias("s"))
        .select("user_id", "d", F.col("s.value").alias("day_value"))
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    joined = (
        spine.alias("s")
        .join(
            daily.alias("dl"),
            (F.col("s.user_id") == F.col("dl.user_id"))
            & (F.col("s.day") == F.col("dl.d")),
            "left",
        )
        .select(F.col("s.user_id").alias("user_id"), "day", "day_value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.when(F.col("day_value").isNull(), 1).otherwise(0).alias("gap_filled"),
        F.last("day_value", ignorenulls=True).over(w).alias("value_ff"),
    )


@register(
    "q71_map_explode",
    """
WITH kv AS (
  SELECT user_id, props, unnest(json_keys(props)) AS prop_key
  FROM events
)
SELECT prop_key,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(CAST(json_extract_string(props, '$.' || prop_key) AS INT)
                     AS DECIMAL(38,0))) AS DOUBLE) AS sum_int_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM kv
GROUP BY prop_key
""",
    doc="MapType surface: the JSON props column parsed into map<string,int> "
    "(from_json with a map schema — typed, not the per-key "
    "get_json_object idiom of q16), exploded into (key, value) rows, "
    "aggregated per key. explode(map) is a generator projection fused "
    "into the scan; the only shuffle is the final per-key aggregate, "
    "map-side-combined. Exact DECIMAL value sums.",
)
def q71_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    kv = e.select("user_id", F.explode(m).alias("prop_key", "prop_value"))
    return kv.groupBy("prop_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("prop_value").cast(DEC)).cast("double").alias("sum_int_value"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )


@register(
    "q72_conversion_funnel",
    """
WITH s1 AS (
  SELECT user_id, event_type, ts,
         MIN(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id) AS s_ts
  FROM events
),
s2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'view' AND ts > s_ts THEN ts END)
              OVER (PARTITION BY user_id) AS v_ts
  FROM s1
),
s3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > v_ts THEN ts END)
              OVER (PARTITION BY user_id) AS p_ts
  FROM s2
),
per_user AS (
  SELECT user_id, MIN(s_ts) AS s_ts, MIN(v_ts) AS v_ts, MIN(p_ts) AS p_ts
  FROM s3 GROUP BY user_id
)
SELECT CAST(SUM(CASE WHEN s_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN v_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view_after,
       CAST(SUM(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_after,
       round(CAST(SUM(CASE WHEN p_ts IS NOT NULL
                           THEN epoch_us(p_ts) - epoch_us(s_ts) END) AS DOUBLE)
             / NULLIF(SUM(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END), 0)
             / 3600000000.0, 6) AS avg_hours_to_convert
FROM per_user
""",
    doc="Ordered conversion funnel (signup -> later view -> later "
    "purchase): three chained min-over-user windows — Catalyst collapses "
    "same-partitioning Window nodes into ONE user_id shuffle — then a "
    "global count per stage and the exact epoch-micros mean conversion "
    "time. The strict ts ordering makes it a sequence pattern, not three "
    "independent existence checks.",
)
def q72_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    s1 = e.withColumn(
        "s_ts", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "v_ts",
        F.min(
            F.when(
                (F.col("event_type") == "view") & (F.col("ts") > F.col("s_ts")),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "p_ts",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("v_ts")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        F.min("s_ts").alias("s_ts"),
        F.min("v_ts").alias("v_ts"),
        F.min("p_ts").alias("p_ts"),
    )
    converted = F.col("p_ts").isNotNull()
    return per_user.agg(
        F.sum(F.col("s_ts").isNotNull().cast("int")).cast("bigint").alias("n_signup"),
        F.sum(F.col("v_ts").isNotNull().cast("int")).cast("bigint").alias("n_view_after"),
        F.sum(converted.cast("int")).cast("bigint").alias("n_purchase_after"),
        F.round(
            F.sum(
                F.when(converted, epoch_us("p_ts") - epoch_us("s_ts"))
            ).cast("double")
            / F.nullif(F.sum(converted.cast("int")), F.lit(0))
            / 3_600_000_000.0,
            6,
        ).alias("avg_hours_to_convert"),
    )


@register(
    "q73_retention_cohorts",
    """
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
),
cohort_sizes AS (
  SELECT cohort_week, COUNT(*) AS n_cohort FROM firsts GROUP BY cohort_week
)
SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('week', f.cohort_week, a.active_week) AS INT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(cs.n_cohort AS BIGINT) AS n_cohort,
       round(CAST(COUNT(*) AS DOUBLE) / cs.n_cohort, 6) AS retention
FROM firsts f
JOIN active a USING (user_id)
JOIN cohort_sizes cs ON f.cohort_week = cs.cohort_week
GROUP BY f.cohort_week, week_offset, cs.n_cohort
""",
    doc="Weekly retention cohorts: users grouped by first-activity week, "
    "retention = share of the cohort active N weeks later. Two "
    "aggregations and a join, ALL keyed on user_id or the tiny "
    "(cohort_week) — the cohort-size frame is vocabulary-sized and "
    "broadcasts; nothing quadratic. Week arithmetic on date_trunc "
    "boundaries (both engines truncate to Monday), emitted as ISO "
    "strings to dodge date-representation drift.",
)
def q73_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_cohort"))
    j = (
        firsts.join(active, "user_id")
        .withColumn(
            "week_offset",
            (
                F.datediff(F.to_date("active_week"), F.to_date("cohort_week")) / 7
            ).cast("int"),
        )
        .join(F.broadcast(sizes), "cohort_week")
    )
    return j.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_cohort",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
    ).select(
        "cohort_week",
        "week_offset",
        "n_active",
        F.col("n_cohort").cast("bigint").alias("n_cohort"),
        F.round(F.col("n_active").cast("double") / F.col("n_cohort"), 6).alias(
            "retention"
        ),
    )


@register(
    "q74_scd2_intervals",
    """
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, event_type, ts,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM seq
),
grouped AS (
  SELECT user_id, event_type, run_id,
         MIN(ts) AS valid_from,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM runs GROUP BY user_id, event_type, run_id
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
         AS valid_to,
       n_events
FROM grouped
""",
    doc="SCD Type 2 interval build: each user's event_type value-runs become "
    "dimension rows with [valid_from, valid_to) validity — valid_to is "
    "the next run's start, NULL while current (the open row). The "
    "gaps-and-islands detect + cumulative run id + per-run aggregate + "
    "lead() all partition on user_id: one keyed shuffle end to end. "
    "(Both windows order by (ts, event_id) so run assignment is "
    "deterministic under timestamp ties.)",
)
def q74_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type"))
    ).cast("int")
    runs = e.select(
        "user_id", "event_type", "ts", "event_id", chg.alias("chg")
    ).withColumn(
        "run_id",
        F.sum("chg").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    grouped = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return grouped.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )


@register(
    "q75_weighted_sample",
    f"""
WITH mx AS (SELECT MAX(n_chars) AS max_chars FROM documents),
s AS (
  SELECT source, n_chars,
         {hashing.sql_md5_prefix_int("doc_id", nhex=8, salt=":pps")}
           / 4294967296.0 AS u,
         CAST(n_chars AS DOUBLE) / max_chars AS w
  FROM documents CROSS JOIN mx
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN u < w THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       round(AVG(w), 6) AS avg_weight
FROM s GROUP BY source
""",
    doc="Deterministic weighted (PPS Bernoulli) sampling: each document "
    "kept with probability proportional to its length weight — the "
    "data-mixing primitive for up/down-weighting sources by quality. "
    "The coin is a 32-bit md5 bucket over 2^32 (exact double) compared "
    "to weight = n_chars/max — all inputs exact, so the kept set is "
    "bit-identical across engines and runs, unlike rand()-based "
    "sample(). Scan-stage projection + one aggregate; the 1-row max "
    "broadcasts.",
)
def q75_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("n_chars").alias("max_chars"))
    u = hashing.md5_prefix_int(F.col("doc_id"), nhex=8, salt=":pps") / F.lit(4294967296.0)
    s = d.crossJoin(F.broadcast(mx)).select(
        "source",
        u.alias("u"),
        (F.col("n_chars").cast("double") / F.col("max_chars")).alias("w"),
    )
    return s.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum((F.col("u") < F.col("w")).cast("int")).cast("bigint").alias("n_sampled"),
        F.round(F.avg("w"), 6).alias("avg_weight"),
    )


@register(
    "q76_mad_outliers",
    """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c FROM events
),
med AS (
  SELECT event_type, quantile_cont(v_c, 0.5) AS med_c FROM c GROUP BY event_type
),
dev AS (
  SELECT c.event_type, c.v_c, med.med_c, abs(c.v_c - med.med_c) AS ad
  FROM c JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(ad, 0.5) AS mad_c FROM dev GROUP BY event_type
)
SELECT dev.event_type,
       round(MIN(dev.med_c) / 100.0, 6) AS median_value,
       round(MIN(mad.mad_c) / 100.0, 6) AS mad_value,
       CAST(SUM(CASE WHEN dev.ad > 3 * mad.mad_c THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n_total
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
""",
    doc="Robust outlier detection per group: median + MAD (median absolute "
    "deviation), flagging |x - med| > 3*MAD — the quality gate that, "
    "unlike q66's stddev, is not dragged by the outliers it hunts. All "
    "math on exact integer cents (medians are at worst half-integers — "
    "exact doubles), so the flag comparison has no rounding boundary. "
    "Two percentile aggregations + broadcast joins of the 5-row "
    "medians frame; the events table shuffles on event_type once per "
    "percentile pass.",
)
def q76_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    c = e.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("v_c")
    )
    med = c.groupBy("event_type").agg(
        F.expr("percentile(v_c, 0.5)").alias("med_c")
    )
    dev = c.join(F.broadcast(med), "event_type").select(
        "event_type", "v_c", "med_c", F.abs(F.col("v_c") - F.col("med_c")).alias("ad")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad_c")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("med_c") / 100.0, 6).alias("median_value"),
            F.round(F.min("mad_c") / 100.0, 6).alias("mad_value"),
            F.sum((F.col("ad") > 3 * F.col("mad_c")).cast("int"))
            .cast("bigint")
            .alias("n_outliers"),
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
        )
    )


@register(
    "q77_value_histogram",
    """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c FROM events
),
mm AS (SELECT MIN(v_c) AS lo, MAX(v_c) AS hi FROM c)
SELECT event_type,
       CAST((v_c - lo) * 10 // (hi - lo + 1) AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       round((lo + (v_c - lo) * 10 // (hi - lo + 1) * (hi - lo + 1) / 10.0)
             / 100.0, 6) AS bin_lo
FROM c CROSS JOIN mm
GROUP BY event_type, bin, bin_lo
""",
    doc="Fixed-width value histogram per group (10 bins over the global "
    "range): the bin index is PURE INTEGER arithmetic on cents — "
    "(v-lo)*10 // (hi-lo+1) — so bin edges have no float-boundary "
    "ambiguity on any engine. The 1-row min/max frame broadcasts; one "
    "aggregate over (group, bin). The profiling primitive behind "
    "q51's quality report and q76's outlier bands.",
)
def q77_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    c = e.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("v_c")
    )
    mm = c.agg(F.min("v_c").alias("lo"), F.max("v_c").alias("hi"))
    span = F.col("hi") - F.col("lo") + 1
    # integer DIV, not floor(double /): bin edges must be exact on any engine
    bin_ = F.expr("((v_c - lo) * 10) div (hi - lo + 1)").cast("int")
    binned = c.crossJoin(F.broadcast(mm)).select(
        "event_type",
        bin_.alias("bin"),
        F.round(
            (F.col("lo") + bin_.cast("bigint") * span / 10.0) / 100.0, 6
        ).alias("bin_lo"),
    )
    return binned.groupBy("event_type", "bin", "bin_lo").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).select("event_type", "bin", "n", "bin_lo")


@register(
    "q78_pareto_abc",
    """
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                  AS DECIMAL(38,0))) AS rev_c
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(rev_c) AS total_c FROM rev),
ranked AS (
  SELECT l_partkey, rev_c, total_c,
         SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
                          ROWS UNBOUNDED PRECEDING) AS cum_c
  FROM rev CROSS JOIN tot
)
SELECT l_partkey,
       round(CAST(rev_c AS DOUBLE) / 100.0, 6) AS revenue,
       round(CAST(cum_c AS DOUBLE) / CAST(total_c AS DOUBLE), 6) AS cum_share,
       CASE WHEN CAST(cum_c AS DOUBLE) / CAST(total_c AS DOUBLE) <= 0.5 THEN 'A'
            WHEN CAST(cum_c AS DOUBLE) / CAST(total_c AS DOUBLE) <= 0.8 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
""",
    doc="Pareto / ABC analysis: parts ranked by exact-cents revenue, "
    "cumulative share over the GLOBAL revenue order, A/B/C class at the "
    "50/80% knees. The running total uses the distributed two-pass "
    "prefix sum (operators.ranks.global_cumsum): range-partition on the "
    "order key, parallel per-partition cumsums, broadcast prefix "
    "offsets — never a single-partition window, so the plan holds even "
    "if the per-part frame itself is huge. Exact DECIMAL accumulation; "
    "class predicate on the cumulative cast once to double — identical "
    "inputs both engines, no accumulation-order drift.",
)
def q78_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint").cast(DEC)
    rev = li.groupBy("l_partkey").agg(F.sum(cents).alias("rev_c"))
    tot = rev.agg(F.sum("rev_c").alias("total_c"))
    ranked = global_cumsum(
        rev.crossJoin(F.broadcast(tot)),
        [F.col("rev_c").desc(), F.col("l_partkey").asc()],
        "rev_c",
        out_col="cum_c",
    )
    share = F.col("cum_c").cast("double") / F.col("total_c").cast("double")
    return ranked.select(
        "l_partkey",
        F.round(F.col("rev_c").cast("double") / 100.0, 6).alias("revenue"),
        F.round(share, 6).alias("cum_share"),
        F.when(share <= 0.5, "A").when(share <= 0.8, "B").otherwise("C").alias(
            "abc_class"
        ),
    )


@register(
    "q79_growth_accounting",
    """
WITH days AS (
  SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day FROM events
),
firsts AS (SELECT user_id, MIN(day) AS first_day FROM days GROUP BY user_id),
daily AS (
  SELECT d.day,
         CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_active,
         CAST(COUNT(DISTINCT CASE WHEN f.first_day = d.day
                                  THEN d.user_id END) AS BIGINT) AS n_new
  FROM days d JOIN firsts f USING (user_id)
  GROUP BY d.day
)
SELECT day, n_active, n_new,
       CAST(SUM(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_users
FROM daily
""",
    doc="Growth accounting: daily active users, new users (first-ever "
    "activity that day), and the cumulative user base — running COUNT "
    "DISTINCT decomposed into first-seen attribution + a running SUM, "
    "because a naive distinct-over-expanding-window re-scans history "
    "per day. Two aggregates keyed on user_id/day; the final running "
    "sum orders the ~30-row daily frame only. Day emitted as ISO string "
    "(date-representation-proof).",
)
def q79_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    )
    firsts = days.groupBy("user_id").agg(F.min("day").alias("first_day"))
    daily = (
        days.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.count_distinct("user_id").cast("bigint").alias("n_active"),
            F.count_distinct(
                F.when(F.col("first_day") == F.col("day"), F.col("user_id"))
            )
            .cast("bigint")
            .alias("n_new"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "n_active",
        "n_new",
        F.sum("n_new").over(w).cast("bigint").alias("cum_users"),
    )


@register(
    "q80_next_event_features",
    """
SELECT event_id, user_id, event_type,
       lead(event_type) OVER w AS next_type,
       CAST((epoch_us(lead(ts) OVER w) - epoch_us(ts)) // 1000000 AS BIGINT)
         AS gap_s
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    doc="Next-event sequence features: per event, the following event's "
    "type and the integer-seconds gap to it — the label/feature pair "
    "for next-event-prediction training (the forward-looking twin of "
    "q09's lag change detection). One user_id window shuffle; gap math "
    "on integer epoch-micros, NULL at each user's sequence end.",
)
def q80_next_event_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        (epoch_us(F.lead("ts").over(w)) - epoch_us("ts"))
        / F.lit(1_000_000)
    ).cast("bigint")
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        gap.alias("gap_s"),
    )


@register(
    "q81_transition_matrix",
    """
WITH seq AS (
  SELECT event_type, lead(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
),
counted AS (
  SELECT event_type, next_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY event_type), 6)
         AS p_transition
FROM counted
""",
    doc="Markov transition matrix over user event sequences: P(next type | "
    "type), the path-analysis aggregate behind funnel discovery and "
    "next-step recommendation. One user_id window for the successor, "
    "one (type, next) count, and a partition-total window on the "
    "25-cell matrix — heavy lifting all on the user_id shuffle the "
    "sequence family (q09/q74/q80) shares.",
)
def q81_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    counted = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("event_type")
    return counted.select(
        "event_type",
        "next_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n").cast("double") / F.sum("n").over(wt), 6).alias(
            "p_transition"
        ),
    )


@register(
    "q82_linear_regression",
    """
WITH c AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100) AS BIGINT) AS q_c,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS p_c
  FROM lineitem
),
s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(q_c AS DECIMAL(38,0))) AS DOUBLE) AS sq,
         CAST(SUM(CAST(p_c AS DECIMAL(38,0))) AS DOUBLE) AS sp,
         CAST(SUM(CAST(q_c * q_c AS DECIMAL(38,0))) AS DOUBLE) AS sqq,
         CAST(SUM(CAST(p_c * p_c AS DECIMAL(38,0))) AS DOUBLE) AS spp,
         CAST(SUM(CAST(q_c * p_c AS DECIMAL(38,0))) AS DOUBLE) AS sqp
  FROM c GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       round((n * sqp - sq * sp) / (n * sqq - sq * sq), 6) AS slope,
       round((sp - (n * sqp - sq * sp) / (n * sqq - sq * sq) * sq) / n / 100.0, 6)
         AS intercept,
       round(((n * sqp - sq * sp) * (n * sqp - sq * sp))
             / ((n * sqq - sq * sq) * (n * spp - sp * sp)), 6) AS r2
FROM s
""",
    doc="Grouped ordinary-least-squares regression (price ~ quantity): "
    "slope, intercept, R² assembled from the SAME five exact DECIMAL "
    "raw sums as q66 — order-independent accumulation, closed-form "
    "finish in double from identical inputs (built-in regr_slope "
    "merges doubles and is partitioning-dependent). The cents scale "
    "cancels in slope and R²; intercept rescales once. One map-side-"
    "combinable aggregation — the distributed-ML-lite primitive.",
)
def q82_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    q_c = F.round(F.col("l_quantity") * 100).cast("bigint")
    p_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    s = li.select(
        "l_returnflag", q_c.alias("q_c"), p_c.alias("p_c")
    ).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("q_c").cast(DEC)).cast("double").alias("sq"),
        F.sum(F.col("p_c").cast(DEC)).cast("double").alias("sp"),
        F.sum((F.col("q_c") * F.col("q_c")).cast(DEC)).cast("double").alias("sqq"),
        F.sum((F.col("p_c") * F.col("p_c")).cast(DEC)).cast("double").alias("spp"),
        F.sum((F.col("q_c") * F.col("p_c")).cast(DEC)).cast("double").alias("sqp"),
    )
    n = F.col("n")
    sq, sp, sqq, spp, sqp = (F.col(x) for x in ("sq", "sp", "sqq", "spp", "sqp"))
    slope = (n * sqp - sq * sp) / (n * sqq - sq * sq)
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round((sp - slope * sq) / n / 100.0, 6).alias("intercept"),
        F.round(
            ((n * sqp - sq * sp) * (n * sqp - sq * sp))
            / ((n * sqq - sq * sq) * (n * spp - sp * sp)),
            6,
        ).alias("r2"),
    )


# --- round-3 batch: statistics, skew handling, training-data packing --------

from spark_hadoop_automation_in_cloud_spark.operators.packing import (  # noqa: E402
    pack_sequences,
    sql_pack_sequences,
)
from spark_hadoop_automation_in_cloud_spark.operators.ranks import (  # noqa: E402
    global_cumsum,
    global_ntile,
)
from spark_hadoop_automation_in_cloud_spark.operators.skew import salted_join  # noqa: E402


@register(
    "q83_modal_event_type",
    """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
),
r AS (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
  FROM c
)
SELECT user_id, event_type AS modal_type, CAST(n AS BIGINT) AS n_mode
FROM r WHERE rn = 1
""",
    doc="Per-group mode (most frequent event_type per user, ties to the "
    "lexicographically smallest type). Count-then-rank: the count "
    "shrinks each user to <=|type domain| rows before the window, so "
    "the rank sorts a tiny frame — never the raw events. Both engines "
    "run the identical ROW_NUMBER tiebreak.",
)
def q83_modal_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("modal_type"),
            F.col("n").cast("bigint").alias("n_mode"),
        )
    )


@register(
    "q84_event_entropy",
    """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
),
w AS (
  SELECT user_id, n, SUM(n) OVER (PARTITION BY user_id) AS total FROM c
)
SELECT user_id,
       CAST(MAX(total) AS BIGINT) AS n_events,
       round(-SUM((CAST(n AS DOUBLE) / CAST(total AS DOUBLE))
                  * ln(CAST(n AS DOUBLE) / CAST(total AS DOUBLE))), 6) AS entropy
FROM w GROUP BY user_id
""",
    doc="Shannon entropy of each user's event-type distribution (behavioral "
    "diversity; 0 = single-type bot, ln(5) = uniform). Counts first — "
    "the entropy math runs on the per-(user,type) frame, <= |domain| "
    "rows per user. The window total and the final aggregate share the "
    "user_id hash partitioning, so Spark plans ONE shuffle. ln() "
    "follows the q63 TF-IDF precedent: identical double inputs both "
    "engines, rounded to 6dp.",
)
def q84_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy("user_id"))
    p = F.col("n").cast("double") / F.col("total").cast("double")
    return (
        c.withColumn("total", total)
        .groupBy("user_id")
        .agg(
            F.max("total").cast("bigint").alias("n_events"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


@register(
    "q85_basket_pairs",
    """
SELECT a.l_partkey AS p1, b.l_partkey AS p2, CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem a
JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
ORDER BY n DESC, p1, p2
LIMIT 50
""",
    doc="Market-basket co-occurrence: top-50 part pairs ordered together. "
    "Self equi-join on l_orderkey — fan-out is sum(k_i^2) over per-order "
    "line counts (k ~ 4), NOT corpus-quadratic, so the shuffle stays "
    "proportional to the input at any scale; canonical p1 < p2 halves "
    "it. Global top-50 is TakeOrderedAndProject (per-partition heaps, "
    "no full sort), deterministic via the (n, p1, p2) tiebreak.",
)
def q85_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2"))
    return (
        a.join(b, "ok")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "p1", "p2")
        .limit(50)
    )


@register(
    "q86_price_skyline",
    """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS m
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
s AS (
  SELECT d, m,
         MAX(m) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS prev
  FROM daily
)
SELECT CAST(d AS VARCHAR) AS d, round(CAST(m AS DOUBLE) / 100.0, 2) AS best_price
FROM s WHERE prev IS NULL OR m > prev
""",
    doc="2-D skyline (Pareto staircase): days whose max order price beats "
    "every earlier day — the record-breaking frontier of (date min, "
    "price max) dominance. Aggregate-first: the day-level MAX collapses "
    "the input to |days| rows, THEN the running max walks that tiny "
    "frame (same bounded-window-input discipline as q78). Exact cents "
    "comparison; no double ordering anywhere.",
)
def q86_price_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.max(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("m")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    return (
        daily.withColumn("prev", F.max("m").over(w))
        .where(F.col("prev").isNull() | (F.col("m") > F.col("prev")))
        .select(
            F.col("d").cast("string").alias("d"),
            F.round(F.col("m").cast("double") / 100.0, 2).alias("best_price"),
        )
    )


@register(
    "q87_salted_priority_revenue",
    f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       round({sql_dsum("l_extendedprice")}, 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    doc="Skew-safe fact-to-dim equi-join: lineitem keys are salted 8 ways "
    "by a deterministic expression and orders is replicated 8x, so a "
    "pathologically hot l_orderkey splits across 8 reduce tasks instead "
    "of stalling one straggler (operators/skew.py). Salting is a "
    "physical rewrite only — the oracle is the PLAIN join, and the "
    "exact-cents revenue per priority must come out identical.",
)
def q87_salted_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    salt = F.col("o_orderkey") * 31 + F.col("l_linenumber")
    joined = salted_join(li, o, ["o_orderkey"], fact_salt=salt, n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.round(dsum("l_extendedprice"), 2).alias("revenue"),
    )


@register(
    "q88_rfm_segments",
    f"""
WITH m AS (
  SELECT o_custkey,
         CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                        DATE '1998-08-02') AS INT) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         round({sql_dsum("o_totalprice")}, 2) AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, recency_days, frequency, monetary,
       CAST(NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS INT) AS r_quartile,
       CAST(NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS INT) AS f_quartile,
       CAST(NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS INT) AS m_quartile
FROM m
""",
    doc="RFM customer segmentation: recency (days from last order to the "
    "dataset horizon), frequency, exact-cents monetary, each cut into "
    "NTILE(4) quartiles with o_custkey tiebreaks so assignment is "
    "total-ordered and engine-independent. Each quartile is computed as "
    "a DISTRIBUTED exact ntile (operators.ranks): range-partitioned "
    "global row number + closed-form bucket expression — a built-in "
    "unpartitioned NTILE would serialize all customers through one "
    "task; this plan stays parallel at any |customers|.",
)
def q88_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    m = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("1998-08-02").cast("date"), F.to_date(F.max("o_orderdate"))
        )
        .cast("int")
        .alias("recency_days"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.round(dsum("o_totalprice"), 2).alias("monetary"),
    )
    # distributed exact NTILE per dimension (operators.ranks.global_ntile:
    # range partition + local windows + broadcast prefix offsets + the
    # closed-form bucket expression) — ntile semantics preserved exactly
    # (equivalence pinned in tests), no single-partition sort at any
    # |customers| scale.  Each ordering needs its own range partitioning,
    # so the plan is one localCheckpoint of the metric frame + one
    # materialization per dimension (4 total); global_ntile reuses its
    # partition counts as the row total, so no separate count() action.
    m = m.localCheckpoint()
    r = global_ntile(
        m, [F.col("recency_days").asc(), F.col("o_custkey").asc()], 4,
        out_col="r_quartile",
    )
    r = global_ntile(
        r, [F.col("frequency").desc(), F.col("o_custkey").asc()], 4,
        out_col="f_quartile",
    )
    r = global_ntile(
        r, [F.col("monetary").desc(), F.col("o_custkey").asc()], 4,
        out_col="m_quartile",
    )
    return r.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_quartile",
        "f_quartile",
        "m_quartile",
    )


@register(
    "q89_session_intervals",
    """
WITH seq AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM seq
)
SELECT user_id, session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us
FROM islands
GROUP BY user_id, session_id
""",
    doc="Sessionization with materialized intervals: ordinal session ids, "
    "start/end timestamps and exact integer-microsecond durations — the "
    "session-table grain that per-session sequence construction and "
    "engagement analysis consume (q43 keeps only counts; q33 is the "
    "streaming twin). Gaps-and-islands on one user_id window; the "
    "running flag-sum and the final GROUP BY share the same hash "
    "partitioning, so the whole query is a single shuffle.",
)
def q89_session_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = epoch_us("ts") - epoch_us(F.lag("ts").over(w))
    is_new = F.when(
        F.lag("ts").over(w).isNull() | (gap_us > 1800 * 1_000_000), 1
    ).otherwise(0)
    islands = e.select(
        "user_id",
        "ts",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("session_id"),
    )
    return islands.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (epoch_us(F.max("ts")) - epoch_us(F.min("ts")))
        .cast("bigint")
        .alias("duration_us"),
    )


@register(
    "q90_weighted_median",
    """
WITH g AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         SUM(CAST(round(l_quantity) AS BIGINT)) AS w
  FROM lineitem GROUP BY l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT)
),
cum AS (
  SELECT l_returnflag, price_c,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price_c
                      ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM g
)
SELECT l_returnflag,
       round(CAST(MIN(price_c) AS DOUBLE) / 100.0, 2) AS weighted_median
FROM cum WHERE cw * 2 >= tw
GROUP BY l_returnflag
""",
    doc="Exact quantity-weighted median price per return flag: collapse to "
    "distinct (flag, price-cents) with summed integer weights FIRST — "
    "the cumulative window then walks the distinct-price frame, not raw "
    "lineitem — and pick the smallest price whose cumulative weight "
    "reaches half the total. Pure integer comparisons end to end; "
    "contrast with q37's approx_percentile, which trades exactness for "
    "a mergeable sketch.",
)
def q90_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_c"),
    ).agg(F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("w"))
    wp = Window.partitionBy("l_returnflag")
    cum = g.select(
        "l_returnflag",
        "price_c",
        F.sum("w").over(wp.orderBy("price_c").rowsBetween(Window.unboundedPreceding, 0)).alias("cw"),
        F.sum("w").over(wp).alias("tw"),
    )
    return (
        cum.where(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("price_c").cast("double") / 100.0, 2).alias(
                "weighted_median"
            )
        )
    )


@register(
    "q91_mixture_sampling",
    f"""
WITH rated AS (
  SELECT doc_id, source,
         CASE CAST(substr(source, 4) AS INT) % 3
           WHEN 0 THEN 900000 WHEN 1 THEN 500000 ELSE 200000
         END AS rate_micro
  FROM documents
)
SELECT doc_id, source, CAST(rate_micro AS INT) AS rate_micro
FROM rated
WHERE {hashing.sql_md5_int60("doc_id || ':' || source")} % 1000000 < rate_micro
""",
    doc="Source-mixture sampling for training-set composition: each source "
    "tier gets a target keep-rate (90/50/20% by source index mod 3) and "
    "a document survives iff its portable 60-bit content hash falls "
    "under the rate — deterministic, seedless, retry-stable, and "
    "decided row-locally (a pure filter: no shuffle, no sort, no "
    "global count; pushdown-friendly at any scale). The same hash "
    "gates both engines, so the kept set matches exactly — unlike "
    "rand()-based sampling, which is irreproducible across retries.",
)
def q91_mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    rate = (
        F.when(F.substring("source", 4, 10).cast("int") % 3 == 0, 900000)
        .when(F.substring("source", 4, 10).cast("int") % 3 == 1, 500000)
        .otherwise(200000)
    )
    h = hashing.md5_int60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source"))
    )
    return (
        d.withColumn("rate_micro", rate.cast("int"))
        .where(h % 1000000 < F.col("rate_micro"))
        .select("doc_id", "source", "rate_micro")
    )


@register(
    "q92_sequence_packing",
    sql_pack_sequences("documents", "source", "doc_id", "text", capacity=256),
    doc="GPT-style sequence packing (concat-then-chunk): documents are laid "
    "out as one token stream per source and sliced into fixed 256-token "
    "bins; boundary-straddling docs split across adjacent bins. One "
    "prefix-sum window PARTITIONED BY source (never a global "
    "single-partition sort) + a bounded explode of bin spans — "
    "embarrassingly parallel and exactly reproducible, which is why "
    "pretraining pipelines pack this way instead of greedy first-fit "
    "(inherently sequential). operators/packing.py.",
)
def q92_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return pack_sequences(d, "source", "doc_id", "text", capacity=256)


from spark_hadoop_automation_in_cloud_spark.operators.clustering import (  # noqa: E402
    kmeans_assign,
)

_CM_COEFFS = hashing.minhash_coeffs(4, seed=11)
_CM_W = 64  # sketch width (buckets per row)


def _cm_sketch_sql() -> str:
    h = hashing.sql_md5_int60("user_id")
    rows = "\nUNION ALL\n".join(
        f"SELECT user_id, {i} AS row_i, ({hashing.sql_perm_hash('h', a, b)}) % {_CM_W} AS bucket FROM ev"
        for i, (a, b) in enumerate(_CM_COEFFS)
    )
    return f"""
WITH ev AS (SELECT user_id, {h} AS h FROM events),
b AS (
{rows}
),
sketch AS (SELECT row_i, bucket, COUNT(*) AS n FROM b GROUP BY row_i, bucket),
items AS (SELECT DISTINCT user_id, row_i, bucket FROM b),
est AS (
  SELECT user_id, MIN(n) AS est_n
  FROM items JOIN sketch USING (row_i, bucket) GROUP BY user_id
),
tru AS (SELECT user_id, COUNT(*) AS true_n FROM events GROUP BY user_id)
SELECT user_id, CAST(true_n AS BIGINT) AS true_n, CAST(est_n AS BIGINT) AS est_n
FROM tru JOIN est USING (user_id)
"""


@register(
    "q93_countmin_heavy_hitters",
    _cm_sketch_sql(),
    doc="Count-min sketch frequency estimation: 4 portable integer hash "
    "rows x 64 buckets, incremented per event, point-queried with the "
    "min-over-rows rule — est_n >= true_n always (one-sided error), "
    "with overestimate bounded by collisions. The sketch is a FIXED "
    "256-cell aggregate regardless of corpus size: fully map-side "
    "combinable, mergeable across partitions/streams, and the "
    "estimate join broadcasts 256 rows — the sketch answer to heavy "
    "hitters when exact per-key state (q45's distinct counts) stops "
    "fitting. true_n sits alongside so the error is visible per key.",
)
def q93_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    ev = e.select("user_id", hashing.md5_int60(F.col("user_id")).alias("h"))
    buckets = [
        (hashing.perm_hash(F.col("h"), a, b) % _CM_W).alias(f"b{i}")
        for i, (a, b) in enumerate(_CM_COEFFS)
    ]
    b = ev.select("user_id", *buckets).select(
        "user_id",
        F.posexplode(F.array(*[F.col(f"b{i}") for i in range(len(_CM_COEFFS))])).alias(
            "row_i", "bucket"
        ),
    )
    sketch = b.groupBy("row_i", "bucket").agg(F.count(F.lit(1)).alias("n"))
    items = b.distinct()
    est = (
        items.join(F.broadcast(sketch), ["row_i", "bucket"])
        .groupBy("user_id")
        .agg(F.min("n").alias("est_n"))
    )
    tru = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_n"))
    return tru.join(est, "user_id").select(
        "user_id",
        F.col("true_n").cast("bigint").alias("true_n"),
        F.col("est_n").cast("bigint").alias("est_n"),
    )


@register(
    "q94_benford_first_digit",
    """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                     1, 1) AS INT) AS digit
  FROM orders
),
c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
t AS (SELECT SUM(n) AS total FROM c)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / total, 6) AS share,
       round(log10(1.0 + 1.0 / digit), 6) AS benford_p
FROM c CROSS JOIN t
""",
    doc="Benford first-digit audit: the leading digit of every order total "
    "(taken from exact integer cents — never from engine-specific "
    "double formatting) against the Benford expectation log10(1+1/d). "
    "The fraud/data-quality screen: fabricated or unit-mangled amounts "
    "flare as share-vs-benford_p gaps. One 9-row aggregate; the total "
    "joins back via broadcast.",
)
def q94_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.agg(F.sum("n").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
        F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6).alias(
            "benford_p"
        ),
    )


@register(
    "q95_containment_dups",
    dd.sql_containment_pairs(_SHINGLE_SQL, min_containment=0.4),
    doc="Asymmetric shingle-containment near-dup: |A∩B|/|A| >= 0.4 finds "
    "docs mostly CONTAINED in another (boilerplate/template/quote "
    "relation) that symmetric Jaccard (q22) misses when the container "
    "is much larger. Same lossless rarest-first prefix filter, "
    "containment variant: only the contained side prunes its posting "
    "list; candidates verified by exact intersection (oracle runs the "
    "naive full index; property test pins equivalence).",
)
def q95_containment_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    sh = dd.shingle_rows(d, "doc_id", "text", n=2)
    return dd.containment_pairs(sh, min_containment=0.4)


def _kmeans_oracle_sql(k: int = 8, n_iter: int = 5) -> str:
    """Iteration-UNROLLED DuckDB Lloyd's k-means as a CTE chain (no
    leading WITH) ending in ``asg(vec_id, cid, d)`` — the final
    assignment under the converged centroids — mirroring
    operators.clustering.kmeans_assign exactly:

    - all arithmetic in DOUBLE (the operator casts the float32 embeddings
      up front; widening is exact),
    - seeds = the k lowest-id vectors, cluster_id = rank-1,
    - assignment = argmin of squared L2 with ties to the lowest cluster id,
    - centroid means via micro-quantized integer accumulation
      (SUM(round(v*1e6)::HUGEINT)/ (n*1e6)) — order-independent and
      bit-identical across engines, so the trajectories cannot diverge
      (the same _Q=1e6 quantization as the Spark side),
    - empty clusters keep their previous centroid,
    - output: assignment under the final centroids, sq_dist rounded 6dp.

    The only float summation in the loop is the squared-L2 fold itself;
    both engines fold the 64 per-dimension terms in array order.
    """
    iters = []
    prev = "c0"
    for i in range(1, n_iter + 1):
        iters.append(
            f"""a{i} AS (
  SELECT vec_id, v, cid, d FROM (
    SELECT e.vec_id, e.v, c.cid,
           list_sum(list_transform(generate_series(1, len(e.v)),
                    i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]))) AS d,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_sum(list_transform(generate_series(1, len(e.v)),
                      i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]))), c.cid
           ) AS rn
    FROM emb e CROSS JOIN {prev} c) WHERE rn = 1
),
c{i} AS (
  SELECT p.cid, COALESCE(m.c, p.c) AS c
  FROM {prev} p LEFT JOIN (
    SELECT cid, list(m ORDER BY pos) AS c FROM (
      SELECT cid, pos,
             CAST(SUM(CAST(round(val * 1000000) AS HUGEINT)) AS DOUBLE)
               / (COUNT(*) * 1000000) AS m
      FROM (SELECT cid,
                   unnest(generate_series(1, len(v))) AS pos,
                   unnest(v) AS val
            FROM a{i})
      GROUP BY cid, pos) GROUP BY cid) m ON m.cid = p.cid
)"""
        )
        prev = f"c{i}"
    unrolled = ",\n".join(iters)
    # exposed as a reusable CTE chain ending in `asg(vec_id, cid, d)` so
    # compositions (q107's cluster-bucketed dedup) share the EXACT same
    # trajectory the q96 oracle pins
    return f"""emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
  FROM emb ORDER BY vec_id LIMIT {k}
),
{unrolled},
asg AS (
  SELECT vec_id, cid, d FROM (
    SELECT e.vec_id, c.cid,
           list_sum(list_transform(generate_series(1, len(e.v)),
                    i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]))) AS d,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_sum(list_transform(generate_series(1, len(e.v)),
                      i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]))), c.cid
           ) AS rn
    FROM emb e CROSS JOIN {prev} c) WHERE rn = 1
)"""


@register(
    "q96_kmeans_clusters",
    f"WITH {_kmeans_oracle_sql(k=8, n_iter=5)}\n"
    "SELECT vec_id, cid AS cluster_id, round(d, 6) AS sq_dist FROM asg",
    doc="Distributed Lloyd's k-means on the embeddings table (k=8, 5 "
    "iterations, deterministic lowest-id seeding, exact integer-"
    "quantized centroid means). Iterative-broadcast pattern: centroids "
    "(k x dim doubles) broadcast each round, assignment is a JVM-side "
    "F.aggregate distance + min_by argmin, new means come back as ONE "
    "dimension-exploded map-side-combined aggregation — the corpus is "
    "rescanned but never shuffled at full width, and only k x dim "
    "model values ever reach the driver. operators/clustering.py.",
)
def q96_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    return kmeans_assign(emb, k=8, max_iter=5)


@register(
    "q97_point_in_time_state",
    """
WITH st AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
  FROM events WHERE event_type <> 'purchase'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, event_type, ts,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM st
),
iv AS (
  SELECT user_id, event_type AS state_type,
         MIN(ts) AS valid_from,
         lead(MIN(ts)) OVER (PARTITION BY user_id ORDER BY MIN(ts)) AS valid_to
  FROM runs GROUP BY user_id, event_type, run_id
)
SELECT p.event_id, p.user_id, p.ts, iv.state_type
FROM events p
JOIN iv ON iv.user_id = p.user_id
       AND p.ts >= iv.valid_from
       AND (iv.valid_to IS NULL OR p.ts < iv.valid_to)
WHERE p.event_type = 'purchase'
""",
    doc="Point-in-time (as-of-state) lookup against an SCD2 dimension: "
    "build validity intervals from each user's non-purchase state runs "
    "(q74's gaps-and-islands), then attribute every purchase to the "
    "state the user was in at that instant — the temporal-join pattern "
    "behind feature-store training-data correctness (no future "
    "leakage). The interval join is an equi-join on user_id with the "
    "range predicate applied inside the matched group: per-user "
    "interval lists are bounded, so there is no cross-user fan-out and "
    "the whole query rides the one user_id shuffle.",
)
def q97_point_in_time_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    st = e.where(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type"))
    ).cast("int")
    runs = st.select(
        "user_id", "event_type", "ts", "event_id", chg.alias("chg")
    ).withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    grouped = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.min("ts").alias("valid_from")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    iv = grouped.select(
        "user_id",
        F.col("event_type").alias("state_type"),
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # explicit aliases: p and iv share lineage (both derive from e), so
    # column-object equality would lean on Spark's ambiguous-self-join
    # special-casing (it warned 'trivially true equals predicate');
    # alias-qualified names resolve unambiguously on any Spark line
    return (
        p.alias("p")
        .join(
            iv.alias("iv"),
            (F.col("p.user_id") == F.col("iv.user_id"))
            & (F.col("p.ts") >= F.col("iv.valid_from"))
            & (
                F.col("iv.valid_to").isNull()
                | (F.col("p.ts") < F.col("iv.valid_to"))
            ),
        )
        .select("event_id", F.col("p.user_id").alias("user_id"), "ts", "state_type")
    )


@register(
    "q98_mom_revenue_growth",
    f"""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         {sql_dsum("o_totalprice")} AS revenue
  FROM orders GROUP BY date_trunc('month', o_orderdate)
)
SELECT month,
       round(revenue, 2) AS revenue,
       round(revenue - lag(revenue) OVER (ORDER BY month), 2) AS delta,
       round((revenue - lag(revenue) OVER (ORDER BY month))
             / lag(revenue) OVER (ORDER BY month), 6) AS growth_rate
FROM m
""",
    doc="Month-over-month revenue growth: exact-cents monthly rollup, then "
    "lag deltas and growth rate over the month sequence. The ordered "
    "window runs on the ALREADY-AGGREGATED month frame (q78's "
    "bounded-window-input discipline) — at 100 TB the heavy lifting is "
    "one map-side-combinable month aggregation; the trend math touches "
    "|months| rows.",
)
def q98_mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        dsum("o_totalprice").alias("revenue")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") - prev, 2).alias("delta"),
        F.round((F.col("revenue") - prev) / prev, 6).alias("growth_rate"),
    )


#: small demonstrative stopword list — shared literal between both engines
_STOPWORDS = ("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")
_SQL_STOPWORDS = "(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"


@register(
    "q99_text_normalize",
    f"""
WITH norm AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_raw_tokens,
         list_filter(
           string_split(
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                 ' +', ' ', 'g')),
             ' '),
           tok -> len(tok) > 0 AND tok NOT IN {_SQL_STOPWORDS}
         ) AS toks
  FROM documents
)
SELECT doc_id,
       CAST(n_raw_tokens AS INT) AS n_raw_tokens,
       CAST(len(toks) AS INT) AS n_clean_tokens,
       {hashing.sql_md5_int60("list_aggregate(toks, 'string_agg', ' ')")} AS norm_hash
FROM norm
""",
    doc="Text normalization pipeline: lowercase → punctuation to spaces → "
    "whitespace collapse → stopword removal, emitting token counts and "
    "a portable 60-bit hash of the normalized text (the canonical form "
    "downstream dedup keys on — q20's input in a real pipeline). Pure "
    "JVM projections, no shuffle, no Python; the oracle recomputes the "
    "identical normalization so the hash pins byte equality, not just "
    "counts.",
)
def q99_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    toks = F.filter(
        F.split(cleaned, " "),
        lambda t: (F.length(t) > 0) & ~t.isin(*_STOPWORDS),
    )
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("int").alias("n_raw_tokens"),
        F.size(toks).cast("int").alias("n_clean_tokens"),
        hashing.md5_int60(F.array_join(toks, " ")).alias("norm_hash"),
    )


@register(
    "q100_waiting_suppliers",
    """
WITH ordsupp AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
),
nsupp AS (
  SELECT l_orderkey, COUNT(*) AS n_supp FROM ordsupp GROUP BY l_orderkey
),
late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
),
nlate AS (
  SELECT l_orderkey, COUNT(*) AS n_late FROM late GROUP BY l_orderkey
)
SELECT l.l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l
JOIN nsupp USING (l_orderkey)
JOIN nlate USING (l_orderkey)
WHERE nsupp.n_supp >= 2 AND nlate.n_late = 1
GROUP BY l.l_suppkey
ORDER BY numwait DESC, l_suppkey
LIMIT 100
""",
    doc="Sole-blame late suppliers (TPC-H Q21 shape on this schema): "
    "suppliers who shipped >90 days after the order date on multi-"
    "supplier orders where NO other supplier was late. The classic "
    "EXISTS/NOT-EXISTS correlated pair, decorrelated by hand into two "
    "per-order aggregates joined back on the order key — every step an "
    "equi-join or map-side-combinable count on l_orderkey, so the "
    "whole query rides one join key and AQE can broadcast the shrunken "
    "per-order frames. Deterministic heap top-100.",
)
def q100_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    ordsupp = li.select("l_orderkey", "l_suppkey").distinct()
    nsupp = ordsupp.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_supp"))
    late = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    nlate = late.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_late"))
    return (
        late.join(nsupp, "l_orderkey")
        .join(nlate, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "l_suppkey")
        .limit(100)
    )


_SQL_TRAIN_PRED = hashing.sql_md5_prefix_int("doc_id", nhex=8, salt=":split") + " % 100 < 80"


@register(
    "q101_unigram_lm_quality",
    tx.sql_unigram_lm_scores("documents", _SQL_TRAIN_PRED, "doc_id", "text"),
    doc="Language-model quality scoring (CCNet/Gopher-style perplexity "
    "filter): every document's average negative log-probability under "
    "an add-one-smoothed unigram model fit on the q42 train split — "
    "the model is two aggregates (vocabulary counts + one stats row), "
    "scoring one token equi-join + per-doc aggregation; nothing "
    "driver-side, nothing quadratic (operators/textops.py "
    "unigram_lm_scores). Per-token log-probs snap to an integer 1e-6 "
    "grid and sum exactly, so the score is partition-order-independent "
    "and the DuckDB oracle reproduces it bit-for-bit.",
)
def q101_unigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    bucket = hashing.md5_prefix_int(F.col("doc_id"), nhex=8, salt=":split") % 100
    train = d.where(bucket < 80)
    return tx.unigram_lm_scores(d, train, "doc_id", "text", alpha=1.0)


def _q102_sql() -> str:
    import math

    from spark_hadoop_automation_in_cloud_spark.operators.sketches import _offset

    eps = 0.01
    off = _offset(eps)
    # the EXACT double constants the Spark kernel uses, inlined via float
    # repr (round-trips bit-exactly through DuckDB's literal parser):
    # ln(1+eps) computed with log1p — the SQL ln(1.01) would differ in the
    # last ulps and could flip a floor at a bucket boundary
    lg = repr(math.log1p(eps))
    base = repr(1.0 + eps)
    return f"""
WITH b AS (
  SELECT l_returnflag,
         CAST(floor(ln(l_extendedprice) / {lg}) AS BIGINT) + {off} AS bucket
  FROM lineitem
),
c AS (SELECT l_returnflag, bucket, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
t AS (SELECT l_returnflag, SUM(cnt) AS total FROM c GROUP BY 1),
qs(q) AS (VALUES (0.25), (0.5), (0.75), (0.95)),
r AS (
  SELECT l_returnflag, q,
         GREATEST(CAST(ceil(round(q * total, 9)) AS BIGINT), 1) AS rnk
  FROM t CROSS JOIN qs
),
cum AS (
  SELECT l_returnflag, bucket,
         SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum
  FROM c
),
pick AS (
  SELECT r.l_returnflag, r.q, MIN(cum.bucket) AS bucket
  FROM r JOIN cum ON cum.l_returnflag = r.l_returnflag AND cum.cum >= r.rnk
  GROUP BY 1, 2
)
SELECT l_returnflag,
       CAST(q AS DOUBLE) AS q,
       round(power({base}, bucket - {off} + 0.5), 6) AS est
FROM pick
"""


@register(
    "q102_price_quantile_sketch",
    _q102_sql(),
    doc="Mergeable-quantile-sketch rollup (operators/sketches.py): build "
    "per-(returnflag, linestatus) log-bucket sketches of the line price, "
    "merge the stored sketches up to returnflag — touching only bucket "
    "rows, never re-scanning facts — and estimate the quartiles + p95 "
    "per flag. The oracle replays the integer bucket math directly "
    "(identical double constants inlined via float repr; the nearest "
    "price sits ~1.7e-6 buckets from a boundary, so the floors are "
    "engine-stable), proving the whole sketch→merge→estimate pipeline "
    "end-to-end, not just the pytest properties.",
)
def q102_price_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_hadoop_automation_in_cloud_spark.operators.sketches import (
        merge_quantile_sketches,
        quantile_estimates,
        quantile_sketches,
    )

    li = read_table(spark, sf_dir, "lineitem")
    parts = quantile_sketches(
        li, ["l_returnflag", "l_linestatus"], "l_extendedprice", eps=0.01
    )
    merged = merge_quantile_sketches(parts, ["l_returnflag"], eps=0.01)
    est = quantile_estimates(merged, ["l_returnflag"], [0.25, 0.5, 0.75, 0.95], eps=0.01)
    return est.select("l_returnflag", "q", F.round("est", 6).alias("est"))


@register(
    "q103_salted_full_outer_parts",
    f"""
WITH f AS (SELECT * FROM lineitem WHERE l_quantity >= 49),
     d AS (SELECT * FROM part WHERE p_size <= 25),
     j AS (SELECT * FROM f FULL OUTER JOIN d ON f.l_partkey = d.p_partkey)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(l_orderkey) AS BIGINT) AS n_lineitems,
       CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS n_dim_only,
       round(COALESCE({sql_dsum("l_extendedprice")}, 0), 2) AS revenue
FROM j GROUP BY p_brand
""",
    doc="Skew-safe FULL OUTER fact-to-dim join (operators/skew.py): the "
    "fact side (high-quantity lineitems) is salted 8 ways, the dim "
    "(small parts) replicated 8x, and unmatched dim rows are appended "
    "null-extended via a map-side-collapsed distinct — so a hot partkey "
    "splits across 8 reduce tasks while dim-preservation semantics "
    "survive replication (an unmatched dim replica must surface ONCE, "
    "not 8x). Salting is a physical rewrite only: the oracle is the "
    "PLAIN full outer join, and both unmatched directions are pinned in "
    "the output — n_dim_only counts dim rows with no fact match per "
    "brand, the NULL-brand group holds fact rows with no dim match.",
)
def q103_salted_full_outer_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 49)
        .withColumnRenamed("l_partkey", "p_partkey")
    )
    p = read_table(spark, sf_dir, "part").where(F.col("p_size") <= 25)
    salt = F.col("p_partkey") * 31 + F.col("l_linenumber")
    j = salted_join(li, p, ["p_partkey"], fact_salt=salt, n_salts=8, how="full")
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count("l_orderkey").cast("bigint").alias("n_lineitems"),
        (F.count(F.lit(1)) - F.count("l_orderkey")).cast("bigint").alias("n_dim_only"),
        F.round(F.coalesce(dsum("l_extendedprice"), F.lit(0.0)), 2).alias("revenue"),
    )


@register(
    "q104_hll_distinct_rollup",
    """
SELECT event_type,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_n,
       CAST(COUNT(DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP)) AS BIGINT)
         AS n_day_sketches,
       TRUE AS est_in_bound
FROM events GROUP BY event_type
""",
    doc="Mergeable HLL cardinality rollup (operators/sketches.py): one "
    "DataSketches HLL sketch of event_id per (event_type, day) — the "
    "per-partition state a datamart persists — then hll_union_agg up to "
    "event_type, touching one fixed-size sketch row per day instead of "
    "re-scanning facts. The estimator itself isn't SQL-replayable "
    "(DataSketches-internal hashing), so the oracle pins what IS exact: "
    "the group keys, the exact distinct count, the number of day "
    "sketches each rollup merged, and the assertion that the "
    "union-then-estimate lands within the published 3-sigma bound "
    "(3 x 1.04/sqrt(2^12) ~ 4.9%) of the exact answer — est_in_bound "
    "must come back TRUE for every group or the value hash fails.",
)
def q104_hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_hadoop_automation_in_cloud_spark.operators.sketches import (
        distinct_sketches,
        merge_sketches,
    )

    e = read_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    day_sk = distinct_sketches(e, ["event_type", "day"], "event_id")
    est = merge_sketches(day_sk, ["event_type"], out_col="est_n")
    n_sk = day_sk.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_day_sketches")
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("event_id").cast("bigint").alias("exact_n")
    )
    return (
        exact.join(est, "event_type")
        .join(n_sk, "event_type")
        .select(
            "event_type",
            "exact_n",
            "n_day_sketches",
            (
                F.abs(F.col("est_n") - F.col("exact_n"))
                <= F.col("exact_n") * F.lit(3 * 1.04 / 2**6)
            ).alias("est_in_bound"),
        )
    )


def _q105_sql(probe_per_type: int | None = None) -> str:
    from spark_hadoop_automation_in_cloud_spark.operators.sketches import (
        CM_WIDTH,
        _CM_SEED,
        CM_DEPTH,
    )

    coeffs = hashing.minhash_coeffs(CM_DEPTH, seed=_CM_SEED)
    h = hashing.sql_md5_int60("user_id")
    rows = "\nUNION ALL\n".join(
        f"SELECT event_type, user_id, {i} AS row_i,"
        f" ({hashing.sql_perm_hash('h', a, b)}) % {CM_WIDTH} AS bucket FROM ev"
        for i, (a, b) in enumerate(coeffs)
    )
    # optional bounded probe: the first probe_per_type keys per event_type
    # in deterministic hash order — ≤ types × probe_per_type output rows
    # by construction, so a consumer may collect the audit frame at any sf
    # (q142).  Point-query estimates are per-key, so restricting the probe
    # set changes WHICH rows appear, never their values.
    probe_cte = ""
    probe_join = ""
    if probe_per_type is not None:
        ph = hashing.sql_md5_prefix_int(
            "event_type || ':' || CAST(user_id AS VARCHAR)",
            nhex=15,
            salt=":cmprobe",
        )
        probe_cte = f""",
keys AS (SELECT DISTINCT event_type, user_id FROM events),
probe AS (
  SELECT event_type, user_id FROM (
    SELECT event_type, user_id,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY {ph}, user_id) AS r
    FROM keys)
  WHERE r <= {probe_per_type}
)"""
        probe_join = "JOIN probe USING (event_type, user_id)"
    # the oracle sketches at the COARSE grain directly: cell counts are
    # plain integer sums, so merge-of-day-sketches ≡ sketch-of-the-union
    # bit-for-bit — the very property this query exists to prove
    return f"""
WITH ev AS (SELECT event_type, user_id, {h} AS h FROM events),
b AS (
{rows}
),
sketch AS (SELECT event_type, row_i, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2, 3),
items AS (SELECT DISTINCT event_type, user_id, row_i, bucket FROM b),
est AS (
  SELECT event_type, user_id, MIN(COALESCE(n, 0)) AS est_n
  FROM items LEFT JOIN sketch USING (event_type, row_i, bucket)
  GROUP BY 1, 2
),
tru AS (SELECT event_type, user_id, COUNT(*) AS true_n FROM events GROUP BY 1, 2){probe_cte}
SELECT event_type, user_id, CAST(true_n AS BIGINT) AS true_n,
       CAST(est_n AS BIGINT) AS est_n
FROM tru JOIN est USING (event_type, user_id)
{probe_join}
"""


@register(
    "q105_countmin_persist_merge",
    _q105_sql(),
    doc="Count-min persist→merge→estimate chain through the mergeable "
    "sketch API (operators/sketches.py countmin_sketches / "
    "merge_countmin_sketches / countmin_estimate): per-(event_type, day) "
    "cell rows — the persisted per-partition state — are merged up to "
    "event_type by summing cells, then point-queried for every (type, "
    "user) with the min-over-rows rule and left-join zero-fill. The "
    "portable md5/affine hash family lets DuckDB replay the IDENTICAL "
    "geometry built at the coarse grain directly, so a hash match "
    "proves merge-of-sketches ≡ sketch-of-the-union end-to-end (exact "
    "integer cell addition), not just the pytest property. true_n sits "
    "alongside so the one-sided error stays visible per key.",
)
def q105_countmin_persist_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_hadoop_automation_in_cloud_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketches,
        merge_countmin_sketches,
    )

    e = read_table(spark, sf_dir, "events")
    day_sk = countmin_sketches(
        e.withColumn("day", F.date_trunc("day", F.col("ts"))),
        ["event_type", "day"],
        "user_id",
    )
    merged = merge_countmin_sketches(day_sk.drop("day"), ["event_type"])
    items = e.select("event_type", "user_id").distinct()
    est = countmin_estimate(merged, ["event_type"], items, "user_id")
    tru = e.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("true_n")
    )
    return tru.join(est, ["event_type", "user_id"]).select(
        "event_type",
        "user_id",
        F.col("true_n").cast("bigint").alias("true_n"),
        F.col("est_n").cast("bigint").alias("est_n"),
    )


@register(
    "q106_bloom_pruned_revenue",
    f"""
SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       round({sql_dsum("l_extendedprice")}, 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY 1
""",
    doc="Bloom-filter semi-join pruning (operators/bloom.py): the urgent "
    "orders' keys are summarized into a 2^20-bit Bloom filter (one "
    "bit_or aggregation; the word table is bounded model state at any "
    "dim cardinality), and lineitem is filtered ROW-LOCALLY inside its "
    "scan before the join — at 100 TB this is what keeps the fact "
    "shuffle proportional to matching rows when the dim key set is too "
    "large to broadcast exactly. No false negatives (property-pinned), "
    "so prune+join is row-identical to the plain join — the oracle IS "
    "the plain join, proving the prune dropped nothing it shouldn't.",
)
def q106_bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_hadoop_automation_in_cloud_spark.operators.bloom import bloom_prune

    li = read_table(spark, sf_dir, "lineitem")
    o = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    pruned = bloom_prune(li, "l_orderkey", o, "o_orderkey")
    j = pruned.join(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    )
    return j.groupBy(
        F.date_trunc("month", "l_shipdate").alias("ship_month")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.round(dsum("l_extendedprice"), 2).alias("revenue"),
    )


def _q107_sql(threshold: float = 0.4) -> str:
    from spark_hadoop_automation_in_cloud_spark.functions.vectors import (
        SQL_DOT,
        SQL_NORM,
    )

    dot = SQL_DOT.format(a="x.v", b="y.v")
    nx = SQL_NORM.format(a="x.v")
    ny = SQL_NORM.format(a="y.v")
    return f"""
WITH {_kmeans_oracle_sql(k=8, n_iter=5)},
e2 AS (SELECT a.vec_id, a.cid, e.v FROM asg a JOIN emb e USING (vec_id))
SELECT x.cid AS cluster_id,
       x.vec_id AS left_id, y.vec_id AS right_id,
       round({dot} / ({nx} * {ny}), 6) AS cosine_sim
FROM e2 x JOIN e2 y ON x.cid = y.cid AND x.vec_id < y.vec_id
WHERE round({dot} / ({nx} * {ny}), 6) >= {threshold}
"""


@register(
    "q107_semantic_cluster_dedup",
    _q107_sql(0.4),
    doc="SemDeDup-style cluster-bucketed near-duplicate detection: "
    "k-means the embedding space (the q96 kernel, identical "
    "deterministic trajectory), then score cosine pairs ONLY within "
    "each cluster — the quadratic comparison is bounded by the largest "
    "cluster instead of the corpus, which is what makes semantic dedup "
    "runnable at 100 TB (the LSH family q19/q21 buckets by hash; this "
    "buckets by learned geometry, catching paraphrase-level dups that "
    "share no shingles). Cross-cluster pairs are the documented recall "
    "trade (measured in the companion pytest vs exact all-pairs). "
    "Plan shape (r6): the assignment scan carries the vector "
    "(keep_vec), so there is NO corpus re-join; pair generation is "
    "block-salted (operators/pairs.py blocked_pairs_within_groups) — "
    "a plain join on cluster_id would run k=8 tasks TOTAL at any "
    "corpus size, the salted form runs k·36 independent block-pairs — "
    "and each side carries its precomputed norm, so scoring a pair is "
    "one dot fold instead of dot + two norm folds. Oracle: the "
    "unrolled k-means CTE chain (shared verbatim with q96's oracle) + "
    "the same spelled-out double-fold cosine as q19 — bit-identical "
    "because norm-then-divide is the same double arithmetic either "
    "way.",
)
def q107_semantic_cluster_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_hadoop_automation_in_cloud_spark.functions.vectors import dot, norm
    from spark_hadoop_automation_in_cloud_spark.operators.pairs import (
        blocked_pairs_within_groups,
    )

    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    e = kmeans_assign(emb, k=8, max_iter=5, keep_vec=True).select(
        "cluster_id",
        "vec_id",
        F.col("embedding").alias("__v"),
        norm(F.col("embedding")).alias("__n"),
    )
    # 10k-row dispatch: the plain k-task self-join wins below the
    # replication crossover (BLOCKED_PAIRS.json); pair set identical
    pairs = blocked_pairs_within_groups(
        e, ["cluster_id"], "vec_id", n_blocks=8, auto_plain_below=10_000
    )
    return pairs.select(
        "cluster_id",
        F.col("left.vec_id").alias("left_id"),
        F.col("right.vec_id").alias("right_id"),
        F.round(
            dot(F.col("left.__v"), F.col("right.__v"))
            / (F.col("left.__n") * F.col("right.__n")),
            6,
        ).alias("cosine_sim"),
    ).where(F.col("cosine_sim") >= 0.4)


_INC_BUCKET_SQL = hashing.sql_md5_prefix_int("doc_id", nhex=8, salt=":inc") + " % 4"


def _inc_bucket() -> F.Column:
    return hashing.md5_prefix_int(F.col("doc_id"), nhex=8, salt=":inc") % 4


@register(
    "q108_incremental_dedup",
    dd.sql_incremental_dedup(
        f"SELECT doc_id, text FROM documents WHERE {_INC_BUCKET_SQL} = 0",
        f"""SELECT md5(COALESCE(text, '')) AS content_hash, MIN(doc_id) AS canonical_id
            FROM documents WHERE {_INC_BUCKET_SQL} <> 0 GROUP BY 1""",
        "doc_id",
        "text",
    ),
    doc="Incremental cross-batch exact dedup (operators/dedup.py "
    "incremental_dedup): the corpus is hash-split into an already-"
    "ingested majority and a NEW batch (deterministic md5 bucket, the "
    "q42 idiom); the prior batches are represented ONLY by their "
    "persisted fingerprint index (content_hash_index — one tiny row "
    "per distinct content), and the new batch survives via within-"
    "batch min-id dedup + LEFT ANTI join against the index. This is "
    "the run-over-run shape that avoids full-corpus rescans at 100 TB: "
    "both steps key on content_hash, so the batch shuffles once and "
    "the groupBy partitioning is reused by the anti-join probe. The "
    "parquet persist half of the seam is pinned by "
    "test_operators.py's multi-batch round-trip.",
)
def q108_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    bucket = _inc_bucket()
    new_batch = d.where(bucket == 0).select("doc_id", "text")
    prior = d.where(bucket != 0).select("doc_id", "text")
    index = dd.content_hash_index(prior, "doc_id", "text")
    return dd.incremental_dedup(new_batch, index, "doc_id", "text")


@register(
    "q109_repeated_ngram_flags",
    dd.sql_repeated_ngram_doc_stats(
        dd.sql_shingle_rows("documents", "doc_id", "text", n=3), min_doc_freq=3
    ),
    doc="Cross-document repeated-passage stats (operators/dedup.py "
    "repeated_ngram_doc_stats): 3-word shingles, document frequency "
    "per md5-int60 gram hash, per-doc repeated-gram ratio — the "
    "passage-level duplication signal of Lee et al. 2022 that whole-"
    "document dedup (q20/q108) cannot see. Strings are hash-compressed "
    "before the shuffle; two map-side-combined shuffles on the gram "
    "hash, the second reusing the first's partitioning; boilerplate "
    "grams are heavy COUNT keys (absorbed by partial aggregation), and "
    "the rejoin multiplicity per gram is exactly its document "
    "frequency — the inverted index, not a quadratic blowup.",
)
def q109_repeated_ngram_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    sh = dd.shingle_rows(d, "doc_id", "text", n=3)
    return dd.repeated_ngram_doc_stats(sh, min_doc_freq=3)


from spark_hadoop_automation_in_cloud_spark.operators.packing import (  # noqa: E402
    shard_assignments,
    sql_shard_assignments,
)


@register(
    "q110_training_shards",
    sql_shard_assignments("SELECT doc_id FROM documents", "doc_id", n_shards=8),
    doc="Deterministic global-shuffle shard layout (operators/packing.py "
    "shard_assignments): the write-side of a training pipeline — every "
    "document gets a shard (md5 mod n_shards) and an exactly-"
    "reproducible pseudo-random in-shard position, with NO global sort "
    "anywhere in the plan: the single shuffle keys on shard and each "
    "shard's row_number window orders independently. At 100 TB "
    "n_shards tracks corpus_bytes/~256 MB so every window stays "
    "file-sized; 8 here keeps the oracle readable.",
)
def q110_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return shard_assignments(d.select("doc_id"), "doc_id", n_shards=8)


@register(
    "q111_streaming_incremental_dedup",
    f"""
WITH d AS (
  SELECT doc_id, md5(COALESCE(text, '')) AS content_hash,
         {hashing.sql_md5_prefix_int("doc_id", nhex=8, salt=":sb")}
           % 3 AS b
  FROM documents
),
fb AS (SELECT content_hash, MIN(b) AS batch_id FROM d GROUP BY 1)
SELECT MIN(d.doc_id) AS canonical_id,
       d.content_hash,
       CAST(fb.batch_id AS BIGINT) AS batch_id
FROM d JOIN fb ON d.content_hash = fb.content_hash AND d.b = fb.batch_id
GROUP BY d.content_hash, fb.batch_id
""",
    doc="Streaming dedup-on-arrival (streaming/incremental.py "
    "dedup_batch_against_index, the foreachBatch body of "
    "run_streaming_incremental_dedup): documents arrive as three "
    "deterministic micro-batches (md5 bucket % 3 = epoch) and each "
    "batch is deduped against the partitioned fingerprint index of "
    "every earlier epoch, its survivors becoming the index's next "
    "batch_id partition — the index IS the survivor store, replay-"
    "idempotent because a batch reads only batch_id < epoch (partition-"
    "pruned) and overwrites its own partition. This row drives the "
    "per-epoch engine body DIRECTLY (no file-source mtime choreography, "
    "so the correctness row cannot go flaky on driver-environment "
    "timing); the stream wiring — availableNow drain, checkpoint "
    "resume, replay no-op — is pinned by test_streaming.py and the "
    "incremental_dedup_job CLI. Oracle: first-seen-bucket semantics in "
    "plain SQL — survivor = min doc_id within the EARLIEST bucket "
    "containing the hash.",
)
def q111_streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from spark_hadoop_automation_in_cloud_spark.streaming.incremental import (
        dedup_batch_against_index,
    )

    root = tempfile.mkdtemp(prefix="q111_")
    idx = f"{root}/index"
    d = read_table(spark, sf_dir, "documents")
    bucket = hashing.md5_prefix_int(F.col("doc_id"), nhex=8, salt=":sb") % 3
    try:
        for b in range(3):
            dedup_batch_against_index(
                d.where(bucket == b).select("doc_id", "text"),
                idx,
                "doc_id",
                "text",
                epoch_id=b,
            )
        out = spark.read.parquet(idx).select(
            "canonical_id",
            "content_hash",
            F.col("batch_id").cast("bigint").alias("batch_id"),
        )
        # materialize before the index dir goes away: the returned frame
        # must not lazily depend on TMPDIR state, so the whole tempdir is
        # reclaimed here instead of leaking one tree per invocation
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


from spark_hadoop_automation_in_cloud_spark.operators.packing import (  # noqa: E402
    sql_token_budget_selection,
    token_budget_selection,
)

_Q112_SCORED_SQL = f"""
SELECT d.source, q.doc_id, q.quality, q.n_tokens
FROM ({tx.sql_quality_score("documents", "doc_id", "text")}) q
JOIN documents d ON d.doc_id = q.doc_id
"""


@register(
    "q112_token_budget_selection",
    sql_token_budget_selection(
        _Q112_SCORED_SQL, "source", "doc_id", "quality", "n_tokens", budget=2000
    ),
    doc="Greedy per-source data selection under a token budget "
    "(operators/packing.py token_budget_selection): documents ranked "
    "best-first by the q27 quality score within each source, kept while "
    "the running token sum stays under budget — the selection step of a "
    "quality-filtered pretraining mix (the boundary doc may overshoot; "
    "mid-document cuts are the packer's job, q92). One window per "
    "source stratum (no global sort), so at 100 TB the sort is bounded "
    "by a source's catalog, not the corpus. Quality is the exact "
    "integer-arithmetic composite both engines compute bit-identically, "
    "so the prefix order — and therefore the cut — cannot diverge.",
)
def q112_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    scored = (
        tx.quality_score(d, "doc_id", "text")
        .join(d.select("doc_id", "source"), "doc_id")
        .select("source", "doc_id", "quality", "n_tokens")
    )
    return token_budget_selection(
        scored, "source", "doc_id", "quality", "n_tokens", budget=2000
    )


def _q113_sqls() -> str:
    shingles_new = dd.sql_shingle_rows(
        f"(SELECT * FROM documents WHERE {_INC_BUCKET_SQL} = 0)", "doc_id", "text", n=2
    )
    shingles_idx = dd.sql_shingle_rows(
        f"(SELECT * FROM documents WHERE {_INC_BUCKET_SQL} <> 0)", "doc_id", "text", n=2
    )
    return dd.sql_incremental_minhash_dedup(
        dd.sql_minhash_signatures(shingles_new),
        dd.sql_minhash_signatures(shingles_idx),
        min_est_jaccard=0.5,
    )


@register(
    "q113_incremental_minhash_dedup",
    _q113_sqls(),
    doc="Incremental NEAR-dup screening (operators/dedup.py "
    "incremental_minhash_dedup): the fuzzy twin of q108 — a new batch's "
    "MinHash signatures are screened against the persisted LSH band "
    "index of the admitted corpus (minhash_band_index carries the "
    "signature columns, so est_jaccard is scored from the colliding "
    "rows without touching admitted text) plus a one-pass smaller-id "
    "screen within the batch. Both screens are equi-joins on (band_idx, "
    "band_key) with the index side bucketable by that key — new-crawl-"
    "vs-petabyte-corpus near-dup without rescanning the corpus. Output "
    "= admitted signatures, i.e. exactly the index's next increment.",
)
def q113_incremental_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    bucket = _inc_bucket()
    sigs = lambda df: dd.minhash_signatures(  # noqa: E731
        dd.shingle_rows(df, "doc_id", "text", n=2)
    )
    new_sigs = sigs(d.where(bucket == 0))
    index = dd.minhash_band_index(sigs(d.where(bucket != 0)))
    return dd.incremental_minhash_dedup(new_sigs, index, min_est_jaccard=0.5)


from spark_hadoop_automation_in_cloud_spark.operators.similarity import (  # noqa: E402
    hard_negative_topk,
    sql_hard_negative_topk,
)


@register(
    "q114_hard_negatives",
    sql_hard_negative_topk("embeddings", "vec_id < 10", k=5),
    doc="Hard-negative mining for contrastive training "
    "(operators/similarity.py hard_negative_topk): per query vector, "
    "the top-5 most-cosine-similar corpus vectors with a DIFFERENT "
    "label — broadcast query side over an unshuffled corpus scan (the "
    "q24 plan) with the label-mismatch predicate applied before the "
    "per-query ranking window. Similarities rounded to 6dp pre-rank, "
    "neighbor-id tiebreak — the engineered-determinism discipline of "
    "the ANN family.",
)
def q114_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    return hard_negative_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


@register(
    "q115_frame_sampling",
    """
WITH d AS (
  -- COALESCE mirrors the kernel's None -> b'' handling (a NULL payload
  -- still yields one frame hashing the empty chunk).  The byte==char
  -- guard (octet_length of the UTF-8 encoding vs character length) is
  -- applied IDENTICALLY on the Spark side: the kernel chunks UTF-8
  -- BYTES while VARCHAR substr counts CHARACTERS, so only payloads
  -- where the two coincide (pure ASCII) participate — a multi-byte
  -- document drops from BOTH engines instead of desyncing the oracle.
  SELECT doc_id AS media_id, COALESCE(text, '') AS text,
         octet_length(encode(COALESCE(text, ''))) AS n
  FROM documents
  WHERE octet_length(encode(COALESCE(text, ''))) = length(COALESCE(text, ''))
),
f AS (
  SELECT media_id, text,
         unnest(generate_series(0, CAST(greatest(1, n // 64) AS BIGINT) - 1))
           AS frame_idx
  FROM d
)
SELECT media_id,
       CAST(frame_idx AS INT) AS frame_idx,
       md5(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64)) AS frame_hash
FROM f
""",
    doc="Multimodal frame sampling (multimodal/binary_ops.py "
    "sample_frames): the 1→N row fan-out kernel shape — one fingerprint "
    "row per fixed-size payload chunk through an Arrow mapInPandas "
    "batch, payloads never leaving the executors (q31's sibling; a real "
    "video decoder swaps in via the same kernel seam). The synthetic "
    "payload is the document text, restricted on BOTH sides to rows "
    "where octet_length == char_length (pure ASCII): DuckDB's md5 is "
    "VARCHAR-only, so the oracle replays chunk boundaries with "
    "character substr — legal only where bytes and characters "
    "coincide, and the shared predicate makes that coupling explicit "
    "(a future multi-byte data generator drops the same rows from both "
    "engines) rather than an accident of today's ASCII corpus. A full "
    "value-hash proof of the fan-out arithmetic, not just a row count.",
)
def q115_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_hadoop_automation_in_cloud_spark.multimodal.binary_ops import (
        sample_frames,
    )

    d = read_table(spark, sf_dir, "documents", parallelize=True)
    txt = F.coalesce(F.col("text"), F.lit(""))
    media = d.where(F.octet_length(txt) == F.length(txt)).select(
        F.col("doc_id").alias("media_id"),
        txt.cast("binary").alias("payload"),
    )
    return sample_frames(media, every_n_bytes=64)


@register(
    "q116_cluster_canonicals_by_quality",
    f"""
WITH RECURSIVE {_SQL_CLUSTER_CTES},
ranked AS (
  SELECT c.cluster_id, k.doc_id, k.quality,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY k.quality DESC, k.doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members
  FROM kept k JOIN clus c ON k.doc_id = c.doc_id
)
SELECT cluster_id,
       doc_id AS canonical_id,
       quality AS best_quality,
       CAST(n_members AS BIGINT) AS n_members
FROM ranked WHERE rn = 1
""",
    doc="Quality-first canonical selection per near-dup cluster — the "
    "SemDeDup keep-rule (keep the BEST member, not the smallest id): "
    "q40's exact cluster labels (shared CTE chain, verbatim) reduced to "
    "one max_by aggregation keyed on (quality, -doc_id), so the keep "
    "decision is a single map-side-combinable pass over cluster labels "
    "— no window over the corpus. Quality is the bit-identical integer-"
    "arithmetic composite, so the arg-max cannot diverge cross-engine; "
    "ties break to the smaller id on both sides.",
)
def q116_cluster_canonicals_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept, clusters = _curation_clusters(spark, sf_dir)
    members = kept.select("doc_id", "quality").join(clusters, "doc_id")
    key = F.struct(F.col("quality"), (-F.col("doc_id")).alias("__neg_id"))
    return members.groupBy("cluster_id").agg(
        F.max_by("doc_id", key).alias("canonical_id"),
        F.max("quality").alias("best_quality"),
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
    )


@register(
    "q117_upsert_replay",
    """
SELECT user_id, event_id, ts, event_type, round(value, 6) AS value
FROM (SELECT user_id, event_id, ts, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
""",
    doc="End-to-end upsert replay through the merge_fn seam "
    "(streaming/incremental.py upsert_batch + duckdb_merge_fn): events "
    "split into three deterministic md5 batches are applied "
    "sequentially to a real SQL warehouse table — each batch last-"
    "writer-wins deduped in Spark, then INSERT .. ON CONFLICT DO "
    "UPDATE .. WHERE newer_than_condition in DuckDB — and batch 1 is "
    "then REPLAYED verbatim, so every replayed row is stale-or-equal "
    "and the newer-than guard must make the whole pass a no-op (the "
    "foreachBatch checkpoint-replay contract, executed by an actual "
    "second engine; the reference's idempotent datamart overwrite, "
    "/root/reference/src/spark/collector.py:543-557, restated as "
    "MERGE). Oracle: the final snapshot is global last-writer-wins per "
    "user over ALL events, whatever the batch order — exactly one "
    "row_number window. The batches mix timestamps (hash split, not "
    "time split), so cross-batch merges exercise the guard in both "
    "directions, not just append-newer.",
)
def q117_upsert_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    import duckdb

    from spark_hadoop_automation_in_cloud_spark.streaming.incremental import (
        duckdb_merge_fn,
        upsert_batch,
    )

    root = tempfile.mkdtemp(prefix="q117_")
    db = f"{root}/warehouse.duckdb"
    e = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    batch = hashing.md5_prefix_int(F.col("event_id"), nhex=8, salt=":ub") % 3
    merge = duckdb_merge_fn()
    try:
        # 0, 1, 2, then 1 again: the replay sees only stale-or-equal rows
        for b in (0, 1, 2, 1):
            upsert_batch(
                e.where(batch == b), db, ["user_id"], ["ts", "event_id"], merge_fn=merge
            )
        con = duckdb.connect(db)
        try:
            pdf = con.execute(
                "SELECT user_id, event_id, ts, event_type,"
                " round(value, 6) AS value FROM datamart"
            ).df()
        finally:
            con.close()
    finally:
        # the snapshot is fully materialized in pdf; reclaim the tempdir
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(pdf)


@register(
    "q118_repeated_span_coverage",
    dd.sql_repeated_span_coverage("documents", "doc_id", "text", n=3, min_doc_freq=2),
    doc="Position-level repeated-passage coverage (operators/dedup.py "
    "repeated_span_coverage): the interval-union refinement of q109 — "
    "per document, the fraction of TOKENS lying inside any 3-gram "
    "shared with another document (Lee et al. ExactSubstr, position "
    "form: overlapping grams of one long shared passage count its "
    "tokens once, where q109's gram-count ratio double-counts every "
    "overlap). Union without materializing intervals: repeated-gram "
    "starts are fixed-length spans, so sorted-by-start each covers "
    "min(n, next_start - start) new tokens — one lead() window per "
    "doc, no self-join. Grams md5-int60-compressed before any "
    "shuffle; df pass + repeated-flag join share the gram-hash key; "
    "coverage rides one doc_id shuffle.",
)
def q118_repeated_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return dd.repeated_span_coverage(d, "doc_id", "text", n=3, min_doc_freq=2)


from spark_hadoop_automation_in_cloud_spark.operators.similarity import (  # noqa: E402
    ivf_build_lists,
    ivf_centroids,
    ivf_probe_cells,
    ivf_score,
    sql_ann_ivf_topk,
)


@register(
    "q119_ann_ivf_persisted",
    sql_ann_ivf_topk("embeddings", "vec_id < 10", k=5, centroid_mod=37, nprobe=2),
    doc="ANN search against a PERSISTED IVF index (operators/similarity.py "
    "ivf_centroids/ivf_build_lists/ivf_probe_cells/ivf_score): the "
    "build-once/probe-many shape q30 composes in memory — centroids and "
    "cell_id-partitioned inverted lists round-trip through parquet, the "
    "query batch's probed cells (a bounded set: <= n_queries x nprobe) "
    "are collected into an isin predicate, and the lists scan is "
    "PARTITION-PRUNED to exactly those cells (plan-tested). At 100 TB "
    "this is the difference between re-deriving the index per query "
    "batch and reading a few cells of a standing table. Oracle: the "
    "q30 CTE chain at nprobe=2 — the persisted round-trip must be "
    "value-identical to the in-memory composition.",
)
def q119_ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    root = tempfile.mkdtemp(prefix="q119_")
    try:
        cent = ivf_centroids(emb, centroid_mod=37)
        ivf_build_lists(emb, cent).write.partitionBy("cell_id").parquet(f"{root}/lists")
        cent.write.parquet(f"{root}/centroids")
        cent2 = spark.read.parquet(f"{root}/centroids")
        probes = ivf_probe_cells(cent2, emb.where(F.col("vec_id") < 10), nprobe=2)
        cells = sorted(
            r["cell_id"] for r in probes.select("cell_id").distinct().collect()
        )
        lists = spark.read.parquet(f"{root}/lists").where(F.col("cell_id").isin(cells))
        out = ivf_score(probes, lists, k=5)
        # materialize before the index dirs go away (q111's discipline)
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "q120_quality_threshold_for_budget",
    f"""
WITH q AS ({tx.sql_quality_score("documents", "doc_id", "text")}),
c AS (SELECT doc_id, quality, n_tokens,
             SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM q),
b AS (SELECT CAST(unnest([2000, 8000, 32000]) AS BIGINT) AS budget)
SELECT b.budget,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
       MIN(quality) AS threshold_quality
FROM b JOIN c ON c.cum_tokens - c.n_tokens < b.budget
GROUP BY 1
""",
    doc="Budget -> quality-threshold calibration, the INVERSE of q112: "
    "for each candidate token budget, how deep into the quality-ranked "
    "corpus the selection reaches (docs kept, tokens kept, and the "
    "quality of the marginal document — the cutoff you would publish "
    "as 'this mix keeps quality >= X'). The global quality order runs "
    "through operators/ranks.py global_cumsum — range partition + "
    "local window + broadcast prefix offsets, NO SinglePartition "
    "window — and the keep rule (running sum before the doc < budget) "
    "is q112's overshoot convention. Budgets are a 3-row broadcast; "
    "the integer token sums make every engine agree exactly.",
)
def q120_quality_threshold_for_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_hadoop_automation_in_cloud_spark.operators.ranks import global_cumsum

    d = read_table(spark, sf_dir, "documents", parallelize=True)
    scored = tx.quality_score(d, "doc_id", "text").select(
        "doc_id", "quality", "n_tokens"
    )
    cum = global_cumsum(
        scored,
        [F.col("quality").desc(), F.col("doc_id").asc()],
        "n_tokens",
        "cum_tokens",
    )
    budgets = spark.createDataFrame([(2000,), (8000,), (32000,)], "budget long")
    kept = cum.crossJoin(F.broadcast(budgets)).where(
        F.col("cum_tokens") - F.col("n_tokens") < F.col("budget")
    )
    return kept.groupBy("budget").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("kept_tokens"),
        F.min("quality").alias("threshold_quality"),
    )


from spark_hadoop_automation_in_cloud_spark.operators.checks import (  # noqa: E402
    distribution_drift_tv,
    sql_distribution_drift_tv,
)


@register(
    "q121_event_mix_drift",
    sql_distribution_drift_tv(
        "events", "CAST(date_trunc('week', ts) AS TIMESTAMP)", "event_type", "week"
    ),
    doc="Week-over-week event-mix drift vs the earliest week "
    "(operators/checks.py distribution_drift_tv): total-variation "
    "distance of the event_type distribution, computed entirely in "
    "integer arithmetic — TV = sum|c*M - d*N| / (2*N*M) — so unlike a "
    "PSI/KL monitor there is no per-category log whose libm rounding "
    "could diverge cross-engine. The input shuffles once into (week, "
    "type) counts; the baseline slice, category grid, and drift "
    "aggregation all run on aggregate-sized frames. The pipeline-"
    "health check that catches a collector change or upstream schema "
    "drift shifting the event mix.",
)
def q121_event_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events").select(
        F.date_trunc("week", F.col("ts")).alias("week"), "event_type"
    )
    return distribution_drift_tv(e, "week", "event_type")



from spark_hadoop_automation_in_cloud_spark.operators.similarity import (  # noqa: E402
    projected_rerank_topk,
    sql_projected_rerank_topk,
)


@register(
    "q122_projected_rerank_topk",
    sql_projected_rerank_topk(
        "embeddings", "vec_id < 10", k=5, dim=64, out_dim=16, shortlist=25
    ),
    doc="Johnson-Lindenstrauss project -> shortlist -> exact-rerank "
    "similarity search (operators/similarity.py projected_rerank_topk): "
    "embeddings are projected 64 -> 16 dims through deterministic "
    "md5-derived hyperplanes (row-local, zero shuffle), the all-pairs "
    "ranking runs in the 16-dim space to shortlist 25 candidates per "
    "query, and exact full-width cosine re-ranks only those 250 rows — "
    "the faiss-style shape that cuts the expensive stage's arithmetic "
    "and broadcast bytes 4x at 100 TB. The contract is measured on "
    "both corpus shapes: recall@5 = 1.0 vs exact full search on the "
    "clustered fixture (pytest-pinned), and the docstring records why "
    "an isotropic corpus defeats ANY low-dim ranker (noise-level "
    "neighbor gaps). md5 weights, not the LSH LCG: a single LCG step "
    "is linear in its seed, so those rows are phase-shifted copies of "
    "one sawtooth — fine for sign buckets, ill-conditioned as a "
    "projection matrix. Oracle: identical weight literals, identical "
    "left-fold projection, shared _SQL_COS for both stages, 6dp round "
    "+ id tie-break before each cut.",
)
def q122_projected_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True).select(
        "vec_id", "embedding"
    )
    return projected_rerank_topk(
        emb, emb.where(F.col("vec_id") < 10), k=5, dim=64, out_dim=16, shortlist=25
    )


from spark_hadoop_automation_in_cloud_spark.operators import sampling  # noqa: E402


@register(
    "q123_stratified_sample",
    sampling.sql_stratified_sample("documents", ["lang"], "doc_id", k=10, salt=":strat"),
    doc="Deterministic per-language eval sample (operators/sampling.py "
    "stratified_sample): exactly 10 docs per lang in md5-key order — "
    "the balanced-mixture subset every ablation/eval pipeline cuts. "
    "The plan is oversample-then-trim: a tiny per-stratum count "
    "broadcast back as a key cutoff filters the corpus ROW-LOCALLY in "
    "the scan stage (~k_eff=45 survivors per stratum at ANY corpus "
    "size), and the exact top-k window runs only over those survivors "
    "— no per-partition corpus sort and no task-count-proportional "
    "exchange, the two costs Spark's own WindowGroupLimit pushdown "
    "still pays (measured 1.4-2.5x wall / 10-15x exchange bytes vs "
    "that form, SAMPLING.json). Oracle: the naive full-window form, "
    "so the hash match proves plan == spec. Survivor boundedness and "
    "the undershoot guard are pytest-pinned (test_operators.py).",
)
def q123_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parallelize: the counting and cutoff-filter scans both fan out
    # (md5 per row), and testdata parquet is single-row-group
    d = read_table(spark, sf_dir, "documents", parallelize=True).select(
        "lang", "doc_id"
    )
    return sampling.stratified_sample(d, ["lang"], "doc_id", k=10, salt=":strat")


#: 80/10/10 assignment reused by q124's Spark and SQL sides — ONE literal.
_LEAK_SPLITS: list[tuple[str, int]] = [("train", 80), ("val", 10), ("test", 10)]


@register(
    "q124_leakage_safe_split",
    f"""
WITH RECURSIVE {_SQL_NEARDUP_CLOSURE},
clus AS (SELECT a AS vec_id, MIN(b) AS cluster_id FROM reach GROUP BY a)
SELECT vec_id, cluster_id,
       {sampling.sql_hash_split("cluster_id", _LEAK_SPLITS, salt=":leak")} AS split
FROM clus
""",
    doc="Leakage-safe train/val/test split: q42's deterministic 80/10/10 "
    "hash assignment keyed on the NEAR-DUP CLUSTER label (q39's "
    "connected components over embedding near-dup pairs), not the row "
    "id — so a document and its near-duplicates always land in the "
    "SAME split and eval can never score memorized training neighbors "
    "(the classic contamination bug a row-hash split silently commits). "
    "Cost on top of clustering: one row-local projection "
    "(operators/sampling.py hash_split). Co-assignment is pytest-pinned "
    "(every cluster maps to exactly one split). Oracle: the q39 "
    "recursive-CTE closure + the identical CASE thresholds.",
)
def q124_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    pairs = dd.embedding_neardup_pairs(emb, threshold=0.4)
    clus = neardup_clusters(pairs, emb, "vec_id")
    return clus.select(
        "vec_id",
        "cluster_id",
        sampling.hash_split(F.col("cluster_id"), _LEAK_SPLITS, salt=":leak").alias(
            "split"
        ),
    )


from spark_hadoop_automation_in_cloud_spark.operators.packing import (  # noqa: E402
    mixture_budget_selection,
    sql_mixture_budget_selection,
)

#: target language mixture for q125 — zh deliberately unlisted, so the
#: query also exercises the exclude-unweighted-domain semantics.  ONE
#: literal: the Spark plan and the SQL oracle both inline the budgets
#: packing.mixture_budgets derives from it.
_Q125_WEIGHTS: dict[str, float] = {"en": 0.5, "fr": 0.2, "de": 0.2, "es": 0.1}
_Q125_SCORED_SQL = f"""
SELECT d.lang, q.doc_id, q.quality, q.n_tokens
FROM ({tx.sql_quality_score("documents", "doc_id", "text")}) q
JOIN documents d ON d.doc_id = q.doc_id
"""


@register(
    "q125_mixture_budget_selection",
    sql_mixture_budget_selection(
        _Q125_SCORED_SQL, "lang", "doc_id", "quality", "n_tokens",
        total_budget=4000, weights=_Q125_WEIGHTS,
    ),
    doc="Mixture-targeted data selection (operators/packing.py "
    "mixture_budget_selection): q112's best-first budget cut with a "
    "TARGET LANGUAGE MIXTURE — each lang gets floor(total * weight) "
    "tokens (en 50% / fr 20% / de 20% / es 10%; zh unweighted and "
    "therefore excluded) and fills it by quality rank. The static "
    "mixture-reweighting step of pretraining curation (Pile-style hand "
    "weights, DoReMi-style learned weights), enforced at selection "
    "time. The budget table is model state: a literal map resolved "
    "row-locally in the scan — no join, no broadcast — and the "
    "unweighted-domain filter prunes before the per-domain window. "
    "Budgets are floored ONCE in Python and inlined on both engines, "
    "so weight-float rounding cannot diverge the oracle.",
)
def q125_mixture_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    scored = (
        tx.quality_score(d, "doc_id", "text")
        .join(d.select("doc_id", "lang"), "doc_id")
        .select("lang", "doc_id", "quality", "n_tokens")
    )
    return mixture_budget_selection(
        scored, "lang", "doc_id", "quality", "n_tokens",
        total_budget=4000, weights=_Q125_WEIGHTS,
    )


from spark_hadoop_automation_in_cloud_spark.operators.sketches import (  # noqa: E402
    heavy_hitters_exact,
)


@register(
    "q126_heavy_hitter_parts",
    """
SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS freq
FROM lineitem
GROUP BY 1
HAVING COUNT(*) >= 42
""",
    doc="Exact heavy-hitter discovery (operators/sketches.py "
    "heavy_hitters_exact): every part appearing on >= 42 lineitems, with "
    "its exact count — via a transient count-min screen (bounded "
    "depth x width table collected like q106's bloom words, row-local "
    "xxhash64 probe inside the second scan) so the exact aggregation "
    "only ever holds CANDIDATE keys in state. Count-min never "
    "underestimates, so the screen admits a superset and the final "
    "HAVING restores exactness — the oracle is the naive GROUP BY "
    "because the result is geometry-independent. At 100 TB this is how "
    "you find the join keys worth salting (operators/skew.py) or the "
    "boilerplate grams worth pruning without a billion-group "
    "hash-aggregate; measured candidate fraction at sf0.1: ~6% of the "
    "distinct-key space (HEAVY_HITTERS.json).",
)
def q126_heavy_hitter_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem", parallelize=True)
    return heavy_hitters_exact(li, "l_partkey", threshold=42)


@register(
    "q127_curation_funnel",
    tx.sql_curation_funnel(
        "documents", "source", "lang", "doc_id", "text",
        quality_threshold=0.9, min_tokens=30, max_tokens=90,
    ),
    doc="Per-source curation-funnel accounting (operators/textops.py "
    "curation_funnel): survivor counts for each cumulative stage of the "
    "standard pre-training filter chain — nonempty → predicted-language "
    "agrees with metadata → quality >= 0.9 → length band — plus the "
    "surviving token mass, in ONE pass. q40 runs the row-level pipeline; "
    "this is the observability report every curation run produces first "
    "(where did each source's data go?), computed as a single scan + "
    "conditional aggregation to |sources| groups (map-side combined, no "
    "joins, no per-stage rescans — every stage predicate reuses the ONE "
    "lang_score_exprs/quality_exprs definitions the row-level operators "
    "use). The oracle composes the existing per-signal CTEs with joins; "
    "the one-pass plan shape is pinned by the registry plan audit.",
)
def q127_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return tx.curation_funnel(
        d, "source", "lang", "text",
        quality_threshold=0.9, min_tokens=30, max_tokens=90,
    )


from spark_hadoop_automation_in_cloud_spark.operators.components import (  # noqa: E402
    connected_components,
    incremental_components,
)


@register(
    "q128_incremental_components",
    f"""
WITH RECURSIVE pairs AS ({dd.sql_embedding_neardup_pairs("embeddings", threshold=0.4)}),
edges AS (
  SELECT left_id AS a, right_id AS b FROM pairs
  UNION
  SELECT right_id AS a, left_id AS b FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS vec_id, MIN(b) AS component_id
FROM reach
GROUP BY a
""",
    doc="Incremental connected components (operators/components.py "
    "incremental_components): the q39 near-dup edge set is split into an "
    "already-ingested majority and a NEW batch (deterministic id bucket, "
    "the q108 idiom); the history is represented ONLY by its persisted "
    "min-id label table, and the batch merges in via endpoint→root "
    "mapping + CC over the REDUCED graph (size O(batch), independent of "
    "history) + one broadcast root-remap pass over the labels. This "
    "completes the incremental family (q108 exact / q111 streaming / "
    "q113 near-dup screening) for the GRAPH half of dedup: at 100 TB the "
    "iterative shuffles touch the batch, never the corpus. Oracle: the "
    "recursive-CTE closure over the FULL edge set — the equivalence the "
    "any-split property test also pins.",
)
def q128_incremental_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    pairs = dd.embedding_neardup_pairs(emb, threshold=0.4)
    # deterministic batch split on the pair's left endpoint (any split
    # yields the same fixpoint — the oracle is split-blind)
    new_batch = pairs.where(F.col("left_id") % 5 == 0)
    hist = pairs.where(F.col("left_id") % 5 != 0)
    labels = connected_components(hist, "left_id", "right_id").withColumnRenamed(
        "node", "vec_id"
    )
    return incremental_components(
        labels, new_batch, "left_id", "right_id",
        node_col="vec_id", comp_col="component_id",
    ).select("vec_id", "component_id")


_Q129_TICKETS_SQL = "CAST(1 + floor(quality * 9) AS INT)"
_Q129_SCORED_SQL = f"""
SELECT d.lang, q.doc_id, q.quality
FROM ({tx.sql_quality_score("documents", "doc_id", "text")}) q
JOIN documents d ON d.doc_id = q.doc_id
"""


@register(
    "q129_weighted_sample",
    f"""
WITH scored AS ({_Q129_SCORED_SQL}),
ranked AS (
  SELECT lang, doc_id, {_Q129_TICKETS_SQL} AS tickets,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {sampling.sql_weighted_ticket_key(
               "doc_id", _Q129_TICKETS_SQL, 10, ":q129")}, doc_id
         ) AS INTEGER) AS sample_rank
  FROM scored
)
SELECT lang, doc_id, tickets, sample_rank FROM ranked WHERE sample_rank <= 10
""",
    doc="Quality-weighted sampling without replacement (operators/"
    "sampling.py weighted_sample): k=10 docs per language, inclusion "
    "probability ~proportional to a 1..10 ticket weight derived from the "
    "quality score — the probabilistic sibling of q112's best-first cut "
    "(keeps the long tail reachable instead of collapsing to top-k). "
    "Integer-exact ticket lottery (min of `tickets` md5 draws) instead "
    "of Efraimidis-Spirakis' u^(1/w): no transcendental floats anywhere, "
    "so both engines replay the identical 60-bit keys and the sampled "
    "SET can never flip at the rank-k boundary from a last-ulp "
    "difference. Scale shape: the q123 oversample-trim generalizes with "
    "the per-stratum ticket SUM setting the row-local cutoff — one tiny "
    "aggregate broadcast into the scan, window over ~k_eff survivors, "
    "corpus-size-independent. Oracle: the naive full-window form with "
    "the identical key arithmetic.",
)
def q129_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    scored = (
        tx.quality_score(d, "doc_id", "text")
        .select("doc_id", "quality")
        .join(d.select("doc_id", "lang"), "doc_id")
        .withColumn(
            "tickets", (F.lit(1) + F.floor(F.col("quality") * 9)).cast("int")
        )
    )
    return sampling.weighted_sample(
        scored, ["lang"], "doc_id", "tickets", k=10, max_tickets=10, salt=":q129"
    )


from spark_hadoop_automation_in_cloud_spark.operators.sketches import (  # noqa: E402
    quantile_buckets,
    quantile_sketches,
    sql_value_bucket,
    value_bucket,
)

_Q130_SCORED_SQL = f"""
SELECT d.source, q.doc_id, q.quality
FROM ({tx.sql_quality_score("documents", "doc_id", "text")}) q
JOIN documents d ON d.doc_id = q.doc_id
"""


@register(
    "q130_per_source_quality_cut",
    f"""
WITH scored AS ({_Q130_SCORED_SQL}),
b AS (SELECT source, doc_id, quality,
             {sql_value_bucket("quality", 0.01)} AS bkt
      FROM scored),
-- NULL buckets (NULL/non-finite quality) carry no rank: the sketch
-- build skips them (quantile_sketches' _finite guard), so the oracle's
-- totals must too or rnk overshoots the valid cumulative range whenever
-- any document has NULL text
c AS (SELECT source, bkt, COUNT(*) AS cnt FROM b
      WHERE bkt IS NOT NULL GROUP BY 1, 2),
t AS (SELECT source, SUM(cnt) AS total FROM c GROUP BY 1),
r AS (SELECT source,
             GREATEST(CAST(ceil(round(0.7 * total, 9)) AS BIGINT), 1) AS rnk
      FROM t),
cum AS (SELECT source, bkt,
               SUM(cnt) OVER (PARTITION BY source ORDER BY bkt) AS cum
        FROM c),
pick AS (SELECT r.source, MIN(cum.bkt) AS thr_bucket
         FROM r JOIN cum ON cum.source = r.source AND cum.cum >= r.rnk
         GROUP BY 1)
SELECT b.source, b.doc_id, b.quality, p.thr_bucket
FROM b JOIN pick p ON b.source = p.source AND b.bkt >= p.thr_bucket
""",
    doc="Per-source adaptive quality cut (operators/sketches.py "
    "quantile_buckets + value_bucket): keep each source's docs at or "
    "above its OWN p70 quality — the per-domain threshold calibration "
    "every mixed-source corpus needs (a fixed global bar over- or "
    "under-prunes sources with different quality distributions; q120 "
    "calibrates one global bar from a budget, this calibrates one bar "
    "PER source from its distribution). The threshold is the mergeable "
    "quantile sketch's p70 BUCKET CODE and rows compare their own "
    "value_bucket against it — pure integer comparison on both engines "
    "(the representative double would reintroduce last-ulp >= hazards "
    "at the cut line), honest to the sketch's 1% resolution. Scale "
    "shape: sketch build is one map-side-combined agg to a few hundred "
    "bucket rows per source, the threshold table broadcasts, the filter "
    "is row-local in the scan — no sort, no corpus window; at 100 TB "
    "the sketches are the same persisted state q102 rolls up. Floor "
    "stability measured: quality values sit >= 3e-3 buckets from any "
    "boundary vs ~1e-13 cross-engine ln() noise.",
)
def q130_per_source_quality_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    scored = (
        tx.quality_score(d, "doc_id", "text")
        .select("doc_id", "quality")
        .join(d.select("doc_id", "source"), "doc_id")
    )
    sk = quantile_sketches(scored, ["source"], "quality", eps=0.01)
    thr = quantile_buckets(sk, ["source"], [0.7], eps=0.01).select(
        "source", F.col("bucket").alias("thr_bucket")
    )
    return (
        scored.withColumn("__b", value_bucket(F.col("quality"), 0.01))
        .join(F.broadcast(thr), "source")
        .where(F.col("__b") >= F.col("thr_bucket"))
        .select("source", "doc_id", "quality", "thr_bucket")
    )


@register(
    "q131_source_overlap_matrix",
    f"""
WITH g AS ({dd.sql_shingle_rows("documents", "source", "text", n=3)}),
h AS (SELECT DISTINCT doc_id AS source, {dd.sql_md5_int60("shingle")} AS ih FROM g)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM h a JOIN h b ON a.ih = b.ih AND a.source < b.source
GROUP BY 1, 2
""",
    doc="Cross-source contamination matrix (operators/dedup.py "
    "group_overlap_matrix): distinct shared 3-gram count for every "
    "source pair — the planning signal for WHICH source pairs need "
    "cross-dedup (q108/q113) before mixing, and the corpus-level "
    "complement of q109's per-document duplication flags. Grams are "
    "md5-int60-compressed before any shuffle (the oracle hashes "
    "identically); the per-gram self-join fans out at most "
    "|sources|²/2 pairs per gram regardless of corpus size, and the "
    "aggregate map-side-combines to at most |sources|² cells. At "
    "thousands of sources, pre-prune boilerplate grams with the q126 "
    "screen (they carry no pairing information and cost the most).",
)
def q131_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    sh = dd.shingle_rows(d, "source", "text", n=3).withColumnRenamed(
        "doc_id", "source"
    )
    return dd.group_overlap_matrix(sh, "source", "shingle")


_Q132_SHINGLES = dd.sql_shingle_rows("documents", "doc_id", "text", n=2)
_Q132_PAIRS = dd.sql_lsh_candidate_pairs(dd.sql_minhash_signatures(_Q132_SHINGLES))


@register(
    "q132_incremental_cluster_maintenance",
    f"""
WITH RECURSIVE pairs AS (
  SELECT left_doc_id, right_doc_id
  FROM ({_Q132_PAIRS}) p
  WHERE est_jaccard >= 0.5
),
edges AS (
  SELECT left_doc_id AS a, right_doc_id AS b FROM pairs
  UNION
  SELECT right_doc_id AS a, left_doc_id AS b FROM pairs
  UNION
  SELECT doc_id AS a, doc_id AS b FROM documents
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
""",
    doc="End-to-end incremental dedup-CLUSTER maintenance — the capstone "
    "of the incremental family: the corpus splits into an admitted "
    "majority and a NEW batch (q108's hash bucket); history exists only "
    "as its persisted MinHash band index (q113's state) and its persisted "
    "min-id cluster labels; the batch contributes pairs via "
    "incremental_lsh_pairs (batch-vs-index + within-batch band "
    "equi-joins — never index-vs-index, history is not rescanned) and "
    "the labels merge via incremental_components (iterative work "
    "O(batch), one broadcast remap pass over the labels). Equivalence "
    "closed in algebra: hist-pairs ∪ batch-touching-pairs = full-corpus "
    "pairs, and the q128 property test pins the CC merge — so the "
    "oracle is the FULL recompute: LSH pairs over the whole corpus at "
    "the same est_jaccard >= 0.5, recursive closure, min-id labels, "
    "singletons labeling themselves. This is the crawl-pipeline loop "
    "shape at 100 TB: each snapshot pays its own size, never the "
    "corpus's.",
)
def q132_incremental_cluster_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    bucket = _inc_bucket()
    hist = d.where(bucket != 0)
    new = d.where(bucket == 0)
    sig_h = dd.minhash_signatures(dd.shingle_rows(hist, "doc_id", "text", n=2))
    sig_n = dd.minhash_signatures(dd.shingle_rows(new, "doc_id", "text", n=2))
    # persisted state an ingest loop would already hold: the band index
    # and the full-coverage min-id labels of the admitted corpus
    index = dd.minhash_band_index(sig_h)
    hist_pairs = dd.lsh_candidate_pairs(sig_h).where(F.col("est_jaccard") >= 0.5)
    labels = neardup_clusters(
        hist_pairs, hist, "doc_id",
        left_col="left_doc_id", right_col="right_doc_id",
    ).withColumnRenamed("doc_id", "node")
    batch_pairs = dd.incremental_lsh_pairs(sig_n, index, min_est_jaccard=0.5)
    merged = incremental_components(
        labels, batch_pairs, "left_doc_id", "right_doc_id",
        node_col="node", comp_col="cluster_id",
    )
    # batch singletons (no pair touches them) label themselves — the
    # same coalesce-to-self rule neardup_clusters applies
    return (
        d.select("doc_id")
        .join(merged, d["doc_id"] == merged["node"], "left")
        .select(
            "doc_id",
            F.coalesce(merged["cluster_id"], d["doc_id"]).alias("cluster_id"),
        )
    )


#: q133's fixed retrieval queries — ONE literal, inlined identically into
#: the Spark plan and the SQL oracle (terms drawn from the synthetic
#: corpus vocabulary so every query matches documents at every sf)
_Q133_QUERIES: dict[int, str] = {
    1: "hash join shuffle",
    2: "window sort order",
    3: "stream batch merge",
}


@register(
    "q133_bm25_retrieval",
    tx.sql_bm25_scores("documents", "doc_id", "text", _Q133_QUERIES, topk=10),
    doc="BM25 lexical retrieval (operators/textops.py bm25_scores): "
    "top-10 documents for each of three fixed keyword queries — the "
    "exact-lexical half of the search story (q24/q25/q30/q122 cover the "
    "semantic half; q63's TF-IDF gives per-doc keywords, this ranks "
    "docs against QUERIES). Robust BM25+ idf times saturated tf norm; "
    "per-(query,doc,term) contributions snap to a 1e-6 integer grid "
    "before the exact per-doc sum (the q101 unigram-LM idiom, so the "
    "oracle reproduces scores despite float summation order; ln "
    "agreement at 6dp per the TF-IDF precedent). Scale shape: the "
    "query-term literal broadcasts into the token scan FIRST, so tf and "
    "df shuffle only the query terms' posting lists — never the full "
    "vocabulary; corpus stats are one doc-length aggregate; the "
    "per-query top-10 is a WindowGroupLimit window over matched docs.",
)
def q133_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return tx.bm25_scores(d, "doc_id", "text", _Q133_QUERIES, topk=10)


from spark_hadoop_automation_in_cloud_spark.operators.similarity import (  # noqa: E402
    hybrid_prf_rrf_topk,
    sql_hybrid_prf_rrf_topk,
)


@register(
    "q134_hybrid_rrf_retrieval",
    sql_hybrid_prf_rrf_topk(
        "documents", "embeddings", _Q133_QUERIES, k_each=20, topk=10
    ),
    doc="Hybrid lexical+dense retrieval (operators/similarity.py "
    "hybrid_prf_rrf_topk): q133's BM25 queries ranked lexically (top-20), "
    "each query's top-1 hit seeding a dense cosine neighborhood scan by "
    "pseudo-relevance feedback, the two rank lists fused per doc with "
    "reciprocal-rank fusion 1/(60+rank) on an exact 1e-9 integer grid — "
    "the standard two-tower retrieval composition (RAG-style) from parts "
    "the registry already proves separately (q133 lexical, q24 dense). "
    "Scale shape: query-term posting lists + 1-row stats broadcast on "
    "the lexical side; a one-row-per-query PRF seed broadcast and one "
    "unshuffled corpus scan on the dense side; fusion joins two "
    "n_queries*20-row frames. The oracle embeds sql_bm25_scores "
    "verbatim — ONE ranker definition per engine.",
)
def q134_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    e = read_table(spark, sf_dir, "embeddings", parallelize=True)
    return hybrid_prf_rrf_topk(d, e, _Q133_QUERIES, k_each=20, topk=10)


from spark_hadoop_automation_in_cloud_spark.operators import linalg as la  # noqa: E402


@register(
    "q135_embedding_covariance",
    la.sql_covariance_matrix("embeddings", dim=64),
    doc="Embedding covariance matrix (operators/linalg.py "
    "covariance_matrix): the corpus-collapse / whitening diagnostic — "
    "upper-triangle population covariance of the 64-dim embedding "
    "column, exact on a 1e-6 component grid (Spark DECIMAL(38,0) vs "
    "DuckDB HUGEINT moments; value-hash-identical). Scale shape: ONE "
    "corpus scan; each row explodes into its dim(dim+1)/2 cells carrying "
    "pair product + both first moments, so a single map-side-combined "
    "hash aggregate yields n*Sxy - Sx*Sy with no re-join and a shuffle "
    "bounded by cells x partitions regardless of corpus size.",
)
def q135_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings", parallelize=True)
    return la.covariance_matrix(e, dim=64)


@register(
    "q136_pc_projection",
    la.sql_pc_projection("embeddings", dim=64),
    doc="Top-principal-component projection (operators/linalg.py "
    "pc_projection): every embedding's 1-D spectral coordinate, the "
    "SemDeDup-style diversity-budgeting / whitening primitive. The "
    "eigenvector comes from q135's covariance cells by repeated matrix "
    "SQUARING (7 squarings + 4 mat-vec steps = effective power 512, "
    "converging at (l2/l1)^512 — scale-robust where linear power "
    "iteration degrades as the eigengap tightens with corpus size; "
    "|cos| vs numpy eigh = 1.0 at sf0.001/0.01/0.1), all driver-side on "
    "bounded dim^2 integer state with one float renorm recipe per step "
    "that the unrolled SQL twin mirrors op-for-op on HUGEINT/DOUBLE. "
    "Scale shape: one covariance aggregate (collected, bounded) + one "
    "row-local integer dot-product scan — zero shuffle in the returned "
    "plan; the direction ships as a single 64-element literal.",
)
def q136_pc_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings", parallelize=True)
    return la.pc_projection(e, dim=64)


@register(
    "q137_vocab_coverage",
    tx.sql_vocab_coverage("documents", "text", topk=200),
    doc="Vocabulary coverage curve (operators/textops.py vocab_coverage): "
    "the 200 most frequent tokens with exact global rank and cumulative "
    "share of all token occurrences — the tokenizer/vocab-construction "
    "statistic (how many types cover X% of the stream). Scale shape: one "
    "map-side-combined token-count shuffle, then the global order runs "
    "on the range-partition + broadcast-prefix-offset primitives "
    "(ranks.global_row_number / global_cumsum) over the already-"
    "aggregated vocabulary — no SinglePartition window anywhere, so a "
    "multi-million-type vocabulary ranks without serializing through "
    "one task; the total count rides a 1-row broadcast.",
)
def q137_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return tx.vocab_coverage(d, "text", topk=200)


_Q138_JOIN_SQL = (
    "SELECT d.source AS g, e.embedding"
    " FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id"
)


@register(
    "q138_source_centroid_cosine",
    "SELECT group_a AS source_a, group_b AS source_b, centroid_cos FROM ("
    + la.sql_group_centroid_cosine(_Q138_JOIN_SQL, dim=64)
    + ")",
    doc="Cross-source centroid similarity matrix (operators/linalg.py "
    "group_centroid_cosine): pairwise cosine between per-source mean "
    "embeddings — the domain-similarity reading mixture design needs "
    "(which sources cover the same semantic region; complements q131's "
    "LEXICAL gram-overlap matrix with the semantic view). Cosine is "
    "scale-invariant, so the kernel works on exact integer SUM vectors "
    "(1e-6 grid, DECIMAL/HUGEINT) and never divides by counts; the "
    "per-source sums (groups x dim — bounded model state) collect "
    "driver-side, pair moments compute in exact Python ints, and the "
    "single float step (the cosine) evaluates ENGINE-side on the tiny "
    "result frame so rounding is Spark's, never Python's. Scale shape: "
    "one equi-join + one map-side-combined aggregate over groups x dim "
    "cells; everything after is O(sources^2 * dim) on the driver.",
)
def q138_source_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # documents is a fact table at scale — no broadcast hint; the id
    # equi-join shuffles both sides on the key (AQE may still pick a
    # broadcast-hash at small sf, which is fine)
    d = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    e = read_table(spark, sf_dir, "embeddings", parallelize=True)
    j = e.join(d, e["vec_id"] == d["doc_id"]).select(
        F.col("source").alias("src"), "embedding"
    )
    return la.group_centroid_cosine(j, "src", dim=64).select(
        F.col("group_a").alias("source_a"),
        F.col("group_b").alias("source_b"),
        "centroid_cos",
    )


_Q139_MONTHLY_SQL = """
SELECT n.n_name,
       CAST(EXTRACT(year FROM o.o_orderdate) * 12
            + EXTRACT(month FROM o.o_orderdate) AS BIGINT) AS month_idx,
       CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS rev_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1, 2
"""


@register(
    "q139_revenue_trend_ols",
    la.sql_grouped_ols(_Q139_MONTHLY_SQL, ["n_name"], "month_idx", "rev_cents"),
    doc="Per-nation revenue trend by grouped OLS (operators/linalg.py "
    "grouped_ols): slope/intercept of monthly revenue against a month "
    "index, from exact DECIMAL(38,0)/HUGEINT moments (n, Sx, Sy, Sxy, "
    "Sxx), ONE shared double recipe, and magnitude-scaled rounding "
    "(slope 6dp; intercept 2dp — 6dp rounding past ~9e9 is not "
    "cross-engine safe, see grouped_ols) — the trend-detection analytic "
    "(is this segment growing?) as a single map-side-combined aggregate "
    "over the month rollup; five numbers of state per group, NULL slope "
    "when a nation has fewer than two distinct months. The intercept "
    "recomputes the unrounded slope so roundings never compound.",
)
def q139_revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = F.broadcast(read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    month_idx = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("bigint")
    monthly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", month_idx.alias("month_idx"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    return la.grouped_ols(monthly, ["n_name"], "month_idx", "rev_cents")


from spark_hadoop_automation_in_cloud_spark.operators.ranks import (  # noqa: E402
    group_percentile,
    sql_group_percentile,
)

_Q140_SRC_SQL = (
    "SELECT q.doc_id, d.source, q.quality FROM ("
    + tx.sql_quality_score("documents", "doc_id", "text")
    + ") q JOIN documents d ON d.doc_id = q.doc_id"
)


@register(
    "q140_source_calibrated_quality",
    sql_group_percentile(
        _Q140_SRC_SQL,
        "source",
        "quality ASC, doc_id ASC",
        "doc_id, source, quality",
        out_col="pct",
    ),
    doc="Per-source percentile calibration of the quality score "
    "(operators/ranks.py group_percentile): (rank-1)/(n-1) within each "
    "source over (quality, doc_id) — the transform that makes heuristic "
    "quality comparable ACROSS heterogeneous sources before a global "
    "cut (a raw threshold keeps whatever source happens to score high; "
    "the percentile keeps the same fraction of every source; single-doc "
    "sources land at 0.5). Scale shape: quality computes inline in the "
    "scan (no rejoin — the oracle rejoins only because its quality "
    "fragment is a standalone SELECT) and one hash partition on source "
    "feeds an ordinary partitioned window (rank + count in one pass) — "
    "groups parallelize; nothing single-partition.",
)
def q140_source_calibrated_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    e = tx.quality_exprs(F.col("text"))
    scored = d.select("doc_id", "source", e["quality"].alias("quality"))
    return group_percentile(
        scored, "source", [F.col("quality").asc(), F.col("doc_id").asc()], "pct"
    )


@register(
    "q141_bigram_lm_quality",
    tx.sql_bigram_lm_scores("documents", _SQL_TRAIN_PRED, "doc_id", "text"),
    doc="Bigram language-model quality scoring (operators/textops.py "
    "bigram_lm_scores): q101's conditional upgrade — per-doc average "
    "negative log-prob of ADJACENT token pairs under an add-one-smoothed "
    "bigram model fit on the same train split, so fluency now requires "
    "local word order (shuffled text that fools the unigram filter "
    "scores high here). Bigrams extract ROW-LOCALLY from the split "
    "array (one transform, no per-doc window — the corpus never "
    "shuffles on doc id for adjacency); the model is two aggregates "
    "(pair counts; context totals derived from them, no second train "
    "scan); scoring is two equi-joins + a 1-row stats broadcast. "
    "Per-pair log-probs snap to the 1e-6 grid and sum exactly.",
)
def q141_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    bucket = hashing.md5_prefix_int(F.col("doc_id"), nhex=8, salt=":split") % 100
    train = d.where(bucket < 80)
    return tx.bigram_lm_scores(d, train, "doc_id", "text", alpha=1.0)


#: q142's audit probe: ≤ this many (hash-ordered) users per event_type,
#: so the materialize-before-rmtree collect is bounded by construction
#: (types × 200 rows) at ANY sf — the r06 verdict's one unbounded collect
_CM_PROBE_PER_TYPE = 200


@register(
    "q142_streaming_countmin",
    _q105_sql(probe_per_type=_CM_PROBE_PER_TYPE),
    doc="Streaming count-min maintenance (streaming/incremental.py "
    "update_countmin_index / read_countmin_index): events arrive in "
    "three epochs (md5-bucketed), each epoch sketches ITSELF into its "
    "own batch_id partition (overwrite = replay-idempotent; unlike the "
    "dedup index a batch never reads earlier state — pure append-of-own-"
    "partition, commutative by construction), and the reader merges "
    "whatever partitions exist. Count-min is LINEAR, so the merged "
    "batch sketches are bit-for-bit the full-corpus sketch — this row "
    "shares q105's cell-exact oracle BODY (same sketch geometry, same "
    "hash family), restricted to a bounded probe: the first 200 keys "
    "per event_type in deterministic md5 order, so the audit frame the "
    "row materializes before the index tempdir is removed stays ≤ "
    "types × 200 rows at any corpus size (point-query estimates are "
    "per-key — the probe changes which rows appear, never their "
    "values). This row drives the per-epoch engine body directly "
    "(q111's idiom — no file-source timing in a correctness row); the "
    "stream wiring (availableNow drain + checkpoint) is pinned in "
    "test_streaming.py.",
)
def q142_streaming_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from spark_hadoop_automation_in_cloud_spark.operators.sketches import (
        countmin_estimate,
    )
    from spark_hadoop_automation_in_cloud_spark.streaming.incremental import (
        read_countmin_index,
        update_countmin_index,
    )

    e = read_table(spark, sf_dir, "events")
    bucket = hashing.md5_prefix_int(F.col("event_id"), nhex=8, salt=":cmb") % 3
    root = tempfile.mkdtemp(prefix="q142_")
    idx = f"{root}/index"
    try:
        for b in range(3):
            update_countmin_index(
                e.where(bucket == b).select("event_type", "user_id"),
                idx,
                ["event_type"],
                "user_id",
                epoch_id=b,
            )
        merged = read_countmin_index(spark, idx, ["event_type"])
        # bounded probe: first _CM_PROBE_PER_TYPE keys per type by md5
        # order (user_id tiebreak) — the collect below is ≤ types × 200
        # rows by construction; the oracle applies the identical cut
        keys = e.select("event_type", "user_id").distinct()
        ph = hashing.md5_prefix_int(
            F.concat(
                F.col("event_type"), F.lit(":"), F.col("user_id").cast("string")
            ),
            nhex=15,
            salt=":cmprobe",
        )
        pw = Window.partitionBy("event_type").orderBy(
            ph.asc(), F.col("user_id").asc()
        )
        items = (
            keys.withColumn("__r", F.row_number().over(pw))
            .where(F.col("__r") <= _CM_PROBE_PER_TYPE)
            .drop("__r")
        )
        est = countmin_estimate(merged, ["event_type"], items, "user_id")
        tru = e.groupBy("event_type", "user_id").agg(
            F.count(F.lit(1)).alias("true_n")
        )
        out = tru.join(est, ["event_type", "user_id"]).select(
            "event_type",
            "user_id",
            F.col("true_n").cast("bigint").alias("true_n"),
            F.col("est_n").cast("bigint").alias("est_n"),
        )
        # materialize before the index dir goes away (q111's idiom)
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "q143_dedup_audit",
    f"""
WITH RECURSIVE {_SQL_CLUSTER_CTES},
m AS (
  SELECT c.cluster_id, k.doc_id, k.quality,
         CAST(len(string_split(k.text, ' ')) AS BIGINT) AS n_tokens
  FROM kept k JOIN clus c ON k.doc_id = c.doc_id
),
ranked AS (
  SELECT cluster_id, doc_id, quality, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
                            ORDER BY quality DESC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY cluster_id) AS n_members,
         MIN(quality) OVER (PARTITION BY cluster_id) AS worst_quality,
         CAST(SUM(n_tokens) OVER (PARTITION BY cluster_id) AS BIGINT) AS tot_tokens
  FROM m
)
SELECT cluster_id,
       CAST(n_members AS BIGINT) AS n_members,
       doc_id AS survivor_id,
       quality AS best_quality,
       worst_quality,
       round(quality - worst_quality, 6) AS quality_spread,
       tot_tokens - n_tokens AS dropped_tokens
FROM ranked
WHERE rn = 1 AND n_members >= 2
""",
    doc="Dedup audit report (the ops deliverable behind q40/q116): for "
    "every MULTI-member near-dup cluster, what dedup kept and what it "
    "cost — size, the q116 keep-rule survivor, best/worst quality and "
    "their spread, and the token mass the drop forfeits. Spark side is "
    "ONE map-side-combined aggregation over the shared cluster labels "
    "(count + max_by survivor + min/max quality + token sums — no "
    "corpus window; the oracle uses windows only because its CTE is a "
    "standalone SELECT). Shares the q40/q116 closure CTEs verbatim, so "
    "a threshold change moves all three oracles together.",
)
def q143_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept, clusters = _curation_clusters(spark, sf_dir)
    members = (
        kept.select(
            "doc_id",
            "quality",
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        )
        .join(clusters, "doc_id")
    )
    key = F.struct(F.col("quality"), (-F.col("doc_id")).alias("__neg_id"))
    agg = members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.max_by("doc_id", key).alias("survivor_id"),
        F.max("quality").alias("best_quality"),
        F.min("quality").alias("worst_quality"),
        F.sum("n_tokens").alias("__tot_tokens"),
        F.max_by("n_tokens", key).alias("__survivor_tokens"),
    )
    return agg.where(F.col("n_members") >= 2).select(
        "cluster_id",
        "n_members",
        "survivor_id",
        "best_quality",
        "worst_quality",
        F.round(F.col("best_quality") - F.col("worst_quality"), 6).alias(
            "quality_spread"
        ),
        (F.col("__tot_tokens") - F.col("__survivor_tokens"))
        .cast("bigint")
        .alias("dropped_tokens"),
    )


from spark_hadoop_automation_in_cloud_spark.operators.inference import (  # noqa: E402
    rerank_topk,
    sql_fake_pair_score,
)


@register(
    "q144_model_rerank",
    f"""
WITH fused AS (
  SELECT query_id, doc_id, rrf FROM (
    {sql_hybrid_prf_rrf_topk("documents", "embeddings", _Q133_QUERIES, k_each=20, topk=10)}
  )
),
scored AS (
  SELECT query_id, doc_id, rrf,
         round({sql_fake_pair_score(["query_id", "doc_id"])}, 6) AS model_score
  FROM fused
)
SELECT query_id, doc_id, rrf, model_score,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY model_score DESC, doc_id ASC) AS INT)
         AS model_rank
FROM scored
QUALIFY model_rank <= 5
""",
    doc="Model-scored rerank through the Arrow inference seam "
    "(operators/inference.py rerank_topk / score_candidates): the "
    "retrieve→rerank composition — q134's fused top-10 candidates per "
    "query scored by a pluggable batch scorer over mapInPandas "
    "(vectorized Arrow batches, zero shuffle; memory bounded by "
    "maxRecordsPerBatch) and cut to the model's top-5. The default "
    "scorer is the deterministic md5 FAKE (warns at construction; "
    "strict=True raises; a real cross-encoder injects via scorer= — "
    "the multimodal codec-seam pattern applied to inference), which is "
    "what lets this row be a full value-hash oracle: the SQL replays "
    "the same md5 arithmetic. The window is per query over ≤10 rows — "
    "bounded however large the corpus.",
)
def q144_model_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    e = read_table(spark, sf_dir, "embeddings", parallelize=True)
    fused = hybrid_prf_rrf_topk(d, e, _Q133_QUERIES, k_each=20, topk=10).select(
        "query_id", "doc_id", "rrf"
    )
    return rerank_topk(fused, "query_id", "doc_id", topk=5)


@register(
    "q145_sketch_quality_deciles",
    f"""
WITH scored AS ({_Q130_SCORED_SQL}),
b AS (SELECT source, doc_id, quality,
             {sql_value_bucket("quality", 0.01)} AS bkt
      FROM scored),
c AS (SELECT source, bkt, COUNT(*) AS cnt FROM b
      WHERE bkt IS NOT NULL GROUP BY 1, 2),
t AS (SELECT source, SUM(cnt) AS total FROM c GROUP BY 1),
qs AS (SELECT gi.i / 10.0 AS q FROM generate_series(1, 9) gi(i)),
r AS (SELECT t.source, qs.q,
             GREATEST(CAST(ceil(round(qs.q * t.total, 9)) AS BIGINT), 1) AS rnk
      FROM t CROSS JOIN qs),
cum AS (SELECT source, bkt,
               SUM(cnt) OVER (PARTITION BY source ORDER BY bkt) AS cum
        FROM c),
pick AS (SELECT r.source, r.q, MIN(cum.bkt) AS cut
         FROM r JOIN cum ON cum.source = r.source AND cum.cum >= r.rnk
         GROUP BY 1, 2)
SELECT b.source, b.doc_id, b.quality,
       CAST(SUM(CASE WHEN b.bkt > p.cut THEN 1 ELSE 0 END) AS INT) AS decile
FROM b JOIN pick p ON p.source = b.source
WHERE b.bkt IS NOT NULL
GROUP BY 1, 2, 3
""",
    doc="Per-source quality DECILES from the mergeable quantile sketch "
    "(operators/sketches.py quantile_sketches / quantile_buckets / "
    "value_bucket): q140's exact-percentile calibration is a per-group "
    "window — fine when groups fit a partition; THIS is the scale path "
    "when they don't: the nine per-source cut points come from the same "
    "persisted sketch state q102 rolls up, broadcast as integer BUCKET "
    "CODES, and every row's decile is a row-local fold comparing its "
    "own value_bucket against the cut array — pure integer comparisons "
    "(no representative-double >= hazards at cut lines), one map-side-"
    "combined sketch aggregate, no sort, no corpus window. Honest to "
    "the sketch's 1% resolution: adjacent deciles whose cuts land in "
    "one bucket collapse identically on both engines. Rows with "
    "NULL/non-finite quality carry no rank and are excluded on both "
    "sides (the sketch skips them).",
)
def q145_sketch_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    scored = (
        tx.quality_score(d, "doc_id", "text")
        .select("doc_id", "quality")
        .join(d.select("doc_id", "source"), "doc_id")
    )
    sk = quantile_sketches(scored, ["source"], "quality", eps=0.01)
    qs = [i / 10.0 for i in range(1, 10)]
    cuts = (
        quantile_buckets(sk, ["source"], qs, eps=0.01)
        .groupBy("source")
        .agg(F.array_sort(F.collect_list("bucket")).alias("__cuts"))
    )
    b = value_bucket(F.col("quality"), 0.01)
    decile = F.aggregate(
        F.col("__cuts"),
        F.lit(0),
        lambda acc, c: acc + F.when(F.col("__b") > c, 1).otherwise(0),
    )
    return (
        scored.withColumn("__b", b)
        .where(F.col("__b").isNotNull())
        .join(F.broadcast(cuts), "source")
        .select(
            "source",
            "doc_id",
            "quality",
            decile.cast("int").alias("decile"),
        )
    )


from spark_hadoop_automation_in_cloud_spark.operators.checks import (  # noqa: E402
    numeric_psi,
    sql_numeric_psi,
)


@register(
    "q146_value_psi_weekend",
    sql_numeric_psi(
        "SELECT event_type, ts, value FROM events",
        ["event_type"],
        "CASE WHEN extract(dow FROM ts) IN (0, 6) THEN 'weekend' ELSE 'weekday' END",
        "weekday",
        "weekend",
        "value",
        eps=0.01,
    ),
    doc="Numeric distribution drift as PSI (operators/checks.py "
    "numeric_psi): per event type, the Population Stability Index of "
    "the value column between weekday and weekend traffic — the numeric "
    "half of the drift dashboard (q121's total-variation score covers "
    "the categorical half; PSI < 0.1 is the conventional stable line). "
    "Bins are the mergeable quantile sketch's integer bucket codes — no "
    "training pass, engine-identical, run-over-run comparable; shares "
    "are Laplace-smoothed over the group's bin union so one-sided bins "
    "stay finite; each bin's (p-q)*ln(p/q) snaps to a 1e-9 grid before "
    "the exact sum (the ln idiom). ONE shuffle into (group, bin) "
    "conditional counts, map-side combined; term math row-local. Note "
    "the dow conventions differ (Spark dayofweek: 1=Sun..7=Sat; DuckDB "
    "dow: 0=Sun..6=Sat) — each side uses its own weekend set.",
)
def q146_value_psi_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    seg = F.when(F.dayofweek(F.col("ts")).isin(1, 7), "weekend").otherwise(
        "weekday"
    )
    return numeric_psi(
        e.select("event_type", seg.alias("seg"), "value"),
        ["event_type"],
        "seg",
        "weekday",
        "weekend",
        "value",
        eps=0.01,
    )


@register(
    "q147_join_size_estimate",
    """
WITH seg AS (
  SELECT c_mktsegment,
         CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS exact_seg
  FROM customer GROUP BY 1
),
ov AS (
  SELECT c.c_mktsegment,
         CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS exact_overlap
  FROM customer c
  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  GROUP BY 1
)
SELECT seg.c_mktsegment, seg.exact_seg,
       COALESCE(ov.exact_overlap, 0) AS exact_overlap,
       TRUE AS est_in_bound
FROM seg LEFT JOIN ov ON ov.c_mktsegment = seg.c_mktsegment
""",
    doc="Join-cardinality estimation by HLL inclusion-exclusion "
    "(operators/sketches.py overlap_estimate): per market segment, how "
    "many of its customer keys appear among order placers — estimated "
    "from two fixed-size sketches (est_left + est_right - est_union, "
    "union via hll_union) with NO key shuffle; at 100 TB this sizes a "
    "join before paying for it. The DataSketches estimator isn't "
    "SQL-replayable (q104's precedent), so the oracle pins what IS "
    "exact — the segment key counts and the true overlap — plus the "
    "assertion that the inclusion-exclusion estimate lands within the "
    "summed 3-sigma bounds of its three component estimates; "
    "est_in_bound must come back TRUE per group or the value hash "
    "fails.",
)
def q147_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from spark_hadoop_automation_in_cloud_spark.operators.sketches import (
        DEFAULT_LGK,
        overlap_estimate,
    )

    c = read_table(spark, sf_dir, "customer").select("c_mktsegment", "c_custkey")
    o = read_table(spark, sf_dir, "orders").select("o_custkey")
    est = overlap_estimate(c, o, ["c_mktsegment"], "c_custkey", "o_custkey")
    exact_seg = c.groupBy("c_mktsegment").agg(
        F.count_distinct("c_custkey").cast("bigint").alias("exact_seg")
    )
    buyers = c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
    exact_ov = buyers.groupBy("c_mktsegment").agg(
        F.count_distinct("c_custkey").cast("bigint").alias("exact_overlap")
    )
    rel3 = 3.0 * 1.04 / math.sqrt(2.0**DEFAULT_LGK)
    bound = rel3 * (
        F.col("est_left") + F.col("est_right") + F.col("est_union")
    ).cast("double")
    return (
        est.join(exact_seg, "c_mktsegment")
        .join(exact_ov, "c_mktsegment", "left")
        .select(
            "c_mktsegment",
            "exact_seg",
            F.coalesce(F.col("exact_overlap"), F.lit(0).cast("bigint")).alias(
                "exact_overlap"
            ),
            (
                F.abs(
                    F.col("est_overlap").cast("double")
                    - F.coalesce(F.col("exact_overlap"), F.lit(0)).cast("double")
                )
                <= bound
            ).alias("est_in_bound"),
        )
    )


@register(
    "q148_langid_confusion",
    f"""
WITH pred AS ({tx.sql_language_id("documents", "doc_id", "text")}),
conf AS (
  SELECT d.lang AS true_lang, p.pred_lang,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents d JOIN pred p ON p.doc_id = d.doc_id
  GROUP BY 1, 2
)
SELECT true_lang, pred_lang, n,
       round(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY pred_lang) AS BIGINT), 6)
         AS share_of_pred,
       round(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY true_lang) AS BIGINT), 6)
         AS share_of_true
FROM conf
""",
    doc="Classifier evaluation: the language-ID confusion matrix "
    "(operators/textops.py language_id vs the ground-truth lang column) "
    "with per-cell shares — diagonal cells' share_of_pred IS the class "
    "precision and share_of_true the class recall, the evaluation "
    "primitive any heuristic classifier in the curation pipeline needs "
    "before its output gates data. Scale shape: prediction is row-local "
    "marker counting in the scan; ONE map-side-combined aggregation to "
    "|langs|^2 cells; the marginal windows run over that tiny aggregate "
    "(partitioned by class, never the corpus).",
)
def q148_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    pred = tx.language_id(d, "doc_id", "text").select("doc_id", "pred_lang")
    conf = (
        d.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wp = Window.partitionBy("pred_lang")
    wt = Window.partitionBy("true_lang")
    return conf.select(
        "true_lang",
        "pred_lang",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wp), 6).alias(
            "share_of_pred"
        ),
        F.round(F.col("n").cast("double") / F.sum("n").over(wt), 6).alias(
            "share_of_true"
        ),
    )


@register(
    "q149_ann_recall_eval",
    f"""
WITH ann AS (
  SELECT query_id, neighbor_id FROM (
    {sql_ann_lsh_topk("embeddings", "vec_id < 10", k=5, dim=64, planes=4, tables=6)}
  )
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    {sql_cosine_topk("embeddings", "vec_id < 10", k=5)}
  )
)
SELECT e.query_id,
       CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
       CAST(COUNT(*) AS BIGINT) AS k,
       round(CAST(COUNT(a.neighbor_id) AS DOUBLE) / COUNT(*), 6) AS recall_at_k
FROM exact e
LEFT JOIN ann a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id
""",
    doc="Retrieval evaluation as a first-class query: recall@5 of the "
    "LSH ANN index (q25's exact operating point) against the brute-force "
    "ground truth (q24's ranking), per query — the measure-your-index "
    "primitive RECALL.json records offline, here oracle-checked so the "
    "evaluation itself is proven cross-engine (both rankings are "
    "deterministic: LCG hyperplanes, 6dp-rounded cosines, id "
    "tiebreaks). Scale shape: both sides are the already-proven "
    "bucketed/broadcast plans; the comparison joins two "
    "n_queries*k-row frames. At 100 TB the same query runs against a "
    "persisted ANN index (q119) — recall evaluation needs no extra "
    "infrastructure, just this join.",
)
def q149_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    queries_df = emb.where(F.col("vec_id") < 10)
    ann = ann_lsh_topk(emb, queries_df, k=5, dim=64, planes=4, tables=6).select(
        "query_id", F.col("neighbor_id").alias("__ann_n")
    )
    exact = cosine_topk(emb, queries_df, k=5).select("query_id", "neighbor_id")
    j = exact.join(
        ann,
        (exact["query_id"] == ann["query_id"])
        & (exact["neighbor_id"] == ann["__ann_n"]),
        "left",
    ).select(exact["query_id"].alias("qid"), "neighbor_id", "__ann_n")
    return j.groupBy(F.col("qid").alias("query_id")).agg(
        F.count("__ann_n").cast("bigint").alias("n_hit"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.round(
            F.count("__ann_n").cast("double") / F.count(F.lit(1)), 6
        ).alias("recall_at_k"),
    )


from spark_hadoop_automation_in_cloud_spark.operators.packing import (  # noqa: E402
    rendezvous_shard,
    sql_rendezvous_shard,
)


@register(
    "q150_shard_rebalance_plan",
    f"""
WITH a AS (
  SELECT doc_id,
         {sql_rendezvous_shard("doc_id", 12)} AS old_shard,
         {sql_rendezvous_shard("doc_id", 16)} AS new_shard
  FROM documents
)
SELECT old_shard, new_shard,
       CAST(COUNT(*) AS BIGINT) AS n,
       old_shard <> new_shard AS moved
FROM a GROUP BY 1, 2
""",
    doc="Shard-growth rebalance plan under rendezvous (HRW) hashing "
    "(operators/packing.py rendezvous_shard): the old (12-shard) vs new "
    "(16-shard) placement transition matrix — the minimal-move layout "
    "for growing a training-shard set, where the q110 modulo layout "
    "would rehome nearly every key. HRW guarantees a key moves ONLY "
    "into a new shard (no old-to-old churn; property-pinned: every "
    "moved row has new_shard >= 12) and the expected moved fraction is "
    "m/(n+m) = 4/16. Row-local argmax over an n_shards-literal weight "
    "array (the k-means inline-argmin idiom), zero shuffle before the "
    "one transition-matrix aggregation; exactly SQL-replayable.",
)
def q150_shard_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    a = d.select(
        rendezvous_shard(F.col("doc_id"), 12).alias("old_shard"),
        rendezvous_shard(F.col("doc_id"), 16).alias("new_shard"),
    )
    return (
        a.groupBy("old_shard", "new_shard")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            "old_shard",
            "new_shard",
            "n",
            (F.col("old_shard") != F.col("new_shard")).alias("moved"),
        )
    )


@register(
    "q151_freshness_report",
    """
WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),
anchor AS (SELECT MAX(us) AS a_us FROM ev)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(MAX(us) AS BIGINT) AS max_us,
       round(CAST(a.a_us - MAX(us) AS DOUBLE) / 3600000000.0, 6) AS lag_hours,
       CAST(SUM(CASE WHEN us > a.a_us - 86400000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_last_day,
       (a.a_us - MAX(us)) > 86400000000 AS is_stale
FROM ev CROSS JOIN anchor a
GROUP BY event_type, a.a_us
""",
    doc="Source-freshness SLA report: per event type, the lag behind the "
    "lake's newest event (the corpus max ts as the deterministic anchor "
    "— no wall clock, so the report is replayable), volume in the "
    "anchor-relative last day, and a staleness flag at the 24 h line — "
    "the is-any-feed-dead check an ingest dashboard runs every cycle. "
    "All arithmetic on exact epoch microseconds until one final "
    "division. Scale shape: one 1-row max broadcast + one map-side-"
    "combined aggregation over the scan; nothing else.",
)
def q151_freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events").select(
        "event_type", epoch_us(F.col("ts")).alias("us")
    )
    anchor = e.agg(F.max("us").alias("a_us"))
    j = e.crossJoin(F.broadcast(anchor))
    return j.groupBy("event_type", "a_us").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.max("us").cast("bigint").alias("max_us"),
        F.round(
            (F.col("a_us") - F.max("us")).cast("double") / 3_600_000_000.0, 6
        ).alias("lag_hours"),
        F.sum(
            F.when(F.col("us") > F.col("a_us") - 86_400_000_000, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_last_day"),
        ((F.col("a_us") - F.max("us")) > 86_400_000_000).alias("is_stale"),
    ).drop("a_us")


@register(
    "q152_streaming_covariance",
    la.sql_covariance_matrix("embeddings", dim=64),
    doc="Streaming covariance maintenance (streaming/incremental.py "
    "update_covariance_index / read_covariance_index over "
    "linalg.raw_moment_cells): embeddings arrive in three epochs "
    "(md5-bucketed), each epoch aggregates its OWN raw moment cells "
    "into its batch_id partition (overwrite = replay-idempotent, no "
    "earlier state read — q142's pure append-of-own-partition shape), "
    "and the reader merges partitions. Raw moment cells are plain "
    "integer sums — LINEAR like count-min — so merged batch cells are "
    "bit-for-bit the full-corpus cells, and this row shares q135's "
    "covariance oracle VERBATIM: the SQL computes the whole table at "
    "once, the value hash proves the epoch-partitioned maintenance "
    "converges to exactly that. The embedding-drift monitor's "
    "run-over-run shape: dim(dim+1)/2 rows of state per batch, "
    "independent of batch size. Engine body driven directly (q111's "
    "idiom); the stream wiring is pinned in test_streaming.py.",
)
def q152_streaming_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from spark_hadoop_automation_in_cloud_spark.streaming.incremental import (
        read_covariance_index,
        update_covariance_index,
    )

    e = read_table(spark, sf_dir, "embeddings")
    bucket = hashing.md5_prefix_int(F.col("vec_id"), nhex=8, salt=":cov") % 3
    root = tempfile.mkdtemp(prefix="q152_")
    idx = f"{root}/index"
    try:
        for b in range(3):
            update_covariance_index(
                e.where(bucket == b).select("embedding"), idx, "embedding", b
            )
        merged = read_covariance_index(spark, idx)
        cov = F.round(
            F.col("num").cast("double") / F.col("n") / F.col("n")
            / F.lit(la._GRID2),
            6,
        ) + F.lit(0.0)
        out = la._center(merged).select("i", "j", cov.alias("cov"))
        # materialize before the index dir goes away (q111's idiom)
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --- round-8 batch: bucketed layout, rule-level gating, exact KS drift --------


@register(
    "q153_bucketed_colocated_join",
    """
SELECT d.source, d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(round(CAST(e.embedding AS DOUBLE[])[1] * 1000000.0)
                     AS BIGINT)) AS BIGINT) AS emb0_grid_sum
FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
GROUP BY 1, 2
""",
    doc="Bucketed-table co-located join (operators/bucketing.py): "
    "documents and embeddings are written as Hive-bucketed parquet "
    "tables (8 buckets on doc_id / vec_id, sorted), then joined through "
    "the catalog — with matching bucket counts the plan is a "
    "SortMergeJoin with ZERO Exchange on either side (pinned by "
    "tests/test_sources.py; the plain-read A/B carries 2), the pay-the-"
    "shuffle-once layout for fact×fact joins repeated on the same key "
    "at 100 TB. The oracle IS the plain join: the value hash proves the "
    "co-located layout dropped/duplicated nothing. Output is the "
    "per-(source, lang) count + exact 1e-6-grid sum of the first "
    "embedding component (bounded frame — the materialize-then-cleanup "
    "idiom never collects corpus-sized data); tables are dropped and "
    "the tempdir removed per invocation (q111's idiom).",
)
def q153_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from spark_hadoop_automation_in_cloud_spark.operators import bucketing as bk

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    root = tempfile.mkdtemp(prefix="q153_")
    try:
        bk.write_bucketed(docs, "q153_docs", f"{root}/docs", "doc_id", n_buckets=8)
        bk.write_bucketed(emb, "q153_emb", f"{root}/emb", "vec_id", n_buckets=8)
        j = bk.colocated_join(spark, "q153_docs", "q153_emb", "doc_id", "vec_id")
        emb0 = F.expr(
            "CAST(round(element_at(CAST(embedding AS ARRAY<DOUBLE>), 1)"
            " * 1000000.0) AS BIGINT)"
        )
        out = j.groupBy("source", "lang").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(emb0).cast("bigint").alias("emb0_grid_sum"),
        )
        # materialize before the table files go away (q111's idiom);
        # bounded: |sources| x |langs| rows
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        bk.drop_table(spark, "q153_docs")
        bk.drop_table(spark, "q153_emb")
        shutil.rmtree(root, ignore_errors=True)


@register(
    "q154_quality_rule_flags",
    tx.sql_quality_rule_flags("documents", "doc_id", "text"),
    doc="Gopher-style quality rule bundle (operators/textops.py "
    "quality_rule_flags): every heuristic gate as its own 0/1 flag — "
    "token-count band, mean-token-length band, alphabetic ratio, "
    "duplicate-token fraction, digit-token fraction, stopword presence "
    "— plus the conjunctive pass_all. The audit view a curation "
    "pipeline needs (WHY was a doc dropped?) that the composite q27 "
    "score erases; thresholds live as module constants shared verbatim "
    "by the SQL twin. Every rule is a row-local expression in the scan "
    "— one pass, zero shuffle, zero UDF.",
)
def q154_quality_rule_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return tx.quality_rule_flags(d, "doc_id", "text")


from spark_hadoop_automation_in_cloud_spark.operators.checks import (  # noqa: E402
    ks_statistic,
    sql_ks_statistic,
)


@register(
    "q155_ks_drift_weekend",
    sql_ks_statistic(
        "SELECT event_type, ts, value FROM events",
        ["event_type"],
        "CASE WHEN extract(dow FROM ts) IN (0, 6) THEN 'weekend' ELSE 'weekday' END",
        "weekday",
        "weekend",
        "value",
    ),
    doc="Exact two-sample Kolmogorov-Smirnov drift (operators/checks.py "
    "ks_statistic): per event type, the KS statistic of the value "
    "column between weekday and weekend traffic — the order-statistic "
    "complement to q146's binned PSI (KS sees a pure location shift at "
    "full resolution). Numerator is exact integer cross-products "
    "|A(x)*n_b - B(x)*n_a| in DECIMAL(38,0) with ONE final division — "
    "order-independent, engine-identical. One shuffle into (type, "
    "value) conditional counts (ties collapse at the map-side "
    "combiner), a cumulative window partitioned per type (groups "
    "parallelize — the q140 grouped-window idiom), totals broadcast "
    "back. At petabyte per-group cardinality, quantize to the sketch "
    "grid first; the exact form is the auditor's tool. dow conventions "
    "differ (Spark 1=Sun..7=Sat; DuckDB 0=Sun..6=Sat) — each side "
    "spells its own weekend set (the q146 note).",
)
def q155_ks_drift_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    seg = F.when(F.dayofweek(F.col("ts")).isin(1, 7), "weekend").otherwise(
        "weekday"
    )
    return ks_statistic(
        e.select("event_type", seg.alias("seg"), "value"),
        ["event_type"],
        "seg",
        "weekday",
        "weekend",
        "value",
    )


from spark_hadoop_automation_in_cloud_spark.operators.similarity import (  # noqa: E402
    pq_adc_topk,
    pq_encode,
    sql_pq_adc_topk,
    sql_pq_codes,
    train_pq_codebooks,
)


@register(
    "q156_pq_codes",
    sql_pq_codes("embeddings"),
    doc="Product quantization (operators/similarity.py train_pq_codebooks "
    "/ pq_encode): the 64-dim vector column compresses to 4 small-int "
    "codes — one per 16-dim subspace, each trained with the q96 Lloyd's "
    "conventions (lowest-id seeds, lowest-code tie-break, exact "
    "1e-6-quantized means) for 3 iterations — plus the total squared "
    "reconstruction error. This is what makes the vector side of a "
    "100 TB ANN index FIT: IVF (q30/q119) prunes which cells to scan, "
    "PQ shrinks what a scanned cell stores and compares (256 B float32 "
    "-> 4 ints). Training is one scan per iteration (all subspaces' "
    "argmins inline, all means in one exploded aggregation); encoding "
    "is one row-local scan, zero shuffle. The oracle replays the full "
    "per-subspace training trajectory unrolled (the q96 oracle pattern, "
    "every CTE MATERIALIZED).",
)
def q156_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    books = train_pq_codebooks(emb)
    return pq_encode(emb, books)


@register(
    "q157_pq_adc_topk",
    sql_pq_adc_topk("embeddings", "vec_id < 5", topk=10),
    doc="PQ asymmetric-distance search (operators/similarity.py "
    "pq_adc_topk): top-10 neighbors per query where the query stays a "
    "full vector and the corpus is its q156 codes — distance = "
    "sum_s LUT_s[code_s] with the per-query lookup tables (queries x 4 "
    "x 8 doubles, bounded) precomputed driver-side and broadcast. The "
    "scan touches 4 small ints per corpus row, never the vector: the "
    "PQ search kernel that turns a cell scan into array lookups + "
    "adds. The Python LUT fold is IEEE-identical to the engines' "
    "left fold, so the oracle recomputes distances from the replayed "
    "codebooks and still value-hash-matches; ties break on neighbor "
    "id after 6dp rounding (the q24 convention).",
)
def q157_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    books = train_pq_codebooks(emb)
    codes = pq_encode(emb, books).drop("recon_sq")
    return pq_adc_topk(codes, books, emb.where(F.col("vec_id") < 5), k=10)


from spark_hadoop_automation_in_cloud_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    ivf_pq_topk,
    sql_cosine_topk,
    sql_ivf_pq_topk,
)


@register(
    "q158_filtered_cosine_topk",
    sql_cosine_topk(
        "(SELECT e.* FROM embeddings e JOIN documents d"
        " ON d.doc_id = e.vec_id WHERE d.lang = 'en') sub",
        "vec_id < 20",
        k=5,
    ),
    doc="Metadata-filtered vector search (the filtered-ANN composition "
    "every retrieval product needs: 'nearest neighbors WHERE "
    "lang=en'): the corpus narrows through an equi-join to the "
    "documents metadata BEFORE any distance math, so the broadcast "
    "query x corpus scan (q24's plan) runs over the filtered subset "
    "only — predicate first, geometry second. Same rounded-cosine + "
    "id-tiebreak contract as q24; the oracle applies the identical "
    "join-filter. At 100 TB the filter join is the cheap side (ids + "
    "one predicate column), and with the q153 bucketed layout it "
    "co-locates for free.",
)
def q158_filtered_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    docs = read_table(spark, sf_dir, "documents")
    en = docs.where(F.col("lang") == "en").select(F.col("doc_id").alias("vec_id"))
    corpus = emb.join(en, "vec_id")
    return cosine_topk(corpus, corpus.where(F.col("vec_id") < 20), k=5)


@register(
    "q159_ivf_pq_search",
    sql_ivf_pq_topk("embeddings", "vec_id < 5", topk=10),
    doc="IVF-PQ search (operators/similarity.py ivf_pq_topk) — the "
    "billion-scale ANN architecture composed end-to-end from the "
    "persistable stages this engine already ships: q30's coarse cells "
    "decide WHICH lists a query scans (nprobe=2), q156's codebooks "
    "decide what scanning COSTS (4 ints + LUT lookups per candidate, "
    "never a vector), and the coded lists carry cell_id so the "
    "persisted index partitions by cell exactly like q119's "
    "partition-pruned probe. Search = two broadcast equi-joins "
    "(probe pairs, per-query LUTs) into the code scan + a per-query "
    "rank over probed candidates only. The oracle replays modulus "
    "centroids, rounded-cosine assignment, the full PQ training "
    "trajectory, and the probed-cell ADC ranking.",
)
def q159_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    return ivf_pq_topk(emb, emb.where(F.col("vec_id") < 5), k=10)


@register(
    "q160_streaming_ann_maintenance",
    sql_ivf_pq_topk("embeddings", "vec_id < 5", topk=10),
    doc="Streaming ANN index maintenance (streaming/incremental.py "
    "update_ann_index / read_ann_index): vectors arrive in three epochs "
    "(md5-bucketed), each epoch encodes ITSELF against the FROZEN "
    "models (coarse centroids + PQ codebooks — retrained offline, the "
    "standard ANN-serving contract) into its own batch_id partition "
    "(overwrite = replay-idempotent; no earlier state read — the "
    "count-min shape), with cell_id kept as a partition column so "
    "probes prune across every epoch. Encoding is row-local and "
    "deterministic under frozen models, so the union of epoch "
    "partitions is ROW-identical to a one-shot build — which is why "
    "this row shares q159's full-build oracle VERBATIM: the value hash "
    "proves the epoch-maintained index answers queries exactly like "
    "the index built from everything at once. Engine body driven "
    "directly (q111's idiom); the availableNow stream wiring is pinned "
    "in test_streaming.py.",
)
def q160_streaming_ann_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from spark_hadoop_automation_in_cloud_spark.operators.similarity import (
        ivf_centroids,
        ivf_probe_cells,
        pq_adc_rank_within_cells,
        train_pq_codebooks,
    )
    from spark_hadoop_automation_in_cloud_spark.streaming.incremental import (
        read_ann_index,
        update_ann_index,
    )

    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    root = tempfile.mkdtemp(prefix="q160_")
    try:
        # freeze the models (offline-rebuild artifacts), then stream epochs
        ivf_centroids(emb).write.mode("overwrite").parquet(f"{root}/centroids")
        books = train_pq_codebooks(emb)
        bucket = hashing.md5_prefix_int(F.col("vec_id"), nhex=8, salt=":ann") % 3
        for b in range(3):
            update_ann_index(emb.where(bucket == b), root, books, epoch_id=b)
        coded = read_ann_index(spark, root)
        queries = emb.where(F.col("vec_id") < 5)
        probes = ivf_probe_cells(
            spark.read.parquet(f"{root}/centroids"), queries, nprobe=2
        )
        out = pq_adc_rank_within_cells(coded, books, probes, queries, k=10)
        # materialize before the index dir goes away (q111's idiom);
        # bounded: n_queries x k rows
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


from spark_hadoop_automation_in_cloud_spark.operators.components import (  # noqa: E402
    sql_triangle_count,
    triangle_count,
)

#: the recurring co-purchase graph (q161 + q180): parts linked when
#: co-ordered in >= 2 DISTINCT orders — the distinct-order count, not the
#: lineitem row-pair count (a part listed twice in ONE order must not
#: fake recurrence)
_Q161_EDGES_SQL = """
SELECT a.l_partkey AS p1, b.l_partkey AS p2
FROM lineitem a
JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= 2
"""


def _copurchase_edges(li: DataFrame) -> DataFrame:
    """Spark side of ``_Q161_EDGES_SQL`` — the ONE edge-rule definition
    both graph queries drive.

    The distinct-order support gate dedupes (orderkey, partkey) BEFORE
    the self-join rather than distincting the pair rows after it: with
    deduped inputs every (order, p1, p2) triple appears exactly once,
    so a plain COUNT(*) per pair IS the distinct-order count.  Pairs
    per order grow as k²/2 in basket size k, so the post-join distinct
    the r08 receipt caught (it doubled q161's shuffle records —
    ARTIFACTS.md provenance note) shuffled the ~6× larger pair stream;
    the pre-join dedup shuffles only lineitem-sized (ok, pk) rows and
    the pair stream goes straight to the (p1, p2) aggregate.
    """
    keyed = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = keyed.select("ok", F.col("pk").alias("p1"))
    b = keyed.select("ok", F.col("pk").alias("p2"))
    return (
        a.join(b, "ok")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= 2)
        .select("p1", "p2")
    )


@register(
    "q161_copurchase_triangles",
    sql_triangle_count(_Q161_EDGES_SQL, "p1", "p2", topk=50),
    doc="Per-node triangle counts over the recurring co-purchase graph "
    "(operators/components.py triangle_count): parts are linked when "
    "co-ordered in >= 2 DISTINCT orders (the q85 basket join with a "
    "distinct-order support gate — a part listed twice in one order "
    "must not fake recurrence), and a part's triangle count is how CLIQUISH its "
    "neighborhood is — community cores that components (q39) and "
    "PageRank (q69) both miss. Degree-ordered orientation (Schank): "
    "every edge points low->high under (degree, node), so each "
    "triangle materializes exactly once and wedge volume is bounded by "
    "sum(outdeg^2) = O(m^1.5) instead of the hub-quadratic sum(deg^2) "
    "— the celebrity-hub wedge explosion, THE scale killer of naive "
    "triangle counting at 100 TB, is charged to low-degree neighbors "
    "which parallelize. Two equi-join shuffles; AQE splits residual "
    "same-pivot skew. TRIANGLES.json is the measured A/B: 8x edges -> "
    "64x naive wedges, naive wall 5.9->43.7s while the oriented form "
    "stays flat ~10s. Deterministic (tri_count DESC, node ASC) top-50.",
)
def q161_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return triangle_count(_copurchase_edges(li), "p1", "p2", topk=50)


from spark_hadoop_automation_in_cloud_spark.operators import evals  # noqa: E402

_Q162_SCORED_SQL = f"""
SELECT d.source, (d.lang = 'en') AS is_en, q.quality
FROM documents d JOIN ({tx.sql_quality_score("documents", "doc_id", "text")}) q
  ON q.doc_id = d.doc_id
"""


@register(
    "q162_quality_auc_by_source",
    evals.sql_roc_auc(_Q162_SCORED_SQL, ["source"], "is_en", "quality"),
    doc="Exact ROC-AUC of the q27 quality score as an English-document "
    "classifier, per source (operators/evals.py roc_auc) — BEFORE a "
    "score gates 100 TB of data, this is the ranking-power audit: the "
    "Mann-Whitney probability that a random positive outscores a "
    "random negative, ties at half credit. Numerator is exact integer "
    "pair counting on the 1e-6 score grid in DECIMAL(38,0) with one "
    "final division (the q155 KS convention). Aggregate-first: the "
    "corpus collapses to per-(source, distinct score) counts in one "
    "map-side-combined shuffle; the strictly-below cumulative and the "
    "totals are chained windows over that tiny frame, partitioned per "
    "source — no global sort, no corpus-sized rank assignment.",
)
def q162_quality_auc_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    scored = d.select(
        "source",
        (F.col("lang") == "en").alias("is_en"),
        tx.quality_exprs(F.col("text"))["quality"].alias("quality"),
    )
    return evals.roc_auc(scored, ["source"], "is_en", "quality")


@register(
    "q163_quality_calibration",
    evals.sql_calibration_bins(_Q162_SCORED_SQL, ["source"], "is_en", "quality"),
    doc="Reliability diagram of the q27 quality score against the "
    "English label, per source (operators/evals.py calibration_bins): "
    "equal-width decile bins, empirical positive rate next to the mean "
    "claimed score — the calibration gap AUC (q162) cannot see; a "
    "perfectly-ranking score that claims 0.9 where 0.6 are positive "
    "still over-admits at any face-value threshold. Row-local binning "
    "in the scan, ONE map-side-combined aggregation to <= sources x 10 "
    "cells; mean score sums 1e-6-grid integers (order-independent) "
    "with one final division.",
)
def q163_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    scored = d.select(
        "source",
        (F.col("lang") == "en").alias("is_en"),
        tx.quality_exprs(F.col("text"))["quality"].alias("quality"),
    )
    return evals.calibration_bins(scored, ["source"], "is_en", "quality")


@register(
    "q164_pmi_collocations",
    tx.sql_pmi_collocations("documents", "text", min_count=5, topk=50),
    doc="Top-50 bigram collocations by pointwise mutual information "
    "(operators/textops.py pmi_collocations) with a min-count-5 floor "
    "— phrase mining / tokenizer-merge candidates / boilerplate "
    "discovery over the corpus. Bigrams extract row-locally from the "
    "split array (the q141 idiom — no per-doc window); ONE map-side-"
    "combined shuffle to the vocab-squared-bounded pair-count frame; "
    "positional marginals and the grand total derive from THAT frame "
    "(no second corpus scan), joined back vocab-sized. One double "
    "division of exact bigints -> ln -> 6dp; top-50 is "
    "TakeOrderedAndProject with a full tiebreak.",
)
def q164_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return tx.pmi_collocations(d, "text", min_count=5, topk=50)


from spark_hadoop_automation_in_cloud_spark.operators.linalg import (  # noqa: E402
    grouped_ols,
    sql_grouped_ols,
)


@register(
    "q165_zipf_slope_by_source",
    sql_grouped_ols(
        tx.sql_zipf_token_points("documents", ["source"], "text", top_n=100),
        ["source"],
        "ln_rank",
        "ln_freq",
    ),
    doc="Zipf-law exponent per source (operators/textops.py "
    "zipf_token_points composed with operators/linalg.py grouped_ols): "
    "OLS slope of ln(frequency) on ln(rank) over each source's top-100 "
    "tokens — natural text sits near slope -1; a source whose curve is "
    "flat (machine-generated ID soup) or cliff-shaped (template "
    "boilerplate) is flagged before it pollutes the mix. Aggregate-"
    "first: corpus -> per-(source, token) counts in one map-side-"
    "combined shuffle; ranking windows run over that vocab-sized frame "
    "partitioned per source (groups parallelize); the fit consumes 100 "
    "points per source as exact 1e-6-grid integer moments in "
    "DECIMAL(38,0) (the q139 OLS recipe — slope is grid-invariant "
    "since x and y scale identically). Intercept is in y-grid units "
    "(1e6 x ln C) by the shared contract.",
)
def q165_zipf_slope_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    pts = tx.zipf_token_points(d, ["source"], "text", top_n=100)
    return grouped_ols(pts, ["source"], "ln_rank", "ln_freq")


from spark_hadoop_automation_in_cloud_spark.operators.bpe import (  # noqa: E402
    bpe_merges,
    sql_bpe_merges,
)


@register(
    "q166_bpe_merge_training",
    sql_bpe_merges("documents", "text", n_merges=4),
    doc="Distributed BPE merge training (operators/bpe.py bpe_merges): "
    "the first 4 byte-pair-encoding merge rules learned exactly from "
    "the corpus — Sennrich greedy frequency-argmax, the algorithm "
    "under GPT-2/SentencePiece vocab construction. The corpus "
    "collapses ONCE to the word-frequency table (the only corpus-sized "
    "shuffle at any scale); each round is then vocab-sized: row-local "
    "adjacent-pair extraction (q141's bigram idiom), one ordered "
    "LIMIT-1 argmax (driver state = one pair per round, the q96 "
    "broadcast contract), and a row-local JVM-side array fold rewrite "
    "whose last-symbol guard pins the standard non-overlapping greedy "
    "on BOTH engines ('a a a' -> 'aa a'). The oracle unrolls the full "
    "4-round trajectory as MATERIALIZED CTEs with list_reduce folds — "
    "the q96/q156 iterative-oracle pattern. At 100 TB the vocab table "
    "is millions of rows, not billions of tokens; merge rounds never "
    "rescan the corpus.",
)
def q166_bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return bpe_merges(d, "text", n_merges=4)


from spark_hadoop_automation_in_cloud_spark.operators.checks import (  # noqa: E402
    k_anonymity_report,
    sql_k_anonymity_report,
)

_Q167_QI_SQL = """
SELECT c_nationkey, c_mktsegment,
       CAST(floor(c_acctbal / 1000.0) AS INT) AS bal_band
FROM customer
"""


@register(
    "q167_k_anonymity_audit",
    sql_k_anonymity_report(_Q167_QI_SQL, ["c_nationkey", "c_mktsegment", "bal_band"]),
    doc="k-anonymity audit (operators/checks.py k_anonymity_report) over "
    "the customer quasi-identifier combination (nation, market "
    "segment, account-balance band): the group-size histogram with "
    "below-k-5 suppression flags — the privacy gate user-derived "
    "training records need before release, reported WITHOUT re-leaking "
    "the rare combinations it flags. Two map-side-combined aggregates, "
    "each strictly smaller than its input (corpus -> QI groups -> size "
    "histogram); banding is row-local in the scan; shares divide exact "
    "bigints once.",
)
def q167_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    qi = c.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("int").alias("bal_band"),
    )
    return k_anonymity_report(qi, ["c_nationkey", "c_mktsegment", "bal_band"])


from spark_hadoop_automation_in_cloud_spark.operators.similarity import (  # noqa: E402
    mmr_rerank,
    sql_mmr_rerank,
)


@register(
    "q168_mmr_diverse_rerank",
    sql_mmr_rerank("embeddings", "vec_id < 3", k_candidates=20, k_select=5),
    doc="Maximal-marginal-relevance diversified rerank (operators/"
    "similarity.py mmr_rerank, Carbonell-Goldstein): per query, "
    "greedily pick 5 of the cosine top-20 maximizing lam*sim(q,d) - "
    "(1-lam)*max_selected sim(d,s) — the diversity pass that keeps "
    "five near-duplicates from filling a context window. The only "
    "corpus-scale work is q24's candidate scan (broadcast queries x "
    "unshuffled corpus); the greedy runs 5 unrolled DataFrame rounds "
    "(anti-join, max-to-selected, window argmax) on frames bounded at "
    "queries x 20^2 — no driver loop state, cost independent of corpus "
    "size. All sims snap to the 1e-6 integer grid BEFORE the greedy "
    "and every score is the exact bigint numerator 70*sim_g - "
    "30*div_g — no float ever enters an argmax or the output (a "
    "round(float,6) form hit a perfect HALF_UP-vs-multiply-first tie "
    "on a real sf0.01 row); the oracle unrolls the same 5 rounds as "
    "CTEs on the same integers.",
)
def q168_mmr_diverse_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    return mmr_rerank(
        emb, emb.where(F.col("vec_id") < 3), k_candidates=20, k_select=5
    )


from spark_hadoop_automation_in_cloud_spark.operators.bpe import (  # noqa: E402
    segmentation_stats,
    sql_segmentation_stats,
)


@register(
    "q169_tokenizer_fit_by_source",
    sql_segmentation_stats("documents", ["source"], "text", n_merges=4),
    doc="Tokenizer-fit evaluation (operators/bpe.py segmentation_stats): "
    "apply the 4 merge rules q166 learns on the WHOLE corpus to each "
    "source's vocabulary and report per-source compression (symbol "
    "instances before/after) — a source whose ratio trails the corpus "
    "pays more sequence length per byte under this vocab; the "
    "actionable counterpart of q165's Zipf slope for mixture / "
    "tokenizer decisions. The corpus is scanned once into per-(source, "
    "word) frequencies; the learned rules are bounded driver state "
    "(4 pairs) applied as row-local JVM folds over that vocab-sized "
    "frame. The oracle reuses the training CTE chain VERBATIM "
    "(_sql_training_ctes — one definition of the trajectory for both "
    "q166 and this row) and replays the same folds per source.",
)
def q169_tokenizer_fit_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    rules = [
        (r["lhs"], r["rhs"])
        for r in bpe_merges(d, "text", n_merges=4).collect()
    ]
    return segmentation_stats(d, ["source"], "text", rules)


from spark_hadoop_automation_in_cloud_spark.operators.checks import (  # noqa: E402
    rolling_volume_anomaly,
    sql_rolling_volume_anomaly,
)


@register(
    "q170_volume_anomaly",
    sql_rolling_volume_anomaly(
        "SELECT event_type, ts FROM events", ["event_type"], "CAST(ts AS DATE)"
    ),
    doc="Ingest-volume anomaly monitor (operators/checks.py "
    "rolling_volume_anomaly): per event type, each day's arrival count "
    "z-scored against its trailing 7 full days — catches a source "
    "going dark or a crawler loop flooding a partition before either "
    "skews the training mix; the volume-side sibling of the "
    "distribution monitors (PSI q146 / KS q155). Corpus collapses to "
    "(type, day) counts in one map-side-combined shuffle; the rolling "
    "window walks that day-granular frame per type with exact integer "
    "moments (n*Sxx - Sx^2 variance numerator in DECIMAL(38,0)) and "
    "ONE shared double z recipe.",
)
def q170_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return rolling_volume_anomaly(
        e.select("event_type", F.to_date("ts").alias("d")), ["event_type"], "d"
    )


@register(
    "q171_curriculum_interleave",
    f"""
WITH scored AS (
  SELECT d.source, d.doc_id, round(q.quality, 6) AS quality,
         -- rank on the SAME 6dp-rounded value the kernel ranks on: two docs
         -- whose qualities differ only past 1e-6 must tie (-> doc_id ASC)
         -- in BOTH engines, not just in Spark (r07 ADVICE item 1)
         ROW_NUMBER() OVER (PARTITION BY d.source
           ORDER BY round(q.quality, 6) DESC, d.doc_id ASC) AS rn
  FROM documents d
  JOIN ({tx.sql_quality_score("documents", "doc_id", "text")}) q
    ON q.doc_id = d.doc_id
),
head AS (SELECT * FROM scored ORDER BY rn, source LIMIT 50)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY rn, source) AS BIGINT) AS position,
       source, doc_id, CAST(rn AS BIGINT) AS source_rank, quality
FROM head
""",
    doc="Curriculum / mixture interleave ordering: the deterministic "
    "source-round-robin, quality-descending training order (first the "
    "best doc of every source, then every source's second-best, ...) "
    "— how a training run consumes a multi-source corpus so no source "
    "front-loads, materialized as the first 50 positions. Per-source "
    "ranking windows parallelize (never corpus-global); the global "
    "interleave key (rn, source) is only ever SORTED through a top-50 "
    "TakeOrderedAndProject (per-partition heaps), and the position "
    "window runs on the bounded 50-row head (the q86 bounded-window "
    "discipline). At full scale the same (rn, source) key IS the "
    "shard sort key — writers emit the order without any global sort.",
)
def q171_curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    scored = d.select(
        "source",
        "doc_id",
        F.round(tx.quality_exprs(F.col("text"))["quality"], 6).alias("quality"),
    )
    ws = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    ranked = scored.withColumn("rn", F.row_number().over(ws))
    head = ranked.orderBy("rn", "source").limit(50)
    wg = Window.orderBy("rn", "source")
    return head.select(
        F.row_number().over(wg).cast("bigint").alias("position"),
        "source",
        "doc_id",
        F.col("rn").cast("bigint").alias("source_rank"),
        "quality",
    )


@register(
    "q172_langid_kappa",
    evals.sql_cohens_kappa(
        f"""SELECT d.lang AS true_lang, p.pred_lang
FROM documents d JOIN ({tx.sql_language_id("documents", "doc_id", "text")}) p
  ON p.doc_id = d.doc_id""",
        "true_lang",
        "pred_lang",
    ),
    doc="Cohen's kappa of the language-ID heuristic against ground truth "
    "(operators/evals.py cohens_kappa) — the chance-corrected one-"
    "number upgrade of q148's confusion matrix: raw accuracy flatters "
    "any classifier on a skewed language mix (predict-the-majority "
    "scores high); kappa subtracts exactly the marginal-product chance "
    "agreement. Prediction is row-local marker counting in the scan; "
    "ONE map-side-combined aggregation to |langs|^2 cells; marginals, "
    "p_o and p_e are aggregates OF that tiny frame with DECIMAL(38,0) "
    "products and single double divisions.",
)
def q172_langid_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    pred = tx.language_id(d, "doc_id", "text").select("doc_id", "pred_lang")
    joined = d.select("doc_id", F.col("lang").alias("true_lang")).join(pred, "doc_id")
    return evals.cohens_kappa(joined, "true_lang", "pred_lang")


@register(
    "q173_purchase_ab_ztest",
    evals.sql_two_proportion_ztest(
        """SELECT event_type,
       CASE WHEN extract(dow FROM ts) IN (0, 6) THEN 'weekend'
            ELSE 'weekday' END AS seg,
       CASE WHEN value >= 50 THEN 1 ELSE 0 END AS hit
FROM events""",
        ["event_type"],
        "seg",
        "weekday",
        "weekend",
        "hit",
    ),
    doc="Two-proportion z-test per event type (operators/evals.py "
    "two_proportion_ztest): does the high-value rate (value >= 50) "
    "differ between weekday and weekend traffic beyond sampling noise? "
    "The A/B-experiment significance primitive — the drift monitors "
    "(q146 PSI / q155 KS) ask 'did the data change', this asks 'did "
    "the treatment change the data', with the pooled-variance z from "
    "four exact bigints per group. ONE map-side-combined aggregation "
    "to |event_type| rows; every division runs once, group-locally, on "
    "exact counts; one-sided and zero-variance groups drop identically "
    "on both engines. dow conventions differ (Spark 1=Sun..7=Sat, "
    "DuckDB 0=Sun..6=Sat) — each side spells its own weekend set (the "
    "q146/q155 note).",
)
def q173_purchase_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    seg = F.when(F.dayofweek(F.col("ts")).isin(1, 7), "weekend").otherwise("weekday")
    hit = F.when(F.col("value") >= 50, 1).otherwise(0)
    return evals.two_proportion_ztest(
        e.select("event_type", seg.alias("seg"), hit.alias("hit")),
        ["event_type"],
        "seg",
        "weekday",
        "weekend",
        "hit",
    )


@register(
    "q174_streaming_volume_monitor",
    sql_rolling_volume_anomaly(
        "SELECT event_type, ts FROM events", ["event_type"], "CAST(ts AS DATE)"
    ),
    doc="Streaming ingest-volume monitor (streaming/incremental.py "
    "update_daily_counts / read_daily_counts): events arrive in three "
    "epochs (md5-bucketed), each counting ITSELF per (type, day) into "
    "its own batch_id partition (overwrite = replay-idempotent, no "
    "earlier state read — the q142/q152 linear-cell shape); the reader "
    "sums partitions into daily counts that are BIT-identical to the "
    "one-shot aggregate, then scores them through the SAME "
    "zscore_from_daily kernel q170 uses — which is why this row shares "
    "q170's oracle VERBATIM (the q160 precedent): the value hash "
    "proves the epoch-maintained monitor flags exactly what the batch "
    "monitor flags. State per batch is |types x days touched|, "
    "independent of batch rows. Engine body driven directly (q111's "
    "idiom); availableNow stream wiring pinned in test_streaming.py.",
)
def q174_streaming_volume_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from spark_hadoop_automation_in_cloud_spark.operators.checks import (
        zscore_from_daily,
    )
    from spark_hadoop_automation_in_cloud_spark.streaming.incremental import (
        read_daily_counts,
        update_daily_counts,
    )

    e = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.to_date("ts").alias("d")
    )
    root = tempfile.mkdtemp(prefix="q174_")
    try:
        bucket = hashing.md5_prefix_int(F.col("event_id"), nhex=8, salt=":vol") % 3
        for b in range(3):
            update_daily_counts(
                e.where(bucket == b), root, ["event_type"], "d", epoch_id=b
            )
        daily = read_daily_counts(spark, root, ["event_type"]).withColumnRenamed(
            "d", "__d"
        )
        out = zscore_from_daily(daily, ["event_type"])
        # materialize before the index dir goes away (q111's idiom);
        # bounded: |types x days| rows
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


from spark_hadoop_automation_in_cloud_spark.operators.sketches import (  # noqa: E402
    sql_value_bucket,
    value_bucket,
)


@register(
    "q175_ks_drift_sketched",
    sql_ks_statistic(
        f"""SELECT event_type,
       CASE WHEN extract(dow FROM ts) IN (0, 6) THEN 'weekend'
            ELSE 'weekday' END AS seg,
       {sql_value_bucket("value")} AS vb
FROM events""",
        ["event_type"],
        "seg",
        "weekday",
        "weekend",
        "vb",
    ),
    doc="KS drift on the quantile-sketch grid — q155's documented 100 TB "
    "form made executable: values quantize to the sketch family's "
    "sign-aware (1+eps) log-bucket code (sketches.value_bucket — the "
    "SAME coder q102/q140/q145 persist) BEFORE the KS kernel, so the "
    "per-group cumulative window walks at most |buckets| rows no "
    "matter the value cardinality — the bound the exact form (q155) "
    "cannot give when a group's distinct values grow with the corpus. "
    "Same exact integer cross-product numerator; the statistic is the "
    "KS of the bucketed distributions (within one bucket width of "
    "exact, the sketch's rank-error contract). Non-encodable values "
    "(NULL/NaN/inf) drop identically on both engines via the shared "
    "coder.",
)
def q175_ks_drift_sketched(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    seg = F.when(F.dayofweek(F.col("ts")).isin(1, 7), "weekend").otherwise("weekday")
    return ks_statistic(
        e.select(
            "event_type", seg.alias("seg"), value_bucket(F.col("value")).alias("vb")
        ),
        ["event_type"],
        "seg",
        "weekday",
        "weekend",
        "vb",
    )


@register(
    "q176_revenue_share_parts",
    """
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS HUGEINT))
           AS r
  FROM lineitem GROUP BY l_partkey
),
total AS (SELECT SUM(r) AS t FROM rev)
SELECT l_partkey,
       -- 2dp rounding done as exact integer HALF_UP on the 1e-4 grid
       -- ((r+50)//100, r>0): r%100==50 is an exact half-cent, where
       -- double round() diverges between engines (r07 ADVICE item 2)
       CAST((r + 50) // 100 AS DOUBLE) / 100.0 AS part_revenue,
       round(CAST(r AS DOUBLE) / CAST(t AS DOUBLE), 6) AS revenue_share
FROM rev CROSS JOIN total
WHERE r * 1000 > t
ORDER BY part_revenue DESC, l_partkey
""",
    doc="TPC-H Q11's decorrelated HAVING-global-share shape on the "
    "available tables: parts whose discounted revenue exceeds 0.1% of "
    "total corpus revenue. The correlated 'HAVING sum > (SELECT "
    "fraction x total)' decorrelates into ONE per-part aggregate and a "
    "1-row broadcast total; the share gate is the exact integer "
    "cross-product r*1000 > t (no division before filtering — the q155 "
    "numerator discipline). Revenue sums in 1e-4-grid DECIMAL "
    "(extendedprice x (1-discount) needs 4 digits) — order-independent "
    "and engine-identical; divisions happen once, on the survivors.",
)
def q176_revenue_share_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast(dec)
    rev = li.groupBy("l_partkey").agg(F.sum(cents).alias("r"))
    total = rev.agg(F.sum("r").alias("t"))
    return (
        rev.crossJoin(F.broadcast(total))
        .where(F.col("r") * 1000 > F.col("t"))
        .select(
            "l_partkey",
            # exact integer HALF_UP to 2dp before the division (r > 0):
            # half-cent grid points must not hit double round()
            (
                F.floor((F.col("r") + 50) / 100).cast("double") / 100.0
            ).alias("part_revenue"),
            F.round(F.col("r").cast("double") / F.col("t").cast("double"), 6).alias(
                "revenue_share"
            ),
        )
        .orderBy(F.col("part_revenue").desc(), "l_partkey")
    )


@register(
    "q177_idle_rich_customers",
    """
WITH pos AS (
  SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS HUGEINT)) AS HUGEINT) AS s,
         COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0
),
idle AS (
  SELECT c.c_nationkey, CAST(round(c.c_acctbal * 100) AS HUGEINT) AS bal_cents
  FROM customer c CROSS JOIN pos
  WHERE CAST(round(c.c_acctbal * 100) AS HUGEINT) * pos.n > pos.s
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
       round(CAST(SUM(bal_cents) AS DOUBLE) / 100.0, 2) AS totacctbal
FROM idle GROUP BY c_nationkey ORDER BY c_nationkey
""",
    doc="TPC-H Q22's shape on the available tables: per nation, the "
    "count and total balance of customers with above-average balance "
    "(among positive balances) who have NEVER ordered — dormant "
    "high-value accounts. The scalar AVG subquery decorrelates into a "
    "1-row broadcast (sum_cents, n); the above-average gate is the "
    "exact integer cross-product bal_cents * n > sum_cents (never "
    "compare against a divided average); 'no orders' is a left-anti "
    "join (NOT EXISTS in the oracle — NOT IN's three-valued NULL trap "
    "is the documented dedup.sql_incremental_dedup precedent). One "
    "aggregate per side, one broadcast, one anti-join shuffle on "
    "custkey.",
)
def q177_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    cents = F.round(F.col("c_acctbal") * 100).cast(dec)
    pos = (
        c.where(F.col("c_acctbal") > 0)
        .agg(F.sum(cents).alias("s"), F.count(F.lit(1)).cast(dec).alias("n"))
    )
    rich = (
        c.select("c_custkey", "c_nationkey", cents.alias("bal_cents"))
        .crossJoin(F.broadcast(pos))
        .where(F.col("bal_cents") * F.col("n") > F.col("s"))
    )
    idle = rich.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    )
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.round(F.sum("bal_cents").cast("double") / 100.0, 2).alias(
                "totacctbal"
            ),
        )
        .orderBy("c_nationkey")
    )


from spark_hadoop_automation_in_cloud_spark.operators.sampling import (  # noqa: E402
    correlated_sample,
    sql_correlated_sample_counts,
)


@register(
    "q178_correlated_sample_audit",
    f"""
WITH base AS (
{sql_correlated_sample_counts(
    "SELECT c_custkey FROM customer",
    "c_custkey",
    {"orders": ("SELECT o_custkey, o_orderkey FROM orders", "o_custkey")},
)}
),
li AS (
  SELECT 'lineitem' AS tbl,
         CAST(SUM(CASE WHEN l_orderkey IN (
           SELECT o_orderkey FROM orders WHERE o_custkey IN (
             SELECT c_custkey FROM customer
             WHERE {{gate}}
           )
         ) THEN 1 ELSE 0 END) AS BIGINT) AS kept,
         CAST(COUNT(*) AS BIGINT) AS total
  FROM lineitem
)
SELECT tbl, kept, total, round(CAST(kept AS DOUBLE) / total, 6) AS kept_share
FROM (SELECT tbl, kept, total FROM base UNION ALL SELECT tbl, kept, total FROM li)
ORDER BY tbl
""".replace(
        "{gate}",
        "CAST("
        + sampling.sql_sample_key("c_custkey", ":corr")
        + " AS HUGEINT) * 10 < 1 * (CAST(1 AS HUGEINT) << 60)",
    ),
    doc="Referential-integrity-preserving dev-dataset sampling "
    "(operators/sampling.py correlated_sample): hash-gate 10% of "
    "customers and keep 100% of THEIR orders, then 100% of those "
    "orders' lineitems — the correlated cascade row-independent "
    "sampling cannot give (independent 10% cuts of two joined tables "
    "share ~1% of joinable pairs; this keeps every downstream join "
    "intact). The gate is the row-local md5 sample key shared by the "
    "whole sampling family — deterministic run over run, replayable "
    "by the oracle bit-for-bit; children filter by semi-join on the "
    "kept keys (broadcast-eligible at practical rates). Output is the "
    "per-table audit frame (kept/total/share).",
)
def q178_correlated_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    kept = correlated_sample(
        c.select("c_custkey"), "c_custkey", {"orders": (o, "o_custkey")}
    )
    kept_li = li.join(
        kept["orders"].select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
        "l_orderkey",
        "left_semi",
    )
    rows = [
        ("lineitem", kept_li, li),
        ("orders", kept["orders"], o),
        ("root", kept["root"], c),
    ]
    audit = None
    for name, k, full in rows:
        frame = k.agg(F.count(F.lit(1)).cast("bigint").alias("kept")).crossJoin(
            full.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
        ).select(F.lit(name).alias("tbl"), "kept", "total")
        audit = frame if audit is None else audit.unionByName(frame)
    return audit.select(
        "tbl",
        "kept",
        "total",
        F.round(F.col("kept").cast("double") / F.col("total"), 6).alias(
            "kept_share"
        ),
    ).orderBy("tbl")


@register(
    "q179_json_quarantine_ingest",
    """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM documents GROUP BY source
UNION ALL
SELECT '__quarantined__' AS source, CAST(7 AS BIGINT) AS n_rows
ORDER BY source
""",
    doc="Dead-letter JSON ingest (io.read_json_quarantine): the corpus "
    "round-trips through JSON lines plus 7 deliberately malformed "
    "lines; the schema-enforced PERMISSIVE read splits typed rows from "
    "quarantined raw lines in ONE scan (null-test on the corrupt-"
    "record column — no per-line Python, no second parse). The value "
    "hash proves end-to-end losslessness: per-source parsed counts "
    "equal the parquet source of truth exactly and the quarantine "
    "count equals exactly the injected garbage — a malformed line "
    "neither kills the job (FAILFAST) nor silently becomes an all-NULL "
    "row (plain PERMISSIVE). Tempdir materialize-and-rmtree is the "
    "q111/q117 idiom.",
)
def q179_json_quarantine_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from spark_hadoop_automation_in_cloud_spark.io import read_json_quarantine

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    root = tempfile.mkdtemp(prefix="q179_")
    try:
        d.write.mode("overwrite").json(f"{root}/landing")
        with open(f"{root}/landing/part-corrupt.json", "w") as f:
            for i in range(7):
                f.write(f'{{"doc_id": {i}, "text": BROKEN-{i}\n')
        parsed, quarantined = read_json_quarantine(
            spark,
            f"{root}/landing",
            "doc_id bigint, text string, lang string, source string",
        )
        out = parsed.groupBy("source").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows")
        ).unionByName(
            quarantined.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows")
            ).select(F.lit("__quarantined__").alias("source"), "n_rows")
        ).orderBy("source")
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


from spark_hadoop_automation_in_cloud_spark.operators.components import (  # noqa: E402
    clustering_coefficient,
    sql_clustering_coefficient,
)


@register(
    "q180_clustering_coefficient",
    sql_clustering_coefficient(_Q161_EDGES_SQL, "p1", "p2", topk=50),
    doc="Local clustering coefficient over the q161 co-purchase graph "
    "(operators/components.py clustering_coefficient): 2*tri / "
    "(d*(d-1)) per node — q161's raw counts normalized by opportunity "
    "(a degree-100 node in 10 triangles is loose; a degree-5 node in "
    "10 is a clique core). Shares the degree-oriented enumeration "
    "core verbatim (_node_triangles_and_degrees — TRIANGLES.json has "
    "the orientation A/B); adds one left join back to the degree "
    "table (triangle-free nodes score 0, not absent) and one "
    "row-local division of exact bigints. Degree-<2 nodes drop "
    "(undefined). Deterministic (coef DESC, degree DESC, node ASC) "
    "top-50.",
)
def q180_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return clustering_coefficient(_copurchase_edges(li), "p1", "p2", topk=50)


@register(
    "q181_hash_kernel_scores",
    tx.sql_hash_kernel_scores("documents", "doc_id", "text"),
    doc="fastText-shaped linear inference, JVM-native (operators/"
    "textops.py hash_kernel_scores): hashed char-3-gram features -> "
    "integer weight lookup -> exact row-local sum -> sigmoid, with "
    "ZERO Python in the loop — the complement of the Arrow inference "
    "seam (q144 crosses the boundary for a real model; this shows a "
    "linear model needs no boundary). Weights derive from the gram "
    "hash (a real deployment broadcasts a trained bucket->weight "
    "array; identical plan shape). Everything happens inside the scan "
    "stage: no explode, no shuffle, no UDF — the gram loop is one "
    "aggregate() expression in whole-stage codegen. ASCII-stripped "
    "first (UTF-16 vs codepoint indexing, the BPE note).",
)
def q181_hash_kernel_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return tx.hash_kernel_scores(d, "doc_id", "text")


@register(
    "q182_temperature_mixture",
    f"""
WITH sized AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(round(sqrt(COUNT(*)) * 1000000) AS BIGINT) AS sg
  FROM documents GROUP BY source
),
tot AS (SELECT SUM(sg) AS tsg FROM sized),
targets AS (
  SELECT s.source, s.n, CAST((s.sg * 200) // t.tsg AS BIGINT) AS target_k
  FROM sized s CROSS JOIN tot t
),
ranked AS (
  SELECT d.source, d.doc_id,
         ROW_NUMBER() OVER (PARTITION BY d.source
           ORDER BY {sampling.sql_sample_key("d.doc_id", ":temp")} ASC,
                    d.doc_id ASC) AS rn
  FROM documents d
)
SELECT r.source, r.doc_id, CAST(r.rn AS BIGINT) AS source_rank,
       t.target_k
FROM ranked r JOIN targets t ON t.source = r.source
WHERE r.rn <= t.target_k
ORDER BY r.source, source_rank
""",
    doc="Temperature-based mixture sampling (the Pile/LLaMA mixing "
    "math, alpha = 0.5): per-source budgets proportional to n^alpha "
    "flatten the source distribution — big sources down-weighted, "
    "small ones kept — then each source contributes its "
    "deterministically-cheapest docs by the family's md5 sample key. "
    "Cross-engine exactness: sqrt(n) snaps to the 1e-6 grid as a "
    "bigint BEFORE the budget split, and target_k is an exact integer "
    "division (sg*200 DIV total — floor of a ratio of exact ints; "
    "never floor a float share, ulp flips it). ONE aggregate for "
    "sizes, a |sources|-row broadcast, per-source ranking windows "
    "that parallelize (at 100 TB, the q123 oversample-trim replaces "
    "the full window — same result, survivor-sized sort).",
)
def q182_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    sized = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    sg = F.round(F.sqrt(F.col("n").cast("double")) * 1_000_000).cast("bigint")
    sized = sized.select("source", "n", sg.alias("sg"))
    tot = sized.agg(F.sum("sg").alias("tsg"))
    targets = sized.crossJoin(F.broadcast(tot)).select(
        "source",
        F.expr("(sg * 200) DIV tsg").cast("bigint").alias("target_k"),
    )
    w = Window.partitionBy("source").orderBy(
        sampling.sample_key(F.col("doc_id"), ":temp").asc(), F.col("doc_id").asc()
    )
    ranked = d.select("source", "doc_id").withColumn(
        "source_rank", F.row_number().over(w).cast("bigint")
    )
    return (
        ranked.join(F.broadcast(targets), "source")
        .where(F.col("source_rank") <= F.col("target_k"))
        .select("source", "doc_id", "source_rank", "target_k")
        .orderBy("source", "source_rank")
    )


@register(
    "q183_rolling_weekly_actives",
    """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
),
bounds AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM du),
expanded AS (
  SELECT du.user_id, unnest(generate_series(du.d, du.d + INTERVAL 6 DAY,
                                            INTERVAL 1 DAY)) AS wd
  FROM du
)
SELECT strftime(CAST(e.wd AS DATE), '%Y-%m-%d') AS day,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS wau
FROM expanded e CROSS JOIN bounds b
WHERE CAST(e.wd AS DATE) BETWEEN b.dmin AND b.dmax
GROUP BY 1 ORDER BY 1
""",
    doc="Rolling 7-day active users (WAU per day) — the windowed "
    "distinct count that naive SQL writes as a per-day self-join over "
    "raw events (corpus x 7 rescans). Aggregate-first: events collapse "
    "ONCE to the distinct (day, user) frame (map-side combined; "
    "|days| x |users| bounded, NOT corpus-sized), each pair then "
    "fans out row-locally to the <=7 window-days it supports, and one "
    "count-distinct per day finishes. Days clamp to the observed "
    "calendar so edge windows match the self-join definition. At "
    "extreme user cardinality the same shape runs on mergeable HLL "
    "day-sketches (q104's family) — this is the exact form, "
    "oracle-provable.",
)
def q183_rolling_weekly_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("d"), "user_id").distinct()
    bounds = du.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
    expanded = du.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("wd"),
    )
    return (
        expanded.crossJoin(F.broadcast(bounds))
        .where(F.col("wd").between(F.col("dmin"), F.col("dmax")))
        .groupBy(F.date_format("wd", "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").cast("bigint").alias("wau"))
        .orderBy("day")
    )


@register(
    "q184_jm_interpolated_lm",
    tx.sql_jm_bigram_lm_scores(
        "documents", "doc_id % 2 = 0", "doc_id", "text"
    ),
    doc="Jelinek-Mercer interpolated bigram LM scoring (operators/"
    "textops.py jm_bigram_lm_scores): lam*P_ML(w2|w1) + "
    "(1-lam)*P_add1(w2) — q141's smoothing upgrade: an unseen PAIR "
    "backs off to its second word's unigram frequency instead of the "
    "uniform floor ('the zzqx' now scores worse than 'the cat'), the "
    "backoff behavior production LM filters (CCNet/KenLM) exhibit. "
    "Same train-predicate contract and distributed shape as q141 "
    "(row-local bigrams, three train aggregates, three left "
    "equi-joins + 1-row broadcast, 1e-6-grid exact log-prob sums) "
    "plus one unigram join. Train = even doc_ids (the q101/q141 "
    "convention).",
)
def q184_jm_interpolated_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return tx.jm_bigram_lm_scores(
        d, d.where(F.col("doc_id") % 2 == 0), "doc_id", "text"
    )


from spark_hadoop_automation_in_cloud_spark.operators.components import (  # noqa: E402
    personalized_pagerank,
)


def _ppr_oracle_sql(n_iter: int = 10, damping: float = 0.85) -> str:
    """Iteration-unrolled DuckDB PERSONALIZED PageRank — q69's oracle
    conventions (explicit DOUBLE casts so no scalar ever runs as exact
    DECIMAL, 9dp per-round snap) with the teleport landing on the seed
    share instead of 1/n.  The q69 graph is symmetric, so the dangling
    term is exactly 0.0 and adding it cannot change any IEEE double —
    the oracle omits it (the operator computes it for general graphs).
    """
    damp = f"CAST({damping} AS DOUBLE)"
    base = (
        f"(CAST(1.0 AS DOUBLE) - {damp})"
        " * (CAST(s.is_seed AS DOUBLE) / (SELECT ns FROM nn))"
    )
    prev = "r0"
    rounds = []
    for i in range(1, n_iter + 1):
        rounds.append(
            f"""r{i} AS (
  SELECT s.node,
         round({base}
               + {damp} * COALESCE(i.inflow, CAST(0 AS DOUBLE)), 9) AS rank
  FROM seeds s LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank / d.deg) AS inflow
    FROM e JOIN {prev} r ON r.node = e.src JOIN deg d ON d.node = e.src
    GROUP BY e.dst) i ON i.node = s.node
)"""
        )
        prev = f"r{i}"
    unrolled = ",\n".join(rounds)
    return f"""
WITH p AS (
  SELECT DISTINCT CAST(json_extract_string(props, '$.k') AS INT) AS k, user_id
  FROM events WHERE event_type = 'purchase'
),
e AS (
  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
  FROM p a JOIN p b USING (k) WHERE a.user_id <> b.user_id
),
nodes AS (
  SELECT DISTINCT node FROM (SELECT src AS node FROM e
                             UNION ALL SELECT dst FROM e)
),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src),
seeds AS (
  SELECT node, CASE WHEN node < 20 THEN 1 ELSE 0 END AS is_seed FROM nodes
),
nn AS (SELECT CAST(SUM(is_seed) AS DOUBLE) AS ns FROM seeds),
r0 AS (
  SELECT node, CAST(is_seed AS DOUBLE) / (SELECT ns FROM nn) AS rank
  FROM seeds
),
{unrolled}
SELECT node, round(rank, 6) + 0.0 AS rank FROM {prev}
"""


@register(
    "q185_personalized_pagerank",
    _ppr_oracle_sql(n_iter=10),
    doc="Personalized PageRank from a seed cohort (operators/"
    "components.py personalized_pagerank): q69's power iteration with "
    "the teleport landing on users 0-19 instead of uniformly — scores "
    "answer 'important FROM HERE', the related-items / local-community "
    "primitive global PageRank cannot express. Same broadcast-rank "
    "iteration shape (|nodes|-row frame into one map-side hash join "
    "over checkpointed edges per round, ownership-scoped checkpoint "
    "release), dangling mass teleports to the seeds via a 1-row "
    "filter-aggregate broadcast (identically zero on this symmetric "
    "graph — the oracle omits the exact-0.0 term, the operator keeps "
    "it for general graphs). 9dp per-round snap; oracle = q69's "
    "unrolled-CTE conventions with the seed-share base.",
)
def q185_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events", parallelize=True)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .select(k.alias("k"), "user_id")
        .distinct()
        .localCheckpoint()
    )
    # r11: parallelize the single-partition pair fanout — q69's comment
    # (the checkpointed distinct is 1 AQE-coalesced partition, which
    # serialized the 3.5M-row fanout on one task; the respread is gated
    # on partitions < cores so a corpus-scale table never pays it)
    par = spark.sparkContext.defaultParallelism
    pk = (
        purchases.repartition(par, "k")
        if purchases.rdd.getNumPartitions() < par
        else purchases
    )
    edges = (
        pk.alias("a")
        .join(pk.alias("b"), "k")
        .where(F.col("a.user_id") != F.col("b.user_id"))
        .select(F.col("a.user_id").alias("src"), F.col("b.user_id").alias("dst"))
    )
    seeds = purchases.select(F.col("user_id").alias("node")).where(
        F.col("node") < 20
    )
    return personalized_pagerank(edges, seeds, n_iter=10)


from spark_hadoop_automation_in_cloud_spark.operators.components import (  # noqa: E402
    k_core,
    sql_k_core,
)


@register(
    "q186_kcore_members",
    sql_k_core(_Q161_EDGES_SQL, "p1", "p2", k=3),
    doc="The 3-core of the recurring co-purchase graph (operators/"
    "components.py k_core): the maximal subgraph where every part "
    "keeps >= 3 recurring co-purchase partners — the density filter "
    "that extracts a community's load-bearing members as a SET "
    "(triangles q161 / coefficients q180 score nodes individually; "
    "the core is what survives TOGETHER). Iterative peeling: each "
    "round one degree aggregate + one semi-join edge filter, the "
    "driver only checks the edge count; peeling is monotone so the "
    "fixpoint is unique and extra rounds are no-ops — which is why "
    "the fixed 20-round unrolled oracle (the q39/q69 idempotent-tail "
    "convention) equals the loop-until-stable kernel; the kernel "
    "RAISES past max_rounds rather than returning a partially-peeled "
    "supergraph. Output: member nodes with their within-core degree.",
)
def q186_kcore_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return k_core(_copurchase_edges(li), "p1", "p2", k=3)


@register(
    "q187_exact_substring_dedup",
    dd.sql_exact_substring_dedup("documents", "doc_id", "text", n=3, min_doc_freq=2),
    doc="ExactSubstr OUTPUT side (operators/dedup.py "
    "exact_substring_dedup): the cleaned corpus with cross-document "
    "repeated passages REMOVED under a per-GRAM min-doc-id keeper "
    "(removal wins on overlaps — see the operator docstring) — q109 counts repeated grams, q118 "
    "measures covered positions, this row EMITS the deduplicated "
    "text a training run would actually consume (Lee et al.'s "
    "ExactSubstr deliverable, re-expressed without the global suffix "
    "array: gram-hash doc-frequency + keeper in one aggregate, "
    "removal positions by bounded n-times fan-out, keep filter as a "
    "(doc, pos) anti-join, re-assembly through the q11 deterministic "
    "array_sort(collect_list) idiom). Linear in corpus tokens, "
    "shuffles keyed on gram hash / doc id only.",
)
def q187_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    return dd.exact_substring_dedup(d, "doc_id", "text", n=3, min_doc_freq=2)


from spark_hadoop_automation_in_cloud_spark.operators.components import (  # noqa: E402
    label_propagation,
    sql_label_propagation,
)


@register(
    "q188_copurchase_communities",
    sql_label_propagation(_Q161_EDGES_SQL, "p1", "p2", n_rounds=5),
    doc="Label-propagation communities over the recurring co-purchase "
    "graph (operators/components.py label_propagation): each part "
    "adopts its neighbors' majority label for 5 synchronous rounds — "
    "the density-aware community buckets that split a connected blob "
    "into parts (q39's components report it whole), giving "
    "community-level dedup/curation buckets. FIXED-TRAJECTORY "
    "contract: synchronous LPA can 2-cycle, so instead of a fixpoint "
    "both engines walk the identical deterministic 5-round trajectory "
    "(count DESC, label ASC argmax — no ties left to the engine; the "
    "unrolled-CTE oracle IS the kernel by construction, the "
    "trajectory sibling of q186's idempotent-tail convention). Per "
    "round ONE shuffle keyed on the neighbor node; labels "
    "localCheckpoint per round with ownership-scoped release.",
)
def q188_copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return label_propagation(_copurchase_edges(li), "p1", "p2", n_rounds=5)


from spark_hadoop_automation_in_cloud_spark.operators.components import (  # noqa: E402
    modularity,
    sql_modularity,
)


@register(
    "q189_community_modularity",
    sql_modularity(
        _Q161_EDGES_SQL,
        f"({sql_label_propagation(_Q161_EDGES_SQL, 'p1', 'p2', n_rounds=5)})",
        "p1",
        "p2",
    ),
    doc="Exact Newman modularity of q188's LPA communities (operators/"
    "components.py modularity): per community the (4·m·m_c − D_c²)/"
    "(4·m²) contribution — the quality gate that says whether the "
    "label-propagation buckets are actually denser than chance before "
    "they feed per-community dedup. Numerators stay exact integers "
    "(DECIMAL(38,0)/HUGEINT) and the output is ONE IEEE division of "
    "two exactly-derived doubles — no rounding, both engines perform "
    "the identical conversion+divide (the q155 numerator discipline "
    "applied to a quotient). Plan: the LPA trajectory + one degree "
    "aggregate, two endpoint label joins, a 1-row edge-count "
    "broadcast, per-community aggregates.",
)
def q189_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_hadoop_automation_in_cloud_spark.operators.components import (
        _pinned_rdd_ids,
        _unpersist_rdds,
    )

    li = read_table(spark, sf_dir, "lineitem")
    # checkpoint the basket self-join ONCE: lazily it would re-run inside
    # BOTH label_propagation and modularity (the family's dominant cost —
    # shuffle_slope NOTES; r11 review finding)
    edges = _copurchase_edges(li).localCheckpoint()
    # caller-level checkpoints need the operator-level error-path
    # discipline too: if label_propagation or modularity raises mid-run,
    # the edges (and labels, if it exists yet) blocks must not outlive
    # this call (r08 ADVICE item 1)
    created = _pinned_rdd_ids(edges)
    try:
        labels = label_propagation(edges, "p1", "p2", n_rounds=5).select(
            "node", "community"
        )
        created |= _pinned_rdd_ids(labels)
        out = modularity(edges, labels, "p1", "p2")
    except BaseException:
        _unpersist_rdds(spark, created)
        raise
    # modularity checkpointed its result, so the edge frame and the LPA
    # label frame are fully consumed — release both (iterative-family
    # contract: ONE pinned frame survives a queries() call, the returned)
    _unpersist_rdds(spark, created - _pinned_rdd_ids(out))
    return out


@register(
    "q190_top_revenue_supplier",
    """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS HUGEINT))
           AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
),
mx AS (SELECT MAX(r) AS m FROM rev)
SELECT s.s_suppkey, s.s_name,
       CAST(rev.r AS DOUBLE) / 10000.0 AS total_revenue
FROM rev CROSS JOIN mx
JOIN supplier s ON s.s_suppkey = rev.l_suppkey
WHERE rev.r = mx.m
ORDER BY s.s_suppkey
""",
    doc="TPC-H Q15's decorrelated shape on the available tables: the "
    "supplier(s) with MAXIMUM quarterly shipped revenue — the "
    "correlated 'revenue = (SELECT MAX(...))' view decorrelates into "
    "one per-supplier aggregate + a 1-row MAX broadcast, and the "
    "argmax keeps ALL tied suppliers (exact integer equality on the "
    "1e-4 revenue grid — ties are decidable, unlike a double sum). "
    "Revenue emits as ONE IEEE division of the exact grid integer "
    "(no rounding; both engines perform the identical "
    "conversion+divide). Plan: filter-pushed lineitem scan, one "
    "map-side-combined aggregate, 1-row broadcast, broadcast supplier "
    "dim join.",
)
def q190_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    dec = "decimal(38,0)"
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast(dec)
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(cents).alias("r"))
    )
    mx = rev.agg(F.max("r").alias("m"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("r") == F.col("m"))
        .join(F.broadcast(s.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("r").cast("double") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q191_funnel_conversion",
    """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS t FROM events
),
s1 AS (
  SELECT user_id, MIN(t) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT ev.user_id, MIN(ev.t) AS t2
  FROM ev JOIN s1 ON s1.user_id = ev.user_id
  WHERE ev.event_type = 'click'
    AND ev.t > s1.t1 AND ev.t <= s1.t1 + 86400000000
  GROUP BY 1
),
s3 AS (
  SELECT ev.user_id, MIN(ev.t) AS t3
  FROM ev JOIN s2 ON s2.user_id = ev.user_id
  WHERE ev.event_type = 'purchase'
    AND ev.t > s2.t2 AND ev.t <= s2.t2 + 86400000000
  GROUP BY 1
),
counts AS (
  SELECT 1 AS step, 'view' AS funnel_step, COUNT(*) AS n_users FROM s1
  UNION ALL
  SELECT 2, 'view>click', COUNT(*) FROM s2
  UNION ALL
  SELECT 3, 'view>click>purchase', COUNT(*) FROM s3
),
base AS (SELECT n_users AS n1 FROM counts WHERE step = 1)
SELECT CAST(step AS INT) AS step, funnel_step,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_users AS DOUBLE) / CAST(n1 AS DOUBLE) AS conversion
FROM counts CROSS JOIN base
ORDER BY step
""",
    doc="Ordered funnel conversion (view -> click -> purchase, 24h step "
    "windows): users counted at step k only if the steps happened IN "
    "TIME ORDER — first view, then the first click STRICTLY after it "
    "and within 24h, then the first purchase strictly after that and "
    "within 24h (set-intersection funnels "
    "overcount users who purchased before ever viewing; the "
    "event-sequencing shape every product-analytics engine ships). "
    "Each step is one conditional min-aggregate keyed on user_id + an "
    "equi-join back — three user-keyed shuffles that reuse one "
    "partitioning, no windows over the raw stream, no collect. "
    "Conversion emits as one IEEE division of two exact counts. "
    "Timestamps compare as exact integer epoch-micros "
    "(functions/timeutils.epoch_us — encoding-safe on every events "
    "parquet vintage).",
)
def q191_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    ev = e.select("user_id", "event_type", epoch_us(F.col("ts")).alias("t"))
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("t1"))
    )
    day_us = 86_400_000_000
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where((F.col("t") > F.col("t1")) & (F.col("t") <= F.col("t1") + day_us))
        .groupBy("user_id")
        .agg(F.min("t").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where((F.col("t") > F.col("t2")) & (F.col("t") <= F.col("t2") + day_us))
        .groupBy("user_id")
        .agg(F.min("t").alias("t3"))
    )
    counts = (
        s1.agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit(1).alias("step"), F.lit("view").alias("funnel_step"), "n_users")
        .unionAll(
            s2.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(2).alias("step"),
                F.lit("view>click").alias("funnel_step"),
                "n_users",
            )
        )
        .unionAll(
            s3.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(3).alias("step"),
                F.lit("view>click>purchase").alias("funnel_step"),
                "n_users",
            )
        )
    )
    base = counts.where(F.col("step") == 1).select(F.col("n_users").alias("n1"))
    return (
        counts.crossJoin(F.broadcast(base))
        .select(
            F.col("step").cast("int").alias("step"),
            "funnel_step",
            F.col("n_users").cast("bigint").alias("n_users"),
            (F.col("n_users").cast("double") / F.col("n1").cast("double")).alias(
                "conversion"
            ),
        )
        .orderBy("step")
    )


@register(
    "q192_last_touch_attribution",
    f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS t, value FROM events
  WHERE event_type IN ('purchase', 'view', 'click')
),
tagged AS (
  SELECT user_id, t, value,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind,
         CASE WHEN event_type = 'purchase' THEN NULL
              ELSE struct_pack(tt := t, typ := event_type) END AS touch
  FROM ev
),
attrib AS (
  SELECT user_id, t, value, is_p,
         last_value(touch IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, kind, CASE WHEN touch IS NULL
             THEN '' ELSE touch.typ END
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS lt
  FROM tagged
),
purchases AS (
  SELECT CASE WHEN lt IS NULL OR lt.tt < t - 604800000000
              THEN 'direct' ELSE lt.typ END AS touch_type,
         value
  FROM attrib WHERE is_p = 1
)
SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_purchases,
       {sql_dsum("value")} AS attributed_value
FROM purchases GROUP BY 1 ORDER BY 1
""",
    doc="Last-touch marketing attribution: every purchase credited to "
    "the user's most recent view/click STRICTLY before it and within a "
    "7-day lookback, else 'direct' — the standard conversion-credit "
    "query every product-analytics engine ships, and the carry-forward "
    "sibling of q191's ordered funnel. ONE user-keyed shuffle total: "
    "purchases and touches union into one per-user ordered stream and "
    "last(touch, ignorenulls) over rows-to-1-preceding carries the "
    "latest touch forward (the q35 as-of union-and-window shape — no "
    "range join, no per-purchase touch fan-out). Strictness by sort "
    "construction: at equal ts a purchase sorts BEFORE its touches "
    "(kind 0 < 1) so a same-instant touch never credits; ties between "
    "same-ts touches resolve to the lexicographically last type in "
    "BOTH engines. Value sums are exact integer cents (dsum); the "
    "7-day gate compares exact epoch-micros.",
)
def q192_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    ev = e.where(F.col("event_type").isin("purchase", "view", "click")).select(
        "user_id",
        "event_type",
        epoch_us(F.col("ts")).alias("t"),
        "value",
    )
    tagged = ev.select(
        "user_id",
        "t",
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
        F.when(F.col("event_type") == "purchase", 0).otherwise(1).alias("kind"),
        F.when(
            F.col("event_type") != "purchase",
            F.struct(F.col("t").alias("tt"), F.col("event_type").alias("typ")),
        ).alias("touch"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            "t",
            "kind",
            F.coalesce(F.col("touch.typ"), F.lit("")),
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attrib = tagged.withColumn("lt", F.last("touch", ignorenulls=True).over(w))
    day7_us = 7 * 86_400_000_000
    purchases = attrib.where(F.col("is_p") == 1).select(
        F.when(
            F.col("lt").isNull() | (F.col("lt.tt") < F.col("t") - day7_us),
            F.lit("direct"),
        )
        .otherwise(F.col("lt.typ"))
        .alias("touch_type"),
        "value",
    )
    return (
        purchases.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            dsum("value").alias("attributed_value"),
        )
        .orderBy("touch_type")
    )


@register(
    "q193_weekly_retention_cohorts",
    """
WITH wk AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
  FROM events WHERE user_id IS NOT NULL
),
cohort AS (
  SELECT user_id, MIN(w) AS c FROM wk GROUP BY 1
),
aged AS (
  SELECT cohort.c AS cohort_week,
         CAST(date_diff('day', cohort.c, wk.w) // 7 AS INT) AS age,
         wk.user_id
  FROM wk JOIN cohort USING (user_id)
  WHERE date_diff('day', cohort.c, wk.w) // 7 BETWEEN 0 AND 8
),
cells AS (
  SELECT cohort_week, age, COUNT(*) AS n_active
  FROM aged GROUP BY 1, 2
),
base AS (SELECT cohort_week, n_active AS n0 FROM cells WHERE age = 0)
SELECT strftime(cells.cohort_week, '%Y-%m-%d') AS cohort_week, cells.age,
       CAST(cells.n_active AS BIGINT) AS n_active,
       CAST(cells.n_active AS DOUBLE) / CAST(base.n0 AS DOUBLE) AS retention
FROM cells JOIN base USING (cohort_week)
ORDER BY 1, 2
""",
    doc="Weekly retention cohort matrix: users grouped by their "
    "first-activity week, each cohort's share still active at ages "
    "0-8 weeks — THE activation/retention readout, and the cohort "
    "refinement of q79's month-level growth accounting / q183's "
    "rolling actives. Scale shape: the corpus collapses ONCE to "
    "distinct (user, week) pairs (map-side combined — never a per-week "
    "rescan); the cohort assignment is a min-aggregate + equi-join on "
    "user_id reusing that frame; the matrix is calendar-bounded "
    "(weeks x 9 ages) however large the corpus. Retention emits as "
    "one IEEE division of two exact counts (joined to the cohort's own "
    "age-0 cell, never a window); week truncation is Monday-start in "
    "both engines and ages compare on exact day arithmetic (the "
    "7-multiple makes integer DIV exact).",
)
def q193_weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    wk = (
        e.where(F.col("user_id").isNotNull())
        .select(
            "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("w")
        )
        .distinct()
    )
    cohort = wk.groupBy("user_id").agg(F.min("w").alias("c"))
    age = (F.datediff(F.col("w"), F.col("c")) / 7).cast("int")
    aged = (
        wk.join(cohort, "user_id")
        .select(F.col("c").alias("cohort_week"), age.alias("age"), "user_id")
        .where((F.col("age") >= 0) & (F.col("age") <= 8))
    )
    cells = aged.groupBy("cohort_week", "age").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    base = cells.where(F.col("age") == 0).select(
        "cohort_week", F.col("n_active").alias("n0")
    )
    return (
        cells.join(base, "cohort_week")
        .select(
            # string-typed day, the checks.py day convention (pandas
            # renders DATE as datetime64 and the hash would diverge)
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "age",
            F.col("n_active").cast("bigint").alias("n_active"),
            (F.col("n_active").cast("double") / F.col("n0").cast("double")).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "age")
    )


from spark_hadoop_automation_in_cloud_spark.operators.bpe import (  # noqa: E402
    bpe_encode,
    bpe_merges_from_freqs,
    sampled_freqs_slice,
    sql_bpe_encode,
    word_freqs,
)
from spark_hadoop_automation_in_cloud_spark.operators.packing import (  # noqa: E402
    pack_token_counts,
    sql_pack_token_counts,
)


def _bpe_rules_and_encode(
    d: DataFrame, n_merges: int = 4, sample_mod: int | None = None
) -> tuple[list[tuple[str, str]], DataFrame]:
    """The train-then-encode prologue every BPE-consuming query shares,
    paying the corpus word pass ONCE (r10 optimization): the gated
    word-frequency table is localCheckpoint'd (vocab-sized — the same
    bounded class as the graph family's returned label frames), training
    replays the greedy rounds over it (optionally over its deterministic
    1/``sample_mod`` hash slice, the q200 shape), and the encode chain's
    distinct-word side reads the SAME table instead of re-exploding and
    re-gating the corpus.  Before the seam each such query ran THREE
    corpus word passes (training aggregate, encode vocab distinct,
    encode probe); now it runs two — checkpoint + probe — at every
    scale.  Returns (rules, encoded frame)."""
    wf = word_freqs(d, "text").localCheckpoint()
    train = wf if sample_mod is None else sampled_freqs_slice(wf, sample_mod)
    rules = [
        (r["lhs"], r["rhs"])
        for r in bpe_merges_from_freqs(train, n_merges).collect()
    ]
    return rules, bpe_encode(d, "doc_id", "text", rules, vocab_words=wf)


@register(
    "q194_bpe_token_ids",
    f"""
SELECT doc_id, n_tokens,
       array_to_string(token_ids, ',') AS token_ids
FROM (
{sql_bpe_encode("documents", "doc_id", "text", n_merges=4)}
)
""",
    doc="BPE encode-to-ids (operators/bpe.py bpe_encode): the production "
    "artifact of the tokenizer family — per-document token-id arrays "
    "under the 4 merge rules q166 trains on the same corpus. Ids are "
    "deterministic with no corpus pass: printable-ASCII base alphabet "
    "(char -> ascii-32, ids 0-94) plus one id per merge in training "
    "order, insert-if-absent (token_id_map). The merge folds run "
    "VOCAB-sized (distinct words replay the greedy folds as row-local "
    "JVM aggregates, then map symbols through a bounded map literal); "
    "the corpus pays one positioned explode, one equi-join on word, "
    "and one per-doc re-assembly (array_sort(collect_list(struct)) -> "
    "flatten, q187's idiom) — per-occurrence cost independent of "
    "n_merges. The oracle reuses the training CTE chain verbatim and "
    "replays the identical fold + id assignment. The id array emits "
    "comma-joined (the q58 serialization convention: no registered "
    "row ships a raw array column through the driver hash).",
)
def q194_bpe_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    _, enc = _bpe_rules_and_encode(d)
    return enc.select(
        "doc_id",
        "n_tokens",
        F.array_join(F.col("token_ids"), ",").alias("token_ids"),
    ).orderBy("doc_id")


@register(
    "q195_bpe_packed_sequences",
    sql_pack_token_counts(
        f"""(
{sql_bpe_encode("documents", "doc_id", "text", n_merges=4)}
) enc JOIN (SELECT doc_id, source FROM documents) ds USING (doc_id)""",
        "source",
        "doc_id",
        "n_tokens",
        capacity=256,
    ),
    doc="Sequence packing on REAL tokenizer counts (operators/packing.py "
    "pack_token_counts): q92's concat-then-chunk layout driven by "
    "bpe_encode's n_tokens instead of the whitespace approximation — "
    "bin fills now match what the trained tokenizer will actually "
    "emit, so no bin silently over/under-fills when BPE compression "
    "varies by source (q169's finding made load-bearing). Plan: the "
    "q194 encode (vocab-sized folds + one corpus join) feeding the "
    "same per-source prefix-sum window + bounded bin explode; no new "
    "corpus-scale stage beyond q194's. Docs with no encodable word "
    "have no token stream and drop on both engines.",
)
def q195_bpe_packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    _, enc = _bpe_rules_and_encode(d)
    counted = enc.join(d.select("doc_id", "source"), "doc_id")
    return pack_token_counts(counted, "source", "doc_id", "n_tokens", capacity=256)


@register(
    "q196_community_name_neardup",
    f"""
WITH np_lab AS MATERIALIZED (
{sql_label_propagation(_Q161_EDGES_SQL, "p1", "p2", n_rounds=5)}
),
np_pt AS (
  SELECT p_partkey AS node,
         list_distinct(string_split(p_name, ' ')) AS toks
  FROM part
),
np_e AS MATERIALIZED (
  SELECT np_lab.node, np_lab.community, np_pt.toks
  FROM np_lab JOIN np_pt USING (node)
)
SELECT x.community,
       x.node AS left_id, y.node AS right_id,
       CAST(len(list_intersect(x.toks, y.toks)) AS BIGINT) AS shared_tokens,
       CAST(len(x.toks) + len(y.toks) - len(list_intersect(x.toks, y.toks))
            AS BIGINT) AS union_tokens,
       CAST(len(list_intersect(x.toks, y.toks)) AS DOUBLE)
         / CAST(len(x.toks) + len(y.toks) - len(list_intersect(x.toks, y.toks))
                AS DOUBLE) AS name_jaccard
FROM np_e x JOIN np_e y ON x.community = y.community AND x.node < y.node
WHERE CAST(len(list_intersect(x.toks, y.toks)) AS DOUBLE)
        / CAST(len(x.toks) + len(y.toks) - len(list_intersect(x.toks, y.toks))
               AS DOUBLE) >= 0.5
""",
    doc="Community-bucketed near-duplicate detection — q188's stated "
    "purpose wired in: LPA communities over the recurring co-purchase "
    "graph become the dedup buckets (q107's shape with learned GRAPH "
    "structure instead of k-means geometry), and part-name token "
    "Jaccard is scored ONLY within each community via the same "
    "pair generator (operators/pairs.py blocked_pairs_within_groups, "
    "max-group-size dispatch: many tiny communities parallelize "
    "natively, so salting is pure tax until one community exceeds "
    "1500 members — BLOCKED_PAIRS community_runs is the receipt). The "
    "quadratic comparison is bounded by the largest community, not "
    "the corpus; this is also the first row that consumes q188's "
    "output as an INPUT. Jaccard keeps exact integer numerators "
    "(shared/union token counts) and emits ONE IEEE division — the "
    "threshold compares that same division on both engines, no "
    "rounding anywhere. Plan: the LPA trajectory, one broadcast-able "
    "part join, block-salted pairs, row-local set arithmetic.",
)
def q196_community_name_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_hadoop_automation_in_cloud_spark.operators.pairs import (
        blocked_pairs_within_groups,
    )

    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    labels = label_propagation(_copurchase_edges(li), "p1", "p2", n_rounds=5)
    toks = F.array_distinct(F.split(F.col("p_name"), " "))
    e = labels.select("node", "community").join(
        p.select(F.col("p_partkey").alias("node"), toks.alias("toks")), "node"
    )
    # many-small-groups dispatch: LPA communities are numerous and tiny
    # (largest = 7 members at sf0.1), so the group-size probe picks the
    # plain self-join — thousands of community keys already parallelize
    # — and only a giant community (>1500 members ⇒ >1M pairs in one
    # task) would flip it to the salted split (BLOCKED_PAIRS
    # community_runs measured the tax: blocked 0.41× at 3×)
    pairs = blocked_pairs_within_groups(
        e, ["community"], "node", n_blocks=8, auto_plain_max_group=1_500
    )
    inter = F.size(F.array_intersect(F.col("left.toks"), F.col("right.toks")))
    union = F.size(F.col("left.toks")) + F.size(F.col("right.toks")) - inter
    jac = inter.cast("double") / union.cast("double")
    return pairs.select(
        "community",
        F.col("left.node").alias("left_id"),
        F.col("right.node").alias("right_id"),
        inter.cast("bigint").alias("shared_tokens"),
        union.cast("bigint").alias("union_tokens"),
        jac.alias("name_jaccard"),
    ).where(F.col("name_jaccard") >= 0.5)


from spark_hadoop_automation_in_cloud_spark.operators.logistic import (  # noqa: E402
    logistic_train_report,
    sql_logistic_train_report,
)

#: q197 feature ORDER is load-bearing: the GD trajectory iterates the
#: weight vector in this order on both engines
_Q197_FEATS = ["len_k", "alpha_ratio", "short_doc", "has_the"]


def _quality_features_sql(extra_cols: tuple[str, ...] = ()) -> str:
    """The ONE feature-frame definition q197 trains on and q198 deploys,
    parameterized by ride-along columns (``sql_gd_ctes``' contract:
    extras ride ``lgf`` untouched — the gradient sums never reference
    them).  A builder, not textual surgery on a sibling's SQL: a
    reworded SELECT here changes BOTH rows together or neither."""
    extras = "".join(f"{c}, " for c in extra_cols)
    return f"""
SELECT {extras}CASE WHEN q.quality >= 0.93 THEN 1.0 ELSE 0.0 END AS y,
       CAST(d.n_chars AS DOUBLE) / 1000.0 AS len_k,
       q.alpha_ratio AS alpha_ratio,
       CASE WHEN d.n_chars < 100 THEN 1.0 ELSE 0.0 END AS short_doc,
       CASE WHEN position(' the ' IN ' ' || d.text || ' ') > 0
            THEN 1.0 ELSE 0.0 END AS has_the
FROM ({tx.sql_quality_score("documents", "doc_id", "text")}) q
JOIN documents d USING (doc_id)
WHERE length(d.text) > 0
"""


def _quality_feature_frame(
    d: DataFrame, extra_cols: list[str] | None = None
) -> DataFrame:
    """Spark twin of :func:`_quality_features_sql` — q197 and q198 build
    their training frames through this one definition too."""
    e = tx.quality_exprs(F.col("text"))
    return d.where(F.length("text") > 0).select(
        *(extra_cols or []),
        F.when(e["quality"] >= 0.93, 1.0).otherwise(0.0).alias("y"),
        (F.col("n_chars").cast("double") / 1000.0).alias("len_k"),
        e["alpha_ratio"].alias("alpha_ratio"),
        F.when(F.col("n_chars") < 100, 1.0).otherwise(0.0).alias("short_doc"),
        F.when(
            F.instr(F.concat(F.lit(" "), F.col("text"), F.lit(" ")), " the ")
            > 0,
            1.0,
        )
        .otherwise(0.0)
        .alias("has_the"),
    )


_Q197_FEATURES_SQL = _quality_features_sql()


@register(
    "q197_quality_filter_distillation",
    sql_logistic_train_report(_Q197_FEATURES_SQL, _Q197_FEATS, n_iter=10, lr=5.0),
    doc="Distill the rule-based quality gate into a linear filter "
    "(operators/logistic.py): full-batch logistic regression on four "
    "cheap row-local features (scaled length, alpha ratio, short-doc "
    "flag, has-'the' flag) against the label 'q27 composite quality "
    ">= 0.93' — the fastText-style quality-classifier step of a "
    "pretraining pipeline, learned entirely in-engine (97.8% train "
    "accuracy at sf0.01 vs the 74.2% majority baseline). Distributed "
    "shape: d+1 doubles of driver state, ONE map-side-combined "
    "gradient aggregate per round with the weights inlined as "
    "literals (q96's broadcast-model contract), fixed 10 rounds; "
    "accuracy decides on the linear score (dot >= 0 <=> sigma >= 0.5 "
    "— no exp in the metric), exact counts, one IEEE division. "
    "Cross-engine: identical dot/sigmoid/update spelling with a 7dp "
    "per-round snap (exp differs in the last ulp between JVM and "
    "libm, so the per-round wobble is ~n·1e-16 — 9 orders below the "
    "grid; the q69 trajectory discipline, coarsened to fit the exp "
    "noise floor), weights emitted AT the snap with no second "
    "rounding (the q168 half-boundary lesson). The oracle unrolls "
    "the 10 rounds as CTEs over the SAME feature SQL.",
)
def q197_quality_filter_distillation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    feat = _quality_feature_frame(d)
    return logistic_train_report(feat, _Q197_FEATS, n_iter=10, lr=5.0)


from spark_hadoop_automation_in_cloud_spark.operators.logistic import (  # noqa: E402
    logistic_fit,
    sql_dot,
    sql_gd_ctes,
)

#: q198's feature SQL: q197's frame with `source` riding along (extra
#: columns never enter the gradient sums — sql_gd_ctes' contract), so
#: both rows train the IDENTICAL trajectory on one definition
_Q198_FEATURES_SQL = _quality_features_sql(("d.source",))


@register(
    "q198_distilled_filter_rates",
    f"""
WITH {sql_gd_ctes(_Q198_FEATURES_SQL, _Q197_FEATS, n_iter=10, lr=5.0)}
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN ({sql_dot('w', _Q197_FEATS)}) >= 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST(SUM(CASE WHEN ({sql_dot('w', _Q197_FEATS)}) >= 0
                THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS keep_rate
FROM lgf CROSS JOIN lw10 w
GROUP BY source
ORDER BY source
""",
    doc="Deploy the distilled quality filter (q197's trained weights) "
    "over the corpus and report per-source keep rates — the policy "
    "readout a mixture decision actually consumes (which sources "
    "would the cheap linear gate cut, and by how much). Train and "
    "apply happen in ONE definition: the same GD trajectory as q197 "
    "(sql_gd_ctes — extra columns ride the feature frame without "
    "entering the gradient sums), then one row-local linear score per "
    "document (dot >= 0, no exp) and a per-source count aggregate. "
    "Scale shape: the fit's 10 scan-aggregates + one scoring scan "
    "into |sources| cells; keep_rate is one IEEE division of exact "
    "counts. At 100 TB the scoring pass is a pure filter-free scan — "
    "pushdown-friendly, no shuffle beyond the cell aggregate.",
)
def q198_distilled_filter_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    # materialize-once: the fit's 10 rounds AND the scoring pass read the
    # persisted 6-column frame — ONE derivation of the regex-heavy
    # features from raw text (logistic_fit skips its own persist because
    # this caller already holds one)
    feat = _quality_feature_frame(d, ["source"]).persist()
    try:
        w = logistic_fit(
            feat, _Q197_FEATS, n_iter=10, lr=5.0, materialize=False
        )
        dot = F.lit(w[0])
        for j, c in enumerate(_Q197_FEATS, start=1):
            dot = dot + F.lit(w[j]) * F.col(c)
        keep = F.when(dot >= 0, 1).otherwise(0)
        # |sources| cells — bounded model-state output, so materialize it
        # INSIDE the cache scope (the q96 convention): the whole call is
        # one text derivation + 11 narrow cached scans, and no pinned
        # blocks outlive the call
        rows = (
            feat.groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum(keep).cast("bigint").alias("n_keep"),
                (
                    F.sum(keep).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias("keep_rate"),
            )
            .orderBy("source")
            .collect()
        )
    finally:
        feat.unpersist()
    return spark.createDataFrame(
        rows, "source string, n_docs bigint, n_keep bigint, keep_rate double"
    ).orderBy("source")


from spark_hadoop_automation_in_cloud_spark.operators.bpe import (  # noqa: E402
    decode_token_ids,
    gated_words,
    sql_bpe_decode_roundtrip,
)


@register(
    "q199_bpe_decode_roundtrip",
    sql_bpe_decode_roundtrip("documents", "doc_id", "text", n_merges=4),
    doc="Tokenizer round-trip audit (operators/bpe.py decode_token_ids): "
    "encode the corpus under the q166-trained rules, decode the id "
    "arrays back through the inverted vocab, and verify per document "
    "that decoded == concat(gated_words) — the documented lossiness "
    "contract (the scheme carries no word-boundary token) — plus a "
    "second decode with ONE appended out-of-vocab id (9999) proving "
    "the loud-NULL path: a wrong-vocab stream nulls the WHOLE "
    "document (aggregate-concat, not array_join's silent null drop). "
    "Row-local decode: one JVM transform through the bounded inverse "
    "map literal + a fold concat; the only corpus-scale stages are "
    "q194's encode and one expected-value re-assembly on the shared "
    "gated_words stream. The unbounded decoded string ships as its "
    "md5 (the q58 serialization convention).",
)
def q199_bpe_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    rules, enc0 = _bpe_rules_and_encode(d)
    enc = enc0.withColumn(
        "bad_ids", F.concat(F.col("token_ids"), F.array(F.lit(9999).cast("int")))
    )
    dec = decode_token_ids(
        decode_token_ids(enc, rules),
        rules,
        ids_col="bad_ids",
        out_col="bad_decoded",
    )
    expected = (
        gated_words(d, "doc_id", "text")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda x: x["word"],
                ),
                "",
            ).alias("expected")
        )
    )
    return (
        dec.join(expected, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.md5("decoded").alias("decoded_md5"),
            (F.col("decoded") == F.col("expected")).alias("roundtrip_ok"),
            F.col("bad_decoded").isNull().alias("bad_is_null"),
        )
        .orderBy("doc_id")
    )


@register(
    "q200_sampled_bpe_token_ids",
    f"""
SELECT doc_id, n_tokens,
       array_to_string(token_ids, ',') AS token_ids
FROM (
{sql_bpe_encode("documents", "doc_id", "text", n_merges=8, sample_mod=4)}
)
""",
    doc="BPE at realistic merge counts — the 100 TB training shape "
    "(operators/bpe.py bpe_merges_sampled): rules are learned on a "
    "deterministic 1/4 hash-slice of the word-frequency table "
    "(md5(word||salt) % 4 = 0 — surviving words keep EXACT corpus "
    "frequencies, so the pair statistics are true statistics of a "
    "vocabulary subset, not noisy estimates), then the FULL corpus "
    "encodes under those rules via the unchanged q194 path. Every "
    "training round's aggregate + fold runs on vocab/4 rows; the "
    "greedy loop localCheckpoints every 16 rounds so hundreds of "
    "rounds never deepen the Catalyst plan past the checkpoint "
    "window (BPE_LADDER.json measures wall vs n_merges at 4/64/256). "
    "8 merges here — twice q194's — so the sampled trajectory "
    "actually diverges from the full one at sf0.01 and the oracle "
    "proves the sampled chain, not a coincidence. Pair exhaustion "
    "before round 8 is a no-op round on both engines (the "
    "_sql_fold_round LEFT JOIN guard).",
)
def q200_sampled_bpe_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    _, enc = _bpe_rules_and_encode(d, n_merges=8, sample_mod=4)
    return enc.select(
        "doc_id",
        "n_tokens",
        F.array_join(F.col("token_ids"), ",").alias("token_ids"),
    ).orderBy("doc_id")


from spark_hadoop_automation_in_cloud_spark.operators.bpe import (  # noqa: E402
    _SQL_ENCODE_SELECT,
    _sql_encode_ctes,
)
from spark_hadoop_automation_in_cloud_spark.operators.packing import (  # noqa: E402
    sql_token_budget_selection,
    token_budget_selection,
)

#: q201's total token budget — a fixed constant so the cut binds at every
#: sf (the corpus always holds far more kept tokens than this)
_Q201_BUDGET = 20_000
_Q201_FEATURES_SQL = f"""
SELECT f.*, e.n_tokens
FROM ({_quality_features_sql(("d.doc_id", "d.source"))}) f
JOIN enc e ON e.doc_id = f.doc_id
"""
_Q201_SQL = (
    "WITH "
    + _sql_encode_ctes("documents", "doc_id", "text", 4)
    + f""",
enc AS MATERIALIZED (
{_SQL_ENCODE_SELECT}),
"""
    + sql_gd_ctes(_Q201_FEATURES_SQL, _Q197_FEATS, n_iter=10, lr=5.0)
    + f""",
scored AS MATERIALIZED (
  SELECT lgf.*, {sql_dot("w", _Q197_FEATS)} AS score
  FROM lgf CROSS JOIN lw10 w
),
kept AS (SELECT * FROM scored WHERE score >= 0),
base AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM lgf GROUP BY source
),
keeps AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_keep FROM kept GROUP BY source
),
tot AS (SELECT CAST(SUM(n_keep) AS BIGINT) AS total_keep FROM keeps),
budg AS (
  SELECT k.source,
         CASE WHEN t.total_keep = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(({_Q201_BUDGET} * k.n_keep) // t.total_keep AS BIGINT)
         END AS source_budget
  FROM keeps k CROSS JOIN tot t
),
sel AS MATERIALIZED (
{sql_token_budget_selection(
    "SELECT kt.*, b.source_budget FROM kept kt JOIN budg b USING (source)",
    "source", "doc_id", "score", "n_tokens", "source_budget",
)}),
packed AS (
{sql_pack_token_counts("sel", "source", "doc_id", "n_tokens", capacity=256)})
SELECT b.source,
       b.n_docs,
       COALESCE(k.n_keep, 0) AS n_keep,
       COALESCE(g.source_budget, 0) AS source_budget,
       COALESCE(s.n_selected, 0) AS n_selected,
       COALESCE(s.tokens_selected, 0) AS tokens_selected,
       COALESCE(p.n_bins, 0) AS n_bins
FROM base b
LEFT JOIN keeps k USING (source)
LEFT JOIN budg g USING (source)
LEFT JOIN (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_selected,
         CAST(SUM(n_tokens) AS BIGINT) AS tokens_selected
  FROM sel GROUP BY source
) s USING (source)
LEFT JOIN (
  SELECT source, CAST(COUNT(DISTINCT bin_id) AS BIGINT) AS n_bins
  FROM packed GROUP BY source
) p USING (source)
ORDER BY source
"""
)


@register(
    "q201_curated_mix_funnel",
    _Q201_SQL,
    doc="The full curated-pretraining-mix readout — every stage of the "
    "pipeline composed end-to-end with zero new kernels: (1) q194's "
    "BPE encode supplies REAL per-document token counts; (2) q197's "
    "distilled quality gate trains on the encodable docs (the shared "
    "sql_gd_ctes trajectory, token counts riding along); (3) the "
    "gate's per-source keep counts DERIVE the per-source token "
    "budgets — budget_s = total * n_keep_s DIV total_keep, exact "
    "integer arithmetic, so the mixture follows what the gate kept "
    "rather than hand weights (q198's readout made load-bearing); "
    "(4) q112's budget selection takes best-scoring docs first "
    "(linear score DESC — bit-identical IEEE dot on both engines — "
    "doc_id tiebreak) until each source's budget is spent; (5) q195's "
    "packing lays the selection into capacity-256 bins. Output: one "
    "funnel row per source (n_docs -> n_keep -> budget -> n_selected "
    "-> tokens_selected -> n_bins), the q127 receipt shape. Scale: "
    "each stage keeps its own proven plan; the composition adds one "
    "broadcast of the |sources|-row budget table and bounded-state "
    "aggregates only.",
)
def q201_curated_mix_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    _, enc0 = _bpe_rules_and_encode(d)
    enc = enc0.select("doc_id", "n_tokens")
    feat = _quality_feature_frame(d, ["doc_id", "source"]).join(enc, "doc_id")
    feat = feat.persist()
    try:
        w = logistic_fit(
            feat, _Q197_FEATS, n_iter=10, lr=5.0, materialize=False
        )
        dot = F.lit(w[0])
        for j, c in enumerate(_Q197_FEATS, start=1):
            dot = dot + F.lit(w[j]) * F.col(c)
        scored = feat.withColumn("score", dot)
        kept = scored.where(F.col("score") >= 0)
        # r11: base counts and keep counts ride ONE aggregate pass over the
        # scored frame (they were two scan+collect actions; the conditional
        # sum is exact-integer, and dropping zero-keep sources reproduces
        # the old keeps dict, which only held sources present in `kept`)
        bk = (
            scored.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("score") >= 0, 1).otherwise(0)).alias("k"),
            )
            .collect()
        )
        base = {r["source"]: int(r["n"]) for r in bk}
        keeps = {r["source"]: int(r["k"]) for r in bk if int(r["k"]) > 0}
        # |sources| cells of driver state; the budget derivation is exact
        # integer arithmetic spelled identically in the oracle
        total_keep = sum(keeps.values())
        budgets = {
            s: (0 if total_keep == 0 else (_Q201_BUDGET * n) // total_keep)
            for s, n in keeps.items()
        }
        budg = spark.createDataFrame(
            [(s, b) for s, b in budgets.items()],
            "source string, source_budget bigint",
        )
        sel = token_budget_selection(
            kept.join(F.broadcast(budg), "source"),
            "source",
            "doc_id",
            "score",
            "n_tokens",
            budget=F.col("source_budget"),
        ).persist()
        try:
            # r11: the selection stats and the packing-bin counts ride ONE
            # collect (a full-outer join of the two per-source aggregates
            # over the persisted `sel` — they were two separate actions);
            # values are the per-frame aggregates unchanged
            sel_join = (
                sel.groupBy("source")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("n_tokens").alias("t"),
                )
                .join(
                    pack_token_counts(
                        sel, "source", "doc_id", "n_tokens", capacity=256
                    )
                    .groupBy("source")
                    .agg(F.countDistinct("bin_id").alias("b")),
                    "source",
                    "full",
                )
                .collect()
            )
            sel_stats = {
                r["source"]: (int(r["n"]), int(r["t"]))
                for r in sel_join
                if r["n"] is not None
            }
            bins = {
                r["source"]: int(r["b"]) for r in sel_join if r["b"] is not None
            }
        finally:
            sel.unpersist()
    finally:
        feat.unpersist()
    rows = [
        (
            s,
            base[s],
            keeps.get(s, 0),
            budgets.get(s, 0),
            sel_stats.get(s, (0, 0))[0],
            sel_stats.get(s, (0, 0))[1],
            bins.get(s, 0),
        )
        for s in sorted(base)
    ]
    return spark.createDataFrame(
        rows,
        "source string, n_docs bigint, n_keep bigint, source_budget bigint, "
        "n_selected bigint, tokens_selected bigint, n_bins bigint",
    ).orderBy("source")


from spark_hadoop_automation_in_cloud_spark.operators.reweight import (  # noqa: E402
    exp_gradient_weights,
    sql_reweight_ctes,
    sql_reweight_select,
)

_Q202_CELLS_SQL = f"""
lcell AS MATERIALIZED (
  SELECT source AS domain,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         round(SUM(GREATEST(0.0, -({sql_dot("w", _Q197_FEATS)})))
               / CAST(COUNT(*) AS DOUBLE), 7) AS mean_loss
  FROM lgf CROSS JOIN lw10 w
  GROUP BY source
)"""


@register(
    "q202_doremi_mixture_weights",
    "WITH "
    + sql_gd_ctes(_Q198_FEATURES_SQL, _Q197_FEATS, n_iter=10, lr=5.0)
    + ","
    + _Q202_CELLS_SQL
    + ",\n"
    + sql_reweight_ctes("lcell", n_rounds=5, eta=0.5)
    + sql_reweight_select("lcell", n_rounds=5, total_budget=20_000),
    doc="DoReMi-shaped LEARNED mixture weights (operators/reweight.py): "
    "instead of hand weights (q125) or a one-shot keep-rate readout "
    "(q198/q201), learn per-source weights by exponentiated gradient "
    "against a moving weighted baseline — domains the distilled gate "
    "finds HARDEST (mean hinge of the linear score, max(0, -dot)) "
    "gain weight each round, the Group-DRO direction of the public "
    "method. 100 TB shape: the gate trains on the shared sql_gd_ctes "
    "trajectory (10 scan-aggregates over the persisted feature "
    "frame), the per-domain loss cells distill in ONE more aggregate, "
    "and the 5 weight rounds are |domains|-sized arithmetic — "
    "driver-bounded, no further corpus contact. Cross-engine: Spark "
    "executes the SAME sql_reweight_ctes fragment the oracle unrolls "
    "(spelling drift impossible by construction), with a 7dp "
    "per-round snap absorbing exp/summation ulp wobble (the q69/q197 "
    "trajectory discipline). Budgets are floor(total * w) — one IEEE "
    "multiply+floor per domain.",
)
def q202_doremi_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    feat = _quality_feature_frame(d, ["source"]).persist()
    try:
        w = logistic_fit(
            feat, _Q197_FEATS, n_iter=10, lr=5.0, materialize=False
        )
        dot = F.lit(w[0])
        for j, c in enumerate(_Q197_FEATS, start=1):
            dot = dot + F.lit(w[j]) * F.col(c)
        loss = F.greatest(F.lit(0.0), -dot)
        cells = (
            feat.groupBy(F.col("source").alias("domain"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.round(
                    F.sum(loss) / F.count(F.lit(1)).cast("double"), 7
                ).alias("mean_loss"),
            )
            # |domains| cells — bounded model state; materialize inside
            # the persist scope (the q96 convention), then walk the
            # weight trajectory on the tiny local frame
            .collect()
        )
    finally:
        feat.unpersist()
    cells_df = spark.createDataFrame(
        cells, "domain string, n_docs bigint, mean_loss double"
    )
    rows = exp_gradient_weights(
        spark, cells_df, n_rounds=5, eta=0.5, total_budget=20_000
    ).collect()
    return spark.createDataFrame(
        rows,
        "source string, n_docs bigint, mean_loss double, weight double, "
        "token_budget bigint",
    ).orderBy("source")


from spark_hadoop_automation_in_cloud_spark.operators.bpe import (  # noqa: E402
    sql_bpe_encode as _sql_bpe_encode_203,
    sql_gated_doc_words,
)

_Q203_SQL = f"""
WITH enc AS (
{_sql_bpe_encode_203("documents", "doc_id", "text", n_merges=4)}
),
gw AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(length(word)) AS BIGINT) AS n_chars
  FROM ({sql_gated_doc_words("documents", "doc_id", "text")})
  GROUP BY doc_id
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(enc.n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(gw.n_words) AS BIGINT) AS total_words,
       CAST(SUM(gw.n_chars) AS BIGINT) AS total_chars,
       round(CAST(CAST(SUM(enc.n_tokens) AS BIGINT) AS DOUBLE)
             / CAST(SUM(gw.n_words) AS BIGINT), 6) AS fertility,
       round(CAST(CAST(SUM(gw.n_chars) AS BIGINT) AS DOUBLE)
             / CAST(SUM(enc.n_tokens) AS BIGINT), 6) AS chars_per_token
FROM enc
JOIN gw USING (doc_id)
JOIN documents d ON d.doc_id = enc.doc_id
GROUP BY d.source
ORDER BY d.source
"""


@register(
    "q203_tokenizer_fertility",
    _Q203_SQL,
    doc="Per-source tokenizer fertility/compression readout — the "
    "standard tokenizer-quality diagnostic (tokens-per-word fertility "
    "and chars-per-token compression, the numbers tokenizer papers "
    "report per language/domain): encode the corpus under the "
    "q166-trained rules (the unchanged q194 path), total tokens vs "
    "gated words vs gated chars per source. A domain whose fertility "
    "runs high is one the merge table serves badly — the "
    "retrain-or-resample signal for that source. 100 TB shape: two "
    "corpus passes (the encode chain's positioned explode + one "
    "gated-words aggregate sharing the SAME sql_gated_doc_words gate "
    "definition), a doc-keyed join, then a |sources|-cell aggregate; "
    "exact bigint totals, one IEEE division each at the end (the q189 "
    "division discipline).",
)
def q203_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    _, enc0 = _bpe_rules_and_encode(d)
    enc = enc0.select("doc_id", "n_tokens")
    gw = (
        gated_words(d, "doc_id", "text")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
        )
    )
    per_doc = enc.join(gw, "doc_id").join(d.select("doc_id", "source"), "doc_id")
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    return (
        agg.withColumn(
            "fertility",
            F.round(
                F.col("total_tokens").cast("double") / F.col("total_words"), 6
            ),
        )
        .withColumn(
            "chars_per_token",
            F.round(
                F.col("total_chars").cast("double") / F.col("total_tokens"), 6
            ),
        )
        .orderBy("source")
    )


_Q204_SQL = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
),
sc AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt_sw
  FROM toks GROUP BY source, token
),
w AS (
  SELECT source, cnt_sw,
         CAST(round(ln(CAST(cnt_sw AS DOUBLE)) * 1000000) AS BIGINT)
         - CAST(round(ln(CAST(SUM(cnt_sw) OVER (PARTITION BY token)
                             AS DOUBLE)) * 1000000) AS BIGINT) AS qd
  FROM sc
),
st AS (
  SELECT source,
         CAST(SUM(CAST(cnt_sw AS HUGEINT) * qd) AS HUGEINT) AS sum_q,
         CAST(SUM(cnt_sw) AS BIGINT) AS tot_s,
         CAST(COUNT(*) AS BIGINT) AS vocab_s
  FROM w GROUP BY source
),
stt AS (
  SELECT source, sum_q, tot_s, vocab_s,
         CAST(SUM(tot_s) OVER () AS BIGINT) AS tot
  FROM st
)
SELECT source, tot_s AS n_tokens, vocab_s AS vocab_size,
       round(CAST(sum_q
                  + CAST(tot_s AS HUGEINT)
                    * (CAST(round(ln(CAST(tot AS DOUBLE)) * 1000000)
                            AS BIGINT)
                       - CAST(round(ln(CAST(tot_s AS DOUBLE)) * 1000000)
                              AS BIGINT)) AS DOUBLE)
             / (CAST(tot_s AS DOUBLE) * 1000000.0), 6) AS kl_to_corpus
FROM stt
ORDER BY source
"""


@register(
    "q204_source_kl_divergence",
    _Q204_SQL,
    doc="Per-source domain-shift readout: KL(P_source || P_corpus) over "
    "the unigram token distributions — the drift/contamination-triage "
    "number an ingestion pipeline watches per feed (a source whose KL "
    "jumps changed register or language; KL 0 = indistinguishable "
    "from the mix). Same raw-space-token convention as q101's LM. "
    "100 TB shape — ONE linear pipeline, no self-join, no repeated "
    "corpus scan: corpus -> (source, token) counts (the only "
    "corpus-sized, map-side-combined shuffle) -> corpus-wide token "
    "count as a WINDOW over token on that vocab-sized frame -> "
    "per-source aggregate; the corpus-total terms factor out "
    "algebraically (sum_w cnt_sw * ln(tot/tot_s) = tot_s * "
    "ln(tot/tot_s)) so they fold into |sources|-sized arithmetic "
    "instead of a broadcast onto every row. Determinism: each ln "
    "snaps to the integer 1e-6 grid (the q101 quantized-log idiom), "
    "per-source sums are exact integer arithmetic "
    "(HUGEINT/decimal(38,0); per-term bigint products bound corpus "
    "size at ~2^53 tokens, the q189 modularity note), ONE IEEE "
    "division at the end. Support(P_s) is a subset of support(P), so "
    "no smoothing is needed: every term has cnt_w >= cnt_sw >= 1.",
)
def q204_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    toks = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    sc = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_sw")
    )

    def qln(c: F.Column) -> F.Column:
        return F.round(F.log(c.cast("double")) * 1_000_000).cast("bigint")

    cnt_w = F.sum("cnt_sw").over(Window.partitionBy("token"))
    w = sc.select(
        "source",
        "cnt_sw",
        (qln(F.col("cnt_sw")) - qln(cnt_w)).alias("qd"),
    )
    st = w.groupBy("source").agg(
        F.sum((F.col("cnt_sw") * F.col("qd")).cast("decimal(38,0)")).alias(
            "sum_q"
        ),
        F.sum("cnt_sw").cast("bigint").alias("tot_s"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_s"),
    )
    # the corpus total rides a global window over the |sources|-sized
    # frame (trivial single partition of ~|sources| rows) — NOT a
    # re-aggregation branch, which would re-derive the corpus scan
    stt = st.withColumn(
        "tot", F.sum("tot_s").over(Window.partitionBy()).cast("bigint")
    )
    kl_q = F.col("sum_q") + (
        F.col("tot_s") * (qln(F.col("tot")) - qln(F.col("tot_s")))
    ).cast("decimal(38,0)")
    return (
        stt.select(
            "source",
            F.col("tot_s").alias("n_tokens"),
            F.col("vocab_s").alias("vocab_size"),
            F.round(
                kl_q.cast("double")
                / (F.col("tot_s").cast("double") * 1_000_000.0),
                6,
            ).alias("kl_to_corpus"),
        )
        .orderBy("source")
    )


_Q205_CELLS_SQL = """
lcell AS MATERIALIZED (
  SELECT source AS domain,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         round(SUM(GREATEST(0.0, -score))
               / CAST(COUNT(*) AS DOUBLE), 7) AS mean_loss
  FROM scored
  GROUP BY source
)"""

_Q205_SQL = (
    "WITH "
    + _sql_encode_ctes("documents", "doc_id", "text", 4)
    + f""",
enc AS MATERIALIZED (
{_SQL_ENCODE_SELECT}),
"""
    + sql_gd_ctes(_Q201_FEATURES_SQL, _Q197_FEATS, n_iter=10, lr=5.0)
    + f""",
scored AS MATERIALIZED (
  SELECT lgf.*, {sql_dot("w", _Q197_FEATS)} AS score
  FROM lgf CROSS JOIN lw10 w
),"""
    + _Q205_CELLS_SQL
    + ",\n"
    + sql_reweight_ctes("lcell", n_rounds=5, eta=0.5)
    + f""",
budg AS (
  SELECT c.domain AS source,
         CAST(FLOOR({_Q201_BUDGET} * r.w) AS BIGINT) AS source_budget
  FROM lcell c JOIN rw5 r USING (domain)
),
kept AS (SELECT * FROM scored WHERE score >= 0),
sel AS MATERIALIZED (
{sql_token_budget_selection(
    "SELECT kt.*, b.source_budget FROM kept kt JOIN budg b USING (source)",
    "source", "doc_id", "score", "n_tokens", "source_budget",
)}),
packed AS (
{sql_pack_token_counts("sel", "source", "doc_id", "n_tokens", capacity=256)})
SELECT c.domain AS source,
       c.n_docs,
       c.mean_loss,
       r.w AS weight,
       b.source_budget,
       COALESCE(s.n_selected, 0) AS n_selected,
       COALESCE(s.tokens_selected, 0) AS tokens_selected,
       COALESCE(p.n_bins, 0) AS n_bins
FROM lcell c
JOIN rw5 r USING (domain)
JOIN budg b ON b.source = c.domain
LEFT JOIN (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_selected,
         CAST(SUM(n_tokens) AS BIGINT) AS tokens_selected
  FROM sel GROUP BY source
) s ON s.source = c.domain
LEFT JOIN (
  SELECT source, CAST(COUNT(DISTINCT bin_id) AS BIGINT) AS n_bins
  FROM packed GROUP BY source
) p ON p.source = c.domain
ORDER BY source
"""
)


@register(
    "q205_learned_mix_funnel",
    _Q205_SQL,
    doc="The curated-mix funnel under LEARNED mixture weights — q201's "
    "composition with stage 3 swapped: instead of keep-rate-derived "
    "budgets, the per-source token budgets come from q202's "
    "exponentiated-gradient trajectory (floor(total * w) over the "
    "per-domain mean-hinge cells of the SAME gate the selection "
    "scores with), so the budget flows toward the domains the gate "
    "finds hardest — the Group-DRO allocation deployed end-to-end: "
    "encode -> gate -> loss cells -> learned weights -> budgets -> "
    "budget selection -> packing. Cells here are over ENCODABLE docs "
    "(the feature frame joins enc), unlike q202's all-docs cells: a "
    "budget must allocate tokens the packer can actually pack. "
    "Scale: q201's story — every stage keeps its proven plan; the "
    "weight trajectory adds |domains|-sized arithmetic and the "
    "budget table broadcasts.",
)
def q205_learned_mix_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    _, enc0 = _bpe_rules_and_encode(d)
    enc = enc0.select("doc_id", "n_tokens")
    feat = _quality_feature_frame(d, ["doc_id", "source"]).join(enc, "doc_id")
    feat = feat.persist()
    try:
        w = logistic_fit(
            feat, _Q197_FEATS, n_iter=10, lr=5.0, materialize=False
        )
        dot = F.lit(w[0])
        for j, c in enumerate(_Q197_FEATS, start=1):
            dot = dot + F.lit(w[j]) * F.col(c)
        scored = feat.withColumn("score", dot)
        cells = (
            scored.groupBy(F.col("source").alias("domain"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.round(
                    F.sum(F.greatest(F.lit(0.0), -F.col("score")))
                    / F.count(F.lit(1)).cast("double"),
                    7,
                ).alias("mean_loss"),
            )
            # |domains| cells — bounded model state (the q202 shape)
            .collect()
        )
        cells_df = spark.createDataFrame(
            cells, "domain string, n_docs bigint, mean_loss double"
        )
        wrows = {
            r["source"]: (float(r["weight"]), int(r["token_budget"]))
            for r in exp_gradient_weights(
                spark, cells_df, n_rounds=5, eta=0.5, total_budget=_Q201_BUDGET
            ).collect()
        }
        budg = spark.createDataFrame(
            [(s, b) for s, (_, b) in wrows.items()],
            "source string, source_budget bigint",
        )
        kept = scored.where(F.col("score") >= 0)
        sel = token_budget_selection(
            kept.join(F.broadcast(budg), "source"),
            "source",
            "doc_id",
            "score",
            "n_tokens",
            budget=F.col("source_budget"),
        ).persist()
        try:
            # r11: the selection stats and the packing-bin counts ride ONE
            # collect (a full-outer join of the two per-source aggregates
            # over the persisted `sel` — they were two separate actions);
            # values are the per-frame aggregates unchanged
            sel_join = (
                sel.groupBy("source")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("n_tokens").alias("t"),
                )
                .join(
                    pack_token_counts(
                        sel, "source", "doc_id", "n_tokens", capacity=256
                    )
                    .groupBy("source")
                    .agg(F.countDistinct("bin_id").alias("b")),
                    "source",
                    "full",
                )
                .collect()
            )
            sel_stats = {
                r["source"]: (int(r["n"]), int(r["t"]))
                for r in sel_join
                if r["n"] is not None
            }
            bins = {
                r["source"]: int(r["b"]) for r in sel_join if r["b"] is not None
            }
        finally:
            sel.unpersist()
    finally:
        feat.unpersist()
    rows = [
        (
            r["domain"],
            int(r["n_docs"]),
            float(r["mean_loss"]),
            wrows[r["domain"]][0],
            wrows[r["domain"]][1],
            sel_stats.get(r["domain"], (0, 0))[0],
            sel_stats.get(r["domain"], (0, 0))[1],
            bins.get(r["domain"], 0),
        )
        for r in sorted(cells, key=lambda x: x["domain"])
    ]
    return spark.createDataFrame(
        rows,
        "source string, n_docs bigint, mean_loss double, weight double, "
        "source_budget bigint, n_selected bigint, tokens_selected bigint, "
        "n_bins bigint",
    ).orderBy("source")


#: q206's total token budget — sized so that at sf0.01 at least one
#: weighted language lands above 1 epoch (the corpus holds ~60k BPE
#: tokens) while sf0.1 sits below; the flag threshold is the public
#: data-constrained-scaling observation that value decays sharply past
#: ~4 repetitions
_Q206_BUDGET = 100_000

#: per-language budgets floored ONCE in Python and inlined on both
#: engines (the q125 rule: weight-float rounding must not diverge the
#: oracle); unweighted languages (zh) are excluded by the inner join
_Q206_BUDGETS: dict[str, int] = {
    lang: int(_Q206_BUDGET * w) for lang, w in _Q125_WEIGHTS.items()
}

_Q206_SQL = (
    "WITH "
    + _sql_encode_ctes("documents", "doc_id", "text", 4)
    + f""",
enc AS MATERIALIZED (
{_SQL_ENCODE_SELECT}),
al AS (
  SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(e.n_tokens) AS BIGINT) AS available_tokens
  FROM enc e JOIN documents d ON d.doc_id = e.doc_id
  GROUP BY d.lang
)
SELECT al.lang, al.n_docs, al.available_tokens,
       b.token_budget,
       round(CAST(b.token_budget AS DOUBLE) / al.available_tokens, 6)
         AS epochs,
       (CAST(b.token_budget AS DOUBLE) / al.available_tokens) > 4.0
         AS repeat_heavy
FROM al
JOIN (VALUES {", ".join(f"('{l}', CAST({b} AS BIGINT))"
                        for l, b in sorted(_Q206_BUDGETS.items()))})
  b(lang, token_budget) ON b.lang = al.lang
ORDER BY al.lang
"""
)


@register(
    "q206_mixture_epochs",
    _Q206_SQL,
    doc="Data-constrained mix readout — for each weighted language, how "
    "many EPOCHS of its available corpus the mixture budget implies "
    "(epochs = budget / available BPE tokens), with the repeat_heavy "
    "flag at the public data-constrained-scaling threshold (~4 "
    "repetitions is where repeated data's value decays sharply): the "
    "number that tells a curator whether a mix is asking a domain to "
    "repeat itself into diminishing returns, and the missing readout "
    "between q125's budget ENFORCEMENT and q202's budget LEARNING. "
    "Real tokenizer counts (the q194 encode path — the q195 lesson: "
    "whitespace approximations misprice CJK-like and code-like "
    "domains), per-language budgets floored once in Python and "
    "inlined as literals on both engines (the q125 rule), unweighted "
    "languages excluded by the inner join. 100 TB shape: the encode "
    "chain's corpus passes + one |langs|-cell aggregate + a literal "
    "join; the epoch division is one IEEE divide per language, and "
    "the flag compares the UNROUNDED quotient identically on both "
    "engines.",
)
def q206_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents", parallelize=True)
    _, enc0 = _bpe_rules_and_encode(d)
    enc = enc0.select("doc_id", "n_tokens")
    al = (
        enc.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("available_tokens"),
        )
    )
    b = spark.createDataFrame(
        sorted(_Q206_BUDGETS.items()), "lang string, token_budget bigint"
    )
    ratio = F.col("token_budget").cast("double") / F.col("available_tokens")
    return (
        al.join(F.broadcast(b), "lang")
        .select(
            "lang",
            "n_docs",
            "available_tokens",
            "token_budget",
            F.round(ratio, 6).alias("epochs"),
            (ratio > 4.0).alias("repeat_heavy"),
        )
        .orderBy("lang")
    )
