"""Document deduplication operators (training-data pipeline extensions,
SURVEY §7.3 step 9): exact, MinHash+LSH, SimHash, n-gram Jaccard.

All hashing goes through the portable md5-derived 60-bit hash
(``functions.hashing``) so every stage is reproducible in the DuckDB oracle.
Everything is built-in expressions — shingling is ``transform/sequence``
over split tokens, signatures are single-pass aggregations (no row
explosion beyond the shingle inverted index), candidate pairing is an
equi-join on band keys.  No Python UDFs anywhere.

Scale shape (100 TB of documents):
- exact: one shuffle on the content hash (map-side combine first).
- minhash: shingle explode → ONE aggregation to a per-doc signature row
  (16 ``min`` aggregates — partial-aggregates map-side), band explode is
  ×NUM_BANDS on the tiny signature frame, pairing is an equi-join on
  (band_idx, band_key) — the classic shuffle-bounded LSH plan; skewed
  bucket keys (boilerplate docs) are handled by AQE skew join.
- simhash: shingle explode → per-(doc, token) count → one 60-term
  conditional-sum aggregation to a 60-bit fingerprint.
- jaccard: inverted-index self-join on shingle — exact but quadratic in
  per-shingle document frequency; use for verification / small blocks,
  MinHash for the scale path (documented, not silently capped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.functions.hashing import (
    md5_int60,
    minhash_coeffs,
    perm_hash,
    sql_md5_int60,
    sql_perm_hash,
)

NUM_PERM = 16
NUM_BANDS = 4
ROWS_PER_BAND = NUM_PERM // NUM_BANDS
COEFFS = minhash_coeffs(NUM_PERM)


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per content-hash group: size + canonical (min) id.

    Output: content_hash (md5 hex), n_docs, canonical_id.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("canonical_id"),
        )
    )


SQL_EXACT_DEDUP = """
SELECT md5({t}) AS content_hash,
       COUNT(*) AS n_docs,
       MIN({i}) AS canonical_id
FROM {src}
GROUP BY 1
"""


def word_shingles(text: Column, n: int = 2) -> Column:
    """Distinct n-word shingles of a single-space-tokenized text column.

    Guarded for short texts: Spark's ``sequence(1, 0)`` would generate a
    DESCENDING [1, 0] — so texts with < n tokens return an empty array
    explicitly.
    """
    toks = F.split(text, " ")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    parts = lambda i: [F.element_at(toks, i + j) for j in range(n)]  # noqa: E731
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))),
    ).otherwise(F.array().cast("array<string>"))


def sql_shingle_rows(src: str, id_col: str, text_col: str, n: int = 2) -> str:
    """DuckDB: one row per distinct (doc, shingle).  Scalar
    ``unnest(generate_series(...))`` — DuckDB 1.0 rejects column arguments
    to the generate_series *table* function."""
    concat = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return f"""
SELECT DISTINCT doc_id, {concat} AS shingle
FROM (
  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - {n - 1})) AS i
  FROM (SELECT {id_col} AS doc_id, string_split({text_col}, ' ') AS toks FROM {src})
)
"""


def shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int = 2) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )


def minhash_signatures(shingles: DataFrame) -> DataFrame:
    """(doc_id, shingle) → one row per doc with mh_0..mh_{NUM_PERM-1}.

    The md5-derived base hash is projected ONCE before the aggregation —
    inlining it into the 16 permutation aggregates would rely on Catalyst
    CSE across aggregate expressions, which is not guaranteed; md5 is the
    expensive part, the permutations are two integer ops each.
    """
    hashed = shingles.select("doc_id", md5_int60(F.col("shingle")).alias("__h"))
    aggs = [
        F.min(perm_hash(F.col("__h"), a, b)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(COEFFS)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def sql_minhash_signatures(shingle_src_sql: str) -> str:
    h = sql_md5_int60("shingle")
    aggs = ",\n       ".join(
        f"MIN({sql_perm_hash(h, a, b)}) AS mh_{i}" for i, (a, b) in enumerate(COEFFS)
    )
    return f"SELECT doc_id,\n       {aggs}\nFROM ({shingle_src_sql})\nGROUP BY doc_id"


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Docs sharing ≥1 LSH band; est_jaccard = matching minhash fraction.

    Output: left_doc_id, right_doc_id, est_jaccard.
    """
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "_",
                    *[F.col(f"mh_{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
                ).alias("band_key"),
            )
            for b in range(NUM_BANDS)
        ]
    )
    banded = signatures.select(
        "*", F.explode(band_structs).alias("__band")
    ).select("*", F.col("__band.band_idx").alias("band_idx"), F.col("__band.band_key").alias("band_key"))
    l = banded.alias("l")
    r = banded.alias("r")
    matches = sum(
        (F.col(f"l.mh_{i}") == F.col(f"r.mh_{i}")).cast("int") for i in range(NUM_PERM)
    )
    return (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("left_doc_id"),
            F.col("r.doc_id").alias("right_doc_id"),
            (matches / F.lit(float(NUM_PERM))).alias("est_jaccard"),
        )
        .distinct()
    )


def sql_lsh_candidate_pairs(signatures_sql: str) -> str:
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band_idx, "
        + " || '_' || ".join(
            f"CAST(mh_{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        )
        + " AS band_key, "
        + ", ".join(f"mh_{i}" for i in range(NUM_PERM))
        + " FROM sigs"
        for b in range(NUM_BANDS)
    )
    matches = " + ".join(
        f"(CASE WHEN l.mh_{i} = r.mh_{i} THEN 1 ELSE 0 END)" for i in range(NUM_PERM)
    )
    return f"""
WITH sigs AS ({signatures_sql}),
banded AS ({bands})
SELECT DISTINCT l.doc_id AS left_doc_id, r.doc_id AS right_doc_id,
       ({matches}) / {float(NUM_PERM)} AS est_jaccard
FROM banded l JOIN banded r
  ON l.band_idx = r.band_idx AND l.band_key = r.band_key AND l.doc_id < r.doc_id
"""


SIMHASH_BITS = 60


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Weighted 60-bit SimHash over whitespace tokens (weight = term count).

    Output: doc_id, simhash (BIGINT).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    counted = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    h = md5_int60(F.col("token"))
    hashed = counted.select(
        "doc_id",
        "cnt",
        h.alias("th"),
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, F.col("cnt"))
            .otherwise(-F.col("cnt"))
        ).alias(f"s_{i}")
        for i in range(SIMHASH_BITS)
    ]
    sums = hashed.groupBy("doc_id").agg(*bit_sums)
    value = sum(
        F.when(F.col(f"s_{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(SIMHASH_BITS)
    )
    return sums.select("doc_id", value.cast("bigint").alias("simhash"))


def sql_simhash(src: str, id_col: str, text_col: str) -> str:
    h = sql_md5_int60("token")
    bit_sums = ",\n       ".join(
        f"SUM(CASE WHEN (th >> {i}) & 1 = 1 THEN cnt ELSE -cnt END) AS s_{i}"
        for i in range(SIMHASH_BITS)
    )
    value = " + ".join(
        f"(CASE WHEN s_{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, unnest(string_split({text_col}, ' ')) AS token
  FROM {src}
),
counted AS (
  SELECT doc_id, token, COUNT(*) AS cnt FROM toks GROUP BY 1, 2
),
hashed AS (
  SELECT doc_id, cnt, {h} AS th FROM counted
),
sums AS (
  SELECT doc_id,
       {bit_sums}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, CAST({value} AS BIGINT) AS simhash FROM sums
"""


def jaccard_pairs(
    shingles: DataFrame, min_jaccard: float
) -> DataFrame:
    """Exact n-gram Jaccard similarity via shingle inverted index.

    Output: left_doc_id, right_doc_id, jaccard (rounded 6dp).
    Quadratic in per-shingle doc frequency — verification / small-block
    tool; MinHash LSH is the scale path.
    """
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    l = shingles.alias("l")
    r = shingles.alias("r")
    inter = (
        l.join(r, (F.col("l.shingle") == F.col("r.shingle")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .groupBy(
            F.col("l.doc_id").alias("left_doc_id"),
            F.col("r.doc_id").alias("right_doc_id"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sl = sizes.select(F.col("doc_id").alias("left_doc_id"), F.col("n_sh").alias("n_l"))
    sr = sizes.select(F.col("doc_id").alias("right_doc_id"), F.col("n_sh").alias("n_r"))
    return (
        inter.join(sl, "left_doc_id")
        .join(sr, "right_doc_id")
        .select(
            "left_doc_id",
            "right_doc_id",
            F.round(
                F.col("inter") / (F.col("n_l") + F.col("n_r") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )


def sql_jaccard_pairs(shingle_src_sql: str, min_jaccard: float) -> str:
    return f"""
WITH sh AS ({shingle_src_sql}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT l.doc_id AS left_doc_id, r.doc_id AS right_doc_id, COUNT(*) AS inter
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT left_doc_id, right_doc_id,
       round(CAST(inter AS DOUBLE) / (sl.n_sh + sr.n_sh - inter), 6) AS jaccard
FROM inter
JOIN sizes sl ON sl.doc_id = left_doc_id
JOIN sizes sr ON sr.doc_id = right_doc_id
WHERE round(CAST(inter AS DOUBLE) / (sl.n_sh + sr.n_sh - inter), 6) >= {min_jaccard}
"""


# --- embedding-cosine near-dup ----------------------------------------------


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lsh_dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity ≥ ``threshold``.

    Output: left_id, right_id, cosine_sim (rounded 6dp, left < right).

    ``lsh_dim=None`` (default) is the exact all-pairs form — O(n²) dot
    products, oracle-checkable, fine for a block of documents.  At 100 TB
    pass ``lsh_dim=<vector dim>``: both sides get a random-hyperplane
    bucket signature (``operators.similarity.lsh_bucket``) and pairing
    becomes an equi-join on the bucket — candidates shrink to colliding
    buckets (shuffle-bounded, like MinHash LSH for text), at the cost of
    missing cross-bucket pairs (recall < 1 by construction, the standard
    trade; raise recall with multi-probe as in ``ann_lsh_topk``).
    """
    from spark_hadoop_automation_in_cloud_spark.functions.vectors import cosine
    from spark_hadoop_automation_in_cloud_spark.operators.similarity import lsh_bucket

    a = emb.select(F.col(id_col).alias("left_id"), F.col(vec_col).alias("__va"))
    b = emb.select(F.col(id_col).alias("right_id"), F.col(vec_col).alias("__vb"))
    if lsh_dim is not None:
        a = a.withColumn("__bucket", lsh_bucket(F.col("__va"), lsh_dim))
        b = b.withColumn("__bucket", lsh_bucket(F.col("__vb"), lsh_dim))
        cand = a.join(b, "__bucket").where(F.col("left_id") < F.col("right_id"))
    else:
        cand = a.crossJoin(b).where(F.col("left_id") < F.col("right_id"))
    return (
        cand.select(
            "left_id",
            "right_id",
            F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )


def sql_embedding_neardup_pairs(
    src: str, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    """DuckDB oracle for the exact form (same left-to-right double fold)."""
    dot = (
        "list_sum(list_transform(list_zip(a.__va, b.__vb), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )
    na = "sqrt(list_sum(list_transform(a.__va, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    nb = "sqrt(list_sum(list_transform(b.__vb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    return f"""
WITH a AS (SELECT {id_col} AS left_id, {vec_col} AS __va FROM {src}),
b AS (SELECT {id_col} AS right_id, {vec_col} AS __vb FROM {src}),
scored AS (
  SELECT left_id, right_id, round({dot} / ({na} * {nb}), 6) AS cosine_sim
  FROM a JOIN b ON left_id < right_id
)
SELECT * FROM scored WHERE cosine_sim >= {threshold}
"""

