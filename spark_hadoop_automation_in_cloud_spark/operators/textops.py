"""Text-analysis operators for document pipelines: language ID, quality
scoring, token statistics, fingerprinting.

All built-in string/regex expressions (JVM-side, whole-stage codegen), each
with a DuckDB-oracle SQL generator.  These are per-row projections +
(sometimes) one aggregation — embarrassingly parallel at any scale; the
only planning rule is to project (id, text) before applying them so the
scan stays narrow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.functions.hashing import md5_int60, sql_md5_int60
from spark_hadoop_automation_in_cloud_spark.functions.text import (
    occurrence_count,
    sql_occurrence_count,
)

# language marker words (space-padded to match whole tokens)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "nicht"),
    "fr": ("le", "et", "les"),
    "es": ("el", "y", "los"),
    "zh": ("的", "是", "了"),
}


def lang_score_exprs(t: Column) -> dict[str, Column]:
    """Per-language marker-hit counts for a text column — the shared
    first stage of :func:`language_id` and :func:`curation_funnel`.

    Counting is NON-OVERLAPPING on the space-padded text (the oracle
    replicates this exactly): immediately adjacent repeats share their
    delimiting space, so "the the" counts once — a deliberate cheap-pass
    trade; scores remain a consistent relative signal across languages.
    """
    padded = F.concat(F.lit(" "), t, F.lit(" "))
    return {
        lang: sum(occurrence_count(padded, f" {m} ") for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_pred_exprs() -> tuple[Column, Column]:
    """(pred_lang, best_score) read from the ``__s_<lang>`` columns a
    prior select materialized via :func:`lang_score_exprs` — the scores
    are projected ONCE because inlining them here would rely on Catalyst
    CSE across the argmax's repeated references (the same reasoning as
    minhash_signatures' base-hash projection).  Ties → lexicographic
    lang order, deterministic."""
    best = F.greatest(*[F.col(f"__s_{lang}") for lang in LANG_MARKERS])
    pred = F.lit(None).cast("string")
    # first lang (sorted) reaching the max wins — deterministic tie-break
    for lang in sorted(LANG_MARKERS):
        pred = F.coalesce(pred, F.when(F.col(f"__s_{lang}") == best, F.lit(lang)))
    return pred, best


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """n-gram-heuristic language ID: count per-language marker-token
    occurrences (:func:`lang_score_exprs`), predict the argmax.

    Output: doc_id, pred_lang, marker_hits.
    """
    scores = lang_score_exprs(F.col(text_col))
    out = df.select(
        F.col(id_col).alias("doc_id"),
        *[c.alias(f"__s_{lang}") for lang, c in scores.items()],
    )
    pred, best = lang_pred_exprs()
    return out.select(
        "doc_id",
        pred.alias("pred_lang"),
        best.cast("int").alias("marker_hits"),
    )


def sql_language_id(src: str, id_col: str, text_col: str) -> str:
    padded = f"(' ' || {text_col} || ' ')"
    score_exprs = {
        lang: " + ".join(sql_occurrence_count(padded, f" {m} ") for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }
    score_cols = ",\n       ".join(
        f"({e}) AS __s_{lang}" for lang, e in score_exprs.items()
    )
    best = "greatest(" + ", ".join(f"__s_{lang}" for lang in LANG_MARKERS) + ")"
    pred = "CASE "
    for lang in sorted(LANG_MARKERS):
        pred += f"WHEN __s_{lang} = {best} THEN '{lang}' "
    pred += "END"
    return f"""
WITH scored AS (
  SELECT {id_col} AS doc_id,
       {score_cols}
  FROM {src}
)
SELECT doc_id, {pred} AS pred_lang, CAST({best} AS INT) AS marker_hits
FROM scored
"""


def quality_exprs(t: Column) -> dict[str, Column]:
    """The quality-metric expressions for a text column, in ONE place —
    :func:`quality_score` projects all of them; :func:`curation_funnel`
    folds ``quality``/``n_tokens`` into its staged predicates without a
    join back to a scored frame.  Keys: n_chars, n_tokens, alpha_ratio,
    mean_token_len, quality.

    Ratios are NOT rounded: each is one exact integer-over-integer
    division done in double, already bit-identical across engines (a
    rounding step would itself be the portability hazard at
    half-boundary values like 0.9428125).
    """
    # BIGINT from the start: the composite numerator reaches 10000*n_chars,
    # which overflows 32-bit (silently, in non-ANSI sessions) for documents
    # beyond ~214k chars — and the DuckDB oracle computes in BIGINT.
    n_chars = F.length(t).cast("bigint")
    toks = F.split(t, " ")
    n_tokens = F.size(toks)
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", "")).cast("bigint")
    alpha_ratio = F.when(n_chars == 0, 0.0).otherwise(
        alpha.cast("double") / n_chars
    )
    mean_tok = F.when(n_tokens == 0, 0.0).otherwise(
        (n_chars - (n_tokens - 1)).cast("double") / n_tokens
    )
    has_stop = (
        occurrence_count(F.concat(F.lit(" "), t, F.lit(" ")), " the ") > 0
    ).cast("int")
    # bands ×10 as integers; quality = numer / (10000 * n_chars), where
    # numer = 400*lb10*n + 3000*alpha + 200*tb10*n + 1000*hs*n (all ints)
    lb10 = F.when(n_chars < 100, 2).when(n_chars < 1000, 10).otherwise(7)
    tb10 = F.when((mean_tok >= 3) & (mean_tok <= 10), 10).otherwise(5)
    numer = (
        lb10 * 400 * n_chars
        + alpha * 3000
        + tb10 * 200 * n_chars
        + has_stop * 1000 * n_chars
    )
    quality = F.when(n_chars == 0, 0.0).otherwise(
        numer.cast("double") / (n_chars * 10000).cast("double")
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": alpha_ratio,
        "mean_token_len": mean_tok,
        "quality": quality,
    }


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality metrics + a composite score in [0, 1]
    (:func:`quality_exprs`: length band, alpha-char ratio, mean token
    length band, stopword presence).  Output: doc_id, n_chars, n_tokens,
    alpha_ratio, mean_token_len, quality.
    """
    e = quality_exprs(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        e["n_chars"].cast("int").alias("n_chars"),
        e["n_tokens"].cast("int").alias("n_tokens"),
        e["alpha_ratio"].alias("alpha_ratio"),
        e["mean_token_len"].alias("mean_token_len"),
        e["quality"].alias("quality"),
    )


def sql_quality_score(src: str, id_col: str, text_col: str) -> str:
    t = text_col
    n_chars = f"length({t})"
    n_tokens = f"len(string_split({t}, ' '))"
    alpha = f"length(regexp_replace({t}, '[^a-zA-Z]', '', 'g'))"
    alpha_ratio = f"CASE WHEN {n_chars} = 0 THEN 0.0 ELSE CAST({alpha} AS DOUBLE) / {n_chars} END"
    mean_tok = (
        f"CASE WHEN {n_tokens} = 0 THEN 0.0 "
        f"ELSE CAST({n_chars} - ({n_tokens} - 1) AS DOUBLE) / {n_tokens} END"
    )
    padded = "(' ' || " + t + " || ' ')"
    has_stop = f"CASE WHEN {sql_occurrence_count(padded, ' the ')} > 0 THEN 1 ELSE 0 END"
    lb10 = f"CASE WHEN {n_chars} < 100 THEN 2 WHEN {n_chars} < 1000 THEN 10 ELSE 7 END"
    tb10 = f"CASE WHEN ({mean_tok}) >= 3 AND ({mean_tok}) <= 10 THEN 10 ELSE 5 END"
    numer = (
        f"(({lb10}) * 400 * {n_chars} + ({alpha}) * 3000"
        f" + ({tb10}) * 200 * {n_chars} + ({has_stop}) * 1000 * {n_chars})"
    )
    quality = (
        f"CASE WHEN {n_chars} = 0 THEN 0.0 "
        f"ELSE CAST({numer} AS DOUBLE) / CAST({n_chars} * 10000 AS DOUBLE) END"
    )
    return f"""
SELECT {id_col} AS doc_id,
       CAST({n_chars} AS INT) AS n_chars,
       CAST({n_tokens} AS INT) AS n_tokens,
       {alpha_ratio} AS alpha_ratio,
       {mean_tok} AS mean_token_len,
       {quality} AS quality
FROM {src}
"""


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counting, three ways: whitespace tokens, BPE-ish regex pieces
    (letter runs / digit runs / single other), distinct tokens.

    Output: doc_id, ws_tokens, bpe_tokens, distinct_tokens.
    """
    t = F.col(text_col)
    ws = F.size(F.split(t, " "))
    bpe = F.size(F.regexp_extract_all(t, F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), 0))
    distinct = F.size(F.array_distinct(F.split(t, " ")))
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws.cast("int").alias("ws_tokens"),
        bpe.cast("int").alias("bpe_tokens"),
        distinct.cast("int").alias("distinct_tokens"),
    )


def sql_token_stats(src: str, id_col: str, text_col: str) -> str:
    t = text_col
    return f"""
SELECT {id_col} AS doc_id,
       CAST(len(string_split({t}, ' ')) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all({t}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INT) AS bpe_tokens,
       CAST(len(list_distinct(string_split({t}, ' '))) AS INT) AS distinct_tokens
FROM {src}
"""


WINNOW_K = 8  # char-shingle length
WINNOW_W = 4  # winnowing window


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Winnowing document fingerprint (rolling-hash selection): hash every
    ``WINNOW_K``-char shingle, keep the min hash of each ``WINNOW_W``-wide
    position window, count distinct selected hashes and keep the global min
    as a compact signature.

    Output: doc_id, n_fingerprints, min_fingerprint.
    """
    toks = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
    pos = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("__t") - (WINNOW_K - 1), F.lit(1))),
                lambda i: F.col("__t").substr(i, F.lit(WINNOW_K)),
            )
        ).alias("pos", "shingle"),
    )
    hashed = pos.select("doc_id", "pos", md5_int60(F.col("shingle")).alias("h"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, WINNOW_W - 1)
    )
    selected = hashed.select("doc_id", F.min("h").over(w).alias("fp"))
    return selected.groupBy("doc_id").agg(
        F.count_distinct(F.col("fp")).alias("n_fingerprints"),
        F.min("fp").alias("min_fingerprint"),
    )


def sql_fingerprint(src: str, id_col: str, text_col: str) -> str:
    h = sql_md5_int60("substr(__t, i, " + str(WINNOW_K) + ")")
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, {text_col} AS __t FROM {src}
),
pos AS (
  SELECT doc_id, i AS pos, {h} AS h
  FROM (
    SELECT doc_id, __t,
           unnest(generate_series(1, greatest(length(__t) - {WINNOW_K - 1}, 1))) AS i
    FROM base
  )
),
selected AS (
  SELECT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS fp
  FROM pos
)
SELECT doc_id, COUNT(DISTINCT fp) AS n_fingerprints, MIN(fp) AS min_fingerprint
FROM selected GROUP BY doc_id
"""


def pii_scrub(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: dict[str, str],
    redaction: str = "[PII]",
) -> DataFrame:
    """PII / identifier scrubbing: per-category match counts, a stable
    pseudonym for the first identifier found, and a redacted text.

    ``patterns`` maps category name → Java/RE2-common regex (stick to the
    shared subset: character classes, ``\\d``, quantifiers — both engines
    and DuckDB compile them identically).  Output per row:
    ``n_<category>`` match counts, ``pseudonym`` (md5-derived surrogate for
    the first match of the FIRST category — stable across runs/engines, so
    downstream joins on the pseudonym still link records), and
    ``redacted_<text_col>`` with every match of every category replaced.

    Pure projection — regexp_count/replace are JVM codegen expressions; at
    100 TB this runs inside the scan stage with zero shuffle.
    """
    first_cat = next(iter(patterns))
    first_pat = patterns[first_cat]
    counts = [
        F.regexp_count(F.col(text_col), F.lit(p)).cast("bigint").alias(f"n_{name}")
        for name, p in patterns.items()
    ]
    redacted = F.col(text_col)
    for p in patterns.values():
        redacted = F.regexp_replace(redacted, p, redaction)
    first_match = F.regexp_extract(F.col(text_col), first_pat, 0)
    pseudonym = F.when(
        first_match != "",
        F.substring(F.md5(F.concat(first_match, F.lit(":pii"))), 1, 12),
    ).alias("pseudonym")
    return df.select(
        F.col(id_col),
        *counts,
        pseudonym,
        redacted.alias(f"redacted_{text_col}"),
    )


def sql_pii_scrub(
    src: str,
    id_col: str,
    text_col: str,
    patterns: dict[str, str],
    redaction: str = "[PII]",
) -> str:
    """DuckDB oracle for :func:`pii_scrub` (regexp_extract_all for counts,
    'g'-flagged regexp_replace for redaction)."""
    # escape quotes the same way sql_occurrence_count does — a pattern or
    # redaction containing ' must not break (or alter) the generated SQL
    esc = {name: p.replace("'", "''") for name, p in patterns.items()}
    red = redaction.replace("'", "''")
    first_pat = esc[next(iter(esc))]
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all({text_col}, '{p}')) AS BIGINT) AS n_{name}"
        for name, p in esc.items()
    )
    redacted = text_col
    for p in esc.values():
        redacted = f"regexp_replace({redacted}, '{p}', '{red}', 'g')"
    return f"""
SELECT {id_col},
       {counts},
       CASE WHEN regexp_extract({text_col}, '{first_pat}') <> ''
            THEN substr(md5(regexp_extract({text_col}, '{first_pat}') || ':pii'), 1, 12)
       END AS pseudonym,
       {redacted} AS redacted_{text_col}
FROM {src}
"""


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    tfidf(term, doc) = tf * ln(N / df) — raw counts, natural log, no
    smoothing (df >= 1 for every term that appears, so the log is always
    finite).  Scores are rounded to 6dp BEFORE ranking, with the term
    string as final tiebreaker, so the top-k set is engine-independent.

    Scale shape: token explode → (doc, term) count [shuffle 1, map-side
    partial] → vocabulary df count [shuffle 2, vocabulary-sized output] →
    df broadcast back onto tf (vocabulary ≪ corpus; no third shuffle) →
    one window per doc [shuffle 3, same key as shuffle 1].  The corpus-
    sized frames only ever shuffle on doc or (doc, term) — nothing
    quadratic, no driver-side vocabulary.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def sql_tfidf_top_terms(src: str, id_col: str, text_col: str, k: int = 3) -> str:
    """DuckDB oracle for :func:`tfidf_top_terms`."""
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, unnest(string_split({text_col}, ' ')) AS term
  FROM {src}
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM {src}),
scored AS (
  SELECT doc_id, term,
         round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Split documents into fixed-size overlapping token windows — the
    standard corpus→training-example transform (windows of ``chunk_tokens``
    tokens every ``stride`` tokens; ``stride < chunk_tokens`` gives the
    overlap that keeps context at window boundaries).

    One window starts at every ``1 + k*stride`` ≤ token count, so every
    document emits at least one chunk and the final (possibly short) tail
    is kept.  Full token coverage holds iff ``stride <= chunk_tokens``
    (property-tested); ``stride > chunk_tokens`` is the deliberate
    SUBSAMPLING mode — spaced windows with gaps, for corpus preview or
    sketching, never for lossless training-example construction.
    Output: doc_id, chunk_id, start_tok, n_tokens, chunk_text.

    Scale shape: array-build + explode — a pure generator projection, no
    shuffle, no state; the fan-out factor is len/stride (bounded by the
    longest document), and the chunk rows inherit the parent partitioning,
    so the write after this is partition-preserving.
    """
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride)
    )
    chunked = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__toks"),
        F.explode(starts).alias("start_tok"),
    )
    piece = F.slice(F.col("__toks"), F.col("start_tok"), chunk_tokens)
    return chunked.select(
        "doc_id",
        ((F.col("start_tok") - 1) / stride).cast("int").alias("chunk_id"),
        F.col("start_tok").cast("int").alias("start_tok"),
        F.size(piece).cast("int").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def sql_chunk_documents(
    src: str, id_col: str, text_col: str, chunk_tokens: int = 50, stride: int = 40
) -> str:
    """DuckDB oracle for :func:`chunk_documents` (list_slice clamps at the
    list end exactly like Spark's slice)."""
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, string_split({text_col}, ' ') AS toks
  FROM {src}
),
s AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, greatest(len(toks), 1), {stride})) AS start_tok
  FROM t
)
SELECT doc_id,
       CAST((start_tok - 1) / {stride} AS INT) AS chunk_id,
       CAST(start_tok AS INT) AS start_tok,
       CAST(len(list_slice(toks, start_tok, start_tok + {chunk_tokens} - 1)) AS INT)
         AS n_tokens,
       array_to_string(list_slice(toks, start_tok, start_tok + {chunk_tokens} - 1), ' ')
         AS chunk_text
FROM s
"""


def unigram_lm_scores(
    docs: DataFrame,
    train: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 1.0,
) -> DataFrame:
    """Language-model quality scoring: per-document average negative
    log-probability under an add-``alpha``-smoothed unigram model fit on
    ``train`` — the CCNet/Gopher-style perplexity filter (fluent prose
    scores low, boilerplate/garbage scores high), here with the cheapest
    model that gives the signal shape.

    Distributed shape: the model is TWO aggregates (per-token counts =
    the vocabulary; one row of [total tokens, vocab size]) — never
    driver-side; scoring is one equi-join of the corpus tokens against
    the vocabulary (per-token single match — no fanout) plus a per-doc
    aggregation.  At 100 TB the corpus-sized frames shuffle only on
    token and doc id.

    Determinism: per-token log-probs are snapped to an integer 1e-6 grid
    and summed exactly (order-independent), so the DuckDB oracle
    reproduces the scores despite float summation order — the same idiom
    as the engine's money sums; ``ln`` agreement at 6dp follows the
    TF-IDF precedent.

    Output: doc_id, n_tokens, n_oov, avg_neg_logprob (rounded 6dp;
    higher = less like the training corpus).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    vocab = (
        train.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = vocab.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("v_size")
    )
    # add-alpha smoothing with one shared OOV bucket: denominator counts
    # the vocabulary plus the OOV pseudo-type
    denom = F.col("total").cast("double") + F.lit(alpha) * (
        F.col("v_size").cast("double") + 1.0
    )
    logp = F.log((F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(alpha)) / denom)
    q = F.round(logp * 1_000_000).cast("bigint")  # exact, order-independent sum
    scored = (
        toks.join(vocab, "token", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            q.alias("__q"),
            F.when(F.col("cnt").isNull(), 1).otherwise(0).alias("__oov"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("__oov").cast("bigint").alias("n_oov"),
        F.round(
            -F.sum("__q").cast("double") / (F.count(F.lit(1)) * 1_000_000.0), 6
        ).alias("avg_neg_logprob"),
    )


def sql_unigram_lm_scores(
    docs_src: str,
    train_pred: str,
    id_col: str,
    text_col: str,
    alpha: float = 1.0,
) -> str:
    """DuckDB oracle for :func:`unigram_lm_scores` — the same quantized
    log-prob arithmetic; ``train_pred`` selects the training split of
    ``docs_src``."""
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, unnest(string_split({text_col}, ' ')) AS token
  FROM {docs_src}
),
vocab AS (
  SELECT token, COUNT(*) AS cnt FROM (
    SELECT unnest(string_split({text_col}, ' ')) AS token
    FROM {docs_src} WHERE {train_pred}
  ) GROUP BY token
),
stats AS (SELECT SUM(cnt) AS total, COUNT(*) AS v_size FROM vocab),
scored AS (
  SELECT t.doc_id,
         CAST(round(ln((CAST(COALESCE(v.cnt, 0) AS DOUBLE) + {alpha})
                       / (CAST(s.total AS DOUBLE) + {alpha} * (CAST(s.v_size AS DOUBLE) + 1.0)))
                    * 1000000) AS BIGINT) AS q,
         CASE WHEN v.cnt IS NULL THEN 1 ELSE 0 END AS oov
  FROM toks t LEFT JOIN vocab v USING (token) CROSS JOIN stats s
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(oov) AS BIGINT) AS n_oov,
       round(-CAST(SUM(q) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) AS avg_neg_logprob
FROM scored GROUP BY doc_id
"""


def curation_funnel(
    df: DataFrame,
    source_col: str,
    lang_col: str,
    text_col: str,
    quality_threshold: float = 0.9,
    min_tokens: int = 30,
    max_tokens: int = 90,
) -> DataFrame:
    """Per-source curation-funnel accounting in ONE pass: survivor counts
    for each cumulative stage of the standard pre-training filter chain,
    plus the token mass the source would contribute after all filters.

    q40 runs the row-level pipeline (which rows survive); this is the
    OBSERVABILITY aggregate every curation run reports first — where did
    each source's data go? — computed without running the pipeline once
    per stage: every stage predicate is a row-local expression
    (:func:`lang_score_exprs` / :func:`quality_exprs`, the same ONE
    definitions the row-level operators use), so the plan is a single
    scan + conditional aggregation to |sources| groups, map-side
    combined.  At 100 TB: no joins, no second scan, no per-stage rescans
    — strictly cheaper than the pipeline it summarizes.

    Stages (each ANDs onto the previous — a funnel, not independent
    filters):

      1. total       — all rows
      2. nonempty    — text non-NULL with at least one character
      3. lang_ok     — predicted language == tagged metadata language
                       (marker argmax; a metadata-trust gate)
      4. quality_ok  — composite quality >= ``quality_threshold``
      5. len_ok      — ws token count in [min_tokens, max_tokens]

    Output: source, n_total, n_nonempty, n_lang_ok, n_quality_ok,
    n_len_ok, tokens_kept (ws tokens summed over full survivors).
    """
    t = F.col(text_col)
    scored = df.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("__lang"),
        t.alias("__t"),
        *[c.alias(f"__s_{lang}") for lang, c in lang_score_exprs(t).items()],
    )
    pred, _ = lang_pred_exprs()
    tt = F.col("__t")
    q = quality_exprs(tt)
    s2 = tt.isNotNull() & (F.length(tt) > 0)
    s3 = s2 & (pred == F.col("__lang"))
    s4 = s3 & (q["quality"] >= quality_threshold)
    s5 = s4 & q["n_tokens"].between(min_tokens, max_tokens)
    flag = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731 — NULL-safe: NULL → 0
    staged = scored.select(
        "source",
        flag(s2).alias("__c2"),
        flag(s3).alias("__c3"),
        flag(s4).alias("__c4"),
        flag(s5).alias("__c5"),
        F.when(s5, q["n_tokens"]).otherwise(0).cast("bigint").alias("__tok"),
    )
    return staged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum("__c2").cast("bigint").alias("n_nonempty"),
        F.sum("__c3").cast("bigint").alias("n_lang_ok"),
        F.sum("__c4").cast("bigint").alias("n_quality_ok"),
        F.sum("__c5").cast("bigint").alias("n_len_ok"),
        F.sum("__tok").cast("bigint").alias("tokens_kept"),
    )


def sql_curation_funnel(
    src: str,
    source_col: str,
    lang_col: str,
    id_col: str,
    text_col: str,
    quality_threshold: float = 0.9,
    min_tokens: int = 30,
    max_tokens: int = 90,
) -> str:
    """DuckDB twin of :func:`curation_funnel`.  The oracle composes the
    existing per-signal CTEs with joins (value-equality is what it
    proves); the one-pass shape is the Spark side's claim, pinned by the
    plan audit instead."""
    return f"""
WITH li AS ({sql_language_id(src, id_col, text_col)}),
q AS ({sql_quality_score(src, id_col, text_col)}),
j AS (
  SELECT d.{source_col} AS source,
         CASE WHEN d.{text_col} IS NOT NULL AND length(d.{text_col}) > 0
              THEN 1 ELSE 0 END AS c2,
         CASE WHEN li.pred_lang = d.{lang_col} THEN 1 ELSE 0 END AS lang_ok,
         CASE WHEN q.quality >= {quality_threshold!r} THEN 1 ELSE 0 END AS q_ok,
         CASE WHEN q.n_tokens BETWEEN {min_tokens} AND {max_tokens}
              THEN 1 ELSE 0 END AS len_ok,
         q.n_tokens
  FROM {src} d
  JOIN li ON li.doc_id = d.{id_col}
  JOIN q ON q.doc_id = d.{id_col}
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(c2) AS BIGINT) AS n_nonempty,
       CAST(SUM(c2 * lang_ok) AS BIGINT) AS n_lang_ok,
       CAST(SUM(c2 * lang_ok * q_ok) AS BIGINT) AS n_quality_ok,
       CAST(SUM(c2 * lang_ok * q_ok * len_ok) AS BIGINT) AS n_len_ok,
       CAST(SUM(c2 * lang_ok * q_ok * len_ok * n_tokens) AS BIGINT)
         AS tokens_kept
FROM j
GROUP BY 1
"""


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: dict[int, str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """BM25 lexical retrieval: top-``topk`` documents per query — the
    exact-lexical half of the engine's search story (ANN covers the
    semantic half; TF-IDF gives per-doc keywords, this ranks docs
    against QUERIES).

    Output: query_id, doc_id, bm25 (round 6dp), rank (1..topk, dense per
    query, ties broken by doc_id).

    Scoring: the BM25+-style robust idf ``ln(1 + (N - df + 0.5) /
    (df + 0.5))`` (never negative) times the saturated tf norm
    ``tf(k1+1) / (tf + k1(1 - b + b·dl/avgdl))``.  ``dl/avgdl`` is
    computed as ``dl·N / total_dl`` — integer numerator, one double
    division — and each (query, doc, term) contribution is snapped to an
    integer 1e-6 grid before the per-doc sum (the unigram-LM idiom:
    order-independent exact summation; ``ln`` agreement at 6dp follows
    the TF-IDF precedent).

    Scale shape: the query-term table is a broadcast literal joined into
    the (doc, term) tf frame FIRST, so only the query terms' posting
    lists survive — the inverted-index probe; fan-out per term = its
    document frequency.  Document length is ROW-LOCAL
    (``size(split(text))`` projected in the same scan that tokenizes, and
    carried through the tf aggregate's key) — dl never aggregates and
    never joins, so the corpus-wide ``explode→groupBy(doc_id)`` shuffle
    and the tf⋈dl shuffle join of the earlier form are both gone
    (r06 VERDICT item 5).  Corpus statistics (per-term df; N and total
    length via one row-local scan-aggregate) broadcast back.  The
    per-query top-k is a WindowGroupLimit window over matched docs only.
    """
    if not queries:
        raise ValueError("queries must be non-empty")
    if topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    spark = docs.sparkSession
    qterms = spark.createDataFrame(
        sorted(
            {(int(qid), t) for qid, qs in queries.items() for t in qs.split()}
        ),
        "query_id int, token string",
    )
    # dl = size(split(text)) is exactly explode-count for non-NULL text
    # ("" splits to [""], count 1); NULL-text docs vanish from explode and
    # are excluded from the stats scan by the same isNotNull predicate
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("dl"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    # prune to query terms BEFORE any aggregation: tf and df shuffle only
    # the query terms' posting lists, never the full vocabulary (the
    # oracle computes the naive full-vocab form — df per term is the same
    # number either way, which is exactly what the value-hash proves)
    qtok = F.broadcast(qterms.select("token").distinct())
    tf = (
        toks.join(qtok, "token")
        .groupBy("doc_id", "token", "dl")  # dl functionally depends on doc_id
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = (
        docs.where(F.col(text_col).isNotNull())
        .select(F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("__dl"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("__dl").alias("total_dl"))
    )
    matched = (
        tf.join(F.broadcast(qterms), "token")
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + k1
        * (
            1.0
            - b
            + b * (F.col("dl") * F.col("n_docs")).cast("double") / F.col("total_dl")
        )
    )
    contrib = F.round(idf * norm * 1_000_000).cast("bigint")
    scored = (
        matched.select("query_id", "doc_id", contrib.alias("__c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("__c").alias("__s"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__s").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= topk)
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("__s") / 1_000_000.0, 6).alias("bm25"),
            "rank",
        )
    )


def sql_bm25_scores(
    src: str,
    id_col: str,
    text_col: str,
    queries: dict[int, str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> str:
    """DuckDB twin of :func:`bm25_scores` — identical idf/norm arithmetic,
    identical 1e-6 contribution grid, identical tiebreak."""
    if not queries:
        raise ValueError("queries must be non-empty")
    pairs = sorted(
        {(int(qid), t) for qid, qs in queries.items() for t in qs.split()}
    )
    values = ", ".join(
        f"({qid}, '" + t.replace("'", "''") + "')" for qid, t in pairs
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, unnest(string_split({text_col}, ' ')) AS token
  FROM {src}
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl),
qterms(query_id, token) AS (VALUES {values}),
matched AS (
  SELECT q.query_id, tf.doc_id,
         CAST(round(
           ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (tf.tf * ({k1!r} + 1.0))
           / (tf.tf + {k1!r} * (1.0 - {b!r}
              + {b!r} * CAST(dl.dl * s.n_docs AS DOUBLE) / s.total_dl))
           * 1000000) AS BIGINT) AS c
  FROM tf
  JOIN qterms q ON q.token = tf.token
  JOIN dfreq d ON d.token = tf.token
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT query_id, doc_id, SUM(c) AS s FROM matched GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id,
         round(s / 1000000.0, 6) AS bm25,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY s DESC, doc_id
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, doc_id, bm25, rank FROM ranked WHERE rank <= {topk}
"""


def vocab_coverage(df: DataFrame, text_col: str, topk: int = 200) -> DataFrame:
    """Vocabulary coverage curve: the ``topk`` most frequent tokens with
    their exact global rank and the cumulative share of ALL token
    occurrences they cover — the tokenizer/vocab-construction statistic
    ("how many types cover 95% of the stream?").

    Output: ``rank`` (int, 1-based by count desc / token asc), ``token``,
    ``cnt`` (bigint), ``cum_share`` (double, 6dp — running coverage of
    the total token count, NOT just the top-k mass).

    Scale shape: token counts are one map-side-combined shuffle; the
    global order over the (already aggregated, vocabulary-sized) counts
    uses the range-partition + broadcast-prefix-offset primitives
    (:func:`~...ranks.global_row_number` / ``global_cumsum``) — never a
    SinglePartition window, so a 100 TB corpus's multi-million-type
    vocabulary ranks without serializing through one task.  The total
    occurrence count rides a 1-row broadcast.
    """
    from spark_hadoop_automation_in_cloud_spark.operators.ranks import (
        global_cumsum,
        global_row_number,
    )

    if topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    counts = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("tot"))
    order = [F.col("cnt").desc(), F.col("token").asc()]
    ranked = global_row_number(counts, order, out_col="rank").where(
        F.col("rank") <= topk
    )
    cum = global_cumsum(ranked, [F.col("rank").asc()], "cnt", out_col="cum")
    return cum.crossJoin(F.broadcast(total)).select(
        F.col("rank").cast("int").alias("rank"),
        "token",
        "cnt",
        F.round(F.col("cum").cast("double") / F.col("tot"), 6).alias("cum_share"),
    )


def sql_vocab_coverage(src: str, text_col: str, topk: int = 200) -> str:
    """DuckDB twin of :func:`vocab_coverage` — same tokenization as the
    BM25/TF-IDF family, same (cnt desc, token asc) tiebreak; the windowed
    bigint SUM comes back HUGEINT, so it is cast before the division."""
    return f"""
WITH toks AS (
  SELECT unnest(string_split({text_col}, ' ')) AS token FROM {src}
),
counts AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1),
total AS (SELECT SUM(cnt) AS tot FROM counts),
ranked AS (
  SELECT token, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank
  FROM counts
)
SELECT CAST(rank AS INT) AS rank, token, CAST(cnt AS BIGINT) AS cnt,
       round(CAST(CAST(SUM(cnt) OVER (ORDER BY rank) AS BIGINT) AS DOUBLE)
             / tot, 6) AS cum_share
FROM ranked, total
WHERE rank <= {topk}
"""


def _bigram_pairs(text_col: str) -> Column:
    """Row-local bigram extraction expression: adjacent token pairs from
    the split array via one transform — NO per-doc window, no shuffle;
    documents shorter than two tokens yield an empty array (and a NULL
    text yields NULL, which explode drops — same as the unigram family)."""
    return F.expr(
        f"""
        CASE WHEN size(split({text_col}, ' ')) < 2 THEN
          array()
        ELSE
          transform(sequence(2, size(split({text_col}, ' '))), i ->
            struct(element_at(split({text_col}, ' '), i - 1) AS w1,
                   element_at(split({text_col}, ' '), i) AS w2))
        END
        """
    )


def bigram_lm_scores(
    docs: DataFrame,
    train: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 1.0,
) -> DataFrame:
    """Bigram language-model quality scoring: per-document average
    negative log-probability of its adjacent token pairs under an
    add-``alpha``-smoothed bigram model fit on ``train`` —
    :func:`unigram_lm_scores`' conditional upgrade (fluency now requires
    LOCAL word order, not just vocabulary; shuffled text that fools the
    unigram filter scores high here).

    Model: ``P(w2|w1) = (c(w1,w2) + alpha) / (c1(w1) + alpha·(V+1))``
    with ``c1`` the context total (derived from the bigram counts — one
    aggregate chain, no second train scan), ``V`` the distinct follower
    types in train (+1 shared OOV bucket).  An unseen context degrades
    to the uniform ``1/(V+1)``.

    Distributed shape: bigrams extract ROW-LOCALLY from the split array
    (one transform — no per-doc window, so the corpus never shuffles on
    doc id for adjacency); the model is two aggregates; scoring is two
    equi-joins (pair → bigram table, context → context table) + a 1-row
    stats broadcast + per-doc aggregation.  Grid idiom: per-pair
    log-probs snap to an integer 1e-6 grid and sum exactly.

    Output: doc_id, n_bigrams, n_unseen (pairs absent from the train
    bigram table), avg_neg_logprob (6dp).  Documents with fewer than two
    tokens have no pairs and no output row (both engines).
    """
    pairs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_bigram_pairs(text_col)).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    tpairs = train.select(
        F.explode(_bigram_pairs(text_col)).alias("p")
    ).select("p.w1", "p.w2")
    c2 = tpairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt2"))
    c1 = c2.groupBy("w1").agg(F.sum("cnt2").alias("cnt1"))
    stats = c2.agg(F.count_distinct("w2").alias("v_size"))
    denom = F.coalesce(F.col("cnt1"), F.lit(0)).cast("double") + F.lit(alpha) * (
        F.col("v_size").cast("double") + 1.0
    )
    logp = F.log(
        (F.coalesce(F.col("cnt2"), F.lit(0)).cast("double") + F.lit(alpha)) / denom
    )
    q = F.round(logp * 1_000_000).cast("bigint")
    scored = (
        pairs.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            q.alias("__q"),
            F.when(F.col("cnt2").isNull(), 1).otherwise(0).alias("__unseen"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("__unseen").cast("bigint").alias("n_unseen"),
        F.round(
            -F.sum("__q").cast("double") / (F.count(F.lit(1)) * 1_000_000.0), 6
        ).alias("avg_neg_logprob"),
    )


def sql_bigram_lm_scores(
    docs_src: str,
    train_pred: str,
    id_col: str,
    text_col: str,
    alpha: float = 1.0,
) -> str:
    """DuckDB twin of :func:`bigram_lm_scores`: bigrams via
    ``list_zip(l, l[2:])`` (pads the tail with one NULL pair, filtered),
    identical smoothing arithmetic and 1e-6 grid.

    The SQL surface expresses the train corpus as ``docs_src`` rows
    satisfying ``train_pred`` — the Python API's arbitrary ``train``
    DataFrame has no SQL-side equivalent beyond that predicate, so
    callers pairing the two must pass ``train = docs.where(train_pred)``.
    Both CTEs instantiate one shared template with the FROM clause as a
    parameter (never post-hoc string replacement, which would corrupt a
    ``docs_src`` that happens to be a substring of another identifier)."""

    def bigrams(from_clause: str) -> str:
        return (
            f"SELECT {id_col} AS doc_id, p[1] AS w1, p[2] AS w2 FROM ("
            f"  SELECT {id_col}, unnest(list_zip(l, l[2:])) AS p FROM ("
            f"    SELECT {id_col}, string_split({text_col}, ' ') AS l"
            f" FROM {from_clause}"
            f"  )"
            f") WHERE p[2] IS NOT NULL"
        )

    return f"""
WITH pairs AS ({bigrams(docs_src)}),
tpairs AS (
  SELECT w1, w2 FROM ({bigrams(f"{docs_src} WHERE {train_pred}")})
),
c2 AS (SELECT w1, w2, COUNT(*) AS cnt2 FROM tpairs GROUP BY 1, 2),
c1 AS (SELECT w1, SUM(cnt2) AS cnt1 FROM c2 GROUP BY 1),
stats AS (SELECT COUNT(DISTINCT w2) AS v_size FROM c2),
scored AS (
  SELECT p.doc_id,
         CAST(round(ln((CAST(COALESCE(c2.cnt2, 0) AS DOUBLE) + {alpha})
                       / (CAST(COALESCE(c1.cnt1, 0) AS DOUBLE)
                          + {alpha} * (CAST(s.v_size AS DOUBLE) + 1.0)))
                    * 1000000) AS BIGINT) AS q,
         CASE WHEN c2.cnt2 IS NULL THEN 1 ELSE 0 END AS unseen
  FROM pairs p
  LEFT JOIN c2 ON c2.w1 = p.w1 AND c2.w2 = p.w2
  LEFT JOIN c1 ON c1.w1 = p.w1
  CROSS JOIN stats s
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(unseen) AS BIGINT) AS n_unseen,
       round(-CAST(SUM(q) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) AS avg_neg_logprob
FROM scored GROUP BY doc_id
"""


# --- Gopher-style per-rule quality gating ------------------------------------

#: the rule thresholds, named once so kernel / SQL / docs stay in lockstep
RULE_MIN_TOKENS = 20
RULE_MAX_TOKENS = 90
RULE_MIN_MEAN_TOK = 3.0
RULE_MAX_MEAN_TOK = 10.0
RULE_MIN_ALPHA = 0.8
RULE_MAX_DUP = 0.5
RULE_MAX_DIGIT = 0.1


def quality_rule_flags(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style quality RULE BUNDLE: each heuristic gate as its own
    0/1 flag plus the conjunctive ``pass_all`` — the audit view a curation
    pipeline needs ("WHY was this document dropped?") that a composite
    score (:func:`quality_score`) deliberately erases.  Rules follow the
    Rae et al. (Gopher, arXiv:2112.11446) word-count / mean-word-length /
    symbol-ratio / repetition family, with thresholds set for this
    corpus's synthetic token streams:

    - ``r_len``: RULE_MIN_TOKENS ≤ n_tokens ≤ RULE_MAX_TOKENS
    - ``r_mean_tok``: mean token length in [RULE_MIN_MEAN_TOK,
      RULE_MAX_MEAN_TOK] (reuses :func:`quality_exprs`' definition)
    - ``r_alpha``: alphabetic-char ratio ≥ RULE_MIN_ALPHA
    - ``r_dup``: duplicate-token fraction ``1 − distinct/n`` ≤ RULE_MAX_DUP
    - ``r_digit``: all-digit-token fraction ≤ RULE_MAX_DIGIT
    - ``r_stop``: contains the stopword marker (the quality_exprs gate)

    Output: doc_id, the six flags (int 0/1), pass_all (int).  NULL text
    fails every rule; EMPTY text fails the length / mean-token / alpha /
    stopword gates (never pass_all) but trivially passes r_dup and
    r_digit — its single ``''`` token has zero duplicates and zero digit
    tokens, on both engines.

    Scale shape: every rule is a row-local expression in the scan — one
    pass, no shuffle, no UDF; the flags feed whatever grouped audit sits
    downstream (q153-era curation reports) as ordinary columns.
    """
    t = F.col(text_col)
    e = quality_exprs(t)
    n = e["n_tokens"]
    toks = F.split(t, " ")
    digit_cnt = F.size(F.filter(toks, lambda x: x.rlike("^[0-9]+$")))
    distinct_cnt = F.size(F.array_distinct(toks))
    nz = n > 0
    dup_frac = F.when(nz, 1.0 - distinct_cnt.cast("double") / n).otherwise(1.0)
    digit_frac = F.when(nz, digit_cnt.cast("double") / n).otherwise(1.0)
    has_stop = (
        occurrence_count(F.concat(F.lit(" "), t, F.lit(" ")), " the ") > 0
    )
    flags = {
        "r_len": (n >= RULE_MIN_TOKENS) & (n <= RULE_MAX_TOKENS),
        "r_mean_tok": nz
        & (e["mean_token_len"] >= RULE_MIN_MEAN_TOK)
        & (e["mean_token_len"] <= RULE_MAX_MEAN_TOK),
        "r_alpha": nz & (e["alpha_ratio"] >= RULE_MIN_ALPHA),
        "r_dup": nz & (dup_frac <= RULE_MAX_DUP),
        "r_digit": nz & (digit_frac <= RULE_MAX_DIGIT),
        "r_stop": nz & has_stop,
    }
    all_pass = None
    for c in flags.values():
        all_pass = c if all_pass is None else (all_pass & c)
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[F.coalesce(c.cast("int"), F.lit(0)).alias(k) for k, c in flags.items()],
        F.coalesce(all_pass.cast("int"), F.lit(0)).alias("pass_all"),
    )


def sql_quality_rule_flags(src: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`quality_rule_flags` — identical thresholds
    (the module constants), identical zero-token and NULL handling."""
    t = text_col
    n_chars = f"length({t})"
    n = f"len(string_split({t}, ' '))"
    alpha = f"length(regexp_replace({t}, '[^a-zA-Z]', '', 'g'))"
    alpha_ratio = f"(CAST({alpha} AS DOUBLE) / {n_chars})"
    mean_tok = f"(CAST({n_chars} - ({n} - 1) AS DOUBLE) / {n})"
    digit_cnt = (
        f"len(list_filter(string_split({t}, ' '),"
        f" x -> regexp_matches(x, '^[0-9]+$')))"
    )
    distinct_cnt = f"len(list_distinct(string_split({t}, ' ')))"
    dup_frac = f"(1.0 - CAST({distinct_cnt} AS DOUBLE) / {n})"
    digit_frac = f"(CAST({digit_cnt} AS DOUBLE) / {n})"
    padded = f"(' ' || {t} || ' ')"
    has_stop = f"{sql_occurrence_count(padded, ' the ')} > 0"
    nz = f"{n} > 0"
    rules = {
        "r_len": f"{n} >= {RULE_MIN_TOKENS} AND {n} <= {RULE_MAX_TOKENS}",
        "r_mean_tok": f"{nz} AND {mean_tok} >= {RULE_MIN_MEAN_TOK!r}"
        f" AND {mean_tok} <= {RULE_MAX_MEAN_TOK!r}",
        "r_alpha": f"{nz} AND {alpha_ratio} >= {RULE_MIN_ALPHA!r}",
        "r_dup": f"{nz} AND {dup_frac} <= {RULE_MAX_DUP!r}",
        "r_digit": f"{nz} AND {digit_frac} <= {RULE_MAX_DIGIT!r}",
        "r_stop": f"{nz} AND {has_stop}",
    }
    cols = ",\n       ".join(
        f"CAST(COALESCE(({c}), FALSE) AS INT) AS {k}" for k, c in rules.items()
    )
    conj = " AND ".join(f"COALESCE(({c}), FALSE)" for c in rules.values())
    return f"""
SELECT {id_col} AS doc_id,
       {cols},
       CAST(({conj}) AS INT) AS pass_all
FROM {src}
"""


# --- corpus statistics: collocations and Zipf fit -----------------------------


def pmi_collocations(
    docs: DataFrame,
    text_col: str,
    min_count: int = 5,
    topk: int = 50,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information — the
    corpus-statistics primitive behind phrase mining, tokenizer-merge
    candidates, and boilerplate discovery (a high-PMI pair that appears
    in half the corpus is template text, not language).

    ``PMI(w1, w2) = ln( c(w1,w2)·N / (c1(w1)·c2(w2)) )`` over the
    bigram distribution, with POSITIONAL marginals: ``c1`` counts w1
    occurrences as a left element, ``c2`` as a right element, ``N`` the
    total bigram count — all three derived from the bigram-count frame
    itself (one aggregate chain, no second corpus scan: the
    :func:`bigram_lm_scores` idiom).  ``min_count`` floors the pair
    count (PMI's classic rare-pair pathology: a hapax pair maximizes
    PMI by definition).

    Scale shape: bigrams extract ROW-LOCALLY from the split array (no
    per-doc window); ONE map-side-combined shuffle to vocab²-bounded
    pair counts; marginals are two aggregates OF that frame joined back
    onto it (vocab-sized, broadcast-eligible); N is a 1-row broadcast.
    Top-k is TakeOrderedAndProject.  The ratio is one double division
    of exact bigints, then ln, then 6dp — engine-identical.

    Output: w1, w2, n_pair (bigint), pmi (double 6dp), ordered
    (pmi DESC, n_pair DESC, w1, w2).
    """
    pairs = docs.select(F.explode(_bigram_pairs(text_col)).alias("p")).select(
        "p.w1", "p.w2"
    )
    c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    left = c2.groupBy("w1").agg(F.sum("n_pair").alias("c_left"))
    right = c2.groupBy("w2").agg(F.sum("n_pair").alias("c_right"))
    total = c2.agg(F.sum("n_pair").alias("n_total"))
    pmi = F.round(
        F.log(
            (F.col("n_pair") * F.col("n_total")).cast("double")
            / (F.col("c_left") * F.col("c_right")).cast("double")
        ),
        6,
    )
    return (
        c2.where(F.col("n_pair") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            pmi.alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("n_pair").desc(), "w1", "w2")
        .limit(topk)
    )


def sql_pmi_collocations(
    src: str, text_col: str, min_count: int = 5, topk: int = 50
) -> str:
    """DuckDB twin of :func:`pmi_collocations`: bigrams via
    ``list_zip(l, l[2:])``, identical positional marginals, one double
    division of exact counts, same ln/round and top-k order."""
    return f"""
WITH pairs AS (
  SELECT p[1] AS w1, p[2] AS w2 FROM (
    SELECT unnest(list_zip(l, l[2:])) AS p FROM (
      SELECT string_split({text_col}, ' ') AS l FROM {src}
    )
  ) WHERE p[2] IS NOT NULL
),
c2 AS (SELECT w1, w2, COUNT(*) AS n_pair FROM pairs GROUP BY 1, 2),
lft AS (SELECT w1, SUM(n_pair) AS c_left FROM c2 GROUP BY 1),
rgt AS (SELECT w2, SUM(n_pair) AS c_right FROM c2 GROUP BY 1),
total AS (SELECT SUM(n_pair) AS n_total FROM c2)
SELECT c2.w1 AS w1, c2.w2 AS w2, CAST(c2.n_pair AS BIGINT) AS n_pair,
       round(ln(CAST(c2.n_pair * t.n_total AS DOUBLE)
                / CAST(l.c_left * r.c_right AS DOUBLE)), 6) AS pmi
FROM c2
JOIN lft l ON l.w1 = c2.w1
JOIN rgt r ON r.w2 = c2.w2
CROSS JOIN total t
WHERE c2.n_pair >= {min_count}
ORDER BY pmi DESC, n_pair DESC, c2.w1, c2.w2
LIMIT {topk}
"""


#: log values snap to this grid before the OLS moments — exact integers
#: from there on (the evals.SCORE_GRID convention)
ZIPF_LOG_GRID = 1_000_000


def zipf_token_points(
    docs: DataFrame,
    group_cols: list[str],
    text_col: str,
    top_n: int = 100,
) -> DataFrame:
    """Per-group (ln rank, ln frequency) points for the top-``top_n``
    tokens — the input frame of :func:`zipf_slope`, exposed separately
    so the fit stays a :func:`~spark_hadoop_automation_in_cloud_spark.operators.linalg.grouped_ols`
    composition.

    Tokens lowercase and split on space (the corpus-stats convention);
    empty strings drop.  Rank is (count DESC, token ASC) per group —
    deterministic; the ranking window runs over the per-group TOKEN
    COUNT frame (vocab-sized, groups parallelize), never the corpus.
    ln values snap to the 1e-6 grid as bigints, so the downstream OLS
    moments are exact integers.
    """
    gs = list(group_cols)
    toks = docs.select(
        *gs,
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    counts = toks.groupBy(*gs, "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(*gs).orderBy(F.col("cnt").desc(), F.col("tok").asc())
    grid = float(ZIPF_LOG_GRID)
    return (
        counts.select(*gs, "cnt", F.row_number().over(w).alias("rnk"))
        .where(F.col("rnk") <= top_n)
        .select(
            *gs,
            F.round(F.log(F.col("rnk").cast("double")) * grid)
            .cast("bigint")
            .alias("ln_rank"),
            F.round(F.log(F.col("cnt").cast("double")) * grid)
            .cast("bigint")
            .alias("ln_freq"),
        )
    )


def sql_zipf_token_points(
    src: str, group_cols: list[str], text_col: str, top_n: int = 100
) -> str:
    """DuckDB twin of :func:`zipf_token_points`."""
    gs = ", ".join(group_cols)
    return f"""
SELECT {gs},
       CAST(round(ln(CAST(rnk AS DOUBLE)) * {ZIPF_LOG_GRID}) AS BIGINT) AS ln_rank,
       CAST(round(ln(CAST(cnt AS DOUBLE)) * {ZIPF_LOG_GRID}) AS BIGINT) AS ln_freq
FROM (
  SELECT {gs}, cnt,
         ROW_NUMBER() OVER (PARTITION BY {gs} ORDER BY cnt DESC, tok ASC) AS rnk
  FROM (
    SELECT {gs}, tok, COUNT(*) AS cnt FROM (
      SELECT {gs}, unnest(string_split(lower({text_col}), ' ')) AS tok FROM {src}
    ) WHERE tok <> '' GROUP BY {gs}, tok
  )
)
WHERE rnk <= {top_n}
"""


# --- hash-kernel linear scoring (JVM-native model inference) -----------------

#: hash-kernel geometry shared verbatim by the SQL twin
HK_NGRAM = 3
HK_WEIGHT_RANGE = 1000  # per-gram integer weights in [-1000, 1000]


def hash_kernel_scores(
    df: DataFrame, id_col: str, text_col: str, salt: str = ":hk"
) -> DataFrame:
    """Linear-model inference over hashed character n-gram features,
    entirely JVM-side — the fastText-style scoring shape (hash the
    gram, look up its weight, sum, squash) with zero Python in the
    loop: the complement of the Arrow inference seam (q144 ships a
    real model ACROSS the Python boundary; this shows a linear model
    needs no boundary at all).

    Weights are derived, not stored: ``w(g) = (md5_int(g‖salt) mod
    (2·R+1)) − R`` — a deterministic hash kernel both engines replay
    bit-for-bit, standing in for trained weights (a real deployment
    substitutes a broadcast bucket→weight array; the plan shape is
    identical).  Per document the gram weights sum EXACTLY (integer
    accumulator inside one row-local ``aggregate`` — no explode, no
    shuffle, nothing leaves the scan stage), then one double division
    and a sigmoid.

    Text is lowercased and stripped to printable ASCII first: Spark
    indexes substrings by UTF-16 code unit, DuckDB by codepoint — the
    same astral divergence the BPE trainer sidesteps, removed the same
    way.  Documents with no complete n-gram after stripping drop.

    Output: doc_id, n_grams (bigint), score (double 6dp, sigmoid of
    the mean gram weight), pred (int, score > 0.5).
    """
    n, r = HK_NGRAM, HK_WEIGHT_RANGE
    stripped = df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_replace(F.lower(F.col(text_col)), "[^ -~]", "").alias("__t"),
    )
    t = F.col("__t")
    cnt = F.length(t) - (n - 1)
    gram = lambda i: F.substr(t, i, F.lit(n))  # noqa: E731
    w = lambda i: (  # noqa: E731
        md5_int_expr(F.concat(gram(i), F.lit(salt))) % (2 * r + 1) - r
    )
    ssum = F.aggregate(
        F.transform(F.sequence(F.lit(1), cnt), w),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    mean = ssum.cast("double") / (float(r) * cnt.cast("double"))
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-mean)), 6)
    return stripped.where(cnt.isNotNull() & (cnt >= 1)).select(
        "doc_id",
        cnt.cast("bigint").alias("n_grams"),
        (score + F.lit(0.0)).alias("score"),
        F.when(score > 0.5, 1).otherwise(0).alias("pred"),
    )


def md5_int_expr(c: Column) -> Column:
    """First 8 hex chars of md5 as BIGINT — the gram-weight hash (a
    Column-input variant of functions.hashing.md5_prefix_int, which
    takes the id column pre-concat)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def sql_hash_kernel_scores(
    src: str, id_col: str, text_col: str, salt: str = ":hk"
) -> str:
    """DuckDB twin of :func:`hash_kernel_scores`: identical strip,
    gram hash, integer weight sum (list_transform over range — empty
    below one gram), division and sigmoid."""
    n, r = HK_NGRAM, HK_WEIGHT_RANGE
    esc = salt.replace("'", "''")
    t = f"regexp_replace(lower({text_col}), '[^ -~]', '', 'g')"
    w = (
        f"(CAST(('0x' || substr(md5(substr(t, i, {n}) || '{esc}'), 1, 8)) "
        f"AS BIGINT) % {2 * r + 1}) - {r}"
    )
    return f"""
WITH stripped AS (
  SELECT {id_col} AS doc_id, {t} AS t,
         length({t}) - {n - 1} AS cnt
  FROM {src}
),
summed AS (
  SELECT doc_id, cnt,
         COALESCE(list_sum(list_transform(range(1, cnt + 1), i -> {w})), 0)
           AS ssum
  FROM stripped WHERE cnt >= 1
)
SELECT doc_id, CAST(cnt AS BIGINT) AS n_grams,
       round(1.0 / (1.0 + exp(-(CAST(ssum AS DOUBLE)
                                / ({r}.0 * CAST(cnt AS DOUBLE))))), 6) + 0.0
         AS score,
       CASE WHEN round(1.0 / (1.0 + exp(-(CAST(ssum AS DOUBLE)
                / ({r}.0 * CAST(cnt AS DOUBLE))))), 6) > 0.5
            THEN 1 ELSE 0 END AS pred
FROM summed
"""


def jm_bigram_lm_scores(
    docs: DataFrame,
    train: DataFrame,
    id_col: str,
    text_col: str,
    lam: float = 0.7,
) -> DataFrame:
    """Jelinek-Mercer interpolated bigram LM scoring:
    ``P(w2|w1) = lam·P_ML(w2|w1) + (1−lam)·P_add1(w2)`` — the
    smoothing upgrade of :func:`bigram_lm_scores` (whose add-alpha
    conditional wastes mass uniformly): an unseen PAIR backs off to
    the unigram frequency of its second word instead of the uniform
    floor, so 'the zzqx' scores worse than 'the cat' even when neither
    pair was observed — the backoff behavior every production LM
    filter (CCNet's KenLM) exhibits.

    ``P_ML = c(w1,w2)/c1(w1)`` (0 when the context is unseen);
    ``P_add1(w2) = (cu(w2)+1)/(T+V+1)`` with token total ``T`` and
    vocab ``V`` (+1 OOV bucket) — the mixture is strictly positive,
    so every bigram has a finite log-prob.

    Distributed shape (q141's, plus one unigram join): row-local
    bigram extraction, model = three aggregates of the train scan,
    scoring = three left equi-joins + a 1-row stats broadcast +
    per-doc aggregation; per-pair log-probs snap to the 1e-6 integer
    grid and sum exactly.  Output: doc_id, n_bigrams, n_unseen_pairs
    (bigint), avg_neg_logprob (6dp); sub-two-token docs have no row.
    """
    pairs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_bigram_pairs(text_col)).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    tpairs = train.select(F.explode(_bigram_pairs(text_col)).alias("p")).select(
        "p.w1", "p.w2"
    )
    c2 = tpairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt2"))
    c1 = c2.groupBy("w1").agg(F.sum("cnt2").alias("cnt1"))
    toks = train.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).where(F.col("w") != "")
    cu = toks.groupBy(F.col("w").alias("w2")).agg(
        F.count(F.lit(1)).alias("cntu")
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("t_total"),
        F.count_distinct("w").alias("v_size"),
    )
    p_ml = F.when(
        F.col("cnt1").isNotNull() & F.col("cnt2").isNotNull(),
        F.col("cnt2").cast("double") / F.col("cnt1").cast("double"),
    ).otherwise(F.lit(0.0))
    p_uni = (F.coalesce(F.col("cntu"), F.lit(0)).cast("double") + 1.0) / (
        F.col("t_total").cast("double") + F.col("v_size").cast("double") + 1.0
    )
    q = F.round(F.log(lam * p_ml + (1.0 - lam) * p_uni) * 1_000_000).cast(
        "bigint"
    )
    scored = (
        pairs.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .join(cu, ["w2"], "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            q.alias("__q"),
            F.when(F.col("cnt2").isNull(), 1).otherwise(0).alias("__unseen"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("__unseen").cast("bigint").alias("n_unseen_pairs"),
        F.round(
            -F.sum("__q").cast("double") / (F.count(F.lit(1)) * 1_000_000.0), 6
        ).alias("avg_neg_logprob"),
    )


def sql_jm_bigram_lm_scores(
    docs_src: str,
    train_pred: str,
    id_col: str,
    text_col: str,
    lam: float = 0.7,
) -> str:
    """DuckDB twin of :func:`jm_bigram_lm_scores` — the q141 template
    conventions (parameterized train CTE, list_zip bigrams, 1e-6
    grid) with the interpolated probability."""

    def bigrams(from_clause: str) -> str:
        return (
            f"SELECT {id_col} AS doc_id, p[1] AS w1, p[2] AS w2 FROM ("
            f"  SELECT {id_col}, unnest(list_zip(l, l[2:])) AS p FROM ("
            f"    SELECT {id_col}, string_split({text_col}, ' ') AS l"
            f" FROM {from_clause}"
            f"  )"
            f") WHERE p[2] IS NOT NULL"
        )

    return f"""
WITH pairs AS ({bigrams(docs_src)}),
tpairs AS (
  SELECT w1, w2 FROM ({bigrams(f"{docs_src} WHERE {train_pred}")})
),
c2 AS (SELECT w1, w2, COUNT(*) AS cnt2 FROM tpairs GROUP BY 1, 2),
c1 AS (SELECT w1, SUM(cnt2) AS cnt1 FROM c2 GROUP BY 1),
toks AS (
  SELECT unnest(string_split({text_col}, ' ')) AS w
  FROM {docs_src} WHERE {train_pred}
),
toks_nz AS (SELECT w FROM toks WHERE w <> ''),
cu AS (SELECT w AS w2, COUNT(*) AS cntu FROM toks_nz GROUP BY 1),
stats AS (
  SELECT COUNT(*) AS t_total, COUNT(DISTINCT w) AS v_size FROM toks_nz
),
scored AS (
  SELECT p.doc_id,
         CAST(round(ln({lam} * (CASE WHEN c1.cnt1 IS NOT NULL
                                       AND c2.cnt2 IS NOT NULL
                    THEN CAST(c2.cnt2 AS DOUBLE) / CAST(c1.cnt1 AS DOUBLE)
                    ELSE 0.0 END)
               + {1.0 - lam} * ((CAST(COALESCE(cu.cntu, 0) AS DOUBLE) + 1.0)
                    / (CAST(s.t_total AS DOUBLE)
                       + CAST(s.v_size AS DOUBLE) + 1.0)))
                    * 1000000) AS BIGINT) AS q,
         CASE WHEN c2.cnt2 IS NULL THEN 1 ELSE 0 END AS unseen
  FROM pairs p
  LEFT JOIN c2 ON c2.w1 = p.w1 AND c2.w2 = p.w2
  LEFT JOIN c1 ON c1.w1 = p.w1
  LEFT JOIN cu ON cu.w2 = p.w2
  CROSS JOIN stats s
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(unseen) AS BIGINT) AS n_unseen_pairs,
       round(-CAST(SUM(q) AS DOUBLE) / (COUNT(*) * 1000000.0), 6)
         AS avg_neg_logprob
FROM scored GROUP BY doc_id
"""
