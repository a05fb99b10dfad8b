"""Distributed byte-pair-encoding merge training — the tokenizer-side
primitive of an LLM data pipeline: given the corpus, learn the first
``n_merges`` BPE merge rules exactly (Sennrich et al.'s greedy
frequency-argmax, the algorithm under GPT-2/SentencePiece-BPE vocab
construction), entirely as DataFrame aggregates.

Why this distributes cleanly when the textbook trainer doesn't: the
textbook form mutates an in-memory vocab dict word-by-word.  Here the
corpus collapses ONCE to the word-frequency table (one map-side-combined
shuffle — the only corpus-sized operation at any scale), and every merge
round after that runs on the vocab-sized frame: adjacent-pair counts are
a row-local array expression (the bigram-LM extraction idiom — no
per-word window), the argmax is one ordered ``LIMIT 1`` (driver state =
ONE (left, right) pair per round, the q96 broadcast-centroid contract),
and the rewrite is a row-local left fold over each word's symbol array.
At 100 TB the vocab table is millions of rows, not billions of tokens —
merge rounds never touch the corpus again.

Greedy-rewrite semantics are pinned identically on both engines by the
same fold: scanning left to right, a symbol equal to ``right`` fuses
into the accumulator only when the accumulator's LAST symbol equals
``left`` — so ``a a a`` under merge (a,a) becomes ``aa a``, and a
just-fused symbol never re-fuses in the same round (the standard
non-overlapping greedy of every BPE implementation).

Vocabulary is lowercased and restricted to printable-ASCII words:
symbols are per-codepoint, and Java regex (UTF-16) vs RE2 (UTF-8) split
astral codepoints differently — ASCII sidesteps the divergence; a
production byte-level trainer would pre-encode to bytes, which is the
same pipeline with a different initial alphabet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: vocab gates shared verbatim by the SQL twin
MAX_WORD_LEN = 30
WORD_RE = "^[ -~]+$"  # printable ASCII only (see module docstring)


def word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    """The ONE corpus-sized step: lowercase space-tokens → (word, freq).
    Map-side combined; everything after runs vocab-sized."""
    w = F.col("word")
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
        )
        .where((w != "") & (F.length(w) <= MAX_WORD_LEN) & w.rlike(WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _spaced(col: F.Column) -> F.Column:
    """word → space-separated single-codepoint symbols."""
    return F.trim(F.regexp_replace(col, "(.)", "$1 "))


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """freq-weighted adjacent symbol pairs of the seq column — row-local
    extraction (the bigram idiom), one vocab-sized aggregation."""
    from spark_hadoop_automation_in_cloud_spark.operators.textops import _bigram_pairs

    return (
        seqs.select(F.col("freq"), F.explode(_bigram_pairs("seq")).alias("p"))
        .groupBy(F.col("p.w1").alias("left"), F.col("p.w2").alias("right"))
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
    )


def _merge_fold(left: str, right: str) -> F.Column:
    """The greedy left-to-right merge pass over the ``seq`` column as a
    row-local fold (JVM-side ``aggregate`` — no UDF): a symbol equal to
    ``right`` fuses iff the accumulator's last symbol equals ``left``."""
    l, r = F.lit(left), F.lit(right)
    arr = F.split(F.col("seq"), " ")
    tail = F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))
    return F.aggregate(
        tail,
        F.element_at(arr, 1),
        lambda acc, x: F.when(
            (x == r) & (F.element_at(F.split(acc, " "), -1) == l),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(" "), x)),
    )


def _apply_merge(
    seqs: DataFrame,
    left: str,
    right: str,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """One merge pass over a (seq, freq, *keep) frame."""
    return seqs.select(
        _merge_fold(left, right).alias("seq"), "freq", *(keep_cols or [])
    )


def bpe_merges(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 4,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules from the corpus.

    Per round: pair counts (vocab-sized aggregate) → argmax by
    (pair_count DESC, left ASC, right ASC) — one row to the driver —
    → fold-rewrite of every word's symbol sequence.  The working frame
    is cached per round and released after the next round's counts
    materialize (bounded: two vocab-sized caches in flight).

    Output: step (int, 1-based), lhs, rhs, merged (string),
    pair_count (bigint) — the merge table, ``n_merges`` rows (fewer iff
    the vocabulary runs out of adjacent pairs).
    """
    spark = docs.sparkSession
    seqs = word_freqs(docs, text_col).select(
        _spaced(F.col("word")).alias("seq"), "freq"
    )
    rules: list[tuple[int, str, str, str, int]] = []
    prev = None
    for step in range(1, n_merges + 1):
        seqs = seqs.persist()
        top = (
            _pair_counts(seqs)
            .orderBy(F.col("pair_count").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if prev is not None:
            prev.unpersist()
        prev = seqs
        if not top:
            break
        l, r, cnt = top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
        rules.append((step, l, r, l + r, cnt))
        seqs = _apply_merge(seqs, l, r)
    if prev is not None:
        prev.unpersist()
    return spark.createDataFrame(
        rules, "step int, lhs string, rhs string, merged string, pair_count bigint"
    )


def _sql_fold(seq_expr: str, t_alias: str) -> str:
    """The shared ``list_reduce`` greedy rewrite (last-symbol guard)."""
    return (
        f"list_reduce(string_split({seq_expr}, ' '),"
        f" (acc, x) -> CASE WHEN x = {t_alias}.rgt"
        f" AND string_split(acc, ' ')[-1] = {t_alias}.lft"
        " THEN acc || x ELSE acc || ' ' || x END)"
    )


def _sql_training_ctes(src: str, text_col: str, n_merges: int) -> str:
    """The training trajectory as a CTE-chain fragment (``w``, ``s0``,
    then per round ``p{i}``/``t{i}``/``s{i}``), shared by
    :func:`sql_bpe_merges` and :func:`sql_segmentation_stats` so both
    oracles train on ONE definition."""

    def pair_cte(seq_src: str) -> str:
        return (
            "SELECT p[1] AS lft, p[2] AS rgt, CAST(SUM(freq) AS BIGINT) AS pair_count"
            " FROM (SELECT unnest(list_zip(ls, ls[2:])) AS p, freq"
            f" FROM (SELECT string_split(seq, ' ') AS ls, freq FROM {seq_src}))"
            " WHERE p[2] IS NOT NULL GROUP BY 1, 2"
        )

    parts = [
        f"""
w AS MATERIALIZED (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(string_split(lower({text_col}), ' ')) AS word FROM {src}
  ) WHERE word <> '' AND length(word) <= {MAX_WORD_LEN}
        AND regexp_matches(word, '{WORD_RE}')
  GROUP BY word
),
s0 AS MATERIALIZED (
  SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq, freq FROM w
)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f"""
p{i} AS MATERIALIZED ({pair_cte(f"s{i - 1}")}),
t{i} AS MATERIALIZED (
  SELECT lft, rgt, pair_count FROM p{i}
  ORDER BY pair_count DESC, lft ASC, rgt ASC LIMIT 1
),
s{i} AS MATERIALIZED (
  SELECT {_sql_fold("s.seq", "t")} AS seq,
         s.freq
  FROM s{i - 1} s CROSS JOIN t{i} t
)"""
        )
    return ",".join(parts)


def sql_bpe_merges(src: str, text_col: str, n_merges: int = 4) -> str:
    """DuckDB twin of :func:`bpe_merges`: the full greedy trajectory
    unrolled as one CTE chain per round (the q96/q156 iterative-oracle
    pattern, MATERIALIZED so each round computes once) — identical
    vocab gates, pair counting, (count, left, right) argmax, and the
    same last-symbol-guarded left fold via ``list_reduce`` (the 1-row
    winner CROSS JOINs into the rewrite; lambdas cannot hold
    subqueries)."""
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, lft AS lhs, rgt AS rhs, lft || rgt AS merged,"
        f" pair_count FROM t{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + _sql_training_ctes(src, text_col, n_merges)
        + f"\nSELECT * FROM ({unions}) ORDER BY step"
    )


def grouped_word_freqs(
    docs: DataFrame, group_cols: list[str], text_col: str
) -> DataFrame:
    """Per-group word frequencies under the same vocab gates as
    :func:`word_freqs` — the corpus-sized step of
    :func:`segmentation_stats`."""
    w = F.col("word")
    return (
        docs.select(
            *group_cols,
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word"),
        )
        .where((w != "") & (F.length(w) <= MAX_WORD_LEN) & w.rlike(WORD_RE))
        .groupBy(*group_cols, "word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def segmentation_stats(
    docs: DataFrame,
    group_cols: list[str],
    text_col: str,
    rules: list[tuple[str, str]],
) -> DataFrame:
    """Apply a learned merge table to the corpus and report per-group
    tokenizer fit: how well do the merges COMPRESS each slice?  The
    eval a tokenizer-vs-mixture decision reads — a source whose
    compression ratio trails the corpus average is paying more
    sequence length per byte under this vocab (the q165 Zipf slope's
    actionable counterpart).

    ``rules`` is the (lhs, rhs) merge list IN ORDER (from
    :func:`bpe_merges` — bounded driver state, broadcast into the fold
    literals).  Each merge is one row-local fold pass over the
    per-(group, word) vocab frame; the corpus is touched exactly once
    (the grouped word-frequency aggregate).

    Output per group: n_words (distinct vocab words, bigint),
    n_tokens (word instances, bigint), syms_before, syms_after
    (symbol instances, bigint), compression (before/after, double 6dp).
    """
    gs = list(group_cols)
    seqs = grouped_word_freqs(docs, gs, text_col).select(
        *gs,
        _spaced(F.col("word")).alias("seq"),
        "freq",
        F.length(F.col("word")).alias("__lw"),
    )
    for lhs, rhs in rules:
        seqs = _apply_merge(seqs, lhs, rhs, keep_cols=[*gs, "__lw"])
    return seqs.groupBy(*gs).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("freq").cast("bigint").alias("n_tokens"),
        F.sum(F.col("freq") * F.col("__lw")).cast("bigint").alias("syms_before"),
        F.sum(F.col("freq") * F.size(F.split(F.col("seq"), " ")))
        .cast("bigint")
        .alias("syms_after"),
        F.round(
            F.sum(F.col("freq") * F.col("__lw")).cast("double")
            / F.sum(F.col("freq") * F.size(F.split(F.col("seq"), " "))).cast(
                "double"
            ),
            6,
        ).alias("compression"),
    )


def sql_segmentation_stats(
    src: str, group_cols: list[str], text_col: str, n_merges: int = 4
) -> str:
    """DuckDB twin of :func:`segmentation_stats` for rules learned by
    :func:`bpe_merges` on the SAME source: reuses the shared training
    CTE chain verbatim, then applies each round's winner to the
    per-group vocab with the same fold."""
    gs = ", ".join(group_cols)
    group_parts = [
        f"""
gw AS MATERIALIZED (
  SELECT {gs}, word, COUNT(*) AS freq FROM (
    SELECT {gs}, unnest(string_split(lower({text_col}), ' ')) AS word FROM {src}
  ) WHERE word <> '' AND length(word) <= {MAX_WORD_LEN}
        AND regexp_matches(word, '{WORD_RE}')
  GROUP BY {gs}, word
),
g0 AS MATERIALIZED (
  SELECT {gs}, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq, freq,
         length(word) AS lw
  FROM gw
)"""
    ]
    for i in range(1, n_merges + 1):
        group_parts.append(
            f"""
g{i} AS MATERIALIZED (
  SELECT {gs}, {_sql_fold("g.seq", "t")} AS seq, g.freq, g.lw
  FROM g{i - 1} g CROSS JOIN t{i} t
)"""
        )
    return (
        "WITH "
        + _sql_training_ctes(src, text_col, n_merges)
        + ","
        + ",".join(group_parts)
        + f"""
SELECT {gs},
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(freq) AS BIGINT) AS n_tokens,
       CAST(SUM(freq * lw) AS BIGINT) AS syms_before,
       CAST(SUM(freq * len(string_split(seq, ' '))) AS BIGINT) AS syms_after,
       round(CAST(SUM(freq * lw) AS DOUBLE)
             / CAST(SUM(freq * len(string_split(seq, ' '))) AS DOUBLE), 6)
         AS compression
FROM g{n_merges}
GROUP BY {gs}
"""
    )


def token_id_map(rules: list[tuple[str, str]]) -> dict[str, int]:
    """Deterministic token-id assignment for a learned merge table: the
    base alphabet is printable ASCII (char c → ``ord(c) − 32``, ids
    0–94 — fixed, no corpus pass), and each merge's concatenated symbol
    takes the next id (95, 96, …) IN TRAINING ORDER, first occurrence
    wins (two merges can emit the same string — ``(a, bc)`` and
    ``(ab, c)`` both yield ``abc`` — and a vocab maps strings, so the
    duplicate reuses the earlier id; the standard insert-if-absent of
    every BPE vocab builder)."""
    ids: dict[str, int] = {}
    for left, right in rules:
        merged = left + right
        if merged not in ids:
            ids[merged] = 95 + len(ids)
    return ids


def bpe_encode(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    rules: list[tuple[str, str]],
) -> DataFrame:
    """Encode the corpus to token-id arrays under a learned merge table
    — the production artifact of the BPE family (training emits rules,
    q166; fit reporting scores them, q169; THIS emits what a trainer
    actually consumes: per-document ``array<int>`` token ids).

    100 TB shape — the merge folds run VOCAB-sized, never corpus-sized:
    the corpus explodes once to positioned words, collapses to DISTINCT
    words, each distinct word replays the ``n_merges`` greedy folds
    (row-local JVM ``aggregate``, the q181 idiom) and maps symbols to
    ids (single codepoint → ``ascii−32``; merged symbol → the bounded
    :func:`token_id_map` literal).  The corpus is then touched by one
    equi-join on word and one per-doc re-assembly aggregate
    (``array_sort(collect_list(struct(pos, ids)))`` → flatten — q187's
    re-assembly idiom), so per-occurrence work is O(1) regardless of
    ``n_merges``.  Words failing the training vocab gates (empty, >30
    chars, non-printable-ASCII) are untokenizable under this alphabet
    and drop from the stream; documents with NO encodable word drop
    entirely (both engines agree — inner join + group by).

    Output: doc_id, n_tokens (bigint), token_ids (array<int>, document
    order).
    """
    ids = token_id_map(rules)
    w = F.col("word")
    words = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias(
                "pos", "word"
            ),
        )
        .where((w != "") & (F.length(w) <= MAX_WORD_LEN) & w.rlike(WORD_RE))
    )
    vocab = (
        words.select("word")
        .distinct()
        .select("word", _spaced(F.col("word")).alias("seq"))
    )
    for left, right in rules:
        vocab = vocab.select("word", _merge_fold(left, right).alias("seq"))
    if ids:
        id_map = F.create_map(
            *[F.lit(x) for kv in ids.items() for x in (kv[0], kv[1])]
        )
        merged_id = lambda s: F.element_at(id_map, s)  # noqa: E731
    else:
        merged_id = lambda s: F.lit(None)  # noqa: E731
    word_ids = vocab.select(
        "word",
        F.transform(
            F.split(F.col("seq"), " "),
            lambda s: F.when(F.length(s) == 1, F.ascii(s) - 32)
            .otherwise(merged_id(s))
            .cast("int"),
        ).alias("ids"),
    )
    assembled = F.flatten(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "ids"))),
            lambda x: x["ids"],
        )
    )
    return (
        words.join(word_ids, "word")
        .groupBy("doc_id")
        .agg(assembled.alias("token_ids"))
        .select(
            "doc_id",
            F.size("token_ids").cast("bigint").alias("n_tokens"),
            "token_ids",
        )
    )


def sql_bpe_encode(src: str, id_col: str, text_col: str, n_merges: int = 4) -> str:
    """DuckDB twin of :func:`bpe_encode` for rules learned by
    :func:`bpe_merges` on the SAME source: the shared training CTE
    chain derives t1..tn, a word-keyed rewrite chain replays the folds
    on the distinct vocab, merged symbols take ids by first-training-
    step order (95 + dense first-step rank — :func:`token_id_map`'s
    insert-if-absent in SQL), and per-doc streams re-assemble in word
    order."""
    rewrite = [
        """
v0 AS MATERIALIZED (
  SELECT word, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq FROM w
)"""
    ]
    for i in range(1, n_merges + 1):
        rewrite.append(
            f"""
v{i} AS MATERIALIZED (
  SELECT v.word, {_sql_fold("v.seq", "t")} AS seq
  FROM v{i - 1} v CROSS JOIN t{i} t
)"""
        )
    step_union = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, lft || rgt AS merged FROM t{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + _sql_training_ctes(src, text_col, n_merges)
        + ","
        + ",".join(rewrite)
        + f""",
mv AS (
  SELECT merged,
         94 + ROW_NUMBER() OVER (ORDER BY first_step) AS tok_id
  FROM (SELECT merged, MIN(step) AS first_step FROM ({step_union})
        GROUP BY merged)
),
sym AS (
  SELECT word, ord,
         CASE WHEN length(s) = 1 THEN ascii(s) - 32 ELSE mv.tok_id END AS tid
  FROM (SELECT word, unnest(string_split(seq, ' ')) AS s,
               generate_subscripts(string_split(seq, ' '), 1) AS ord
        FROM v{n_merges})
  LEFT JOIN mv ON mv.merged = s AND length(s) > 1
),
word_ids AS (
  SELECT word, list(CAST(tid AS INT) ORDER BY ord) AS ids
  FROM sym GROUP BY word
),
doc_words AS (
  SELECT doc_id, pos, word FROM (
    SELECT {id_col} AS doc_id,
           unnest(string_split(lower({text_col}), ' ')) AS word,
           generate_subscripts(string_split(lower({text_col}), ' '), 1) AS pos
    FROM {src}
  ) WHERE word <> '' AND length(word) <= {MAX_WORD_LEN}
        AND regexp_matches(word, '{WORD_RE}')
)
SELECT doc_id,
       CAST(SUM(len(ids)) AS BIGINT) AS n_tokens,
       flatten(list(ids ORDER BY pos)) AS token_ids
FROM doc_words JOIN word_ids USING (word)
GROUP BY doc_id
"""
    )


def decode_token_ids(
    encoded: DataFrame,
    rules: list[tuple[str, str]],
    ids_col: str = "token_ids",
) -> DataFrame:
    """Invert :func:`bpe_encode`: token-id arrays back to text — the
    inspection/debug side of the tokenizer family (spot-check what the
    trainer actually sees).  Row-local: one JVM ``transform`` through
    the inverted :func:`token_id_map` literal (base ids 0–94 →
    ``chr(id+32)``, merge ids → their concatenated symbol) and an
    ``array_join``.

    LOSSY BY DESIGN at the word level: the encode scheme emits no
    word-boundary token, so decode returns the CONCATENATION of the
    document's gated words with no separators (``decoded ==
    concat(gated_words)`` — the round-trip contract
    tests/test_operators.py pins).  Unknown ids (not base, not in the
    merge vocab) decode to NULL for the whole document rather than
    silently skipping — a wrong-vocab mistake should be loud.
    """
    inv = {v: k for k, v in token_id_map(rules).items()}
    inv_map = (
        F.create_map(*[F.lit(x) for kv in inv.items() for x in (kv[0], kv[1])])
        if inv
        else None
    )

    def sym(t: F.Column) -> F.Column:
        merged = (
            F.element_at(inv_map, t) if inv_map is not None
            else F.lit(None).cast("string")
        )
        return F.when((t >= 0) & (t <= 94), F.char(t + 32)).otherwise(merged)

    # array_join with no null_replacement drops nulls, which would decode
    # a wrong-vocab stream to a silently-shorter string — aggregate with
    # concat instead so ONE unknown id nulls the whole decode (loud)
    decoded = F.aggregate(
        F.transform(F.col(ids_col), sym),
        F.lit("").cast("string"),
        lambda acc, s: F.concat(acc, s),
    )
    return encoded.select("*", decoded.alias("decoded"))
