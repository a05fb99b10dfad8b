"""Edge-case regressions for the text/dedup/packing kernels (found by
review, each one a real divergence from the DuckDB oracle or a silent
wrong answer)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_quality_score_long_document_no_overflow(spark):
    """The composite numerator reaches 10000*n_chars — int32 wrapped for
    docs over ~214k chars (silently negative scores in non-ANSI sessions);
    the arithmetic is now 64-bit like the oracle's."""
    from spark_hadoop_automation_in_cloud_spark.operators.textops import quality_score

    text = ("word " * 60_000).strip()  # ~300k chars, alpha-heavy
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = quality_score(df, "doc_id", "text").first()
    assert row["n_chars"] == len(text)
    assert 0.0 <= row["quality"] <= 1.0, row["quality"]


def test_passjoin_short_strings_lossless(spark):
    """Strings shorter than max_dist+1 have zero-length segments; an
    untouched EMPTY segment must still generate a candidate ('ab' vs 'cd'
    edits both non-empty segments; '' pairs have only empty segments)."""
    from spark_hadoop_automation_in_cloud_spark.operators.dedup import (
        fuzzy_pairs_passjoin,
    )

    rows = [(1, "ab"), (2, "cd"), (3, ""), (4, "a"), (5, "smith")]
    df = spark.createDataFrame(rows, "c_custkey int, c_name string")
    got = {
        (r.left_id, r.right_id, r.edit_dist)
        for r in fuzzy_pairs_passjoin(df, max_dist=2).collect()
    }
    # exact all-pairs truth at dist <= 2
    want = set()
    import itertools

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[len(b)]

    for (i1, n1), (i2, n2) in itertools.combinations(rows, 2):
        dd = lev(n1, n2)
        if dd <= 2:
            want.add((i1, i2, dd))
    assert got == want, f"missing: {want - got}, extra: {got - want}"


def test_fuzzy_blocked_empty_names_pair(spark):
    """Two empty names are a distance-0 pair the oracle includes; the probe
    side must not filter out length-0 blocks."""
    from spark_hadoop_automation_in_cloud_spark.operators.dedup import (
        fuzzy_pairs_blocked,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "abc")], "c_custkey int, c_name string"
    )
    got = {
        (r.left_id, r.right_id, r.edit_dist)
        for r in fuzzy_pairs_blocked(df, max_dist=2).collect()
    }
    assert (1, 2, 0) in got


def test_pack_sequences_duplicate_ids_and_null_text(spark):
    """Duplicate (part, id) rows must pack SEQUENTIALLY (explicit ROWS
    frame — the default RANGE frame summed peers together, overlapping
    their slices), and a NULL text row drops out without shifting later
    documents' offsets (size(split(NULL)) is NULL, sums skip it — same as
    the oracle's NULL propagation)."""
    from spark_hadoop_automation_in_cloud_spark.operators.packing import pack_sequences

    text_1k = " ".join(["t"] * 1024)
    rows = [
        ("s", 1, text_1k),
        ("s", 1, text_1k),  # duplicate id
        ("s", 2, None),  # null text
        ("s", 3, text_1k),
    ]
    df = spark.createDataFrame(rows, "src string, doc_id long, text string")
    out = pack_sequences(df, "src", "doc_id", "text", capacity=1024).collect()
    assert all(r["doc_id"] != 2 for r in out), "null-text row must drop"
    bins = sorted((r["doc_id"], r["bin_id"], r["tok_start"], r["tok_end"]) for r in out)
    # three 1024-token docs at capacity 1024: bins 0,1,2 — each full slice
    assert bins == [(1, 0, 0, 1024), (1, 1, 0, 1024), (3, 2, 0, 1024)], bins
    assert all(ts < te for _, _, ts, te in bins)


def test_unigram_lm_scores_semantics(spark):
    """Fluent-vs-garbage ordering, OOV counting, and the smoothing
    arithmetic checked against a hand-computed model."""
    import math

    from spark_hadoop_automation_in_cloud_spark.operators.textops import (
        unigram_lm_scores,
    )

    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog sat")], ["doc_id", "text"]
    )
    docs = train.union(
        spark.createDataFrame([(3, "the the"), (4, "zyx qwv")], ["doc_id", "text"])
    )
    got = {
        r["doc_id"]: r
        for r in unigram_lm_scores(docs, train, "doc_id", "text").collect()
    }
    # model: tokens {the:2, cat:1, sat:2, dog:1}, total=6, V=4, alpha=1
    denom = 6 + 1 * (4 + 1)
    lp = lambda c: round(math.log((c + 1) / denom) * 1e6)
    the2 = round(-(2 * lp(2)) / (2 * 1e6), 6)
    assert got[3]["avg_neg_logprob"] == the2
    assert got[3]["n_oov"] == 0 and got[3]["n_tokens"] == 2
    # all-OOV doc scores strictly worse than the all-common-token doc
    assert got[4]["n_oov"] == 2
    assert got[4]["avg_neg_logprob"] > got[3]["avg_neg_logprob"]
    # training docs score better than the OOV doc
    assert got[1]["avg_neg_logprob"] < got[4]["avg_neg_logprob"]


def test_curation_funnel_staged_counts_and_one_pass_plan(spark):
    """Funnel semantics pinned on a hand-built corpus: stages are
    CUMULATIVE (monotone non-increasing counts), NULL/empty text dies at
    stage 2 (and so cannot resurface later however its quality scores),
    token mass sums only over full survivors.  Plus the operator's whole
    point: the physical plan is ONE scan + one aggregate — no joins, no
    second Exchange beyond the group-by."""
    from spark_hadoop_automation_in_cloud_spark.operators.textops import (
        curation_funnel,
    )

    good = "the cat and the dog of the house " * 8  # en markers, ~64 tokens
    rows = [
        ("s1", "en", good),                      # survives everything
        ("s1", "en", None),                      # dies at nonempty
        ("s1", "en", ""),                        # dies at nonempty
        ("s1", "de", good),                      # dies at lang agreement
        ("s1", "en", "the and of"),              # lang ok, dies at length band
        ("s2", "en", good + good + good),        # > 90 tokens: dies at len
        ("s2", "en", good),                      # survives
    ]
    df = spark.createDataFrame(rows, ["source", "lang", "text"])
    out = {
        r["source"]: r
        for r in curation_funnel(
            df, "source", "lang", "text", 0.0, 30, 90
        ).collect()
    }
    s1, s2 = out["s1"], out["s2"]
    assert (s1["n_total"], s1["n_nonempty"], s1["n_lang_ok"]) == (5, 3, 2)
    assert s1["n_len_ok"] == 1 and s1["tokens_kept"] == 65  # 64 + trailing-space empty token
    assert (s2["n_total"], s2["n_nonempty"], s2["n_len_ok"]) == (2, 2, 1)
    for r in (s1, s2):  # funnel monotonicity
        seq = [r["n_total"], r["n_nonempty"], r["n_lang_ok"],
               r["n_quality_ok"], r["n_len_ok"]]
        assert seq == sorted(seq, reverse=True)

    plan = curation_funnel(df, "source", "lang", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan and plan.count("Exchange") == 1


def test_bm25_properties_and_python_reference(spark):
    """BM25 pinned against a from-scratch Python reference on a toy
    corpus (same idf/norm/grid arithmetic — catches sign, saturation,
    and avgdl mistakes the oracle parity could mask by replicating
    them), plus the two semantic properties: a doc with more matching
    terms outranks one with fewer, and a rare term outweighs a common
    one at equal tf."""
    import math

    from spark_hadoop_automation_in_cloud_spark.operators.textops import bm25_scores

    corpus = {
        1: "rare common common filler filler filler",
        2: "common filler filler",
        3: "rare common extra filler",
        4: "filler filler filler filler",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id long, text string"
    )
    queries = {7: "rare common"}
    got = {
        (r["query_id"], r["doc_id"]): (r["bm25"], r["rank"])
        for r in bm25_scores(df, "doc_id", "text", queries, topk=4).collect()
    }

    k1, b = 1.2, 0.75
    docs_toks = {i: t.split() for i, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in docs_toks.values()) / n
    dfreq = {
        w: sum(1 for t in docs_toks.values() if w in t) for w in ("rare", "common")
    }
    want_scores = {}
    for i, t in docs_toks.items():
        s = 0
        for w in ("rare", "common"):
            tf = t.count(w)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[w] + 0.5) / (dfreq[w] + 0.5))
            norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(t) / avgdl))
            s += round(idf * norm * 1_000_000)
        if s:
            want_scores[i] = round(s / 1_000_000.0, 6)
    order = sorted(want_scores, key=lambda i: (-want_scores[i], i))
    want = {
        (7, i): (want_scores[i], r + 1) for r, i in enumerate(order)
    }
    assert got == want
    # both-term docs outrank single-term docs; rare beats common at the top
    ranks = {i: got[(7, i)][1] for i in got and [k[1] for k in got]}
    assert ranks[1] < ranks[2] and ranks[3] < ranks[2]
    assert 4 not in ranks  # no matching term, no row


def test_vocab_coverage_counts_rank_and_share(spark):
    """Hand corpus: exact counts, (cnt desc, token asc) tiebreak, and a
    cumulative share over the TOTAL stream (so a topk smaller than the
    vocabulary tops out below 1.0)."""
    from spark_hadoop_automation_in_cloud_spark.operators.textops import (
        vocab_coverage,
    )

    df = spark.createDataFrame(
        [
            (0, "a a a b b c"),
            (1, "a b z"),
            (2, "c a"),
        ],
        "doc_id long, text string",
    )
    # counts: a=5, b=3, c=2, z=1; total=11
    out = {r["token"]: r for r in vocab_coverage(df, "text", topk=3).collect()}
    assert set(out) == {"a", "b", "c"}
    assert (out["a"]["rank"], out["a"]["cnt"]) == (1, 5)
    assert (out["b"]["rank"], out["b"]["cnt"]) == (2, 3)
    assert (out["c"]["rank"], out["c"]["cnt"]) == (3, 2)
    assert out["a"]["cum_share"] == round(5 / 11, 6)
    assert out["b"]["cum_share"] == round(8 / 11, 6)
    assert out["c"]["cum_share"] == round(10 / 11, 6)  # < 1.0: z excluded


def test_vocab_coverage_tiebreak_by_token(spark):
    from spark_hadoop_automation_in_cloud_spark.operators.textops import (
        vocab_coverage,
    )

    df = spark.createDataFrame(
        [(0, "x y"), (1, "y x")], "doc_id long, text string"
    )
    rows = sorted(
        vocab_coverage(df, "text", topk=2).collect(), key=lambda r: r["rank"]
    )
    assert [r["token"] for r in rows] == ["x", "y"]  # equal cnt → token asc


def test_bigram_lm_python_reference(spark):
    """Hand-check the smoothed bigram model on a tiny corpus: per-pair
    quantized log-probs, unseen-pair counting, and the <2-token /
    NULL-text drop rule."""
    import math

    from spark_hadoop_automation_in_cloud_spark.operators.textops import (
        bigram_lm_scores,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b a b"),      # train
            (1, "a b c"),        # train
            (2, "b a"),          # scored: pair (b,a) seen? train has (b,a) from doc0
            (3, "x"),            # single token → no row
            (4, None),           # NULL text → no row
            (5, "q z"),          # fully unseen pair + unseen context
        ],
        "doc_id long, text string",
    )
    train = docs.where("doc_id < 2")
    out = {r["doc_id"]: r for r in bigram_lm_scores(docs, train, "doc_id", "text").collect()}
    assert 3 not in out and 4 not in out
    # train pairs: (a,b)x3? doc0: (a,b),(b,a),(a,b); doc1: (a,b),(b,c)
    # c2: (a,b)=3, (b,a)=1, (b,c)=1; c1: a=3, b=2; V = |{b,a,c}| = 3
    def logp(c2, c1):
        return math.log((c2 + 1.0) / (c1 + 1.0 * (3 + 1.0)))
    q = lambda c2, c1: round(logp(c2, c1) * 1_000_000)
    # doc2: one pair (b,a): c2=1, c1=2
    assert out[2]["n_bigrams"] == 1 and out[2]["n_unseen"] == 0
    assert out[2]["avg_neg_logprob"] == round(-q(1, 2) / 1e6, 6)
    # doc5: (q,z): unseen pair AND unseen context → 1/(V+1) smoothing
    assert out[5]["n_unseen"] == 1
    assert out[5]["avg_neg_logprob"] == round(-q(0, 0) / 1e6, 6)
    # word order matters: the model is conditional, not bag-of-words
    assert out[2]["avg_neg_logprob"] != out[5]["avg_neg_logprob"]


def test_quality_rule_flags_each_rule_and_null(spark):
    """Each rule trips on its own construction; NULL text fails all."""
    from spark_hadoop_automation_in_cloud_spark.operators.textops import (
        RULE_MIN_TOKENS,
        quality_rule_flags,
    )

    letters = "abcdefghijklmnopqrstuvwxyz"
    ok = "the " + " ".join(
        f"word{letters[i]}" for i in range(RULE_MIN_TOKENS + 4)
    )
    short = "the tiny text here"                       # fails r_len only
    digits = "the " + " ".join(str(i) for i in range(30))  # digit + alpha fail
    dupy = "the " + " ".join(["same"] * 30)            # fails r_dup (+ r_alpha ok)
    rows = [(1, ok), (2, short), (3, digits), (4, dupy), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in quality_rule_flags(df, "doc_id", "text").collect()}
    assert out[1]["pass_all"] == 1 and all(
        v == 1 for k, v in out[1].items() if k.startswith("r_")
    )
    assert out[2]["r_len"] == 0 and out[2]["r_stop"] == 1
    assert out[3]["r_digit"] == 0 and out[3]["r_alpha"] == 0
    assert out[4]["r_dup"] == 0 and out[4]["r_len"] == 1
    assert all(v == 0 for k, v in out[5].items() if k != "doc_id")
    assert all(out[i]["pass_all"] == 0 for i in (2, 3, 4, 5))
