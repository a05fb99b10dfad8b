"""Measure wall-clock scaling of the corpus operators on a 10x-replicated
document table, writing SCALING.json at the repo root.

Replication is the WORST case for dedup-family operators: every shingle's
document frequency grows with the replication factor, so anything
quadratic in df goes superlinear here long before it would on organically
grown data (which mostly adds NEW shingles).  A sublinear-or-linear result
on this corpus is strong evidence the plan survives a real scale-up; this
harness is what caught the uncapped decontamination join at 30x wall for
10x input.

Run: ``python tools/scaling_check.py`` (env ``SPARK_GRAFT_SF_DIR``,
``SPARK_GRAFT_SCALE`` to vary; scaled data is built under /tmp).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark import queries as q
from spark_hadoop_automation_in_cloud_spark.io import TABLES, read_table
from spark_hadoop_automation_in_cloud_spark.session import get_test_session

QUERIES = [
    "q60_decontamination",
    "q63_tfidf_top_terms",
    "q54_repetition_ratio",
    "q92_sequence_packing",
    "q99_text_normalize",
    # LM quality scoring: replication multiplies corpus tokens 10x while
    # the vocabulary stays constant (replicas add no new types) — the
    # worst case for the token->vocab join's build side reuse
    "q101_unigram_lm_quality",
    # incremental dedup: replicas are EXACT duplicates under fresh ids, so
    # each content hash collects scale x the docs — the pile-on-one-key
    # stress for the within-batch combine + index anti-join
    "q108_incremental_dedup",
    # repeated-passage stats: replication multiplies every gram's document
    # frequency by scale, growing the df-rejoin multiplicity (the op's
    # only fan-out) by exactly the factor — worst case for that join
    "q109_repeated_ngram_flags",
    # span coverage: replication makes EVERY gram repeated, so the
    # interval-union window sees the maximal repeated-start stream —
    # worst case for the per-doc lead() pass on top of q109's join shape
    "q118_repeated_span_coverage",
    # ExactSubstr output: replication makes EVERY gram repeated with one
    # replica-0 keeper, so every non-keeper doc hits the maximal removal
    # fan-out (n x starts) AND the full-token anti-join + reassembly run
    # on the whole corpus — the worst case for the emit side on top of
    # q118's measurement shape
    "q187_exact_substring_dedup",
    # shard layout: pure shuffle + per-shard window, should track input
    "q110_training_shards",
    # budget selection: per-source windows grow with the factor while the
    # stratum count stays fixed — the worst case for the quality-sort
    "q112_token_budget_selection",
    # incremental near-dup: replicas are exact dups, so every band bucket
    # collects scale x the docs — the pile-on stress for BOTH screens'
    # band-key joins
    "q113_incremental_minhash_dedup",
    # stratified sample: replication grows every lang stratum by the
    # factor while k stays 10 — the cutoff must shrink proportionally so
    # the window's input stays ~k_eff per stratum; wall should track the
    # counting+filter scans, never the stratum size
    "q123_stratified_sample",
    # mixture budget: per-lang quality windows grow with the factor while
    # budgets stay fixed — same stress as q112 plus the literal-map arm
    "q125_mixture_budget_selection",
    # curation funnel: one scan + conditional agg to |sources| groups —
    # wall should track the scan and nothing else (the regression this
    # guards: the one-pass shape quietly becoming per-stage rescans)
    "q127_curation_funnel",
    # BM25: replication multiplies every query term's document frequency
    # by the factor — the posting-list join fan-out is exactly df, so
    # this is the worst case for the pruned tf/df aggregation
    "q133_bm25_retrieval",
    # vocab coverage: replication multiplies counts while the vocabulary
    # stays constant — the rank/cumsum stages see identical input sizes,
    # so wall should track the token scan alone
    "q137_vocab_coverage",
    # lang-ID confusion matrix: replication multiplies every (true, pred)
    # cell count while the matrix stays |langs|² — wall must track the
    # heuristic-scoring scan, never the cell table (r06 VERDICT item 6)
    "q148_langid_confusion",
    # quality rule flags: pure row-local scan expressions — wall must
    # track the scan exactly (any superlinearity = a rule stopped being
    # row-local)
    "q154_quality_rule_flags",
    # ROC-AUC: replication multiplies per-(source, score) counts while
    # the DISTINCT score grid stays constant — the per-source cumulative
    # windows' input is FLAT while the scan grows (the q155 combiner
    # story applied to rank statistics)
    "q162_quality_auc_by_source",
    # PMI: replication multiplies every bigram count by the factor while
    # the vocabulary stays constant — pair/marginal frames are FLAT, so
    # wall must track the bigram-explode scan alone
    "q164_pmi_collocations",
    # BPE training: replicas add no new words, so the vocab table — the
    # input of ALL 4 merge rounds — is IDENTICAL at every rung; only the
    # one corpus shuffle grows.  The flattest ladder row by design; a
    # ratio tracking the factor means a round regressed into rescanning
    # the corpus (q169 shares the shape and is not separately laddered)
    "q166_bpe_merge_training",
    # BPE encode-to-ids: the vocab-sized fold chain is IDENTICAL at every
    # rung (replicas add no new words, q166's flatness) — the only growing
    # stages are the positioned explode, the word equi-join (probe side
    # grows, build side constant) and the per-doc re-assembly aggregate.
    # Wall must track the corpus scan; a factor-tracking ratio on the fold
    # stages means encode regressed into folding per-occurrence
    "q194_bpe_token_ids",
    # hash-kernel scoring: pure row-local aggregate() in the scan — wall
    # must track the scan exactly (any superlinearity = the gram loop
    # stopped being row-local)
    "q181_hash_kernel_scores",
    # logistic distillation: 10 fixed GD rounds, each ONE gradient
    # aggregate over the feature scan with broadcast-literal weights —
    # wall must track rounds x scan with a constant model; any growth
    # beyond the scan means the fit stopped being a pure aggregate
    "q197_quality_filter_distillation",
    # interpolated LM: replication multiplies pair/unigram counts while
    # the vocab stays constant — all three model frames FLAT, the
    # scoring joins' build sides constant (q141's stress, +unigrams)
    "q184_jm_interpolated_lm",
    # sampled BPE training + full encode: replication adds no new words,
    # so BOTH the sampled training rounds (vocab/4 input) and the encode
    # fold chain are IDENTICAL at every rung — only the corpus explode/
    # join/re-assembly grow (q194's flatness with 8 sampled-trained
    # rounds in front)
    "q200_sampled_bpe_token_ids",
    # the curated-mix funnel: every constituent stage is laddered on its
    # own (q194 encode, q197 GD, q112 budget windows, q92 packing) —
    # this row pins that the COMPOSITION stays sublinear too (the
    # failure it guards: a stage boundary silently re-deriving the
    # corpus-scale frame instead of reading the persisted one)
    "q201_curated_mix_funnel",
    # learned mixture weights: gate training + ONE loss-cell aggregate
    # touch the corpus; the 5 weight rounds are |domains|-sized — wall
    # must track q197's (the gate is the whole cost)
    "q202_doremi_mixture_weights",
    # tokenizer fertility: q194's encode chain + one more gated-words
    # aggregate — wall must track q194's (the encode is the whole cost)
    "q203_tokenizer_fertility",
    # per-source KL: one map-side-combined corpus shuffle, everything
    # after vocab-sized — replication grows token counts 10x but adds
    # no new (source, token) keys, the best case for the combine
    "q204_source_kl_divergence",
    # learned-mix funnel: q201's composition with the exp-gradient
    # budget stage — wall must track q201's (the trajectory adds
    # |domains|-sized rounds, each ONE tiny query since the
    # round-per-query reweight executor)
    "q205_learned_mix_funnel",
    # mixture epochs: the q194 encode chain + one |langs|-cell
    # aggregate + a literal join — wall must track q194/q203's
    "q206_mixture_epochs",
]
# q126 (heavy hitters) and q128 (incremental components) are swept by
# their own dedicated ladders instead — HEAVY_HITTERS.json widens the
# KEY SPACE at constant support (replicating lineitem here would only
# multiply per-key counts), INCREMENTAL_CC.json grows the HISTORY at a
# fixed batch (replication would grow the batch too, which is exactly
# the variable that must stay fixed to show history-independence).

#: events-table operators: replication shifts user_id/event_id per copy, so
#: the KEY SPACE grows with the factor while per-key work stays constant —
#: the growth shape a real event lake has, and the one that validates that
#: per-user window/sessionization plans parallelize instead of piling onto
#: existing keys.
EVENTS_QUERIES = [
    "q89_session_intervals",   # gaps-and-islands window + groupBy
    "q53_time_range_average",  # epoch-keyed RANGE frame
    "q97_point_in_time_state", # SCD2 build + temporal join
    "q81_transition_matrix",   # lag window + matrix aggregate
    "q11_travel_history",      # broadcast 1-NN + change detection + collect_list
    # upsert replay via the duckdb merge backend: key space grows with the
    # factor so the ON CONFLICT table and every batch's toPandas crossing
    # scale together — this one SHOULD be ~linear (it is the documented
    # driver-crossing micro-batch shape; the sublinear flag just confirms
    # nothing superlinear crept into the per-batch dedup windows)
    "q117_upsert_replay",
    # numeric PSI drift: two scan-side conditional aggregates to a
    # |event_type|×|bins| cell table — wall must track the scans; the
    # smoothing/log arithmetic runs on the bounded cells (r06 item 6)
    "q146_value_psi_weekend",
    # freshness SLA: per-(type, day) aggregate + 1-row max-ts broadcast —
    # the day×type frame is calendar-bounded, wall tracks the scan
    "q151_freshness_report",
    # exact KS: one shuffle into (type, value) conditional counts (ties
    # collapse at the combiner — replication grows counts, NOT distinct
    # values, so the per-type window input stays FLAT while the scan
    # grows; the best case the combiner design banks on)
    "q155_ks_drift_weekend",
    # rolling weekly actives: replication SHIFTS user ids, so the
    # distinct (day, user) frame grows with the factor — the fan-out
    # and count-distinct must track that frame, never the raw corpus
    "q183_rolling_weekly_actives",
]
# NOT replicated here: q16 (co-purchase pairing) — replicas share contact
# keys, so pair density grows QUADRATICALLY with the factor; that stress
# shape is covered by the documents-side dedup caps instead.

#: embeddings-table operators: replication re-ids vectors with the SAME
#: shift as documents (the join key alignment q134/q138 need), leaving
#: the vector values identical — covariance/PC outputs are unchanged
#: while the scan grows by the factor, so wall isolates the scan +
#: bounded-shuffle claim (the moment aggregate's shuffle is cells x
#: partitions regardless of rows).
EMB_QUERIES = [
    "q135_embedding_covariance",
    "q136_pc_projection",
    # source-centroid matrix: the doc join + groups x dim aggregate —
    # group count fixed, rows x factor
    "q138_source_centroid_cosine",
    # hybrid retrieval: both the lexical posting lists and the dense
    # corpus scan grow by the factor; the fusion stays bounded
    "q134_hybrid_rrf_retrieval",
    # bucketed co-located join: the per-invocation bucketed write + the
    # exchange-free join both track the scan; the join key spaces stay
    # aligned under the shared id shift
    "q153_bucketed_colocated_join",
    # PQ: training is iters corpus scans + a bounded-cell aggregate;
    # encode is one row-local scan; ADC is a code-only scan per query —
    # model state (k·dim) constant at every rung
    "q156_pq_codes",
    "q157_pq_adc_topk",
]

#: lineitem-table operators: replication shifts BOTH l_orderkey and
#: l_partkey per copy, so the co-purchase graph becomes ``scale``
#: DISJOINT copies of the base graph — node and edge space x factor at
#: constant density (the organic-growth shape; an UNshifted partkey
#: would instead multiply every pair's support, densifying the graph
#: into the minsup-1 clique soup — a different experiment).  Wall must
#: track m: the orientation bound O(m^1.5) is per-component.
LINEITEM_QUERIES = [
    "q161_copurchase_triangles",
    # k-core peeling on 100 disjoint graph copies: the peel cascade per
    # copy is identical, so rounds stay FIXED while each round's
    # degree-aggregate + semi-join grows with the factor — wall must
    # track m, never rounds x m
    "q186_kcore_members",
    # label propagation on the same disjoint copies: the 5-round
    # trajectory per copy is identical, so the round count is fixed by
    # contract while each round's neighbor join + (node, label) count
    # grows with the factor — wall must track m x rounds, never anything
    # label-cardinality-shaped (labels stay within each copy)
    "q188_copurchase_communities",
    # modularity of those communities: LPA's cost + one degree aggregate
    # and two endpoint label joins — wall must track the LPA rung; the
    # per-community aggregate output grows with the factor but stays
    # bounded by the node count
    "q189_community_modularity",
]


def best_of(fn, sf_dir: str, n: int = 2) -> float:
    fn(sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn(sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scale = int(os.environ.get("SPARK_GRAFT_SCALE", "10"))
    spark = get_test_session("scaling-check")

    scaled = f"/tmp/spark_graft_scaled_{scale}x"
    shutil.rmtree(scaled, ignore_errors=True)
    os.makedirs(scaled)
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = base.count()
    rep = (
        base.crossJoin(spark.range(scale).withColumnRenamed("id", "__rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * (n * scale))
        .drop("__rep")
    )
    rep.write.mode("overwrite").parquet(f"{scaled}/documents.parquet")

    # through read_table: ts normalized to TIMESTAMP from any encoding
    ev = read_table(spark, sf_dir, "events")
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
    n_events = ev.agg(F.max("event_id")).first()[0] + 1
    ev_rep = (
        ev.crossJoin(spark.range(scale).withColumnRenamed("id", "__rep"))
        .withColumn("user_id", F.col("user_id") + F.col("__rep") * n_users)
        .withColumn("event_id", F.col("event_id") + F.col("__rep") * n_events)
        .drop("__rep")
    )
    ev_rep.write.mode("overwrite").parquet(f"{scaled}/events.parquet")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb_rep = (
        emb.crossJoin(spark.range(scale).withColumnRenamed("id", "__rep"))
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * (n * scale))
        .drop("__rep")
    )
    emb_rep.write.mode("overwrite").parquet(f"{scaled}/embeddings.parquet")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_ok = li.agg(F.max("l_orderkey")).first()[0] + 1
    n_pk = li.agg(F.max("l_partkey")).first()[0] + 1
    li_rep = (
        li.crossJoin(spark.range(scale).withColumnRenamed("id", "__rep"))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__rep") * n_ok)
        .withColumn("l_partkey", F.col("l_partkey") + F.col("__rep") * n_pk)
        .drop("__rep")
    )
    li_rep.write.mode("overwrite").parquet(f"{scaled}/lineitem.parquet")

    for t in TABLES:
        if t not in ("documents", "events", "embeddings", "lineitem"):
            os.symlink(f"{sf_dir}/{t}.parquet", f"{scaled}/{t}.parquet")

    fns = {s.name: s.fn for s in q.specs()}
    out: dict[str, dict] = {}
    names = QUERIES + EVENTS_QUERIES + EMB_QUERIES + LINEITEM_QUERIES
    # SPARK_GRAFT_SCALING_QUERIES=q146_...,q151_... runs a subset and
    # MERGES it into the existing artifact (so extending the ladder to a
    # new family never re-times — or clobbers — the 27 standing rows).
    # Unknown names FAIL rather than silently filter (a typo would skip
    # the row, rewrite the artifact unchanged, and look successful — the
    # failure mode test_headline_names_are_registered pins for bench.py)
    only = os.environ.get("SPARK_GRAFT_SCALING_QUERIES")
    if only:
        wanted = set(only.split(","))
        unknown = wanted - set(names)
        if unknown:
            raise SystemExit(
                f"SPARK_GRAFT_SCALING_QUERIES names not in the ladder: "
                f"{sorted(unknown)}"
            )
        names = [n for n in names if n in wanted]
    for name in names:
        fn = fns[name]
        t1 = best_of(lambda d: fn(spark, d), sf_dir)
        t10 = best_of(lambda d: fn(spark, d), scaled)
        out[name] = {
            "base_sec": t1,
            f"{scale}x_sec": t10,
            "wall_ratio": round(t10 / t1, 2),
            "sublinear": t10 / t1 < scale,
        }

    result = {"sf_dir": sf_dir, "scale": scale, "n_docs_base": n, "queries": out}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the 10x sweep is the standing artifact the verdict reads as
    # SCALING.json; other factors (30x, 100x) get their own files so a
    # deeper sweep never clobbers the baseline one
    name = "SCALING.json" if scale == 10 else f"SCALING_{scale}x.json"
    path = os.path.join(root, name)
    if only and os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
        prior["queries"].update(out)
        result = prior
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    shutil.rmtree(scaled, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
