"""Rounds-vs-wall ladder for BPE merge training, writing BPE_LADDER.json.

The question this answers (r09 verdict item 1): bpe_merges pays one
vocab-sized pair aggregate + fold rewrite PER merge round — fine at the
oracle's 4 merges, but real tokenizers need 10^3-10^5, and the serial
round structure makes per-round cost the only lever.  The production
answer is sampled-rule training (bpe_merges_sampled: rules from a
deterministic hash-slice of the word-frequency table) + full-corpus
encode.  This ladder measures, at n_merges in {4, 64, 256}:

  - full-vocab training wall vs sampled (sample_mod=16) training wall,
    plus secs/round for each (the scale-relevant number: at 100 TB the
    vocab table is millions of rows and per-round cost IS the wall);
  - the per-round input sizes (vocab_rows vs sampled_rows — locally job
    overhead dominates, so the ROW ratio is the honest scale signal);
  - rule-list agreement (per-step exact match from step 1 until first
    divergence, and set overlap) — how different the sampled rules are;
  - corpus COMPRESSION under each rule list (segmentation_stats summed
    over sources): the quality readout — sampled rules should compress
    within a few percent of full rules, which is why public pipelines
    train tokenizers on samples at all.

TESTDATA CAVEAT (measured, and why the ladder has two sections): the
synthetic documents table uses a 31-WORD vocabulary by construction, so
on the raw corpus (a) full training exhausts pairs near ~90 merges and
(b) a 1/16 vocabulary sample keeps ~2 words — degenerate.  The base
rungs therefore sample at mod=2 (a meaningful half-vocabulary), and the
scale claim is carried by the WIDE-VOCAB section: the same corpus with
each token suffixed by ``pos % 1000`` (row-local rewrite, token count
unchanged) grows the vocabulary to ~31k words — the axis real corpora
grow on and the one that makes per-round training cost the wall.  There
full-vs-sampled(mod=16) compares a 31k-row round input against ~2k.

Run: ``python tools/bpe_ladder.py`` (env SPARK_GRAFT_SF_DIR to vary;
default /root/testdata/sf0.1).  NEVER run concurrently with bench or a
scaling ladder — a second Spark JVM contends for execution memory.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.io import read_table
from spark_hadoop_automation_in_cloud_spark.operators.bpe import (
    bpe_merges,
    bpe_merges_sampled,
    sampled_word_freqs,
    segmentation_stats,
    word_freqs,
)
from spark_hadoop_automation_in_cloud_spark.session import get_test_session

N_MERGES = (4, 64, 256)
#: base-rung sample modulus — 2, not 16: the raw testdata vocabulary is
#: 31 words (module docstring), so mod=16 keeps ~2 words and the quality
#: comparison is meaningless; mod=2 keeps a real half-vocabulary
SAMPLE_MOD = 2
#: wide-vocab section: suffix grid size and its sample modulus
WIDE_SUFFIXES = 1_000
WIDE_SAMPLE_MOD = 16


def corpus_compression(docs, rules) -> float:
    """Whole-corpus compression under a rule list: sum(syms_before) /
    sum(syms_after) over the per-source segmentation stats."""
    agg = (
        segmentation_stats(docs, ["source"], "text", rules)
        .agg(F.sum("syms_before").alias("b"), F.sum("syms_after").alias("a"))
        .first()
    )
    return round(int(agg["b"]) / int(agg["a"]), 6)


def agreement(full: list, sampled: list) -> dict:
    """Prefix match length + set overlap of two (lhs, rhs) rule lists."""
    prefix = 0
    for a, b in zip(full, sampled):
        if a != b:
            break
        prefix += 1
    inter = len(set(full) & set(sampled))
    return {
        "prefix_match": prefix,
        "set_overlap": inter,
        "overlap_frac": round(inter / max(len(full), 1), 4),
    }


def rung_measurement(docs, n: int, sample_mod: int, with_quality: bool) -> dict:
    """One (n_merges, sample_mod) measurement: full vs sampled training
    wall, learned-rule counts (per-round figures divide by the ROUNDS
    ACTUALLY RUN — pair exhaustion ends the loop early), agreement, and
    optionally the corpus-compression quality readout."""
    t0 = time.perf_counter()
    full_rules = [
        (r["lhs"], r["rhs"]) for r in bpe_merges(docs, "text", n).collect()
    ]
    full_wall = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    samp_rules = [
        (r["lhs"], r["rhs"])
        for r in bpe_merges_sampled(
            docs, "text", n, sample_mod=sample_mod
        ).collect()
    ]
    samp_wall = round(time.perf_counter() - t0, 3)
    rung = {
        "full_wall_sec": full_wall,
        "full_secs_per_round": round(full_wall / max(len(full_rules), 1), 4),
        "full_rules": len(full_rules),
        "sampled_wall_sec": samp_wall,
        "sampled_secs_per_round": round(samp_wall / max(len(samp_rules), 1), 4),
        "sampled_rules": len(samp_rules),
        "sampled_over_full_wall": round(samp_wall / full_wall, 3),
        "agreement": agreement(full_rules, samp_rules),
    }
    if with_quality:
        rung["compression_full"] = corpus_compression(docs, full_rules)
        rung["compression_sampled"] = corpus_compression(docs, samp_rules)
        rung["compression_ratio"] = round(
            rung["compression_sampled"] / rung["compression_full"], 4
        )
    return rung


def widen_vocab(docs, n_suffixes: int):
    """Row-local vocabulary expansion: suffix every token with
    ``pos % n_suffixes`` — token count unchanged, distinct-word count
    multiplied by up to ``n_suffixes`` (the growth axis real corpora
    have and the 31-word testdata lacks)."""
    toks = F.split(F.col("text"), " ")
    widened = F.array_join(
        F.transform(
            toks,
            lambda w, i: F.concat(
                w, F.lit("x"), (i % n_suffixes).cast("string")
            ),
        ),
        " ",
    )
    return docs.select("doc_id", "source", widened.alias("text"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_test_session("bpe-ladder")
    docs = read_table(spark, sf_dir, "documents", parallelize=True)
    docs = docs.persist()

    out: dict = {
        "sf_dir": sf_dir,
        "sample_mod": SAMPLE_MOD,
        "vocab_rows": word_freqs(docs, "text").count(),
        "sampled_rows": sampled_word_freqs(docs, "text", SAMPLE_MOD).count(),
        "rungs": {},
    }
    for n in N_MERGES:
        rung = rung_measurement(docs, n, SAMPLE_MOD, with_quality=True)
        out["rungs"][str(n)] = rung
        print(json.dumps({f"n_merges={n}": rung}), flush=True)
    docs.unpersist()

    # wide-vocab section: the per-round cost lever made visible.  The
    # suffixed corpus is materialized via localCheckpoint so both
    # variants train on identical blocks (not re-derived text).
    wide = widen_vocab(docs, WIDE_SUFFIXES).localCheckpoint()
    wide_section = {
        "n_suffixes": WIDE_SUFFIXES,
        "sample_mod": WIDE_SAMPLE_MOD,
        "vocab_rows": word_freqs(wide, "text").count(),
        "sampled_rows": sampled_word_freqs(
            wide, "text", WIDE_SAMPLE_MOD
        ).count(),
        # quality on the suffixed corpus is not the point (the suffix
        # grid destroys natural pair structure); wall + rule counts are
        "rungs": {
            str(n): rung_measurement(
                wide, n, WIDE_SAMPLE_MOD, with_quality=False
            )
            for n in (64,)
        },
    }
    out["wide_vocab"] = wide_section
    print(json.dumps({"wide_vocab": wide_section}), flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BPE_LADDER.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BPE_LADDER.json")
    spark.stop()


if __name__ == "__main__":
    main()
