"""CLI runner for the IVF-PQ vector index — the build-once / probe-many
operational split of q159 (the reference's datamart jobs apply the same
philosophy to relational marts: heavy build on a schedule, cheap reads
in between):

    spark-submit jobs/build_ann_index_job.py build \
        <embeddings_parquet> <index_dir> [centroid_mod] [n_sub] [cb_k] [iters]

    spark-submit jobs/build_ann_index_job.py probe \
        <index_dir> <queries_parquet> <out_dir> [k] [nprobe]

``build`` writes three artifacts under ``index_dir``:
- ``centroids/``      — the coarse-cell model (parquet, tiny);
- ``codebooks.json``  — the PQ model (n_sub × cb_k × width doubles;
  bounded driver state, exact float round-trip through JSON repr);
- ``coded_lists/``    — one row per corpus vector: its PQ codes + its
  cell, PARTITIONED BY cell_id — so every later probe reads only probed
  cells (PartitionFilters, the q119 contract), and each candidate row
  costs n_sub small ints instead of a vector.

``probe`` reads the persisted model, probes ``nprobe`` cells per query,
ADC-ranks candidates within probed cells only, and writes
(query_id, neighbor_id, adc_sq, rank) parquet to ``out_dir``.

Determinism: identical input → identical index and identical probe
output (the q156/q159 oracle conventions — modulus centroids, lowest-id
codebook seeds, rounded-cosine and ADC ties to the lowest id).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.session import session_scope


def _build(argv: list[str]) -> int:
    src, index_dir = argv[0], argv[1]
    centroid_mod = int(argv[2]) if len(argv) > 2 else 37
    n_sub = int(argv[3]) if len(argv) > 3 else 4
    cb_k = int(argv[4]) if len(argv) > 4 else 8
    iters = int(argv[5]) if len(argv) > 5 else 3
    from spark_hadoop_automation_in_cloud_spark.operators.similarity import (
        ivf_build_lists,
        ivf_centroids,
        pq_encode,
        train_pq_codebooks,
    )

    with session_scope() as spark:
        emb = spark.read.parquet(src)
        head = emb.select("embedding").first()
        if head is None:
            raise ValueError(
                f"build_ann_index_job: no rows in {src} — nothing to index"
            )
        dim = len(head["embedding"])
        cent = ivf_centroids(emb, centroid_mod)
        books = train_pq_codebooks(
            emb, dim=dim, n_sub=n_sub, k=cb_k, iters=iters
        )
        lists = ivf_build_lists(emb, cent)
        cent.write.mode("overwrite").parquet(f"{index_dir}/centroids")
        coded = pq_encode(
            lists, books, id_col="neighbor_id", vec_col="embedding",
            carry_cols=["cell_id"],
        ).drop("recon_sq")
        coded.write.mode("overwrite").partitionBy("cell_id").parquet(
            f"{index_dir}/coded_lists"
        )
        os.makedirs(index_dir, exist_ok=True)
        with open(f"{index_dir}/codebooks.json", "w") as f:
            json.dump({"n_sub": n_sub, "codebooks": books}, f)
    return 0


def _probe(argv: list[str]) -> int:
    index_dir, queries_src, out_dir = argv[0], argv[1], argv[2]
    k = int(argv[3]) if len(argv) > 3 else 10
    nprobe = int(argv[4]) if len(argv) > 4 else 2
    from spark_hadoop_automation_in_cloud_spark.operators.similarity import (
        ivf_probe_cells,
        pq_adc_rank_within_cells,
    )

    with open(f"{index_dir}/codebooks.json") as f:
        model = json.load(f)
    books = model["codebooks"]
    with session_scope() as spark:
        cent = spark.read.parquet(f"{index_dir}/centroids")
        queries = spark.read.parquet(queries_src)
        probes = ivf_probe_cells(cent, queries, nprobe)
        cells = sorted(
            r["cell_id"] for r in probes.select("cell_id").distinct().collect()
        )
        coded = spark.read.parquet(f"{index_dir}/coded_lists").where(
            F.col("cell_id").isin(cells)  # → PartitionFilters: probed cells only
        )
        pq_adc_rank_within_cells(
            coded, books, probes, queries, k
        ).write.mode("overwrite").parquet(out_dir)
    return 0


def main(argv: list[str]) -> int:
    if not argv or argv[0] not in ("build", "probe"):
        print(__doc__, file=sys.stderr)
        return 2
    mode, rest = argv[0], argv[1:]
    if mode == "build":
        if len(rest) < 2:
            print(__doc__, file=sys.stderr)
            return 2
        return _build(rest)
    if len(rest) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    return _probe(rest)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
