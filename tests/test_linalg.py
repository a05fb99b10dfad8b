"""Distributed PCA family (operators/linalg.py): numpy agreement, exact
cross-engine trajectory, degenerate handling, and the scale-shape plan."""

from __future__ import annotations

import contextlib
import io

import duckdb
import numpy as np
import pytest

from spark_hadoop_automation_in_cloud_spark.operators import linalg as la


def _numpy_cov(sf_dir: str) -> np.ndarray:
    con = duckdb.connect()
    X = np.array(
        con.execute(
            f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
        )
        .fetchdf()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    return np.cov(X.T, bias=True)


def test_covariance_matches_numpy(spark, sf_dir):
    """Grid-exact covariance agrees with numpy's float covariance to the
    quantization bound: components snap to 1e-6, so each product carries
    ~1e-6·|x| error and the population moment stays within ~1e-6."""
    C = _numpy_cov(sf_dir)
    rows = la.covariance_matrix(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), dim=64
    ).collect()
    assert len(rows) == 64 * 65 // 2
    err = max(abs(r["cov"] - C[r["i"], r["j"]]) for r in rows)
    assert err < 2e-6, err


def test_top_pc_matches_numpy_eigh(spark, sf_dir):
    """The squaring schedule (effective power 2^7·4 = 512) must align with
    the true top eigenvector even through 1e-6 grid renormalizations —
    |cos| ≥ 0.999 on the clustered corpus (measured 1.0 at sf0.001/0.01/
    0.1; the eigengap TIGHTENS with scale, which is why the schedule
    squares instead of iterating linearly)."""
    C = _numpy_cov(sf_dir)
    pc = np.linalg.eigh(C)[1][:, -1]
    v = np.array(
        la.top_principal_component(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"), dim=64
        ),
        dtype=np.float64,
    )
    v /= np.linalg.norm(v)
    assert abs(float(v @ pc)) > 0.999
    # sign canonicalization: first nonzero grid component positive
    ints = la.top_principal_component(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), dim=64
    )
    first_nonzero = next(x for x in ints if x != 0)
    assert first_nonzero > 0
    assert max(abs(x) for x in ints) == la._GRID  # max-norm exactly 1e6


def test_degenerate_covariance_yields_zero_direction(spark):
    """Identical vectors → zero covariance → the all-zero direction and
    all-zero projections on BOTH engines (no raise path in SQL, so the
    kernel must not raise either)."""
    emb = spark.createDataFrame(
        [(i, [0.25, -0.5, 0.125]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    v = la.top_principal_component(emb, dim=3)
    assert v == [0, 0, 0]
    pr = la.pc_projection(emb, dim=3).collect()
    assert all(r["pc1"] == 0.0 for r in pr)


def test_constant_dimension_still_finds_pc(spark, tmp_path):
    """A constant (zero-variance) FIRST dimension zeroes covariance row 0;
    the old fixed-e0 seed made ``m·e0 = 0`` and silently returned the zero
    direction while a valid top PC existed (ADVICE r06, medium).  The
    max-|row-sum| seed must recover the true PC — and the SQL twin, which
    mirrors the seed rule, must walk the identical trajectory."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=40)
    X = np.stack(
        [
            np.full(40, 0.5),  # constant dim 0 → cov column 0 is exactly zero
            3.0 * base + rng.normal(scale=0.05, size=40),
            -2.0 * base + rng.normal(scale=0.05, size=40),
            rng.normal(scale=0.01, size=40),
        ],
        axis=1,
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    v = np.array(la.top_principal_component(emb, dim=4), dtype=np.float64)
    assert np.abs(v).max() == la._GRID  # non-degenerate, grid max-norm
    C = np.cov(X.T, bias=True)
    pc = np.linalg.eigh(C)[1][:, -1]
    assert abs(float(v / np.linalg.norm(v) @ pc)) > 0.999
    # cross-engine: the SQL twin shares the seed rule, not just the loop
    path = str(tmp_path / "const_dim.parquet")
    emb.coalesce(1).write.parquet(path)
    spark_out = {
        r["vec_id"]: r["pc1"] for r in la.pc_projection(emb, dim=4).collect()
    }
    con = duckdb.connect()
    sql = la.sql_pc_projection(f"'{path}/*.parquet'", dim=4)
    duck_out = dict(con.execute(sql).fetchall())
    assert spark_out == duck_out
    assert any(x != 0.0 for x in spark_out.values())


def test_group_centroid_cosine_null_group_dropped(spark):
    """NULL group keys are dropped, not crashed on (ADVICE r06: sorted()
    over mixed None/str raised driver-side), and non-string keys cast to
    string."""
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (1, [3.0, 0.0]),
            (2, [0.0, 2.0]),
            (None, [9.0, 9.0]),
        ],
        "g int, embedding array<double>",
    )
    out = {
        (r["group_a"], r["group_b"]): r["centroid_cos"]
        for r in la.group_centroid_cosine(emb, "g", dim=2).collect()
    }
    assert out == {("1", "2"): 0.0}  # NULL group gone, int keys stringified


def test_projection_is_exact_integer_dot(spark):
    """pc1 must equal the exact integer dot product of the grid-snapped
    vector and the returned direction — no float accumulation."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [-1.0, 0.05]),
            (3, [0.8, -0.2]),
        ],
        "vec_id long, embedding array<double>",
    )
    v = la.top_principal_component(emb, dim=2)
    got = {r["vec_id"]: r["pc1"] for r in la.pc_projection(emb, dim=2).collect()}
    rows = {
        0: [1.0, 0.0],
        1: [0.9, 0.1],
        2: [-1.0, 0.05],
        3: [0.8, -0.2],
    }
    for vid, vec in rows.items():
        qi = [round(x * la._GRID) for x in vec]
        want = round(sum(a * b for a, b in zip(qi, v)) / la._GRID2, 6) + 0.0
        assert got[vid] == want, (vid, got[vid], want)


def test_covariance_plan_one_scan_one_shuffle(spark, sf_dir):
    """The moment aggregation must be ONE exchange fed by a two-phase hash
    aggregate (map-side combine collapses each partition to ≤ cells rows
    before the shuffle), with no joins recovering first moments."""
    df = la.covariance_matrix(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), dim=64
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    assert plan.count("Exchange") == 1
    assert plan.lower().count("hashaggregate") >= 2
    assert "Join" not in plan


def test_projection_plan_zero_shuffle(spark, sf_dir):
    """The returned projection plan is a row-local scan: the covariance
    job runs inside the bounded collect, so the plan the caller executes
    carries NO exchange at all."""
    df = la.pc_projection(spark.read.parquet(f"{sf_dir}/embeddings.parquet"), dim=64)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_negative_zero_canonicalized(spark):
    """round() of a tiny negative covariance is IEEE -0.0; the driver's
    value hash stringifies, so both kernel and oracle must emit +0.0.
    This corpus has near-orthogonal dims whose covariances round to zero
    from below."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 1e-8]),
            (1, [-1.0, -1e-8]),
            (2, [1.0, -1e-8]),
            (3, [-1.0, 1e-8]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = la.covariance_matrix(emb, dim=2).collect()
    for r in rows:
        assert str(r["cov"]) != "-0.0", r


def test_group_centroid_cosine_math(spark):
    """Hand-computable centroids: identical groups → cos 1.0, orthogonal
    groups → 0.0, zero-sum group → NULL; cosine of SUMS equals cosine of
    means."""
    emb = spark.createDataFrame(
        [
            ("a", [1.0, 0.0]),
            ("a", [3.0, 0.0]),
            ("b", [0.0, 2.0]),
            ("c", [1.0, 1.0]),
            ("z", [1.0, 0.0]),
            ("z", [-1.0, 0.0]),  # sums to zero → NULL vs everyone
        ],
        "g string, embedding array<double>",
    )
    out = {
        (r["group_a"], r["group_b"]): r["centroid_cos"]
        for r in la.group_centroid_cosine(emb, "g", dim=2).collect()
    }
    assert out[("a", "b")] == 0.0
    assert out[("a", "c")] == round(1 / 2**0.5, 6)
    assert out[("b", "c")] == round(1 / 2**0.5, 6)
    assert out[("a", "z")] is None and out[("b", "z")] is None
    assert len(out) == 6  # 4 groups → 6 pairs


def test_grouped_ols_exact_line(spark):
    """Points exactly on y = 3x + 7 recover slope 3 / intercept 7; a
    single-x group yields NULLs (zero x-variance)."""
    df = spark.createDataFrame(
        [("g", x, 3 * x + 7) for x in (1, 2, 5, 9)]
        + [("s", 4, 100), ("s", 4, 200)],
        "k string, x long, y long",
    )
    rows = {r["k"]: r for r in la.grouped_ols(df, ["k"], "x", "y").collect()}
    assert rows["g"]["slope"] == 3.0 and rows["g"]["intercept"] == 7.0
    assert rows["g"]["n_points"] == 4
    assert rows["s"]["slope"] is None and rows["s"]["intercept"] is None
