"""KMV distinct-count sketch: exactness below k, error bound above k,
merge invariance across partitionings."""

import numpy as np
import pandas as pd
import ray.data as rd

from deduplicate_ray.stages import sketch


def test_exact_below_k():
    rng = np.random.Generator(np.random.PCG64(3))
    vals = rng.integers(0, 500, size=20_000)     # 500 distinct < k
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(6)
    est = sketch.approx_distinct(ds, "v", k=1024)
    assert est == float(len(np.unique(vals)))


def test_error_bound_above_k():
    rng = np.random.Generator(np.random.PCG64(5))
    true_n = 60_000
    vals = rng.permutation(np.repeat(np.arange(true_n), 2))
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    est = sketch.approx_distinct(ds, "v", k=1024)
    # rel error concentrates at 1/sqrt(k) ≈ 0.031; allow 4 sigma
    assert abs(est - true_n) / true_n < 4 / np.sqrt(1024)


def test_partitioning_invariance():
    rng = np.random.Generator(np.random.PCG64(9))
    vals = rng.integers(0, 50_000, size=100_000)
    df = pd.DataFrame({"v": vals})
    e1 = sketch.approx_distinct(rd.from_pandas(df).repartition(2), "v", k=512)
    e2 = sketch.approx_distinct(rd.from_pandas(df).repartition(13), "v", k=512)
    assert e1 == e2              # merge-invariant: same k-min set


def test_grouped_exact_below_k_matches_pandas():
    rng = np.random.Generator(np.random.PCG64(13))
    df = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], size=5000),
        "v": rng.integers(0, 300, size=5000)})
    got = sketch.grouped_approx_distinct(
        rd.from_pandas(df).repartition(5), ["g"], "v", k=1024,
        out_col="n").to_pandas().sort_values("g").reset_index(drop=True)
    want = df.groupby("g")["v"].nunique().reset_index(name="n") \
        .sort_values("g").reset_index(drop=True)
    assert list(got["g"]) == list(want["g"])
    assert np.allclose(got["n"].to_numpy(), want["n"].to_numpy(float))


def test_heavy_hitters_exact_below_k():
    rng = np.random.Generator(np.random.PCG64(17))
    vals = rng.choice([f"u{i}" for i in range(30)], size=8000,
                      p=np.arange(30, 0, -1) / np.arange(30, 0, -1).sum())
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(7)
    got = sketch.heavy_hitters(ds, "v", k=64).to_pandas()
    want = pd.Series(vals).value_counts()
    assert (got["err_bound"] == 0).all()
    assert len(got) == 30
    assert dict(zip(got["v"], got["est_count"])) == want.to_dict()


def test_heavy_hitters_bounds_above_k():
    rng = np.random.Generator(np.random.PCG64(23))
    # zipf-ish: few heavy keys over a long uniform tail
    heavy = np.repeat([f"h{i}" for i in range(4)], 3000)
    tail = np.asarray([f"t{i}" for i in rng.integers(0, 5000, size=8000)])
    vals = rng.permutation(np.concatenate([heavy, tail]))
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(6)
    got = sketch.heavy_hitters(ds, "v", k=8).to_pandas()
    true = pd.Series(vals).value_counts()
    err = int(got["err_bound"].iloc[0])
    assert err > 0
    # every value with true freq > err survives — the 4 heavies qualify
    surv = set(got["v"])
    assert {f"h{i}" for i in range(4)} <= surv
    # and estimates never overcount, never undercount by more than err
    for v, c in zip(got["v"], got["est_count"]):
        assert true[v] - err <= c <= true[v]


def test_heavy_hitters_counts_null_key_exactly():
    df = pd.DataFrame({"v": ["a"] * 5 + [None] * 10 + ["b"] * 2})
    got = sketch.heavy_hitters(
        rd.from_pandas(df).repartition(3), "v", k=8).to_pandas()
    by_val = {(v if pd.notna(v) else None): c
              for v, c in zip(got["v"], got["est_count"])}
    assert by_val == {"a": 5, None: 10, "b": 2}
    assert (got["err_bound"] == 0).all()


def test_count_distinct_and_kmv_ignore_nulls():
    import duckdb

    from deduplicate_ray.stages import stats
    df = pd.DataFrame({"g": ["x", "x", "x", "x", "y"],
                       "v": [1.0, 2.0, None, None, None]})
    got = stats.count_distinct(rd.from_pandas(df).repartition(2),
                               ["g"], "v").to_pandas()
    # SQL semantics: nulls never counted; all-null group y drops out
    # (documented divergence from a base-table GROUP BY emitting 0)
    assert dict(zip(got["g"], got["n_distinct"])) == {"x": 2}
    approx = sketch.grouped_approx_distinct(
        rd.from_pandas(df).repartition(2), ["g"], "v", k=64,
        out_col="n").to_pandas()
    assert dict(zip(approx["g"], approx["n"])) == {"x": 2.0}
