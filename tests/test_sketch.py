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
