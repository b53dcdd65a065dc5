"""Grouped vector centroid vs a plain-numpy reference across
partitionings; ragged input rejection."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from deduplicate_ray.stages import vectors


def test_grouped_centroid_matches_numpy():
    rng = np.random.Generator(np.random.PCG64(31))
    n, dim = 700, 16
    labels = rng.integers(0, 6, size=n)
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    df = pd.DataFrame({"label": labels,
                       "embedding": [r for r in mat]})
    got = vectors.grouped_centroid(
        rd.from_pandas(df).repartition(7), "label", "embedding") \
        .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True)
    assert len(got) == 6 * dim
    for lab in range(6):
        want = mat[labels == lab].astype(np.float64).mean(axis=0)
        sub = got[got.label == lab].centroid.to_numpy()
        assert np.allclose(sub, np.round(want, 6), atol=2e-6)


def test_grouped_centroid_rejects_ragged():
    df = pd.DataFrame({"label": [0, 0],
                       "embedding": [np.zeros(4, np.float32),
                                     np.zeros(5, np.float32)]})
    with pytest.raises(Exception, match="ragged"):
        vectors.grouped_centroid(rd.from_pandas(df), "label",
                                 "embedding").take_all()
