"""Pinned-golden value hashes for the rows-only driver queries.

These pipelines have no SQL oracle by design (MinHash/LSH clustering,
SimHash banding, winnowing fingerprints, approximate ANN, multimodal
stubs), so the driver records only a row count for them. The seeded
sf0.01 corpus is deterministic and every query below is
partition-count-invariant (verified at num_cpus=4 and 16), so the full
output is pinned here as an order-insensitive value hash — a regression
in any of these engines is caught by more than a row count. Canonical
form mirrors the driver's compare: columns sorted by name, rows sorted
by all columns, %.6g CSV. If a hash moves, diff the query output against
the previous build before re-pinning, and note why in the commit.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"

GOLDEN = {
    # simhash/fingerprint keep their goldens on top of their round-4 SQL
    # oracles; minhash_clusters_docs / knn_cosine_lsh / knn_cosine_ivf
    # graduated to full SQL oracles in round 4 (pinned bands/fold16 and
    # bucket/list candidate sets; the driver checks them end-to-end) and
    # left this list.
    "simhash_pairs_docs": (21, "2ec6e4937f7db52bf6d1933eb861ab05"),
    "fingerprint_docs": (500, "b45f46f11657f7b5803ece0aafc31cb4"),
    "media_features": (64, "46d48bb6d95b188bbfcc268622c16973"),
    "media_frames": (128, "515fa197faa8f8076271da6770745301"),
}


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # lists / numpy arrays / bytes -> stable strings (repr of a
            # large numpy array would elide elements, so listify first)
            df[c] = df[c].map(
                lambda v: repr(v.tolist() if isinstance(v, np.ndarray)
                               else v))
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.6g").encode()).hexdigest()


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_rows_only_query_matches_golden(name):
    from deduplicate_ray.pipelines.queries import QUERIES
    res = QUERIES[name](SF_DIR)
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    rows, expected = GOLDEN[name]
    assert len(df) == rows
    assert value_hash(df) == expected


def test_pinned_hash_parquets_match_fresh_compute():
    """Pin honesty for the simhash/fingerprint SQL oracles: the pinned
    parquets (tools/pin_hashes.py) must equal a fresh computation from
    the same kernels over the same testdata — a kernel change that
    forgets to regenerate the pins fails HERE, not as a silent oracle
    shift. (simhash_pairs_docs / fingerprint_docs also keep their golden
    hashes above; the new SQL oracles verify the PAIRING independently.)"""
    import os
    import pyarrow.parquet as pq
    from tools.pin_hashes import build_tables

    here = os.path.dirname(__file__)
    sim_t, fp_t = build_tables(SF_DIR)
    assert sim_t.equals(
        pq.read_table(os.path.join(here, "pinned_simhash_sf001.parquet")))
    assert fp_t.equals(
        pq.read_table(os.path.join(here,
                                   "pinned_fingerprint_sf001.parquet")))


def test_pinned_minhash_and_ann_parquets_match_fresh_compute():
    """Pin honesty for the minhash_clusters_docs / knn_cosine_lsh /
    knn_cosine_ivf SQL oracles: band hashes, 16-bit signature folds,
    LSH bucket codes + probe sets and IVF list assignments + probe
    lists must equal a fresh computation from the same kernels."""
    import os
    import pyarrow.parquet as pq
    from tools.pin_hashes import build_ann_tables, build_minhash_tables

    here = os.path.dirname(__file__)
    bands_t, fold_t = build_minhash_tables(SF_DIR)
    assert bands_t.equals(pq.read_table(
        os.path.join(here, "pinned_minhash_bands_sf001.parquet")))
    assert fold_t.equals(pq.read_table(
        os.path.join(here, "pinned_minhash_fold16_sf001.parquet")))
    lsh_t, lsh_p, ivf_t, ivf_p = build_ann_tables(SF_DIR)
    for t, name in [(lsh_t, "pinned_annlsh_buckets_sf001.parquet"),
                    (lsh_p, "pinned_annlsh_probes_sf001.parquet"),
                    (ivf_t, "pinned_ivf_lists_sf001.parquet"),
                    (ivf_p, "pinned_ivf_probes_sf001.parquet")]:
        assert t.equals(pq.read_table(os.path.join(here, name))), name


def test_pinned_semdedup_clusters_match_fresh_compute():
    """Pin honesty for the semdedup_embeddings SQL oracle: the pinned
    cluster assignment must equal a fresh train+assign from the same
    kernels (the keep relation itself is recomputed by DuckDB)."""
    import os
    import pyarrow.parquet as pq
    from tools.pin_hashes import build_semdedup_table

    here = os.path.dirname(__file__)
    sem = build_semdedup_table(SF_DIR)
    assert sem.equals(pq.read_table(
        os.path.join(here, "pinned_semdedup_clusters_sf001.parquet")))
