"""Regenerate the pinned per-doc hash parquets that back the
simhash_pairs_docs / fingerprint_docs / minhash_clusters_docs /
knn_cosine_lsh / knn_cosine_ivf SQL oracles.

The pairing/report logic of those queries is verified INDEPENDENTLY by
DuckDB (hamming = bit_count(xor(a, b)) over the pinned simhash column;
band-equality candidates + 16-bit-fold Jaccard verify + recursive-CTE
connected components over the pinned minhash band/fold columns; exact
cosine top-k over the pinned LSH-bucket / IVF-list probe sets; see
ORACLE_SQL); only the hash/bucketing kernels themselves are pinned
here. A pytest test (tests/test_golden_rowsonly.py) recomputes every
pin from the testdata each run, so a kernel change fails loud instead
of silently shifting the oracle. The pinned kernels are additionally
verified bit-equal against NAIVE pure-Python reimplementations sharing
no code with production (tests/test_kernel_parity.py) — closing the
"engine pins its own hashes" circularity: a kernel bug that shifted
engine and pin equally would still fail the independent recompute.

Usage: python tools/pin_hashes.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq


def build_tables(sf_dir: str):
    import pyarrow as pa
    import ray.data as rd

    from deduplicate_ray.functions import text as textfn
    from deduplicate_ray.stages import simdedup

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    sim = simdedup.add_simhash(docs).select_columns(["doc_id", "simhash"]) \
        .sort("doc_id").to_arrow_refs()
    import ray
    sim_t = pa.concat_tables([ray.get(r) for r in sim])
    fp = docs.map_batches(
        lambda t: textfn.add_fingerprint(t).drop_columns(["text"]),
        batch_format="pyarrow").sort("doc_id").to_arrow_refs()
    fp_t = pa.concat_tables([ray.get(r) for r in fp])
    return sim_t, fp_t


def build_minhash_tables(sf_dir: str):
    """(bands, fold16) pins for the minhash_clusters_docs oracle.

    Same kernels as the Stage-2 pipeline at the query's config (default
    shingle_k=5 / 128 perms / 32x4 bands / seed 42): per-doc MinHash
    signature -> band_hashes fold per band, and the 16-bit xor-fold the
    verify stage compares (lsh._fold16) — the oracle recomputes the
    PAIRING (band-equality candidates, fold-equality Jaccard estimate,
    connected components) independently in DuckDB."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from deduplicate_ray.config import PipelineConfig
    from deduplicate_ray.stages.lsh import _fold16
    from deduplicate_ray.stages.minhash import MinHashSigner, band_hashes

    docs = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text", "source"]) \
        .sort_by("doc_id")
    fids = [f"{s}::doc{d}.txt" for s, d in
            zip(docs.column("source").to_pylist(),
                docs.column("doc_id").to_pylist())]
    cfg = PipelineConfig()
    sig = MinHashSigner(cfg).signature_matrix(
        [t or "" for t in docs.column("text").to_pylist()])
    bh = band_hashes(sig, cfg.lsh_bands, cfg.lsh_rows)      # (n, 32) int64
    fold = _fold16(sig)                                     # (n, 128) uint16
    n, b = bh.shape
    bands_t = pa.table({
        "file_id": pa.array(np.repeat(fids, b), pa.string()),
        "band_id": pa.array(np.tile(np.arange(b, dtype=np.int32), n)),
        "band_hash": pa.array(bh.reshape(-1), pa.int64()),
    })
    p = fold.shape[1]
    fold_t = pa.table({
        "file_id": pa.array(np.repeat(fids, p), pa.string()),
        "pos": pa.array(np.tile(np.arange(p, dtype=np.int32), n)),
        "val": pa.array(fold.reshape(-1).astype(np.int32), pa.int32()),
    })
    return bands_t, fold_t


def build_ann_tables(sf_dir: str):
    """(lsh_buckets, lsh_probes, ivf_lists, ivf_probes) pins for the
    knn_cosine_lsh / knn_cosine_ivf oracles.

    Same bucketing as the queries (hyperplane signs at num_planes=6 /
    seed 42 with 1-bit multi-probe; spherical k-means n_lists=16 /
    n_probe=4 trained on the same first-rows sample): the candidate SET
    per query is pinned, and DuckDB independently recomputes the exact
    cosine top-k over it."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from deduplicate_ray.stages.similarity import (
        _normalize, hyperplane_signs, probe_buckets, train_kmeans)

    emb_t = _pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                           columns=["vec_id", "embedding"])
    ids = np.asarray(emb_t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.asarray(emb_t.column("embedding").combine_chunks().flatten(),
                      dtype=np.float64).reshape(len(ids), -1)
    order = np.argsort(ids)
    qn = _normalize(vecs[order[ids[order] < 5]])  # vec_id < 5 in id order

    # --- LSH: num_planes=6, seed=42, n_probe_bits=1 (query defaults) ---
    num_planes, n_probe_bits = 6, 1
    rng = np.random.Generator(np.random.PCG64(42))
    planes = rng.standard_normal((num_planes, vecs.shape[1]))
    buckets = hyperplane_signs(_normalize(vecs), planes)
    qbuckets = hyperplane_signs(qn, planes)
    lsh_t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                      "bucket": pa.array(buckets, pa.int64())})
    pq_rows, pb_rows = [], []
    for qi, qb in enumerate(qbuckets):
        for bkt in sorted(probe_buckets(qb, num_planes, n_probe_bits)):
            pq_rows.append(qi)
            pb_rows.append(int(bkt))
    lsh_probes_t = pa.table({
        "query_id": pa.array(pq_rows, pa.int64()),
        "bucket": pa.array(pb_rows, pa.int64())})

    # --- IVF: n_lists=16, n_probe=4, sample=first 10k rows (query cfg) ---
    n_lists, n_probe = 16, 4
    sample = vecs[:10_000]
    cents = train_kmeans(sample, n_lists, seed=42)
    lists = np.argmax(_normalize(vecs) @ _normalize(cents).T,
                      axis=1).astype(np.int64)
    ivf_t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                      "ivf_list": pa.array(lists, pa.int64())})
    qsims = qn @ cents.T
    probes = np.argpartition(-qsims, n_probe - 1, axis=1)[:, :n_probe]
    ivf_probes_t = pa.table({
        "query_id": pa.array(np.repeat(np.arange(len(qn), dtype=np.int64),
                                       n_probe), pa.int64()),
        "ivf_list": pa.array(np.sort(probes, axis=1).reshape(-1)
                             .astype(np.int64), pa.int64())})
    return lsh_t, lsh_probes_t, ivf_t, ivf_probes_t


def build_semdedup_table(sf_dir: str):
    """(vec_id, sem_cluster) pin for the semdedup_embeddings oracle —
    the trained-quantizer artifact, same recipe as the IVF pin: spherical
    k-means (n_clusters=16 / seed 42) on the first-10k-rows sample in
    file order, nearest-centroid assignment in float64. The KEEP relation
    itself is recomputed independently by DuckDB (earlier-same-cluster
    EXISTS over list_cosine_similarity)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from deduplicate_ray.stages.similarity import _normalize, train_kmeans

    emb_t = _pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                           columns=["vec_id", "embedding"])
    ids = np.asarray(emb_t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.asarray(emb_t.column("embedding").combine_chunks().flatten(),
                      dtype=np.float64).reshape(len(ids), -1)
    cents = train_kmeans(vecs[:10_000], 16, seed=42)
    clusters = np.argmax(_normalize(vecs) @ _normalize(cents).T, axis=1)
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "sem_cluster": pa.array(clusters, pa.int64())})


def main() -> None:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sim_t, fp_t = build_tables(sf_dir)
    pq.write_table(sim_t, os.path.join(out_dir,
                                       "pinned_simhash_sf001.parquet"))
    pq.write_table(fp_t, os.path.join(out_dir,
                                      "pinned_fingerprint_sf001.parquet"))
    bands_t, fold_t = build_minhash_tables(sf_dir)
    pq.write_table(bands_t, os.path.join(
        out_dir, "pinned_minhash_bands_sf001.parquet"))
    pq.write_table(fold_t, os.path.join(
        out_dir, "pinned_minhash_fold16_sf001.parquet"))
    lsh_t, lsh_p, ivf_t, ivf_p = build_ann_tables(sf_dir)
    pq.write_table(lsh_t, os.path.join(
        out_dir, "pinned_annlsh_buckets_sf001.parquet"))
    pq.write_table(lsh_p, os.path.join(
        out_dir, "pinned_annlsh_probes_sf001.parquet"))
    pq.write_table(ivf_t, os.path.join(
        out_dir, "pinned_ivf_lists_sf001.parquet"))
    pq.write_table(ivf_p, os.path.join(
        out_dir, "pinned_ivf_probes_sf001.parquet"))
    sem_t = build_semdedup_table(sf_dir)
    pq.write_table(sem_t, os.path.join(
        out_dir, "pinned_semdedup_clusters_sf001.parquet"))
    print(f"pinned {sim_t.num_rows} simhash rows, "
          f"{fp_t.num_rows} fingerprint rows, "
          f"{bands_t.num_rows} band rows, {fold_t.num_rows} fold rows, "
          f"{lsh_t.num_rows}+{lsh_p.num_rows} lsh rows, "
          f"{ivf_t.num_rows}+{ivf_p.num_rows} ivf rows -> {out_dir}")
    ray.shutdown()


if __name__ == "__main__":
    main()
