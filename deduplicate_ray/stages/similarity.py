"""Similarity search over an embedding column (``list<float>``).

* :func:`knn_cosine` — brute-force cosine top-k: the query matrix is
  normalized once on the driver and broadcast via ``ray.put`` (read once per
  task, never re-shipped per batch); each ``map_batches`` computes a numpy
  matmul against its batch and emits only the per-batch local top-k per
  query, so the global reduce sees ``O(num_batches * k)`` rows, not the
  corpus. Global top-k = one small ``groupby(query_id).map_groups``.
* :func:`lsh_buckets` / :func:`knn_cosine_lsh` — the scale path: random
  hyperplane signatures bucket vectors so each query probes only its bucket
  (and optionally neighboring buckets); recall traded for a
  ``2^planes``-fold candidate reduction. Bucketing assumption documented:
  vectors are compared only within probed buckets.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

logger = logging.getLogger(__name__)


def _normalize(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col).combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    return flat.reshape(batch.num_rows, -1)


def knn_cosine(embeddings: rd.Dataset, queries: np.ndarray, k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding",
               round_to: int | None = 4) -> rd.Dataset:
    """Top-k cosine neighbors of each query row. Output:
    ``(query_id:int64, vec_id, score:double)``, deterministic tie-break on
    ``vec_id``; scores optionally rounded for cross-engine comparability."""
    qn = _normalize(queries)
    qref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        e = _normalize(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch.column(id_col).to_pylist())
        sims = e @ q.T  # (n, nq)
        nq = q.shape[0]
        out_q, out_i, out_s = [], [], []
        kk = min(k, len(ids))
        for qi in range(nq):
            s = sims[:, qi]
            idx = np.argpartition(-s, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
            out_q.extend([qi] * len(idx))
            out_i.extend(ids[idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_i),
            "score": pa.array(out_s, pa.float64()),
        })

    local = embeddings.map_batches(local_topk, batch_format="pyarrow",
                                   batch_size=4096)

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True]).head(k)
        if round_to is not None:
            g["score"] = g["score"].round(round_to)
        return g

    return local.groupby("query_id").map_groups(global_topk,
                                                batch_format="pandas")


def hyperplane_signs(vectors: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n,) int64 bucket ids: sign bits against random hyperplanes."""
    bits = (vectors @ planes.T) >= 0  # (n, p)
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def lsh_buckets(embeddings: rd.Dataset, num_planes: int = 8, seed: int = 42,
                vec_col: str = "embedding", dim: int | None = None) -> rd.Dataset:
    """Append a ``bucket`` column from random-hyperplane signatures."""
    state = {"planes": None}

    def bucketize(batch: pa.Table) -> pa.Table:
        e = _normalize(_batch_matrix(batch, vec_col))
        if state["planes"] is None:
            rng = np.random.Generator(np.random.PCG64(seed))
            state["planes"] = rng.standard_normal((num_planes, e.shape[1]))
        b = hyperplane_signs(e, state["planes"])
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    return embeddings.map_batches(bucketize, batch_format="pyarrow")


def probe_buckets(bucket: int, num_planes: int, n_probe_bits: int) -> np.ndarray:
    """Multi-probe set: the bucket itself plus every bucket within Hamming
    distance ``n_probe_bits`` of it (1-bit flips of the hyperplane sign
    word). A near neighbor that lands on the other side of exactly one
    hyperplane — the dominant LSH miss mode — is recovered at the cost of
    ``num_planes`` extra probes per extra bit."""
    out = {int(bucket)}
    frontier = {int(bucket)}
    for _ in range(max(0, n_probe_bits)):
        frontier = {b ^ (1 << i) for b in frontier for i in range(num_planes)}
        out |= frontier
    return np.fromiter(out, dtype=np.int64, count=len(out))


def knn_cosine_lsh(embeddings: rd.Dataset, queries: np.ndarray, k: int = 10,
                   num_planes: int = 6, seed: int = 42,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   n_probe_bits: int = 1) -> rd.Dataset:
    """ANN top-k: probe the bucket each query hashes to plus its
    ``n_probe_bits``-flip neighbors (multi-probe; 0 = single-probe). Scale
    path — trades recall (documented) for a ~2^planes/(1+planes·bits)
    candidate reduction."""
    rng = np.random.Generator(np.random.PCG64(seed))
    qn = _normalize(queries)
    planes = rng.standard_normal((num_planes, qn.shape[1]))
    qbuckets = hyperplane_signs(qn, planes)
    qprobes = [probe_buckets(b, num_planes, n_probe_bits) for b in qbuckets]
    qref = ray.put((qn, planes, qprobes))

    def probe(batch: pa.Table) -> pa.Table:
        q, pl, qp = ray.get(qref)
        e = _normalize(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch.column(id_col).to_pylist())
        eb = hyperplane_signs(e, pl)
        out_q, out_i, out_s = [], [], []
        for qi in range(q.shape[0]):
            mask = np.isin(eb, qp[qi])
            if not mask.any():
                continue
            sub = e[mask]
            s = sub @ q[qi]
            kk = min(k, len(s))
            idx = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) else np.arange(len(s))
            out_q.extend([qi] * len(idx))
            out_i.extend(ids[mask][idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_i),
            "score": pa.array(out_s, pa.float64()),
        })

    local = embeddings.map_batches(probe, batch_format="pyarrow",
                                   batch_size=4096)

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["score", id_col],
                             ascending=[False, True]).head(k)

    return local.groupby("query_id").map_groups(global_topk,
                                                batch_format="pandas")


def train_kmeans(sample: np.ndarray, n_lists: int, iters: int = 10,
                 seed: int = 42) -> np.ndarray:
    """Spherical k-means coarse quantizer (Lloyd's, deterministic seed):
    returns (n_lists, dim) L2-normalized centroids. Runs on a bounded
    SAMPLE on the driver — the IVF training path of every public ANN
    system; assignment stays distributed."""
    s = _normalize(sample)
    # canonicalize the sample ORDER: the caller's sample is gathered from
    # Ray blocks whose arrival order is scheduling-dependent, and both the
    # seeded init choice and (through it) every downstream assignment are
    # order-sensitive — an unsorted sample makes the trained quantizer
    # nondeterministic run-to-run (observed: same multiset, different
    # order at 8 cpus). Lexsort by vector components pins it.
    s = s[np.lexsort(s.T)]
    rng = np.random.Generator(np.random.PCG64(seed))
    n_lists = min(n_lists, len(s))
    cents = s[rng.choice(len(s), size=n_lists, replace=False)]
    for _ in range(iters):
        assign = np.argmax(s @ cents.T, axis=1)
        for c in range(n_lists):
            members = s[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_assign(embeddings: rd.Dataset, centroids: np.ndarray,
               vec_col: str = "embedding") -> rd.Dataset:
    """Append ``ivf_list``: nearest-centroid id per row (one matmul per
    batch against the broadcast centroid matrix)."""
    cref = ray.put(_normalize(centroids))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        e = _normalize(_batch_matrix(batch, vec_col))
        lists = np.argmax(e @ c.T, axis=1).astype(np.int64)
        return batch.append_column("ivf_list", pa.array(lists, pa.int64()))

    return embeddings.map_batches(assign, batch_format="pyarrow")


def knn_cosine_ivf(embeddings: rd.Dataset, queries: np.ndarray, k: int = 10,
                   n_lists: int = 16, n_probe: int = 4,
                   sample_size: int = 10_000, seed: int = 42,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> rd.Dataset:
    """IVF ANN top-k (the coarse-quantizer scale path named by the brief):
    train n_lists spherical-k-means centroids on a bounded sample, assign
    every vector to its nearest list (distributed, one matmul per batch),
    and score each query only against rows of its ``n_probe`` nearest
    lists — candidate work falls ~n_lists/n_probe-fold vs brute force.
    Recall is governed by n_probe (n_probe == n_lists degenerates to exact
    brute force); output schema matches :func:`knn_cosine`."""
    sample_tbl = embeddings.limit(sample_size).select_columns([vec_col])
    sample = np.concatenate([
        _batch_matrix(b, vec_col)
        for b in sample_tbl.iter_batches(batch_format="pyarrow",
                                         batch_size=4096)])
    cents = train_kmeans(sample, n_lists, seed=seed)
    qn = _normalize(queries)
    n_probe = min(n_probe, len(cents))
    # per-query probe set: the n_probe nearest centroids
    qsims = qn @ cents.T
    probes = np.argpartition(-qsims, n_probe - 1, axis=1)[:, :n_probe]
    qref = ray.put((qn, _normalize(cents), probes))

    def probe(batch: pa.Table) -> pa.Table:
        q, c, pr = ray.get(qref)
        e = _normalize(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch.column(id_col).to_pylist())
        lists = np.argmax(e @ c.T, axis=1)
        out_q, out_i, out_s = [], [], []
        for qi in range(q.shape[0]):
            mask = np.isin(lists, pr[qi])
            if not mask.any():
                continue
            sub = e[mask]
            s = sub @ q[qi]
            kk = min(k, len(s))
            idx = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) \
                else np.arange(len(s))
            out_q.extend([qi] * len(idx))
            out_i.extend(ids[mask][idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_i),
            "score": pa.array(out_s, pa.float64()),
        })

    local = embeddings.map_batches(probe, batch_format="pyarrow",
                                   batch_size=4096)

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["score", id_col],
                             ascending=[False, True]).head(k)

    return local.groupby("query_id").map_groups(global_topk,
                                                batch_format="pandas")


def semdedup(embeddings: rd.Dataset, n_clusters: int = 16, tau: float = 0.85,
             sample_size: int = 10_000, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             tile_rows: int = 100_000,
             warn_cluster_rows: int = 200_000) -> rd.Dataset:
    """SemDeDup semantic dedup (Abbas et al. 2023, arXiv:2303.09540 —
    public): cluster the embedding space with spherical k-means, then
    within each cluster drop every vector whose cosine similarity to a
    LOWER-id vector of the same cluster reaches ``tau`` (the deterministic
    keep-lowest-id variant of the paper's keep-one-per-duplicate-group
    rule; dropped rows still suppress later rows, exactly the
    ``EXISTS(earlier row with sim >= tau)`` relation the SQL oracle
    recomputes). Returns ``(id_col, sem_cluster, keep)`` for every input
    row. Reference analog: none — this is a beyond-reference LLM-curation
    operator; the reference dedups byte-identical files only
    (dupe_analysis.py hash cascade).

    Scale contract: k-means trains on a bounded driver sample (the same
    IVF recipe as :func:`knn_cosine_ivf`); assignment is one matmul per
    batch against the broadcast centroid matrix; the only shuffle is the
    groupby on ``sem_cluster``. Per-cluster work is all-pairs BY DESIGN
    (the published algorithm) — ``n_clusters`` is the knob that bounds
    cluster size to ~N/k rows per task. Skewed / oversized clusters are
    processed in id-ordered tiles of ``tile_rows``: tile j is compared
    against itself (upper triangle) and every earlier tile, so peak
    memory is O(tile_rows * dim + tile_rows^2 * 0) — two tile matrices
    and one (tile x tile) sim block — while preserving the lower-id rule
    bit-for-bit.

    SIZING RULE (load-bearing at corpus scale): total compute is
    O(N^2 / n_clusters) dot products, so ``n_clusters`` must GROW with N —
    set ``n_clusters ~= N / target_cluster_rows`` with target_cluster_rows
    in the 10k-100k range (the paper's ImageNet config is ~50k rows per
    cluster). The default 16 is a small-data/test setting; a warning is
    logged whenever the projected MEAN cluster size N / n_clusters exceeds
    ``warn_cluster_rows``, because e.g. 1B rows into 16 clusters is
    ~4e15 dot products per cluster task — unrunnable, and silently so
    without the guard.
    """
    n_total = embeddings.count()   # metadata-only on parquet/pinned inputs
    mean_cluster = n_total / max(n_clusters, 1)
    if mean_cluster > warn_cluster_rows:
        logger.warning(
            "semdedup: n_clusters=%d projects a MEAN cluster of ~%d rows "
            "over %d inputs — per-cluster all-pairs is O(rows^2), so this "
            "run will do ~%.2g dot products per average cluster. Raise "
            "n_clusters to ~N/target_cluster_rows (e.g. %d for 50k-row "
            "clusters); see the sizing rule in the docstring.",
            n_clusters, int(mean_cluster), n_total, mean_cluster ** 2 / 2,
            max(1, n_total // 50_000))
    sample_tbl = embeddings.limit(sample_size).select_columns([vec_col])
    sample = np.concatenate([
        _batch_matrix(b, vec_col)
        for b in sample_tbl.iter_batches(batch_format="pyarrow",
                                         batch_size=4096)])
    cents = train_kmeans(sample, n_clusters, seed=seed)
    assigned = ivf_assign(embeddings, cents, vec_col).map_batches(
        lambda t: t.rename_columns(
            [("sem_cluster" if c == "ivf_list" else c)
             for c in t.column_names]),
        batch_format="pyarrow")

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g[id_col].to_numpy(), kind="stable")
        ids = g[id_col].to_numpy()[order]
        vecs = _normalize(np.stack(g[vec_col].to_numpy()))[order]
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        for j0 in range(0, n, tile_rows):
            j1 = min(j0 + tile_rows, n)
            blk = vecs[j0:j1]
            dropped = np.zeros(j1 - j0, dtype=bool)
            for i0 in range(0, j1, tile_rows):
                i1 = min(i0 + tile_rows, j1)
                sims = vecs[i0:i1] @ blk.T          # (earlier-or-self, blk)
                hit = sims >= tau
                if i0 == j0:
                    # same tile: only strictly-earlier rows count
                    hit = np.triu(hit, k=1)
                dropped |= hit.any(axis=0)
            keep[j0:j1] = ~dropped
        return pd.DataFrame({
            id_col: ids,
            "sem_cluster": np.full(n, g["sem_cluster"].iloc[0],
                                   dtype=np.int64),
            "keep": keep,
        })

    return assigned.groupby("sem_cluster").map_groups(
        dedup_group, batch_format="pandas")
