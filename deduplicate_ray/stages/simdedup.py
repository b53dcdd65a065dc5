"""Additional near-dup detectors: SimHash, n-gram Jaccard, embedding-cosine.

Each is a first-class dedup operation over a text (or embedding) column,
complementing the MinHash/LSH flagship (SURVEY §2.7 D4):

* **SimHash** — 64-bit weighted sign fingerprint of token hashes; documents
  within Hamming distance ``max_hamming`` are near-dups. Candidate
  generation bands the 64 bits into ``64/band_bits`` chunks (pigeonhole: any
  pair within distance d collides on >= one band when bands > d), then an
  exact Hamming verify per candidate pair.
* **n-gram Jaccard** — word n-gram sets compared with exact Jaccard;
  candidates from MinHash bands (reusing the Stage-2 machinery) and
  verified with the true set Jaccard (broadcast n-gram sets at test scale,
  signature estimate at 100 TB scale — documented).
* **embedding cosine** — near-dup pairs among vectors with cosine >=
  threshold; candidates from random-hyperplane buckets, verified exactly.

Each returns an edge relation; clustering is the shared union-find.
"""

from __future__ import annotations

import itertools
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count

from deduplicate_ray.stages.similarity import (_batch_matrix, _normalize,
                                               hyperplane_signs, lsh_buckets)

_TOKEN = re.compile(r"\w+")


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (term-frequency weighted)."""
    v = np.zeros(64, dtype=np.int64)
    for tok in _TOKEN.findall((text or "").lower()):
        h = np.uint64(hash_token(tok))
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        v += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if v[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hash_token(tok: str) -> int:
    import zlib
    a = zlib.crc32(tok.encode())
    b = zlib.crc32(tok[::-1].encode() + b"#")
    return (a << 32) | b


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def add_simhash(ds: rd.Dataset, text_col: str = "text",
                out_col: str = "simhash") -> rd.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        hs = [simhash64(t) for t in batch.column(text_col).to_pylist()]
        return batch.append_column(out_col, pa.array(np.array(hs, dtype=np.uint64).view(np.int64)))
    return ds.map_batches(f, batch_format="pyarrow")


def simhash_edges(ds_with_hash: rd.Dataset, id_col: str,
                  max_hamming: int = 3, band_bits: int = 16,
                  hash_col: str = "simhash") -> rd.Dataset:
    """Candidate pairs from band collisions, verified by exact Hamming
    distance. With 64/band_bits=4 bands, any pair within distance 3 shares
    at least one full band (pigeonhole) — recall 1.0 at max_hamming <= 3."""
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1

    def explode(batch: pa.Table) -> pa.Table:
        hs = np.asarray(batch.column(hash_col).to_pylist(), dtype=np.int64).view(np.uint64)
        ids = batch.column(id_col).to_pylist()
        out_b, out_k, out_i, out_h = [], [], [], []
        for b in range(n_bands):
            chunk = (hs >> np.uint64(b * band_bits)) & np.uint64(mask)
            out_b.extend([b] * len(ids))
            out_k.extend(chunk.tolist())
            out_i.extend(ids)
            out_h.extend(hs.view(np.int64).tolist())
        return pa.table({
            "band_id": pa.array(out_b, pa.int32()),
            "band_key": pa.array(out_k, pa.int64()),
            id_col: pa.array(out_i),
            hash_col: pa.array(out_h, pa.int64()),
        })

    bands = ds_with_hash.map_batches(explode, batch_format="pyarrow")

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(g[id_col], g[hash_col])))
        src, dst, dist = [], [], []
        for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
            d = hamming64(int(ha) & 0xFFFFFFFFFFFFFFFF, int(hb) & 0xFFFFFFFFFFFFFFFF)
            if d <= max_hamming:
                src.append(ia); dst.append(ib); dist.append(d)
        return pd.DataFrame({"src": src, "dst": dst, "hamming": dist},
                            columns=["src", "dst", "hamming"])

    edges = bands.groupby(["band_id", "band_key"]).map_groups(
        emit, batch_format="pandas")
    return edges.groupby(["src", "dst"]).aggregate(
        Count(alias_name="_nb")).select_columns(["src", "dst"])


def ngram_set(text: str, n: int = 3) -> frozenset:
    toks = _TOKEN.findall((text or "").lower())
    if len(toks) < n:
        return frozenset([" ".join(toks)]) if toks else frozenset()
    return frozenset(" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))


def ngram_jaccard_edges(ds: rd.Dataset, id_col: str, text_col: str = "text",
                        n: int = 3, threshold: float = 0.8,
                        broadcast_limit: int = 200_000) -> rd.Dataset:
    """Exact word-n-gram Jaccard pairs >= threshold.

    Candidates: all pairs within hash buckets of the n-gram MinHash (one
    permutation, 16-bit band) — at corpus scale replace the exact verify
    with the MinHash estimate (Stage-2 path). The n-gram sets of the
    candidate universe are broadcast (bounded by ``broadcast_limit`` docs).
    """
    n_docs = ds.count()
    if n_docs > broadcast_limit:
        raise NotImplementedError(
            "exact n-gram verify is the small-corpus path; use the MinHash "
            "pipeline (pipelines.dedup) at scale")
    rows = ds.select_columns([id_col, text_col]).take_all()
    sets = {r[id_col]: ngram_set(r[text_col], n) for r in rows}
    ref = ray.put(sets)

    # candidate buckets: min n-gram hash (cheap single-perm LSH)
    def bucket(batch: pa.Table) -> pa.Table:
        import zlib
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        bks = []
        for t in texts:
            s = ngram_set(t, n)
            bks.append(min((zlib.crc32(g.encode()) for g in s), default=0) & 0xFFFF)
        return pa.table({id_col: pa.array(ids), "bucket": pa.array(bks, pa.int64())})

    buckets = ds.map_batches(bucket, batch_format="pyarrow")

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        all_sets = ray.get(ref)
        ids = sorted(set(g[id_col]))
        src, dst, jac = [], [], []
        for a, b in itertools.combinations(ids, 2):
            sa, sb = all_sets[a], all_sets[b]
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                src.append(a); dst.append(b); jac.append(j)
        return pd.DataFrame({"src": src, "dst": dst, "jaccard": jac},
                            columns=["src", "dst", "jaccard"])

    return buckets.groupby("bucket").map_groups(emit, batch_format="pandas")


def embedding_cosine_edges(embeddings: rd.Dataset, threshold: float = 0.95,
                           num_planes: int = 6, seed: int = 42,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> rd.Dataset:
    """Near-dup pairs among embedding vectors: random-hyperplane buckets →
    exact cosine verify within bucket. Bucketing assumption documented:
    pairs landing in different buckets are missed (multi-probe/multi-table
    raises recall at scale)."""
    bucketed = lsh_buckets(embeddings, num_planes=num_planes, seed=seed,
                           vec_col=vec_col)

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        vecs = _normalize(np.stack(g[vec_col].to_numpy()))
        sims = vecs @ vecs.T
        src, dst, sc = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    src.append(a); dst.append(b); sc.append(float(sims[i, j]))
        return pd.DataFrame({"src": src, "dst": dst, "cosine": sc},
                            columns=["src", "dst", "cosine"])

    return bucketed.select_columns([id_col, vec_col, "bucket"]).groupby(
        "bucket").map_groups(emit, batch_format="pandas")
