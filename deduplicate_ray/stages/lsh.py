"""Stage 2b — LSH band bucketing → candidate pair edges, with skew salting.

The shuffle key is ``(band_id, band_hash)``. Boilerplate-heavy corpora put
thousands of files in one bucket (north_rule skew clause); mitigations, in
order:

1. **Exact-family collapse** upstream (Stage 1) — identical files never reach
   this shuffle (the single biggest skew killer, SURVEY §4.3).
2. **Salting** — buckets whose size exceeds ``cfg.salt_threshold`` are split
   into ``ceil(n/salt_threshold)`` sub-buckets by a hash of ``file_id``.
   Bucket sizes come from a cheap pre-aggregate (counts only), and the
   oversized-key table is broadcast.  Sub-buckets are re-linked through a
   deterministic anchor pseudo-node (``~bucket:band:hash`` — '~' sorts after
   all real file_ids so min-label cluster ids stay real file_ids), so
   union-find connectivity is preserved without a second skewed shuffle.
3. **Bounded pair expansion** — a bucket of n members emits all n(n-1)/2
   pairs only while ``n <= cfg.max_bucket_pairs``; larger buckets emit
   star-to-representative + sorted-adjacent chain edges (O(n), connectivity
   preserved; truncation counted in the ``truncated_buckets`` metric and
   logged).

Candidate verification re-estimates Jaccard from the MinHash signatures
(fraction of equal components) and drops pairs below
``cfg.verify_threshold``.  The small-side path broadcasts the signature
table once via ``ray.put``; the scale path is a two-sided hash join.
Anchor edges carry no signatures and always survive verification.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count

from deduplicate_ray.config import PipelineConfig

logger = logging.getLogger(__name__)

ANCHOR_PREFIX = "~bucket:"


def _fid_salt(fid: str, k: int) -> int:
    # stable across processes (not Python's randomized hash()); 1-based so a
    # salted sub-bucket can never collide with the salt=0 "unsalted"
    # sentinel (sub-bucket 0 would otherwise miss its anchor edge and
    # disconnect from the rest of its bucket)
    import zlib
    return 1 + zlib.crc32(fid.encode()) % k


def add_salt(bands: rd.Dataset, cfg: PipelineConfig) -> rd.Dataset:
    """Append the ``salt`` column: 0 normally; hash(file_id) % k for rows in
    oversized buckets. The oversized-key → k map is tiny and broadcast."""
    sizes = bands.groupby(["band_id", "band_hash"]).aggregate(Count(alias_name="n"))
    big = sizes.filter(expr=f"n > {cfg.salt_threshold}")
    big_rows = big.take_all()  # bounded: one row per *oversized* bucket
    if big_rows:
        logger.info("lsh: salting %d oversized band buckets (max n=%d)",
                    len(big_rows), max(r["n"] for r in big_rows))
    kmap = {
        (r["band_id"], r["band_hash"]): -(-r["n"] // cfg.salt_threshold)
        for r in big_rows
    }
    ref = ray.put(kmap)

    def salt(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        if not m:
            return batch.append_column(
                "salt", pa.array(np.zeros(batch.num_rows, dtype=np.int32)))
        bids = batch.column("band_id").to_pylist()
        bhs = batch.column("band_hash").to_pylist()
        fids = batch.column("file_id").to_pylist()
        salts = [
            _fid_salt(f, k) if (k := m.get((bid, bh), 0)) > 1 else 0
            for bid, bh, f in zip(bids, bhs, fids)
        ]
        return batch.append_column("salt", pa.array(salts, pa.int32()))

    return bands.map_batches(salt, batch_format="pyarrow")


def candidate_pairs(bands: rd.Dataset, cfg: PipelineConfig | None = None) -> rd.Dataset:
    """Exploded band rows → deduped candidate edge relation ``(src, dst)``
    with ``src < dst`` (anchor edges have ``dst`` = anchor node).

    Physical plan: rows are hash-partitioned on the full bucket key into
    ``4 * num_partitions`` partitions, and each partition (MANY buckets) is
    processed by one vectorized ``map_groups`` call: singleton buckets —
    the vast majority — are dropped with one pandas ``transform('size')``
    before any per-bucket Python runs. (A naive per-bucket ``map_groups``
    costs ~0.1 ms of pandas overhead per bucket: 500k buckets ≈ 70 s of
    pure overhead; this plan makes it O(partitions).)
    """
    cfg = cfg or PipelineConfig()
    salted = add_salt(bands, cfg)
    max_n = cfg.max_bucket_pairs
    n_parts = cfg.num_partitions * 4

    def add_part(batch: pa.Table) -> pa.Table:
        bh = np.asarray(batch.column("band_hash").to_pylist(), dtype=np.int64)
        bid = np.asarray(batch.column("band_id").to_pylist(), dtype=np.int64)
        salt = np.asarray(batch.column("salt").to_pylist(), dtype=np.int64)
        mix = (bh.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               ^ bid.view(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
               ^ salt.view(np.uint64) * np.uint64(0x165667B19E3779F9))
        return batch.append_column(
            "_p", pa.array((mix % np.uint64(n_parts)).astype(np.int32)))

    parted = salted.map_batches(add_part, batch_format="pyarrow")

    def emit_partition(g: pd.DataFrame) -> pd.DataFrame:
        keys = ["band_id", "band_hash", "salt"]
        g = g.drop_duplicates(subset=keys + ["file_id"])
        sizes = g.groupby(keys, sort=False)["file_id"].transform("size")
        src: list[str] = []
        dst: list[str] = []
        multi = g[sizes >= 2]
        for (bid, bh, salt), sub in multi.groupby(keys, sort=False):
            fids = sorted(sub["file_id"])
            n = len(fids)
            if n <= max_n:
                for i in range(n):
                    for j in range(i + 1, n):
                        src.append(fids[i]); dst.append(fids[j])
            else:
                # star to representative + sorted-adjacent chain: O(n)
                # edges, connectivity preserved; pair-level completeness
                # truncated (counted by truncation_metrics).
                rep = fids[0]
                src.extend([rep] * (n - 1)); dst.extend(fids[1:])
                src.extend(fids[1:-1]); dst.extend(fids[2:])
        # salted sub-buckets bridge through the bucket anchor (vectorized)
        srows = g[g["salt"] != 0]
        if len(srows):
            mins = srows.groupby(keys, sort=False)["file_id"].min().reset_index()
            src.extend(mins["file_id"].tolist())
            dst.extend(ANCHOR_PREFIX + mins["band_id"].astype(str) + ":"
                       + mins["band_hash"].astype(str))
        return pd.DataFrame({"src": src, "dst": dst}, columns=["src", "dst"])

    edges = parted.groupby("_p").map_groups(emit_partition,
                                            batch_format="pandas")
    # multi-band duplicates of the same pair collapse before verification
    return edges.groupby(["src", "dst"]).aggregate(Count(alias_name="_nb")) \
                .select_columns(["src", "dst"])


def truncation_metrics(bands: rd.Dataset, cfg: PipelineConfig | None = None) -> dict:
    """No-silent-caps accounting: buckets whose pair expansion was truncated
    and buckets that were salted."""
    cfg = cfg or PipelineConfig()
    sizes = bands.groupby(["band_id", "band_hash"]).aggregate(Count(alias_name="n"))
    trunc = sizes.filter(expr=f"n > {cfg.max_bucket_pairs}").count()
    salted = sizes.filter(expr=f"n > {cfg.salt_threshold}").count()
    return {"truncated_buckets": trunc, "salted_buckets": salted}


def verify_pairs(edges: rd.Dataset, signatures: rd.Dataset,
                 cfg: PipelineConfig | None = None,
                 broadcast_limit: int = 500_000) -> rd.Dataset:
    """Drop candidate pairs whose MinHash Jaccard estimate is below
    ``cfg.verify_threshold``. Output adds ``jaccard_est: double``."""
    cfg = cfg or PipelineConfig()
    if cfg.verify_threshold <= 0:
        return edges.map_batches(
            lambda t: t.append_column(
                "jaccard_est", pa.array(np.ones(t.num_rows, dtype=np.float64))),
            batch_format="pyarrow")

    n_sigs = signatures.count()
    if n_sigs <= broadcast_limit:
        sig_map = {}
        for b in signatures.iter_batches(batch_format="pyarrow"):
            fids = b.column("file_id").to_pylist()
            mat = np.asarray(b.column("sig").combine_chunks().flatten()).reshape(
                len(fids), -1)
            for i, f in enumerate(fids):
                sig_map[f] = mat[i]
        ref = ray.put(sig_map)
        thr = cfg.verify_threshold

        def verify(batch: pa.Table) -> pa.Table:
            sigs = ray.get(ref)
            srcs = batch.column("src").to_pylist()
            dsts = batch.column("dst").to_pylist()
            est = np.empty(len(srcs), dtype=np.float64)
            for i, (s, d) in enumerate(zip(srcs, dsts)):
                if d.startswith(ANCHOR_PREFIX) or s.startswith(ANCHOR_PREFIX):
                    est[i] = 1.0
                    continue
                sa, sb = sigs.get(s), sigs.get(d)
                est[i] = float(np.mean(sa == sb)) if sa is not None and sb is not None else 1.0
            batch = batch.append_column("jaccard_est", pa.array(est))
            return batch.filter(pa.array(est >= thr))

        return edges.map_batches(verify, batch_format="pyarrow")

    # scale path: two bucketed hash joins carry each side's signature to the
    # edge relation
    from deduplicate_ray.stages.joins import bucket_join

    def _renamed(side: str) -> rd.Dataset:
        return signatures.map_batches(
            lambda t, side=side: t.rename_columns([side, f"sig_{side}"]),
            batch_format="pyarrow")

    joined = bucket_join(edges, _renamed("src"), on="src", how="left",
                         num_buckets=cfg.num_partitions)
    joined = bucket_join(joined, _renamed("dst"), on="dst", how="left",
                         num_buckets=cfg.num_partitions)
    thr = cfg.verify_threshold

    def verify_joined(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        est = np.ones(n, dtype=np.float64)
        sa_col, sb_col = batch.column("sig_src"), batch.column("sig_dst")
        for i in range(n):
            sa, sb = sa_col[i].as_py(), sb_col[i].as_py()
            if sa is not None and sb is not None:
                est[i] = float(np.mean(np.array(sa) == np.array(sb)))
        batch = batch.append_column("jaccard_est", pa.array(est))
        return batch.filter(pa.array(est >= thr)).drop_columns(["sig_src", "sig_dst"])

    return joined.map_batches(verify_joined, batch_format="pyarrow")
