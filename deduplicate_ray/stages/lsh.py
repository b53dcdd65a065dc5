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
from ray.data.aggregate import Count, Min

from deduplicate_ray.config import PipelineConfig
from deduplicate_ray.stages.joins import stable_hash

logger = logging.getLogger(__name__)

# retained for backward compatibility with old checkpoints; new pipelines
# emit no anchor pseudo-nodes (sub-buckets are bridged with real,
# verifiable edges — see bridge_edges)
ANCHOR_PREFIX = "~bucket:"

# per-worker-process cache for the broadcast verify state (see verify_fn)
_VERIFY_CACHE: dict = {}

# max census rows shipped to every task for singleton pre-filtering; past
# this the filter is skipped (salting-only fallback) — see candidate_pairs
_CENSUS_BROADCAST_LIMIT = 5_000_000


def _int_col(batch: pa.Table, name: str) -> np.ndarray:
    return batch.column(name).combine_chunks().to_numpy(zero_copy_only=False)


def _mix_keys(bh: np.ndarray, bid: np.ndarray) -> np.ndarray:
    """Combined 64-bit bucket key from (band_hash, band_id) int64 arrays."""
    mix = (bh.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
           ^ bid.view(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
    return mix.view(np.int64)


def _partition_col(batch: pa.Table, n_parts: int, with_salt: bool) -> pa.Table:
    bh = _int_col(batch, "band_hash").astype(np.int64)
    bid = _int_col(batch, "band_id").astype(np.int64)
    mix = (bh.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
           ^ bid.view(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
    if with_salt:
        salt = _int_col(batch, "salt").astype(np.int64)
        mix = mix ^ salt.view(np.uint64) * np.uint64(0x165667B19E3779F9)
    return batch.append_column(
        "_p", pa.array((mix % np.uint64(n_parts)).astype(np.int32)))


def bucket_census(bands: rd.Dataset, cfg: PipelineConfig) -> pd.DataFrame:
    """Exact per-bucket member counts for every MULTI-member bucket
    (``n >= 2``), as one driver DataFrame ``(band_id, band_hash, n)``.

    One narrow shuffle of the (band_id, band_hash) int pairs — the
    file_id strings never move. The census drives BOTH skew decisions:

    * rows in buckets absent from the census are singletons and are
      dropped BEFORE the expensive pair shuffle (measured: ~80% of band
      rows on the dup-rich bench corpus — the pair shuffle's input falls
      5x);
    * buckets with ``n > salt_threshold`` get salted sub-buckets.
    """
    n_parts = cfg.num_partitions * 4

    def count_multi(g: pd.DataFrame) -> pd.DataFrame:
        vc = g.groupby(["band_id", "band_hash"], sort=False).size()
        vc = vc[vc > 1]
        out = vc.reset_index()
        out.columns = ["band_id", "band_hash", "n"]
        return out

    parted = bands.select_columns(["band_id", "band_hash"]).map_batches(
        lambda t: _partition_col(t, n_parts, with_salt=False),
        batch_format="pyarrow")
    frames = [b for b in parted.groupby("_p").map_groups(
        count_multi, batch_format="pandas").iter_batches(
        batch_format="pandas", batch_size=None)]
    if not frames:
        return pd.DataFrame({"band_id": pd.Series([], dtype=np.int64),
                             "band_hash": pd.Series([], dtype=np.int64),
                             "n": pd.Series([], dtype=np.int64)})
    return pd.concat(frames, ignore_index=True)


def oversized_buckets(bands: rd.Dataset, cfg: PipelineConfig) -> list[dict]:
    """Bucket keys with more than ``salt_threshold`` members.

    NOT a full ``groupby(bucket_key)`` aggregate: with hundreds of thousands
    of (mostly singleton) buckets, Ray's per-group aggregate overhead
    dominates (~20 s at 2.5M band rows). Instead rows are hash-partitioned
    into ``4*num_partitions`` partitions (whole buckets stay together) and
    each partition counts its keys with one vectorized pandas
    ``value_counts`` — measured ~10x faster, still exact.

    For large thresholds (>= 10k) the probe runs on a ~2% sample: a bucket
    past the threshold is expected to contribute >= 200 sampled rows, so
    detection is reliable while the counting shuffle shrinks 50x (the right
    trade at 10^12-row scale, where exact-counting every band row just to
    find the handful of hot keys is wasted IO). Small thresholds (tests,
    fine-grained salting) stay exact. Estimated counts are scaled back up
    before thresholding.
    """
    n_parts = cfg.num_partitions * 4
    sample_frac = 0.02 if cfg.salt_threshold >= 10_000 else None
    src = bands.select_columns(["band_id", "band_hash"])
    if sample_frac:
        src = src.random_sample(sample_frac, seed=cfg.minhash_seed)
    thr = (cfg.salt_threshold * sample_frac) if sample_frac \
        else cfg.salt_threshold

    def count_big(g: pd.DataFrame) -> pd.DataFrame:
        vc = g.groupby(["band_id", "band_hash"], sort=False).size()
        vc = vc[vc > thr]
        out = vc.reset_index()
        out.columns = ["band_id", "band_hash", "n"]
        if sample_frac:
            out["n"] = (out["n"] / sample_frac).astype(int)
        return out

    parted = src.map_batches(
        lambda t: _partition_col(t, n_parts, with_salt=False),
        batch_format="pyarrow")
    return parted.groupby("_p").map_groups(count_big,
                                           batch_format="pandas").take_all()


def add_salt(bands: rd.Dataset, cfg: PipelineConfig,
             big_rows: list[dict] | None = None) -> rd.Dataset:
    """Append the ``salt`` column: 0 normally; 1 + hash(file_id) % k for
    rows in oversized buckets (1-based so a salted sub-bucket can never
    collide with the salt=0 "unsalted" sentinel). The oversized-key → k
    map is tiny and broadcast; per-batch assignment is one vectorized
    pandas merge + one stable_hash pass — no per-row Python (round-1
    verdict #10)."""
    if big_rows is None:
        big_rows = oversized_buckets(bands, cfg)  # one row per oversized bucket
    if big_rows:
        logger.info("lsh: salting %d oversized band buckets (max n=%d)",
                    len(big_rows), max(r["n"] for r in big_rows))
    kdf = pd.DataFrame(
        {"band_id": [r["band_id"] for r in big_rows],
         "band_hash": [r["band_hash"] for r in big_rows],
         "_k": [max(2, -(-r["n"] // cfg.salt_threshold)) for r in big_rows]})
    ref = ray.put(kdf)

    def salt(batch: pa.Table) -> pa.Table:
        m: pd.DataFrame = ray.get(ref)
        if not len(m):
            return batch.append_column(
                "salt", pa.array(np.zeros(batch.num_rows, dtype=np.int32)))
        keys = pd.DataFrame({
            "band_id": _int_col(batch, "band_id"),
            "band_hash": _int_col(batch, "band_hash")})
        k = keys.merge(m, on=["band_id", "band_hash"], how="left")["_k"] \
            .fillna(0).to_numpy(dtype=np.int64)
        hot = k > 1
        salts = np.zeros(batch.num_rows, dtype=np.int32)
        if hot.any():
            fids = batch.column("file_id").combine_chunks() \
                .to_numpy(zero_copy_only=False)
            h = stable_hash(fids[hot])
            salts[hot] = (1 + (h % k[hot].astype(np.uint64))).astype(np.int32)
        return batch.append_column("salt", pa.array(salts, pa.int32()))

    return bands.map_batches(salt, batch_format="pyarrow")


def bridge_edges(salted: rd.Dataset) -> rd.Dataset:
    """Real, verifiable edges re-linking the sub-buckets of each salted
    band bucket: per (band_id, band_hash, salt) elect the min file_id, then
    per (band_id, band_hash) star every sub-representative to the global
    minimum. Both endpoints are real file_ids carrying signatures, so
    bridges pass through MinHash verification like any other candidate —
    salting changes only the physical plan, never the clustering semantics
    (the round-1 anchor pseudo-edges were verification-exempt and could
    merge dissimilar sub-buckets unconditionally; ADVICE round 1).

    Cost: input is only the salted (oversized-bucket) rows; the first
    groupby runs at sub-bucket granularity (every group <= salt_threshold
    by construction) and its output is one row per sub-bucket — the second
    groupby is tiny."""
    submins = salted.filter(expr="salt != 0") \
        .select_columns(["band_id", "band_hash", "salt", "file_id"]) \
        .groupby(["band_id", "band_hash", "salt"]) \
        .aggregate(Min("file_id", alias_name="sub_min"))

    def star(g: pd.DataFrame) -> pd.DataFrame:
        mins = np.sort(g["sub_min"].to_numpy())
        if len(mins) < 2:
            return pd.DataFrame({"src": [], "dst": []}, dtype=str)
        return pd.DataFrame({"src": np.full(len(mins) - 1, mins[0]),
                             "dst": mins[1:]})

    return submins.groupby(["band_id", "band_hash"]).map_groups(
        star, batch_format="pandas")


def candidate_pairs(bands: rd.Dataset, cfg: PipelineConfig | None = None) -> rd.Dataset:
    """Exploded band rows → deduped candidate edge relation ``(src, dst)``
    with ``src < dst``.

    Physical plan: rows are hash-partitioned on the full (salted) bucket
    key into ``4 * num_partitions`` partitions, and each partition (MANY
    buckets) is processed by one vectorized ``map_groups`` call: singleton
    buckets — the vast majority — are dropped with one pandas
    ``transform('size')`` before any per-bucket Python runs. (A naive
    per-bucket ``map_groups`` costs ~0.1 ms of pandas overhead per bucket:
    500k buckets ≈ 70 s of pure overhead; this plan makes it
    O(partitions).) Salted sub-buckets are re-linked by
    :func:`bridge_edges` — real pairs, verified like any other.
    """
    cfg = cfg or PipelineConfig()
    census = bucket_census(bands, cfg)
    any_salted = bool(len(census)) and bool(
        (census["n"] > cfg.salt_threshold).any())
    if any_salted:
        hot = census[census["n"] > cfg.salt_threshold]
        logger.info("lsh: salting %d oversized band buckets (max n=%d)",
                    len(hot), int(hot["n"].max()))
    # Broadcasting the full multi-bucket census lets every task drop
    # singleton rows before the pair shuffle. Past the broadcast budget
    # (census keys grow with the corpus) fall back to broadcasting only
    # the oversized keys: salting still works, singletons ride the
    # shuffle and are dropped inside emit_partition as before.
    filter_singletons = len(census) <= _CENSUS_BROADCAST_LIMIT
    kdf = census if filter_singletons else \
        census[census["n"] > cfg.salt_threshold]
    kdf = kdf.copy()
    kdf["_k"] = np.where(
        kdf["n"] > cfg.salt_threshold,
        np.maximum(2, -(-kdf["n"] // cfg.salt_threshold)), 0).astype(np.int64)
    # mixed 64-bit bucket key (same mix as _partition_col): one int index
    # lookup per row instead of a two-column merge against the census
    # table on every batch
    kdf["_key"] = _mix_keys(kdf["band_hash"].to_numpy(dtype=np.int64),
                            kdf["band_id"].to_numpy(dtype=np.int64))
    kdf = kdf.drop_duplicates(subset=["_key"])
    ref = ray.put((kdf["_key"].to_numpy(), kdf["_k"].to_numpy()))

    def filter_and_salt(batch: pa.Table) -> pa.Table:
        """Drop singleton-bucket rows (the census is the authority) and
        assign salts — one cached-index lookup serves both decisions."""
        state = _VERIFY_CACHE.get(ref.hex())
        if state is None:
            keys_, ks_ = ray.get(ref)
            state = (pd.Index(keys_), ks_)
            if len(_VERIFY_CACHE) > 4:
                _VERIFY_CACHE.clear()
            _VERIFY_CACHE[ref.hex()] = state
        idx, ks = state
        bkeys = _mix_keys(_int_col(batch, "band_hash").astype(np.int64),
                          _int_col(batch, "band_id").astype(np.int64))
        pos = idx.get_indexer(bkeys)
        if filter_singletons:
            live = pos >= 0
            batch = batch.filter(pa.array(live))
            pos = pos[live]
        k = np.where(pos >= 0, ks[np.clip(pos, 0, None)], 0)
        salts = np.zeros(batch.num_rows, dtype=np.int32)
        hot_rows = k > 1
        if hot_rows.any():
            fids = batch.column("file_id").combine_chunks() \
                .to_numpy(zero_copy_only=False)
            h = stable_hash(fids[hot_rows])
            salts[hot_rows] = (
                1 + (h % k[hot_rows].astype(np.uint64))).astype(np.int32)
        return batch.append_column("salt", pa.array(salts, pa.int32()))

    # NB: the filtered lineage has two consumers when salting is active
    # (pair emit + bridge edges) and is deliberately left lazy — the
    # re-executed filter map is cheap vector work over pinned signature
    # blocks, far cheaper than materializing the exploded band relation.
    salted = bands.map_batches(filter_and_salt, batch_format="pyarrow")
    max_n = cfg.max_bucket_pairs
    n_parts = cfg.num_partitions * 4

    parted = salted.map_batches(
        lambda t: _partition_col(t, n_parts, with_salt=True),
        batch_format="pyarrow")

    def emit_partition(g: pd.DataFrame) -> pd.DataFrame:
        keys = ["band_id", "band_hash", "salt"]
        g = g.drop_duplicates(subset=keys + ["file_id"])
        sizes = g.groupby(keys, sort=False)["file_id"].transform("size")
        srcs: list[np.ndarray] = []
        dsts: list[np.ndarray] = []
        multi = g[sizes >= 2]
        for _, sub in multi.groupby(keys, sort=False):
            fids = np.sort(sub["file_id"].to_numpy())
            n = len(fids)
            if n <= max_n:
                ii, jj = np.triu_indices(n, k=1)
                srcs.append(fids[ii]); dsts.append(fids[jj])
            else:
                # star to representative + sorted-adjacent chain: O(n)
                # edges, connectivity preserved; pair-level completeness
                # truncated (counted by truncation_metrics).
                srcs.append(np.full(n - 1, fids[0])); dsts.append(fids[1:])
                srcs.append(fids[1:-1]); dsts.append(fids[2:])
        if not srcs:
            return pd.DataFrame({"src": [], "dst": []}, dtype=str)
        out = pd.DataFrame({"src": np.concatenate(srcs),
                            "dst": np.concatenate(dsts)})
        # partition-local dedup (same pair from several bands of this
        # partition); the cheap global dedup runs AFTER verification, on the
        # far smaller survivor set (see dedup_edges / verify_pairs ordering)
        return out.drop_duplicates()

    pairs = parted.groupby("_p").map_groups(emit_partition,
                                            batch_format="pandas")
    if not any_salted:
        return pairs
    return pairs.union(bridge_edges(salted))


def dedup_edges(edges: rd.Dataset, num_partitions: int = 16) -> rd.Dataset:
    """Collapse multi-band duplicates of the same pair: hash-partition on
    the pair key (one int32 shuffle key) and ``drop_duplicates`` per
    partition — cheaper than a sort-based groupby over two string columns
    (round-1: ~9 s for a 1M-pair relation emitting 50k rows)."""
    n_parts = num_partitions * 4

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_p", pa.array([], pa.int32()))
        src = t.column("src").combine_chunks().to_numpy(zero_copy_only=False)
        dst = t.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
        h = stable_hash(src) * np.uint64(31) + stable_hash(dst)
        return t.append_column(
            "_p", pa.array((h % np.uint64(n_parts)).astype(np.int32)))

    def drop_dups(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["src", "dst"])[["src", "dst"]]

    return edges.select_columns(["src", "dst"]).map_batches(
        part, batch_format="pyarrow").groupby("_p").map_groups(
        drop_dups, batch_format="pandas")


def truncation_metrics(bands: rd.Dataset, cfg: PipelineConfig | None = None) -> dict:
    """No-silent-caps accounting: buckets whose pair expansion was truncated
    and buckets that were salted."""
    cfg = cfg or PipelineConfig()
    trunc_cfg = PipelineConfig(**{**cfg.__dict__,
                                  "salt_threshold": cfg.max_bucket_pairs})
    trunc = len(oversized_buckets(bands, trunc_cfg))
    salted = len(oversized_buckets(bands, cfg))
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
        # parallel object-store fetch (to_arrow_refs), not a serial
        # iter_batches stream through the driver (round-1: the driver-side
        # signature fetch was Amdahl serial work — ~320 MB at 314k sigs)
        blocks = ray.get(signatures.select_columns(
            ["file_id", "sig"]).to_arrow_refs())
        ids_arrays = [b.column("file_id").combine_chunks() for b in blocks
                      if b.num_rows]
        mats = [np.asarray(b.column("sig").combine_chunks().flatten())
                .reshape(b.num_rows, -1) for b in blocks if b.num_rows]
        ids = pa.concat_arrays(
            [a.cast(pa.string()) for a in ids_arrays]).to_numpy(
            zero_copy_only=False) if ids_arrays else np.array([], object)
        mat = np.concatenate(mats) if mats else np.zeros(
            (0, cfg.num_perms), np.uint64)
        ref = ray.put((ids, mat))
        thr = cfg.verify_threshold

        def verify_fn(batch: pa.Table) -> pa.Table:
            # id index + signature matrix cached once per worker process
            # (broadcast object fetched once); per batch one vectorized
            # indexer pass + one row-gather compare — no per-edge Python.
            state = _VERIFY_CACHE.get(ref.hex())
            if state is None:
                ids_, mat_ = ray.get(ref)
                state = (pd.Index(ids_), mat_)
                _VERIFY_CACHE.clear()   # one live verify set per worker
                _VERIFY_CACHE[ref.hex()] = state
            idx, m = state
            n = batch.num_rows
            if n == 0:
                return batch.append_column("jaccard_est",
                                           pa.array([], pa.float64()))
            srcs = batch.column("src").combine_chunks().to_numpy(
                zero_copy_only=False)
            dsts = batch.column("dst").combine_chunks().to_numpy(
                zero_copy_only=False)
            ia = idx.get_indexer(srcs)
            ib = idx.get_indexer(dsts)
            unknown = (ia < 0) | (ib < 0)   # endpoints with no signature
            est = (m[np.clip(ia, 0, None)] == m[np.clip(ib, 0, None)]) \
                .mean(axis=1)
            est[unknown] = 1.0
            batch = batch.append_column("jaccard_est", pa.array(est))
            return batch.filter(pa.array(est >= thr))

        return edges.map_batches(verify_fn, batch_format="pyarrow",
                                 batch_size=65536)

    # scale path: two bucketed hash joins carry each side's signature to the
    # edge relation — fully distributed, no driver serialization (the
    # broadcast path's driver-side signature fetch is Amdahl serial work
    # that grows with the corpus).
    from deduplicate_ray.stages.joins import bucket_join

    def _renamed(side: str) -> rd.Dataset:
        # signature → one binary blob per row: survives the pandas round
        # trip inside bucket_join intact (list columns degrade to ragged
        # object arrays there)
        def to_blob(t: pa.Table, side=side) -> pa.Table:
            nrows = t.num_rows
            flat = np.asarray(t.column("sig").combine_chunks().flatten(),
                              dtype=np.uint64)
            buf = flat.tobytes()
            w = cfg.num_perms * 8
            blobs = [buf[i * w:(i + 1) * w] for i in range(nrows)]
            return pa.table({side: t.column("file_id"),
                             f"sig_{side}": pa.array(blobs, pa.binary())})

        return signatures.map_batches(to_blob, batch_format="pyarrow")

    joined = bucket_join(edges, _renamed("src"), on="src", how="left",
                         num_buckets=cfg.num_partitions)
    joined = bucket_join(joined, _renamed("dst"), on="dst", how="left",
                         num_buckets=cfg.num_partitions)
    thr = cfg.verify_threshold
    perms = cfg.num_perms

    def verify_joined(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column("jaccard_est",
                                       pa.array([], pa.float64())) \
                        .drop_columns(["sig_src", "sig_dst"])
        est = np.ones(n, dtype=np.float64)

        import pyarrow.compute as pc
        zero_blob = b"\x00" * (perms * 8)

        def to_mat(col) -> tuple[np.ndarray, np.ndarray]:
            # binary-blob column → (n, perms) matrix + null mask
            arr = col.combine_chunks()
            valid = np.asarray(pc.is_valid(arr), dtype=bool)
            blobs = arr.to_pylist()
            joined_buf = b"".join(
                (b if b is not None and len(b) == perms * 8 else zero_blob)
                for b in blobs)
            m = np.frombuffer(joined_buf, dtype=np.uint64).reshape(n, perms)
            return m, valid

        ma, va = to_mat(batch.column("sig_src"))
        mb, vb = to_mat(batch.column("sig_dst"))
        both = va & vb
        est[both] = (ma[both] == mb[both]).mean(axis=1)
        batch = batch.append_column("jaccard_est", pa.array(est))
        return batch.filter(pa.array(est >= thr)).drop_columns(
            ["sig_src", "sig_dst"])

    return joined.map_batches(verify_joined, batch_format="pyarrow",
                              batch_size=65536)
