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


def _id_type_of(t: pa.Table) -> pa.DataType:
    """The document-id dtype riding a band/pair relation — string for the
    classic chain, int64 for the compact int-id chain."""
    for name in ("file_id", "src"):
        if name in t.schema.names:
            return t.schema.field(name).type
    return pa.string()


def _unique_pairs(src: np.ndarray, dst: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Order-free distinct over (src, dst) arrays. Int ids below 2^32 pack
    into one uint64 key for a single ``np.unique`` (the hot path of the
    compact chain); anything else goes through pandas ``drop_duplicates``
    (strings, or a >4G-document id space)."""
    if (src.dtype.kind in "iu" and len(src)
            and int(max(src.max(), dst.max())) < 2**32
            and int(min(src.min(), dst.min())) >= 0):
        packed = (src.astype(np.uint64) << np.uint64(32)) \
            | dst.astype(np.uint64)
        uniq = np.unique(packed)
        return ((uniq >> np.uint64(32)).astype(src.dtype),
                (uniq & np.uint64(0xFFFFFFFF)).astype(dst.dtype))
    df = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
    return df["src"].to_numpy(), df["dst"].to_numpy()


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
            return pd.DataFrame({"src": [], "dst": []},
                                dtype=mins.dtype if len(mins) else str)
        return pd.DataFrame({"src": np.full(len(mins) - 1, mins[0]),
                             "dst": mins[1:]})

    return submins.groupby(["band_id", "band_hash"]).map_groups(
        star, batch_format="pandas")


# max band rows pulled to the driver for the single-threaded census;
# past this the parallel exchange census runs instead (the driver
# np.unique is Amdahl serial time — 15 s at 30M keys — so the limit is
# set where the exchange's task overhead and the driver sort cross over)
_DRIVER_CENSUS_LIMIT = 2_000_000

# max edge rows whose endpoint set is deduped driver-side (strings pulled
# straight off the pinned edge blocks — no extra execution); past this the
# distributed distinct-keys shuffle runs instead
_DRIVER_ENDPOINT_LIMIT = 20_000_000


def _census_keys(bands: rd.Dataset, cfg: PipelineConfig,
                 n_rows_hint: int | None = None
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Sorted ``(keys64, counts)`` of every multi-member bucket (n >= 2).

    Driver path (≤ :data:`_DRIVER_CENSUS_LIMIT` band rows): project the
    mixed 64-bit bucket key per batch (distributed, vectorized), fetch the
    int columns in parallel and count with one ``np.unique`` — cheapest at
    test scale. Past the limit the exchange census runs: per-block
    unique+count map-side combine, hash-range reduce, driver only sorts
    the multi-bucket survivors (``stages.exchange.key_census`` — replaces
    both the 15 s driver ``np.unique`` at 30M keys and the old sort-based
    shuffle census).
    """
    n_rows = n_rows_hint if n_rows_hint is not None else bands.count()
    if n_rows <= _DRIVER_CENSUS_LIMIT:
        def proj(t: pa.Table) -> pa.Table:
            return pa.table({"k": pa.array(_mix_keys(
                _int_col(t, "band_hash").astype(np.int64),
                _int_col(t, "band_id").astype(np.int64)))})

        blocks = ray.get(bands.select_columns(
            ["band_id", "band_hash"]).map_batches(
            proj, batch_format="pyarrow").to_arrow_refs())
        arrs = [b.column("k").combine_chunks().to_numpy()
                for b in blocks if b.num_rows]
        if not arrs:
            return np.array([], np.int64), np.array([], np.int64)
        uk, cnt = np.unique(np.concatenate(arrs), return_counts=True)
        multi = cnt >= 2
        return uk[multi], cnt[multi].astype(np.int64)

    from deduplicate_ray.stages.exchange import key_census

    def key_fn(t: pa.Table) -> np.ndarray:
        return _mix_keys(_int_col(t, "band_hash").astype(np.int64),
                         _int_col(t, "band_id").astype(np.int64))

    return key_census(bands.select_columns(["band_id", "band_hash"]),
                      key_fn, n_parts=cfg.num_partitions * 4, min_count=2)


def candidate_pairs(bands: rd.Dataset, cfg: PipelineConfig | None = None,
                    n_rows_hint: int | None = None) -> rd.Dataset:
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

    ``n_rows_hint``: known band-row count (callers with pinned signatures
    pass ``n_sigs * lsh_bands``) — saves a counting pass over the lazy
    band lineage when choosing the census path.
    """
    cfg = cfg or PipelineConfig()
    from deduplicate_ray.pipelines.dedup import _lap
    keys64, counts = _census_keys(bands, cfg, n_rows_hint)
    _lap("mod:census")
    any_salted = bool((counts > cfg.salt_threshold).any())
    if any_salted:
        hot_n = counts[counts > cfg.salt_threshold]
        logger.info("lsh: salting %d oversized band buckets (max n=%d)",
                    len(hot_n), int(hot_n.max()))
    # Broadcasting the full multi-bucket census lets every task drop
    # singleton rows before the pair shuffle. Past the broadcast budget
    # (census keys grow with the corpus) fall back to broadcasting only
    # the oversized keys: salting still works, singletons ride the
    # shuffle and are dropped inside emit_partition as before.
    filter_singletons = len(keys64) <= _CENSUS_BROADCAST_LIMIT
    ks_all = np.where(counts > cfg.salt_threshold,
                      np.maximum(2, -(-counts // cfg.salt_threshold)),
                      0).astype(np.int64)
    if filter_singletons:
        ref = ray.put((keys64, ks_all))
    else:
        hot = counts > cfg.salt_threshold
        ref = ray.put((keys64[hot], ks_all[hot]))

    def filter_and_salt(batch: pa.Table) -> pa.Table:
        """Drop singleton-bucket rows (the census is the authority) and
        assign salts — one cached binary search serves both decisions.
        The census arrays are warmed on first touch (plasma mappings
        page-fault badly under random access)."""
        state = _VERIFY_CACHE.get(ref.hex())
        if state is None:
            keys_, ks_ = ray.get(ref)
            if len(keys_):
                keys_.sum(); ks_.sum()   # sequential fault-in
            if len(_VERIFY_CACHE) > 4:
                _VERIFY_CACHE.clear()
            state = _VERIFY_CACHE[ref.hex()] = (keys_, ks_)
        keys_, ks_ = state
        bkeys = _mix_keys(_int_col(batch, "band_hash").astype(np.int64),
                          _int_col(batch, "band_id").astype(np.int64))
        if len(keys_):
            pos = np.searchsorted(keys_, bkeys)
            pos = np.clip(pos, 0, len(keys_) - 1)
            hit = keys_[pos] == bkeys
        else:
            pos = np.zeros(len(bkeys), np.int64)
            hit = np.zeros(len(bkeys), bool)
        if filter_singletons:
            batch = batch.filter(pa.array(hit))
            pos = pos[hit]
            k = ks_[pos] if len(keys_) else np.zeros(0, np.int64)
        else:
            k = np.where(hit, ks_[pos], 0)
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

    def part_fn(t: pa.Table) -> np.ndarray:
        # full (band, salt) bucket key — whole buckets stay together
        bh = _int_col(t, "band_hash").astype(np.int64)
        bid = _int_col(t, "band_id").astype(np.int64)
        salt = _int_col(t, "salt").astype(np.int64)
        mix = (bh.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               ^ bid.view(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
               ^ salt.view(np.uint64) * np.uint64(0x165667B19E3779F9))
        return (mix % np.uint64(n_parts)).astype(np.int64)

    def emit_partition(g: pd.DataFrame) -> pd.DataFrame:
        # Vectorized bucket grouping: one lexsort on the combined 64-bit
        # (bucket, salt) key + run-length boundaries. Size-2 buckets (the
        # vast majority) emit their single pair with pure array ops; only
        # buckets of 3+ members enter the Python loop. (A 64-bit mix
        # collision would merge two buckets' candidates — harmless:
        # spurious pairs are dropped by MinHash verification downstream.)
        keys = ["band_id", "band_hash", "salt"]
        g = g.drop_duplicates(subset=keys + ["file_id"])
        bk = _mix_keys(g["band_hash"].to_numpy(dtype=np.int64),
                       g["band_id"].to_numpy(dtype=np.int64))
        bk = (bk.view(np.uint64)
              ^ g["salt"].to_numpy(dtype=np.int64).view(np.uint64)
              * np.uint64(0x165667B19E3779F9)).view(np.int64)
        fids = g["file_id"].to_numpy()
        order = np.lexsort((fids, bk))
        k_s, f_s = bk[order], fids[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]])
        lens = np.diff(np.r_[starts, len(k_s)])
        srcs: list[np.ndarray] = []
        dsts: list[np.ndarray] = []
        two = starts[lens == 2]
        if len(two):
            srcs.append(f_s[two]); dsts.append(f_s[two + 1])
        big = lens >= 3
        for st, n in zip(starts[big], lens[big]):
            bucket = f_s[st:st + n]          # sorted within the bucket
            if n <= max_n:
                ii, jj = np.triu_indices(n, k=1)
                srcs.append(bucket[ii]); dsts.append(bucket[jj])
            else:
                # star to representative + sorted-adjacent chain: O(n)
                # edges, connectivity preserved; pair-level completeness
                # truncated (counted by truncation_metrics).
                srcs.append(np.full(n - 1, bucket[0])); dsts.append(bucket[1:])
                srcs.append(bucket[1:-1]); dsts.append(bucket[2:])
        if not srcs:
            return pd.DataFrame({"src": [], "dst": []},
                                dtype=fids.dtype if len(fids) else str)
        # partition-local dedup (same pair from several bands of this
        # partition); the global dedup runs BEFORE verification — a pair
        # recurs from ~O(bands) buckets, and deduping the narrow pair
        # relation is far cheaper than re-verifying each recurrence
        # (see near_dup_clusters / dedup_edges ordering)
        s, d = _unique_pairs(np.concatenate(srcs), np.concatenate(dsts))
        return pd.DataFrame({"src": s, "dst": d})

    def emit_reduce(t: pa.Table) -> pa.Table:
        # one whole partition (MANY complete buckets) per call; the
        # (src, dst) schema is pinned to the band relation's id dtype so
        # every exchange output block unions cleanly with bridge edges
        id_t = _id_type_of(t)
        if t.num_rows == 0 or "file_id" not in t.schema.names:
            return pa.table({"src": pa.array([], id_t),
                             "dst": pa.array([], id_t)})
        df = emit_partition(t.to_pandas())
        return pa.table({"src": pa.array(df["src"].to_numpy(), id_t),
                         "dst": pa.array(df["dst"].to_numpy(), id_t)})

    # two-stage hash exchange on the precomputed bucket-key partition id
    # (stages.exchange): Ray's groupby would SORT the whole band relation
    # globally just to co-locate buckets — measured 24.5 s -> ~8 s at 6.2M
    # band rows / 32 cpus
    from deduplicate_ray.stages.exchange import exchange
    # chunked reduce: a hot partition's pair expansion streams out in
    # bounded chunks instead of one giant object (spill-aware mode)
    pairs = exchange(salted, part_fn, emit_reduce, n_parts,
                     chunk_rows=cfg.exchange_chunk_rows)
    if not any_salted:
        return pairs
    return pairs.union(bridge_edges(salted))


def dedup_edges(edges: rd.Dataset, num_partitions: int = 16,
                chunk_rows: int | None = None,
                id_bound: int | None = None) -> rd.Dataset:
    """Collapse multi-band duplicates of the same pair: hash-exchange on
    the pair key and ``drop_duplicates`` per partition. Uses the raw-task
    exchange (``stages.exchange``) — Ray's sort-based groupby spent 14.3 s
    sorting a 3.2M-pair relation whose per-partition dedup is <1 s.

    ``id_bound``: when the caller knows ids are dense ints below 2^32
    (the compact chain passes its corpus size), each pair is PACKED into
    one uint64 before the exchange — the duplicated pair relation is the
    single largest exchange of the modular plan (a pair recurs from
    ~O(bands) buckets), so halving its bytes halves the dominant shuffle,
    and the per-partition distinct becomes one flat ``np.unique``."""
    n_parts = num_partitions * 4

    if id_bound is not None and 0 < id_bound <= 2**32:
        def pack(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "src" not in t.schema.names:
                return pa.table({"pk": pa.array([], pa.uint64())})
            src = t.column("src").combine_chunks() \
                .to_numpy(zero_copy_only=False)
            dst = t.column("dst").combine_chunks() \
                .to_numpy(zero_copy_only=False)
            pk = (src.astype(np.uint64) << np.uint64(32)) \
                | dst.astype(np.uint64)
            return pa.table({"pk": pa.array(pk, pa.uint64())})

        def part_fn_pk(t: pa.Table) -> np.ndarray:
            pk = t.column("pk").combine_chunks() \
                .to_numpy(zero_copy_only=False)
            return (stable_hash(pk) % np.uint64(n_parts)).astype(np.int64)

        def unpack_unique(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "pk" not in t.schema.names:
                return pa.table({"src": pa.array([], pa.int64()),
                                 "dst": pa.array([], pa.int64())})
            pk = np.unique(t.column("pk").combine_chunks()
                           .to_numpy(zero_copy_only=False))
            return pa.table({
                "src": pa.array((pk >> np.uint64(32)).astype(np.int64)),
                "dst": pa.array((pk & np.uint64(0xFFFFFFFF))
                                .astype(np.int64))})

        from deduplicate_ray.stages.exchange import exchange
        return exchange(
            edges.select_columns(["src", "dst"]).map_batches(
                pack, batch_format="pyarrow"),
            part_fn_pk, unpack_unique, n_parts, chunk_rows=chunk_rows)

    def part_fn(t: pa.Table) -> np.ndarray:
        src = t.column("src").combine_chunks().to_numpy(zero_copy_only=False)
        dst = t.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
        h = stable_hash(src) * np.uint64(31) + stable_hash(dst)
        return (h % np.uint64(n_parts)).astype(np.int64)

    def drop_dups(t: pa.Table) -> pa.Table:
        id_t = _id_type_of(t)
        if t.num_rows == 0 or "src" not in t.schema.names:
            return pa.table({"src": pa.array([], id_t),
                             "dst": pa.array([], id_t)})
        src = t.column("src").combine_chunks().to_numpy(zero_copy_only=False)
        dst = t.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
        s, d = _unique_pairs(src, dst)
        return pa.table({"src": pa.array(s, id_t),
                         "dst": pa.array(d, id_t)})

    from deduplicate_ray.stages.exchange import exchange
    return exchange(edges.select_columns(["src", "dst"]),
                    part_fn, drop_dups, n_parts, chunk_rows=chunk_rows)


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
                 broadcast_limit: int | None = None,
                 _pruned: bool = False) -> rd.Dataset:
    """Drop candidate pairs whose MinHash Jaccard estimate is below
    ``cfg.verify_threshold``. Output adds ``jaccard_est: double``."""
    cfg = cfg or PipelineConfig()
    if broadcast_limit is None:
        broadcast_limit = cfg.broadcast_limit
        # the post-prune broadcast state is the 16-bit-folded matrix
        # (256 B/row, plasma-shared, zero-copy per worker) — a wider gate
        # applies to it than to raw-signature driver state; an explicit
        # broadcast_limit argument (tests) or broadcast_limit=0 (forced
        # scale path) pins both gates together
        verify_limit = max(broadcast_limit, cfg.verify_broadcast_limit) \
            if broadcast_limit > 0 else 0
    else:
        verify_limit = broadcast_limit
    if cfg.verify_threshold <= 0:
        return edges.map_batches(
            lambda t: t.append_column(
                "jaccard_est", pa.array(np.ones(t.num_rows, dtype=np.float64))),
            batch_format="pyarrow")

    n_sigs = signatures.count()
    if n_sigs > broadcast_limit and not _pruned:
        # Verification only needs signatures of docs that appear in at
        # least one candidate pair — on a dup-minority corpus that is a
        # small fraction of the corpus. Prune with a semi-join on the edge
        # endpoints BEFORE choosing a physical plan: the pruned relation
        # usually re-fits the broadcast budget (one map_batches pass, no
        # shuffle), and even when it doesn't, the bucketed blob joins below
        # run over the pruned relation instead of the full corpus
        # (measured 130 s -> ~15 s for a 943k-sig / 160k-edge verify; the
        # two sort-shuffles were moving 2x943k signature blobs for 320k
        # useful rows).
        from deduplicate_ray.stages import joins
        from deduplicate_ray.pipelines.dedup import _lap
        edges = edges.materialize()   # consumed twice: endpoints + verify
        _lap("verify:pin-edges")
        n_edges = edges.count()       # metadata-only on the pinned relation
        import os as _os
        if _os.environ.get("DEDUP_RAY_PHASES") == "1":
            print(f"[dedup-phase] verify:n_edges={n_edges}", flush=True)
        if n_edges <= _DRIVER_ENDPOINT_LIMIT:
            # endpoint distinct straight off the pinned edge blocks: one
            # driver concat + C++ unique (sub-second at millions of edges)
            # instead of a distributed groupby shuffle + take() execution —
            # two full barriers saved at every parallelism level
            import pyarrow.compute as _pc
            from deduplicate_ray.stages.exchange import _as_arrow_block
            # to_arrow_refs on the pinned relation is free (no projection
            # execution); the src/dst column slices are zero-copy. Blocks
            # are normalized: a pandas-producing lineage (bridge edges)
            # hands back pandas blocks verbatim.
            blocks = [b for b in map(_as_arrow_block,
                                     ray.get(edges.to_arrow_refs()))
                      if b.num_rows]
            if not blocks:
                return edges.map_batches(
                    lambda t: t.append_column(
                        "jaccard_est", pa.array([], pa.float64())),
                    batch_format="pyarrow")
            ends_arr = pa.concat_arrays(
                [b.column("src").combine_chunks() for b in blocks]
                + [b.column("dst").combine_chunks() for b in blocks])
            endpoint_uniq = _pc.unique(ends_arr)
            # the edge COUNT fit the driver, but the distinct endpoint set
            # must also fit the broadcast budget before it is ray.put to
            # every worker — near the 20M-edge gate that set can reach ~2x
            # the semi_join broadcast limit (multi-GB pickled id list +
            # per-worker value-set copies). Past the budget, hand the
            # already-computed distinct endpoints to the distributed
            # semi_join instead of broadcasting unconditionally.
            if len(endpoint_uniq) <= joins.DEFAULT_BROADCAST_LIMIT:
                pruned = joins._broadcast_filter(
                    signatures, endpoint_uniq.to_pylist(), "file_id",
                    keep=True).materialize()
            else:
                ends_ds = rd.from_arrow(
                    pa.table({"file_id": endpoint_uniq}))
                pruned = joins.semi_join(
                    signatures, ends_ds, "file_id",
                    num_partitions=cfg.num_partitions).materialize()
        else:
            ends = edges.select_columns(["src"]).map_batches(
                lambda t: t.rename_columns(["file_id"]),
                batch_format="pyarrow").union(
                edges.select_columns(["dst"]).map_batches(
                    lambda t: t.rename_columns(["file_id"]),
                    batch_format="pyarrow"))
            pruned = joins.semi_join(
                signatures, joins.distinct_keys(ends, "file_id"), "file_id",
                num_partitions=cfg.num_partitions).materialize()
        _lap("verify:prune")
        if _os.environ.get("DEDUP_RAY_PHASES") == "1":
            print(f"[dedup-phase] verify:n_pruned_sigs={pruned.count()}",
                  flush=True)
        # recurse under the WIDER folded-matrix gate: the pruned relation
        # broadcasts as uint16 (256 B/row), not raw signatures
        return verify_pairs(edges, pruned, cfg, verify_limit,
                            _pruned=True)
    if n_sigs <= broadcast_limit:
        # xor-fold each 64-bit minhash component to 16 bits for the
        # broadcast compare: per-component equality gains a 2^-16 false
        # positive (inflates jaccard_est by ~1.5e-5 in expectation —
        # far below any threshold granularity) and the compare's memory
        # traffic falls 4x. The gather-compare kernel is DRAM-bound;
        # a 320k x 128 uint16 matrix (~80 MB) gathers mostly from cache
        # where the uint64 original saturated the memory bus (measured
        # 15 s vs 0.3 s per 65k-pair batch under 16-way concurrency).
        # The fold runs DISTRIBUTED (map_batches over the pinned signature
        # blocks) so the driver fetches only the folded uint16 matrix —
        # folding a ~400 MB uint64 fetch on the driver was ~9 s of serial
        # time at 470k sigs / 1.2M rows, constant in cluster size.
        n_perms = cfg.num_perms

        def fold_block(t: pa.Table) -> pa.Table:
            flat = np.asarray(t.column("sig").combine_chunks().flatten(),
                              dtype=np.uint64)
            folded = ((flat ^ (flat >> np.uint64(16))
                       ^ (flat >> np.uint64(32)) ^ (flat >> np.uint64(48)))
                      & np.uint64(0xFFFF)).astype(np.uint16)
            col = pa.FixedSizeListArray.from_arrays(
                pa.array(folded, pa.uint16()), n_perms)
            return pa.table({"file_id": t.column("file_id"), "sig16": col})

        # parallel object-store fetch (to_arrow_refs), not a serial
        # iter_batches stream through the driver (round-1: the driver-side
        # signature fetch was Amdahl serial work).
        # ids stay an ARROW array end to end: building a Python-object id
        # array + pd.Index cost ~6 s of driver serial time at 320k sigs;
        # pc.index_in is the same lookup in C++ with zero Python strings.
        blocks = ray.get(signatures.select_columns(["file_id", "sig"])
                         .map_batches(fold_block, batch_format="pyarrow")
                         .to_arrow_refs())
        ids_arrays = [b.column("file_id").combine_chunks() for b in blocks
                      if b.num_rows]
        mats = [np.asarray(b.column("sig16").combine_chunks().flatten())
                .reshape(b.num_rows, -1) for b in blocks if b.num_rows]
        ids = pa.concat_arrays(ids_arrays) if ids_arrays \
            else pa.array([], pa.string())
        mat = np.concatenate(mats) if mats else np.zeros(
            (0, cfg.num_perms), np.uint16)
        ref = ray.put((ids, mat))
        from deduplicate_ray.pipelines.dedup import _lap
        _lap("verify:fetch+put")
        thr = cfg.verify_threshold

        def verify_fn(batch: pa.Table) -> pa.Table:
            # signature matrix cached once per worker process (broadcast
            # object fetched once). The plasma-backed zero-copy array is
            # WARMED sequentially on first touch: cold random gathers over
            # the shared mapping page-fault one page per access (measured
            # 17 s/batch vs 0.2 s warm for a 320 MB matrix).
            import pyarrow.compute as _pc
            state = _VERIFY_CACHE.get(ref.hex())
            if state is None:
                import os as _os2
                import time as _time2
                _t0 = _time2.perf_counter()
                ids_, mat_ = ray.get(ref)
                # WARM the shared plasma mapping sequentially instead of
                # copying it into the worker heap: one touch per 4 KB page
                # makes every page resident in the (process-SHARED) page
                # cache, after which random row-gathers are plain memory
                # reads for every worker. The earlier per-worker
                # np.array(copy=True) duplicated the matrix N_workers
                # times through one memory bus — measured 96-98 s PER
                # WORKER at a 512 MB folded matrix under 23-way
                # concurrency vs 0.05 s for the warm touch (the whole
                # verify map: 102 s copy-mode vs 2.0 s warm-mode) — the
                # round-4 "constant-in-N" verify seconds were exactly
                # this contention.
                mv = np.asarray(mat_)
                if mv.size:
                    stride = max(1, 4096 // max(mv.strides[0], 1) // 2)
                    int(mv[::stride, 0].sum())   # touch every page
                state = (ids_, mat_)
                _VERIFY_CACHE.clear()   # one live verify set per worker
                _VERIFY_CACHE[ref.hex()] = state
                if _os2.environ.get("DEDUP_RAY_PHASES") == "1":
                    print(f"[dedup-phase] verify:worker-setup="
                          f"{_time2.perf_counter() - _t0:.2f}s", flush=True)
            ids_, m = state
            n = batch.num_rows
            if n == 0:
                return batch.append_column("jaccard_est",
                                           pa.array([], pa.float64()))
            ia = _pc.fill_null(_pc.index_in(
                batch.column("src").combine_chunks(), value_set=ids_), -1) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            ib = _pc.fill_null(_pc.index_in(
                batch.column("dst").combine_chunks(), value_set=ids_), -1) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
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
            # same 16-bit xor-fold as the broadcast path: 4x less join
            # shuffle volume, jaccard_est bias <= 1.5e-5
            flat = ((flat ^ (flat >> np.uint64(16))
                     ^ (flat >> np.uint64(32)) ^ (flat >> np.uint64(48)))
                    & np.uint64(0xFFFF)).astype(np.uint16)
            w = cfg.num_perms * 2
            # one binary array straight from the flat buffer: uniform
            # offsets + the signature bytes, no per-row Python slicing
            offs = np.arange(0, (nrows + 1) * w, w, dtype=np.int32)
            blobs = pa.Array.from_buffers(
                pa.binary(), nrows,
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(flat.tobytes())])
            return pa.table({side: t.column("file_id"),
                             f"sig_{side}": blobs})

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

        def to_mat(col) -> tuple[np.ndarray, np.ndarray]:
            # binary-blob column → (n, perms) matrix + null mask, via one
            # numpy gather over the shared data buffer (no per-row Python
            # bytes objects; nulls/short rows read as zero signatures)
            arr = col.combine_chunks()
            valid = (np.ones(n, dtype=bool) if arr.null_count == 0
                     else np.asarray(pc.is_valid(arr), dtype=bool))
            width = np.int64 if pa.types.is_large_binary(arr.type) \
                else np.int32
            bufs = arr.buffers()
            offs = np.frombuffer(
                bufs[1], dtype=width, count=n + 1,
                offset=arr.offset * np.dtype(width).itemsize).astype(np.int64)
            data = (np.frombuffer(bufs[2], dtype=np.uint8)
                    if bufs[2] is not None else np.zeros(0, np.uint8))
            good = valid & (np.diff(offs) == perms * 2)
            m = np.zeros((n, perms), dtype=np.uint16)
            if good.any():
                idx = (offs[:-1][good, None]
                       + np.arange(perms * 2, dtype=np.int64)[None, :])
                m[good] = data[idx].view(np.uint16)
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


def _fold16(mat: np.ndarray) -> np.ndarray:
    """xor-fold a uint64 signature matrix to uint16 (see verify_pairs)."""
    return ((mat ^ (mat >> np.uint64(16)) ^ (mat >> np.uint64(32))
             ^ (mat >> np.uint64(48))) & np.uint64(0xFFFF)).astype(np.uint16)


def translate_edges(edges: rd.Dataset, file_ids: pa.Array,
                    cfg: PipelineConfig | None = None) -> rd.Dataset:
    """Map an int-keyed edge relation back to file-id strings.

    ``file_ids`` is the dense id→file_id array from
    :func:`deduplicate_ray.stages.minhash.with_int_ids` — translation is
    one zero-copy Arrow ``take`` per batch against the broadcast array
    (ids are dense indexes, no hash lookup). Past ``cfg.rep_broadcast_limit``
    documents the array no longer belongs on every worker; translation
    falls back to two bucketed hash joins on the id map (fully
    distributed, same output)."""
    cfg = cfg or PipelineConfig()

    if len(file_ids) <= cfg.rep_broadcast_limit:
        from deduplicate_ray.stages.joins import _PROBE_CACHE
        ref = ray.put(file_ids)

        def tr(t: pa.Table) -> pa.Table:
            fids = _PROBE_CACHE.get(ref.hex())
            if fids is None:
                if len(_PROBE_CACHE) > 8:
                    _PROBE_CACHE.clear()
                fids = _PROBE_CACHE.setdefault(ref.hex(), ray.get(ref))
            cols = {c: t.column(c) for c in t.schema.names}
            cols["src"] = fids.take(t.column("src").combine_chunks())
            cols["dst"] = fids.take(t.column("dst").combine_chunks())
            return pa.table(cols)

        return edges.map_batches(tr, batch_format="pyarrow")

    # distributed fallback: two bucketed hash joins against the id map
    # (the map itself is built distributed-ready — one narrow relation)
    from deduplicate_ray.stages.joins import bucket_join
    ids_arr = pa.array(np.arange(len(file_ids), dtype=np.int64), pa.int64())

    def _swap(ds: rd.Dataset, key: str, fid_col: str) -> rd.Dataset:
        m = rd.from_arrow(pa.table({key: ids_arr, fid_col: file_ids}))
        joined = bucket_join(ds, m, on=key, how="left",
                             num_buckets=cfg.num_partitions)

        def fix(t: pa.Table) -> pa.Table:
            cols = {c: t.column(c) for c in t.schema.names
                    if c not in (key, fid_col)}
            cols[key] = t.column(fid_col)
            return pa.table(cols)

        return joined.map_batches(fix, batch_format="pyarrow")

    return _swap(_swap(edges, "src", "_src_fid"), "dst", "_dst_fid")


def translate_labels(labels: rd.Dataset, file_ids: pa.Array,
                     cfg: PipelineConfig | None = None) -> rd.Dataset:
    """Map an int-keyed union-find label table ``(node, label)`` back to
    file-id strings — O(nodes) work where :func:`translate_edges` is
    O(edges). Valid ONLY when ``file_ids`` came from
    :func:`deduplicate_ray.stages.minhash.with_int_ids` (lexicographic-rank
    ids, so the int min-label picked the same document as the string
    min-label would have). Broadcast take under ``cfg.rep_broadcast_limit``;
    bucketed-join fallback past it, same shape as translate_edges."""
    cfg = cfg or PipelineConfig()
    if labels.count() == 0:
        return labels

    if len(file_ids) <= cfg.rep_broadcast_limit:
        from deduplicate_ray.stages.joins import _cached_value_set
        ref = ray.put(file_ids)

        def tr(t: pa.Table) -> pa.Table:
            fids = _cached_value_set(ref)
            return pa.table({
                "node": fids.take(t.column("node").combine_chunks()),
                "label": fids.take(t.column("label").combine_chunks())})

        return labels.map_batches(tr, batch_format="pyarrow")

    from deduplicate_ray.stages.joins import bucket_join
    ids_arr = pa.array(np.arange(len(file_ids), dtype=np.int64), pa.int64())

    def _swap_lbl(ds: rd.Dataset, key: str) -> rd.Dataset:
        m = rd.from_arrow(pa.table({key: ids_arr, "_fid": file_ids}))
        joined = bucket_join(ds, m, on=key, how="left",
                             num_buckets=cfg.num_partitions)

        def fix(t: pa.Table) -> pa.Table:
            cols = {c: t.column(c) for c in t.schema.names
                    if c not in (key, "_fid")}
            cols[key] = t.column("_fid")
            return pa.table(cols)

        return joined.map_batches(fix, batch_format="pyarrow")

    return _swap_lbl(_swap_lbl(labels, "node"), "label")


def fused_candidate_edges(sigs: rd.Dataset, cfg: PipelineConfig | None = None,
                          broadcast_limit: int | None = None
                          ) -> rd.Dataset | None:
    """Fused LSH candidate+verify fast path: pinned signatures →
    verified, deduped ``(src, dst, jaccard_est)`` edges in ONE narrow
    integer shuffle.

    Applies when the signature relation fits the broadcast budget
    (``n_sigs <= broadcast_limit``); returns ``None`` past it and callers
    fall back to the modular distributed plan (``candidate_pairs →
    verify_pairs → dedup_edges``), which carries no driver-resident state.

    Why fused: the modular plan moves file_id STRINGS through three
    all-to-all barriers (census, pair emit, edge dedup) and re-fetches
    signatures for verification. On a bandwidth-bound box that's ~10x the
    necessary traffic. Here every doc becomes an int32 index into the
    lexicographically sorted id array (so index order == string order and
    min-label / src<dst semantics are preserved exactly), the census is a
    driver ``np.unique`` over the band-key matrix (bounded by the same
    broadcast budget), and the single shuffle carries only
    ``(bucket_key:int64, salt:int32, idx:int32)`` for rows of multi-member
    buckets (~20 B/row). Pair emission, MinHash verification (same 16-bit
    fold as verify_pairs) and partition-local dedup run inside the SAME
    map_groups task against the broadcast folded matrix; only survivor
    edges (plus one tiny sub-bucket-minimum row per salted sub-bucket,
    bridged and verified on the driver) leave the task.

    Semantics are identical to the modular plan: same bucket membership,
    same salting threshold and sub-bucket bridging (ADVICE round 1: bridges
    are real verified edges), same bounded star+chain expansion for buckets
    past ``max_bucket_pairs``, same verify threshold.
    """
    cfg = cfg or PipelineConfig()
    if broadcast_limit is None:
        broadcast_limit = cfg.broadcast_limit
    n_sigs = sigs.count()
    if n_sigs > broadcast_limit:
        return None

    empty = pa.table({"src": pa.array([], pa.string()),
                      "dst": pa.array([], pa.string()),
                      "jaccard_est": pa.array([], pa.float64())})
    if n_sigs == 0:
        return rd.from_arrow(empty)

    from deduplicate_ray.stages import minhash as _mh
    import pyarrow.compute as pc

    b_, r_ = cfg.lsh_bands, cfg.lsh_rows

    def prep(batch: pa.Table) -> pa.Table:
        """Distributed prep: band-key matrix + 16-bit fold per sig row.
        Runs in parallel over the pinned sig blocks so the driver only
        concatenates the 4x-smaller derived columns (the full uint64
        signature matrix never streams through the driver serially)."""
        n = batch.num_rows
        if n == 0:
            return pa.table({
                "file_id": pa.array([], pa.string()),
                "bh": pa.array([], pa.list_(pa.int64())),
                "fold": pa.array([], pa.list_(pa.uint16()))})
        m = np.asarray(batch.column("sig").combine_chunks().flatten()) \
            .reshape(n, -1).astype(np.uint64, copy=False)
        bh = _mh.band_hashes(m, b_, r_)
        fd = _fold16(m)
        return pa.table({
            "file_id": batch.column("file_id").combine_chunks(),
            "bh": pa.FixedSizeListArray.from_arrays(
                pa.array(bh.reshape(-1), pa.int64()), b_),
            "fold": pa.FixedSizeListArray.from_arrays(
                pa.array(fd.reshape(-1), pa.uint16()), m.shape[1])})

    from deduplicate_ray.pipelines.dedup import _lap
    _lap("fused:begin")
    prepped = sigs.select_columns(["file_id", "sig"]).map_batches(
        prep, batch_format="pyarrow").materialize()
    _lap("fused:prep")
    blocks = [b for b in ray.get(prepped.to_arrow_refs()) if b.num_rows]
    ids_arr = pa.concat_arrays(
        [b.column("file_id").combine_chunks() for b in blocks])
    bh_all = np.concatenate(
        [np.asarray(b.column("bh").combine_chunks().flatten())
         .reshape(b.num_rows, -1) for b in blocks])
    fold = np.concatenate(
        [np.asarray(b.column("fold").combine_chunks().flatten())
         .reshape(b.num_rows, -1) for b in blocks])
    _lap("fused:driver-concat")
    order = pc.sort_indices(ids_arr)
    ids_sorted = ids_arr.take(order)
    # fold stays in BLOCK order; the int32 permutation (sorted idx →
    # block row) rides along instead of an 80 MB driver-side row gather
    perm = np.asarray(order).astype(np.int32)
    _lap("fused:sort-ids")

    # radix sort + run-length flags, touching only MULTI runs: singleton
    # keys (the vast majority) are never gathered. Equivalent to
    # np.unique(return_counts) filtered to count>=2, minus several full
    # passes — on the target box every streaming pass over the 80 MB key
    # array costs real wall time.
    flat = np.sort(bh_all, axis=None, kind="stable")
    eq = flat[1:] == flat[:-1]
    run_start = np.flatnonzero(eq & np.r_[True, ~eq[:-1]])   # multi runs
    run_end = np.flatnonzero(eq & np.r_[~eq[1:], True]) + 2  # exclusive
    census_keys = flat[run_start]
    census_n = run_end - run_start
    _lap("fused:census-unique")
    ks = np.where(census_n > cfg.salt_threshold,
                  np.maximum(2, -(-census_n // cfg.salt_threshold)),
                  0).astype(np.int64)
    if (ks > 0).any():
        logger.info("lsh-fused: salting %d oversized band buckets (max n=%d)",
                    int((ks > 0).sum()), int(census_n.max()))
    del bh_all

    map_ref = ray.put((ids_sorted, census_keys, ks))
    mat_ref = ray.put((fold, perm))
    _lap("fused:puts")
    thr = cfg.verify_threshold
    max_n = cfg.max_bucket_pairs
    n_parts = cfg.num_partitions * 4
    salt_mix = np.uint64(0x165667B19E3779F9)

    def project(batch: pa.Table) -> pa.Table:
        """prepped rows → (gkey, key, salt, idx, _p) rows of multi
        buckets (band keys come precomputed from the prep pass)."""
        ck = "fusedmap:" + map_ref.hex()
        state = _VERIFY_CACHE.get(ck)
        if state is None:
            ids_, keys_, ks_ = ray.get(map_ref)
            if len(keys_):
                keys_.sum(); ks_.sum()      # fault-in
            if len(_VERIFY_CACHE) > 4:
                _VERIFY_CACHE.clear()
            state = _VERIFY_CACHE[ck] = (ids_, keys_, ks_)
        ids_, keys_, ks_ = state
        n = batch.num_rows
        out_empty = pa.table({"gkey": pa.array([], pa.int64()),
                              "key": pa.array([], pa.int64()),
                              "salt": pa.array([], pa.int32()),
                              "idx": pa.array([], pa.int32())})
        if n == 0 or not len(keys_):
            return out_empty
        keys = np.asarray(batch.column("bh").combine_chunks().flatten()) \
            .reshape(n, b_).ravel()
        idx = pc.index_in(batch.column("file_id").combine_chunks(),
                          value_set=ids_).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        idxr = np.repeat(idx, b_)
        pos = np.clip(np.searchsorted(keys_, keys), 0, len(keys_) - 1)
        hit = keys_[pos] == keys
        keys, idxr, pos = keys[hit], idxr[hit], pos[hit]
        if not len(keys):
            return out_empty
        k = ks_[pos]
        salts = np.zeros(len(keys), dtype=np.int32)
        hot = k > 1
        if hot.any():
            h = _mh._mix64(idxr[hot].astype(np.uint64))
            salts[hot] = (1 + (h % k[hot].astype(np.uint64))).astype(np.int32)
        gkey = (keys.view(np.uint64)
                ^ salts.astype(np.uint64) * salt_mix).view(np.int64)
        return pa.table({"gkey": pa.array(gkey),
                         "key": pa.array(keys),
                         "salt": pa.array(salts),
                         "idx": pa.array(idxr.astype(np.int32))})

    def emit_verify(g: pd.DataFrame) -> pd.DataFrame:
        """One partition (many whole buckets) → verified int edges +
        sub-bucket-minimum marker rows (dst == -1, bkey = bucket key)."""
        ck = "fusedmat:" + mat_ref.hex()
        state = _VERIFY_CACHE.get(ck)
        if state is None:
            m_, perm_ = ray.get(mat_ref)
            m_.sum(); perm_.sum()      # sequential fault-in of the mapping
            if len(_VERIFY_CACHE) > 4:
                _VERIFY_CACHE.clear()
            state = _VERIFY_CACHE[ck] = (m_, perm_)
        m, perm_ = state
        gkey = g["gkey"].to_numpy()
        key = g["key"].to_numpy()
        salt = g["salt"].to_numpy()
        idx = g["idx"].to_numpy().astype(np.int64)
        o = np.lexsort((idx, gkey))
        gkey, key, salt, idx = gkey[o], key[o], salt[o], idx[o]
        starts = np.flatnonzero(np.r_[True, gkey[1:] != gkey[:-1]])
        lens = np.diff(np.r_[starts, len(gkey)])
        srcs: list[np.ndarray] = []
        dsts: list[np.ndarray] = []
        two = starts[lens == 2]
        if len(two):
            srcs.append(idx[two]); dsts.append(idx[two + 1])
        big = lens >= 3
        for st, n in zip(starts[big], lens[big]):
            bucket = idx[st:st + n]
            if n <= max_n:
                ii, jj = np.triu_indices(n, k=1)
                srcs.append(bucket[ii]); dsts.append(bucket[jj])
            else:
                srcs.append(np.full(n - 1, bucket[0]))
                dsts.append(bucket[1:])
                srcs.append(bucket[1:-1]); dsts.append(bucket[2:])
        cols = {"src": np.array([], np.int64), "dst": np.array([], np.int64),
                "jaccard_est": np.array([], np.float64),
                "bkey": np.array([], np.int64)}
        frames = []
        if srcs:
            src = np.concatenate(srcs)
            dst = np.concatenate(dsts)
            # partition-local dedup on the packed 64-bit pair key
            packed = (src.astype(np.uint64) << np.uint64(32)) \
                | dst.astype(np.uint64)
            _, first = np.unique(packed, return_index=True)
            src, dst = src[first], dst[first]
            est = (m[perm_[src]] == m[perm_[dst]]).mean(axis=1)
            keep = est >= thr
            frames.append(pd.DataFrame({
                "src": src[keep], "dst": dst[keep],
                "jaccard_est": est[keep],
                "bkey": np.zeros(int(keep.sum()), np.int64)}))
        salted_start = starts[salt[starts] > 0]
        if len(salted_start):
            frames.append(pd.DataFrame({
                "src": idx[salted_start], "dst": np.full(
                    len(salted_start), -1, np.int64),
                "jaccard_est": np.zeros(len(salted_start), np.float64),
                "bkey": key[salted_start]}))
        if not frames:
            return pd.DataFrame(cols)
        return pd.concat(frames, ignore_index=True)

    # large project batches: pc.index_in rebuilds its value-set hash table
    # per call, so tiny batches would pay the O(n_sigs) build hundreds of
    # times (307 tasks x ~0.2 s at 314k sigs with the 1024-row default)
    projected = prepped.map_batches(project, batch_format="pyarrow",
                                    batch_size=65536)

    def fused_part(t: pa.Table) -> np.ndarray:
        g = t.column("gkey").combine_chunks().to_numpy(zero_copy_only=False)
        return (g.view(np.uint64) % np.uint64(n_parts)).astype(np.int64)

    def fused_reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "gkey" not in t.schema.names:
            return pa.table({
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "jaccard_est": pa.array([], pa.float64()),
                "bkey": pa.array([], pa.int64())})
        df = emit_verify(t.to_pandas())
        return pa.table({
            "src": pa.array(df["src"].to_numpy(), pa.int64()),
            "dst": pa.array(df["dst"].to_numpy(), pa.int64()),
            "jaccard_est": pa.array(df["jaccard_est"].to_numpy(),
                                    pa.float64()),
            "bkey": pa.array(df["bkey"].to_numpy(), pa.int64())})

    # same raw-task hash exchange as the modular plan (stages.exchange):
    # the single fused shuffle moves only multi-bucket int rows, and a
    # sort-based groupby would order them globally for nothing
    from deduplicate_ray.stages.exchange import exchange
    parts = exchange(projected, fused_part, fused_reduce, n_parts)
    out_blocks = [b for b in ray.get(parts.to_arrow_refs()) if b.num_rows]
    _lap("fused:shuffle+emit")
    if not out_blocks:
        return rd.from_arrow(empty)
    tbl = pa.concat_tables([b.select(["src", "dst", "jaccard_est", "bkey"])
                            for b in out_blocks])
    src = tbl.column("src").combine_chunks().to_numpy().astype(np.int64)
    dst = tbl.column("dst").combine_chunks().to_numpy().astype(np.int64)
    est = tbl.column("jaccard_est").combine_chunks().to_numpy()
    bkey = tbl.column("bkey").combine_chunks().to_numpy().astype(np.int64)

    _lap("fused:final-np")
    is_bridge = dst < 0
    e_src, e_dst, e_est = src[~is_bridge], dst[~is_bridge], est[~is_bridge]
    if is_bridge.any():
        # star each bucket's sub-minima to its global minimum; verify the
        # bridges like any other candidate (driver-side: one row per
        # sub-bucket, tiny by construction)
        bmin, bky = src[is_bridge], bkey[is_bridge]
        o = np.lexsort((bmin, bky))
        bmin, bky = bmin[o], bky[o]
        bs = np.flatnonzero(np.r_[True, bky[1:] != bky[:-1]])
        bl = np.diff(np.r_[bs, len(bky)])
        bsrc, bdst = [], []
        for st, n in zip(bs[bl >= 2], bl[bl >= 2]):
            mins = bmin[st:st + n]
            bsrc.append(np.full(n - 1, mins[0])); bdst.append(mins[1:])
        if bsrc:
            bsrc = np.concatenate(bsrc); bdst = np.concatenate(bdst)
            best = (fold[perm[bsrc]] == fold[perm[bdst]]).mean(axis=1)
            keep = best >= thr
            e_src = np.concatenate([e_src, bsrc[keep]])
            e_dst = np.concatenate([e_dst, bdst[keep]])
            e_est = np.concatenate([e_est, best[keep]])

    # global dedup (same pair via several bands lands in different
    # partitions): bounded by the post-verify survivor set
    packed = (e_src.astype(np.uint64) << np.uint64(32)) \
        | e_dst.astype(np.uint64)
    _, first = np.unique(packed, return_index=True)
    e_src, e_dst, e_est = e_src[first], e_dst[first], e_est[first]
    out = rd.from_arrow(pa.table({
        "src": ids_sorted.take(pa.array(e_src)),
        "dst": ids_sorted.take(pa.array(e_dst)),
        "jaccard_est": pa.array(e_est, pa.float64())}))
    _lap("fused:translate")
    return out
