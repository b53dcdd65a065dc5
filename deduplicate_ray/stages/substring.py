"""Stage 3 — per-partition substring containment (D4 / SURVEY §7 step 8).

Generalizes the reference's dead ``max_overlap`` longest-common-substring DP
(``deduplicate.py:242-260``, defined but never called) from a pairwise O(n*m)
DP into a per-partition scan: within each partition group, find documents
whose full content appears verbatim inside a longer document
("embedded-file duplicates", north_star stage 3).

**Partitioning assumption (documented per the north rule):** containment is
detected only *within* a partition group — by default
``cfg.substring_partition_col`` (``repo``); callers can pre-assign any other
scope column (e.g. Stage-2 ``cluster_id``, a length bucket, or a shard key).
Cross-partition embeddings are out of scope by design; widening the scope is
a partitioning choice, not a code change.

Physical plan: ``groupby(partition).map_groups(scan)`` — one stateful scan
per group (the per-group analog of an actor-held index). The scan
concatenates the group's contents with a ``\\x00`` sentinel (never present
in text content) and queries containment through a **suffix array** of the
concatenation:

* build: prefix-doubling over numpy ``lexsort`` — O(|S| log²|S|), all
  C-speed vector passes (north_star names the suffix-array pass
  explicitly; the round-1 version was repeated ``str.find``, O(g·|S|));
* query per doc: two binary searches over the SA locate the suffix range
  whose prefixes equal the doc's content — O(|a|·log|S|) byte compares —
  then every occurrence maps to its holder doc with one ``searchsorted``.
  UTF-8 is self-synchronizing, so byte-level matches are exactly
  character-level matches.

Small groups (< ``_SA_MIN_BYTES`` total) keep the C ``bytes.find`` scan —
cheaper than building an index that is thrown away.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from deduplicate_ray.config import PipelineConfig
from deduplicate_ray.functions import hashing

SENTINEL = "\x00"
_SA_MIN_BYTES = 1 << 20  # below this, brute find beats building the index


def build_suffix_array(data: bytes, depth: int | None = None) -> np.ndarray:
    """Suffix array of ``data`` by prefix doubling (Manber–Myers): each
    round packs (rank, rank_at_offset_k) into ONE int64 key — rank < n and
    key2 + 1 <= n, so ``rank * (n + 1) + key2 + 1`` is collision-free —
    and sorts with a single ``argsort`` (half the sort passes of a 2-key
    ``lexsort``). O(n log² n), every pass vectorized.

    ``depth``: stop once suffixes are sorted by their first ``depth``
    bytes (ties beyond that stay arbitrary). Containment queries compare
    only ``len(pattern)`` bytes, so a depth >= the longest query pattern
    yields the same occurrence ranges while skipping the deep doubling
    rounds — on repetitive text those are the expensive ones (ranks stay
    tied until k exceeds the repeat length)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    # densify byte values so every rank < n (the packing invariant below;
    # raw bytes run up to 255, which breaks it for short inputs)
    rank = np.unique(arr, return_inverse=True)[1].astype(np.int64)
    stride = np.int64(n + 1)
    k = 1
    while True:
        packed = rank * stride
        if k < n:
            packed[:-k] += rank[k:] + 1
        # sort kind does not matter for correctness: intermediate ranks
        # depend only on key EQUALITY, and the final round's keys are all
        # unique — introsort beats stable mergesort here
        order = np.argsort(packed)
        po = packed[order]
        changed = np.empty(n, dtype=np.int64)
        changed[0] = 0
        if n > 1:
            changed[1:] = po[1:] != po[:-1]
        new_rank = np.cumsum(changed)
        k *= 2
        if new_rank[-1] == n - 1 or (depth is not None and k >= depth):
            return order
        r = np.empty(n, dtype=np.int64)
        r[order] = new_rank
        rank = r


def _sa_occurrences(concat: bytes, sa: np.ndarray, pat: bytes) -> np.ndarray:
    """All start positions of ``pat`` in ``concat`` via two binary searches
    on the suffix array (O(|pat| log n) byte compares)."""
    m = len(pat)
    lo, hi = 0, len(sa)
    # lower bound: first suffix >= pat
    while lo < hi:
        mid = (lo + hi) // 2
        p = sa[mid]
        if concat[p:p + m] < pat:
            lo = mid + 1
        else:
            hi = mid
    start = lo
    hi = len(sa)
    # upper bound: first suffix whose m-prefix > pat
    while lo < hi:
        mid = (lo + hi) // 2
        p = sa[mid]
        if concat[p:p + m] <= pat:
            lo = mid + 1
        else:
            hi = mid
    return sa[start:lo]


def containment_pairs_between(query_ids: list[str], query_contents: list[str],
                              host_ids: list[str], host_contents: list[str],
                              min_len: int = 32) -> list[tuple[str, str]]:
    """(query, host) pairs where the query's content is a proper substring
    of a strictly LONGER host content. ``query_id == host_id`` rows (the
    same document on both sides, e.g. in a same-shard scan) never pair.

    The index side is the HOST list only — per-task memory is bounded by
    the host bytes plus one query at a time, which is what lets oversized
    groups shard (see :func:`containment_edges`)."""
    enc_h = [c.encode() for c in host_contents]
    concat = SENTINEL.encode().join(enc_h)
    offs = np.zeros(len(enc_h) + 1, dtype=np.int64)
    for i, c in enumerate(enc_h):
        offs[i + 1] = offs[i] + len(c) + 1  # +1 for sentinel
    starts = offs[:-1]
    enc_q = [c.encode() for c in query_contents]
    order = np.argsort([len(c) for c in enc_q], kind="stable")

    use_sa = len(concat) >= _SA_MIN_BYTES
    sa = None
    if use_sa:
        # queries compare at most max-query-doc-length bytes; sorting
        # deeper than that buys nothing (see build_suffix_array depth)
        q_lens = [len(c) for c in enc_q if len(c) >= min_len]
        max_q = max(q_lens) if q_lens else min_len
        sa = build_suffix_array(concat, depth=max_q)

    pairs: set[tuple[str, str]] = set()
    seen_content: dict[bytes, np.ndarray] = {}
    for idx in order:
        a = enc_q[idx]
        if len(a) < min_len:
            continue
        if use_sa:
            positions = seen_content.get(a)
            if positions is None:
                positions = _sa_occurrences(concat, sa, a)
                seen_content[a] = positions
            it = positions.tolist()
        else:
            it = []
            pos = concat.find(a)
            while pos != -1:
                it.append(pos)
                pos = concat.find(a, pos + 1)
        for pos in it:
            holder = int(np.searchsorted(starts, pos, side="right") - 1)
            if host_ids[holder] != query_ids[idx] \
                    and len(enc_h[holder]) > len(a):
                pairs.add((query_ids[idx], host_ids[holder]))
    return sorted(pairs)


def containment_pairs_in_group(file_ids: list[str], contents: list[str],
                               min_len: int = 32) -> list[tuple[str, str]]:
    """(inner, outer) pairs where inner's content is a proper substring of
    outer's content. Equal contents are NOT reported (Stage 1 territory)."""
    return containment_pairs_between(file_ids, contents, file_ids, contents,
                                     min_len)


def containment_edges(corpus_with_ids: rd.Dataset,
                      cfg: PipelineConfig | None = None,
                      partition_col: str | None = None) -> rd.Dataset:
    """corpus rows (``file_id``, ``content``, partition col) →
    ``(src, dst)`` edge relation (src = embedded inner file, dst = host).

    Group-size bound: a partition group whose total content exceeds
    ``cfg.substring_group_bytes_cap`` is hash-sharded into
    ``k = ceil(bytes / cap)`` shards, and every ordered shard pair (i, j)
    becomes its own scan task — queries from shard i against a suffix
    array over shard j's docs — so one task never holds more than ~2x the
    cap regardless of group size (a monorepo-sized group previously
    concatenated whole in one worker). Detection stays exact: pair
    (a ⊂ b) surfaces in exactly task (shard(a), shard(b)). Cost of the
    fallback is 2k copies of each oversized-group row and k² tasks —
    quadratic in group size, the honest price of exact containment
    without a distributed suffix structure. Per-DOC bound unchanged: one
    document larger than the cap must still fit a worker."""
    cfg = cfg or PipelineConfig()
    pcol = partition_col or cfg.substring_partition_col
    min_len = cfg.min_containment_len
    cap = cfg.substring_group_bytes_cap

    have_size = "size" in corpus_with_ids.schema().names
    cols = ["file_id", "content", pcol] + (["size"] if have_size else [])
    src = corpus_with_ids.select_columns(cols)

    # narrow per-group byte census (the hash pass's `size` column when
    # present — no content touch); only OVERSIZED groups reach the driver
    from ray.data.aggregate import Sum as _Sum

    def group_bytes(t: pa.Table) -> pa.Table:
        b = t.column("size") if "size" in t.schema.names \
            else pc.binary_length(t.column("content"))
        return pa.table({pcol: t.column(pcol), "b": b})

    census_src = corpus_with_ids.select_columns(
        [pcol, "size"] if have_size else [pcol, "content"])
    oversized_rows = census_src \
        .map_batches(group_bytes, batch_format="pyarrow") \
        .groupby(pcol).aggregate(_Sum("b", alias_name="b")) \
        .filter(expr=f"b > {int(cap)}").take_all()
    shard_counts = {r[pcol]: int(-(-r["b"] // cap)) for r in oversized_rows}

    import ray as _ray
    counts_ref = _ray.put(shard_counts)

    def explode_shards(t: pa.Table) -> pa.Table:
        counts = _ray.get(counts_ref)
        gvals = t.column(pcol).to_pylist()
        if not counts or not any(g in counts for g in gvals):
            # fast path (every group under the cap): one scan task per
            # group, single copy, role 'b' (both sides)
            key = pc.binary_join_element_wise(
                pc.cast(t.column(pcol), pa.string()), "#0_0", "\x01")
            return pa.table({
                "file_id": t.column("file_id"),
                "content": t.column("content"),
                "_scan_key": key.combine_chunks()
                if isinstance(key, pa.ChunkedArray) else key,
                "role": pa.array(["b"] * t.num_rows, pa.string())})
        from deduplicate_ray.stages.joins import stable_hash
        fids = t.column("file_id").to_pylist()
        contents = t.column("content").to_pylist()
        h_all = stable_hash(np.asarray(fids, dtype=object))
        out_f, out_c, out_k, out_r = [], [], [], []
        for row, (g, f, c) in enumerate(zip(gvals, fids, contents)):
            k = counts.get(g, 1)
            if k <= 1:
                out_f.append(f); out_c.append(c)
                out_k.append(f"{g}\x01#0_0"); out_r.append("b")
                continue
            s = int(h_all[row] % np.uint64(k))
            for j in range(k):           # query side visits every shard
                out_f.append(f); out_c.append(c)
                out_k.append(f"{g}\x01#{s}_{j}"); out_r.append("q")
            for i in range(k):           # host side of its own shard
                out_f.append(f); out_c.append(c)
                out_k.append(f"{g}\x01#{i}_{s}"); out_r.append("h")
        return pa.table({"file_id": pa.array(out_f, pa.string()),
                         "content": pa.array(out_c, pa.string()),
                         "_scan_key": pa.array(out_k, pa.string()),
                         "role": pa.array(out_r, pa.string())})

    def scan(g: pd.DataFrame) -> pa.Table:
        # arrow output keeps empty blocks TYPED (string, not object) —
        # Ray's block size estimator chokes on empty object columns
        # ("cannot call `vectorize` on size 0 inputs")
        roles = g["role"]
        if (roles == "b").all():
            pairs = containment_pairs_in_group(
                g["file_id"].tolist(), g["content"].fillna("").tolist(),
                min_len)
        else:
            q = g[roles == "q"]
            h = g[roles == "h"]
            pairs = containment_pairs_between(
                q["file_id"].tolist(), q["content"].fillna("").tolist(),
                h["file_id"].tolist(), h["content"].fillna("").tolist(),
                min_len)
        return pa.table(
            {"src": pa.array([p[0] for p in pairs], pa.string()),
             "dst": pa.array([p[1] for p in pairs], pa.string())})

    exploded = src.map_batches(explode_shards, batch_format="pyarrow")
    return exploded.groupby("_scan_key").map_groups(
        scan, batch_format="pandas")


def add_ids_only(corpus: rd.Dataset) -> rd.Dataset:
    """Light prep for the substring pass: file_id only (no hashing)."""
    return corpus.map_batches(hashing.add_file_id, batch_format="pyarrow")
