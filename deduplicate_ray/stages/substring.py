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


#: fine log-length buckets: bucket(b) = floor(LOG_GRAIN * log2(b)); at
#: grain 4 lengths inside one bucket differ by < 2^(1/4) ≈ 1.19x, so
#: length-range shards stay tight even on near-uniform length corpora.
_LOG_GRAIN = 4


def _len_bucket(blen: np.ndarray) -> np.ndarray:
    """Monotone length→bucket map (int64). Monotonicity is the soundness
    invariant of the query-side shard pruning below: bucket(h) < bucket(q)
    must imply len(h) < len(q). np.log2 is monotone on floats and floor
    preserves it; census and explode use THIS same function on the same
    integer lengths, so assignments always agree."""
    b = np.asarray(blen, dtype=np.float64)
    return np.floor(_LOG_GRAIN * np.log2(np.maximum(b, 1.0))).astype(np.int64)


def _build_shard_defs(bucket_rows: list[tuple[int, int]],
                      cap: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy length-ordered sharding of one oversized group from its
    (bucket, bytes) histogram: contiguous ascending bucket ranges of
    ≈``cap`` bytes each; a single bucket heavier than ``cap`` becomes
    ``ceil(bytes/cap)`` hash sub-shards sharing its length range. Returns
    (hi_bucket, nsub, off) arrays where ``off[i]`` is the flat scan-id of
    shard i's first sub-shard."""
    his: list[int] = []
    nsubs: list[int] = []
    cur_hi = None
    cur_bytes = 0
    for bucket, b in sorted(bucket_rows):
        if b > cap:
            if cur_hi is not None:
                his.append(cur_hi)
                nsubs.append(1)
                cur_hi, cur_bytes = None, 0
            his.append(bucket)
            nsubs.append(int(-(-b // cap)))
        elif cur_hi is None:
            cur_hi, cur_bytes = bucket, b
        elif cur_bytes + b > cap:
            his.append(cur_hi)
            nsubs.append(1)
            cur_hi, cur_bytes = bucket, b
        else:
            cur_hi, cur_bytes = bucket, cur_bytes + b
    if cur_hi is not None:
        his.append(cur_hi)
        nsubs.append(1)
    nsub = np.asarray(nsubs, dtype=np.int64)
    off = np.zeros(len(nsubs), dtype=np.int64)
    np.cumsum(nsub[:-1], out=off[1:])
    hi = np.asarray(his, dtype=np.int64)
    # hi_flat[flat scan-id] = hi bucket of that sub-shard's shard — the
    # length-prune lookup for candidate (query, sid) pairs
    hi_flat = np.repeat(hi, nsub)
    return hi, nsub, off, hi_flat


# --------------------------------------------------------------------------
# content-defined anchors (query routing for oversized groups)
# --------------------------------------------------------------------------
# Polynomial rolling hash mod 2^64 with an odd multiplier (so it is
# invertible mod 2^64 — the prefix trick below needs B^-1), finalized by
# the public MurmurHash3 fmix64 avalanche. A window is an ANCHOR iff
# mixed_hash % gap == 0 — a pure function of the window's bytes, so a
# query embedded verbatim inside a host carries its anchors with it.

_B64 = np.uint64(0x100000001B3)
_BINV64 = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def _mix64(x: np.ndarray) -> np.ndarray:
    """MurmurHash3 fmix64 finalizer, vectorized over uint64."""
    x = x.copy()
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def _window_hashes(buf: np.ndarray, w: int) -> np.ndarray:
    """uint64 hash of every w-byte window of ``buf``:
    H[i] = sum_j buf[i+j] * B^(w-1-j) (mod 2^64). O(n) via prefix sums of
    buf[t] * B^-t — wraparound uint64 arithmetic throughout."""
    n = int(buf.size)
    if n < w:
        return np.zeros(0, np.uint64)
    a = buf.astype(np.uint64)
    bpow = np.empty(n + 1, np.uint64)
    bpow[0] = 1
    np.multiply.accumulate(np.full(n, _B64, np.uint64), out=bpow[1:])
    binvpow = np.empty(n, np.uint64)
    binvpow[0] = 1
    if n > 1:
        np.multiply.accumulate(np.full(n - 1, _BINV64, np.uint64),
                               out=binvpow[1:])
    s = np.cumsum(a * binvpow)          # s[i] = sum_{t<=i} a[t] * B^-t
    pref = np.empty(n + 1, np.uint64)
    pref[0] = 0
    pref[1:] = bpow[:n] * s             # pref[i] = hash of buf[:i]
    return pref[w:] - pref[:-w] * bpow[w]


def _anchors_from_stream(buf: np.ndarray, ends: np.ndarray, w: int,
                         gap: int) -> tuple[np.ndarray, np.ndarray]:
    """Anchor windows over a pre-concatenated uint8 byte stream with
    per-doc end offsets (windows crossing doc boundaries are masked
    out). Returns (doc_idx, key) — anchors in ascending position order,
    so the first anchor of doc d is its first occurrence in doc_idx."""
    h = _window_hashes(buf, w)
    if h.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    keys = _mix64(h)
    pos = np.flatnonzero(keys % np.uint64(gap) == 0)
    d = np.searchsorted(ends, pos, side="right")
    valid = pos + w <= ends[d]          # window fully inside its doc
    pos, d = pos[valid], d[valid]
    return d, keys[pos]


def _col_stream(col, rows: np.ndarray | None = None
                ) -> tuple[np.ndarray, np.ndarray]:
    """(uint8 byte stream, per-doc end offsets) of a string column —
    the zero-copy replacement for per-row ``.as_py()`` + ``encode()`` +
    ``join``: Arrow strings ARE utf-8, so the column's data buffer is
    already the concatenated byte stream. One vectorized ``take`` when a
    row subset is given (the compacted result's data buffer is exactly
    the subset's stream); nulls read as empty docs."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):        # 0-chunk edge case
        arr = pa.concat_arrays(arr.chunks) if arr.num_chunks \
            else pa.array([], pa.string())
    if rows is not None:
        arr = arr.take(pa.array(np.asarray(rows, np.int64)))
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.uint8), np.zeros(0, np.int64)
    width = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(
        arr.buffers()[1], dtype=width, count=n + 1,
        offset=arr.offset * np.dtype(width).itemsize).astype(np.int64)
    data = arr.buffers()[2]
    full = np.frombuffer(data, np.uint8) if data is not None \
        else np.zeros(0, np.uint8)
    return full[offs[0]:offs[n]], offs[1:] - offs[0]


def _batch_anchors(contents: list[str], w: int,
                   gap: int) -> tuple[np.ndarray, np.ndarray]:
    """All anchor windows across a batch of docs (computed over ONE
    concatenated buffer). List-of-str convenience wrapper over
    :func:`_anchors_from_stream` (tests / small relations); batch hot
    paths use :func:`_batch_anchors_col` on the Arrow column directly."""
    enc = [c.encode() for c in contents]
    lens = np.asarray([len(e) for e in enc], np.int64)
    buf = np.frombuffer(b"".join(enc), np.uint8)
    return _anchors_from_stream(buf, np.cumsum(lens), w, gap)


def _batch_anchors_col(col, rows: np.ndarray | None, w: int,
                       gap: int) -> tuple[np.ndarray, np.ndarray]:
    """:func:`_batch_anchors` straight off an Arrow string column (row
    subset optional) — no per-row Python string materialization."""
    buf, ends = _col_stream(col, rows)
    return _anchors_from_stream(buf, ends, w, gap)


def _first_anchor(contents: list[str], w: int,
                  gap: int) -> tuple[np.ndarray, np.ndarray]:
    """(has_anchor bool mask, first anchor key per doc) — key undefined
    where the mask is False."""
    return _first_from(len(contents), *_batch_anchors(contents, w, gap))


def _first_anchor_col(col, rows: np.ndarray | None, w: int,
                      gap: int) -> tuple[np.ndarray, np.ndarray]:
    """Column-direct :func:`_first_anchor` (see :func:`_batch_anchors_col`)."""
    buf, ends = _col_stream(col, rows)
    n = len(ends)
    return _first_from(n, *_anchors_from_stream(buf, ends, w, gap))


def _first_from(n: int, d: np.ndarray, keys: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray]:
    has = np.zeros(n, dtype=bool)
    first = np.zeros(n, np.uint64)
    if d.size:
        uniq, idx = np.unique(d, return_index=True)
        has[uniq] = True
        first[uniq] = keys[idx]
    return has, first


def containment_edges(corpus_with_ids: rd.Dataset,
                      cfg: PipelineConfig | None = None,
                      partition_col: str | None = None,
                      _return_exploded: bool = False) -> rd.Dataset:
    """corpus rows (``file_id``, ``content``, partition col) →
    ``(src, dst)`` edge relation (src = embedded inner file, dst = host).

    Group-size bound — LENGTH-AWARE sharding: a partition group whose
    total content exceeds ``cfg.substring_group_bytes_cap`` is split into
    length-ordered shards of ≈cap bytes (from a narrow byte-weighted
    log-length histogram; an overweight single length bucket hash-splits
    into sub-shards sharing its range). Containment is length-monotone —
    a query can only be embedded in a strictly LONGER host — so each doc
    is shipped as a HOST exactly once (its own length shard) and as a
    QUERY only to shards whose length range reaches above its own bucket;
    docs shorter than ``min_containment_len`` ship nowhere. Total shuffle
    volume is O(bytes + query_bytes x higher_shards) instead of the
    previous every-shard-pair explosion's O(bytes^2/cap): on a corpus
    whose bytes are dominated by its longer documents (source code is)
    the exploded relation is a small constant times the input. Detection
    stays exact: pair (a ⊂ b) needs bucket(a) <= bucket(b) <= hi(shard(b))
    so a's query copies always include b's host shard, and the strictly-
    longer byte compare inside the scan task rejects everything pruning
    let through. Per-task memory is bounded by ~cap of host bytes plus
    the visiting query docs. Per-DOC bound unchanged: one document larger
    than the cap must still fit a worker.

    When the corpus carries a ``size`` column it is used as the length
    measure without touching ``content`` — it MUST equal the UTF-8 byte
    length of ``content`` (true for ``hashing.add_hashes`` output, which
    computes it via ``binary_length``); a divergent size column would
    break the pruning monotonicity above."""
    cfg = cfg or PipelineConfig()
    pcol = partition_col or cfg.substring_partition_col
    min_len = cfg.min_containment_len
    cap = cfg.substring_group_bytes_cap

    have_size = "size" in corpus_with_ids.schema().names
    cols = ["file_id", "content", pcol] + (["size"] if have_size else [])
    src = corpus_with_ids.select_columns(cols)

    # narrow per-group byte-weighted length histogram (the hash pass's
    # `size` column when present — no content touch); map-side combined,
    # so the shuffle and the driver see <= groups x 64ish rows
    from ray.data.aggregate import Sum as _Sum

    def length_hist(t: pa.Table) -> pa.Table:
        b = (t.column("size") if "size" in t.schema.names
             else pc.binary_length(t.column("content"))) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({pcol: t.column(pcol).to_pandas(),
                           "bucket": _len_bucket(b), "b": b})
        g = df.groupby([pcol, "bucket"], sort=False, dropna=False)["b"] \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    census_src = corpus_with_ids.select_columns(
        [pcol, "size"] if have_size else [pcol, "content"])
    hist_rows = census_src \
        .map_batches(length_hist, batch_format="pyarrow") \
        .groupby([pcol, "bucket"]).aggregate(_Sum("b", alias_name="b")) \
        .take_all()
    totals: dict = {}
    for r in hist_rows:
        totals[r[pcol]] = totals.get(r[pcol], 0) + int(r["b"])
    shard_defs = {}
    for g, tot in totals.items():
        if tot > cap:
            rows = [(int(r["bucket"]), int(r["b"])) for r in hist_rows
                    if r[pcol] == g]
            shard_defs[g] = _build_shard_defs(rows, cap)

    import ray as _ray
    defs_ref = _ray.put(shard_defs)

    # ---- anchored query routing (oversized groups only) ------------------
    # The length-pruned fanout ships each query to EVERY sub-shard that
    # could hold a longer host — O(query_bytes x k) on length-uniform
    # corpora. Content-defined anchors cut that to candidate-driven
    # volume: hosts publish (anchor key, sid) for every anchor window of
    # their content (a NARROW relation, ~16/gap bytes per content byte);
    # each query publishes its FIRST anchor key; a groupby on the key
    # yields the (query, sid) visit list, and the query ships only there.
    # Exactness: a query embedded in a host at offset o has its anchor
    # window verbatim at o+p in the host (anchor-ness is a pure function
    # of the window bytes), so the host's sid is always in the visit
    # list; hash collisions only ADD visits, and the suffix-array scan
    # byte-verifies everything. Anchorless queries (short or unlucky
    # content — P(no anchor) ~ e^(-len/gap)) fall back to the exact
    # length-pruned fanout, as does everything if the visit list blows
    # the driver budget or an anchor-key group blows the group cap.
    gap = cfg.substring_anchor_gap
    group_cap = cfg.substring_anchor_group_cap
    visits_ref = None
    if shard_defs:
        from deduplicate_ray.stages.joins import stable_hash as _shash

        def host_anchor_rel(t: pa.Table) -> pa.Table:
            defs = _ray.get(defs_ref)
            blen = (t.column("size") if "size" in t.schema.names
                    else pc.binary_length(t.column("content"))) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            gv = np.asarray(t.column(pcol).to_pylist(), dtype=object)
            m = np.asarray([g in defs for g in gv], dtype=bool) \
                & (blen > min_len)
            rows = np.flatnonzero(m)
            out_p, out_h, out_s = [], [], []
            if rows.size:
                fid = np.asarray(t.column("file_id").to_pylist(),
                                 dtype=object)[rows]
                bk = _len_bucket(blen[rows])
                sid = np.empty(rows.size, np.int64)
                for g in set(gv[rows].tolist()):
                    gm = gv[rows] == g
                    hi, nsub, off, _ = defs[g]
                    st = np.searchsorted(hi, bk[gm])
                    sub = (_shash(fid[gm]) % nsub[st].astype(np.uint64)) \
                        .astype(np.int64)
                    sid[gm] = off[st] + sub
                d, keys = _batch_anchors_col(t.column("content"), rows,
                                             min_len, gap)
                if d.size:
                    df = pd.DataFrame({
                        "p": gv[rows][d], "h": keys.view(np.int64),
                        "s": sid[d]}).drop_duplicates()
                    out_p = df["p"].tolist()
                    out_h = df["h"].to_numpy()
                    out_s = df["s"].to_numpy()
            return pa.table({
                pcol: pa.array(out_p, t.schema.field(pcol).type),
                "h": pa.array(np.asarray(out_h, np.int64), pa.int64()),
                "sid": pa.array(np.asarray(out_s, np.int64), pa.int64()),
                "file_id": pa.array([""] * len(out_p), pa.string()),
                "bucket": pa.array(np.full(len(out_p), -1, np.int64),
                                   pa.int64()),
                "kind": pa.array(["H"] * len(out_p), pa.string())})

        def query_anchor_rel(t: pa.Table) -> pa.Table:
            defs = _ray.get(defs_ref)
            blen = (t.column("size") if "size" in t.schema.names
                    else pc.binary_length(t.column("content"))) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            gv = np.asarray(t.column(pcol).to_pylist(), dtype=object)
            m = np.asarray([g in defs for g in gv], dtype=bool) \
                & (blen >= min_len)
            rows = np.flatnonzero(m)
            out = {k: [] for k in ("p", "h", "f", "b")}
            if rows.size:
                has, first = _first_anchor_col(t.column("content"), rows,
                                               min_len, gap)
                sel = np.flatnonzero(has)
                if sel.size:
                    fid = np.asarray(t.column("file_id").to_pylist(),
                                     dtype=object)[rows]
                    bk = _len_bucket(blen[rows])
                    out["p"] = gv[rows][sel].tolist()
                    out["h"] = first[sel].view(np.int64)
                    out["f"] = fid[sel].tolist()
                    out["b"] = bk[sel]
            n = len(out["p"])
            return pa.table({
                pcol: pa.array(out["p"], t.schema.field(pcol).type),
                "h": pa.array(np.asarray(out["h"], np.int64), pa.int64()),
                "sid": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "file_id": pa.array(out["f"], pa.string()),
                "bucket": pa.array(np.asarray(out["b"], np.int64),
                                   pa.int64()),
                "kind": pa.array(["Q"] * n, pa.string())})

        def pair_fn(t: pa.Table) -> pa.Table:
            kind = np.asarray(t.column("kind").to_pylist())
            qm = kind == "Q"
            qf = np.asarray(t.column("file_id").to_pylist(),
                            dtype=object)[qm]
            if qf.size == 0:
                return pa.table({"file_id": pa.array([], pa.string()),
                                 "sid": pa.array([], pa.int64())})
            if t.num_rows > group_cap:  # pathological shared gram
                uq = np.unique(qf)
                return pa.table({
                    "file_id": pa.array(uq, pa.string()),
                    "sid": pa.array(np.full(uq.size, -1, np.int64),
                                    pa.int64())})
            sids = np.unique(
                t.column("sid").to_numpy(zero_copy_only=False)[~qm])
            if sids.size == 0:
                return pa.table({"file_id": pa.array([], pa.string()),
                                 "sid": pa.array([], pa.int64())})
            g = t.column(pcol)[0].as_py()
            hi_flat = _ray.get(defs_ref)[g][3]
            hs = hi_flat[sids]          # non-decreasing in sid
            qb = t.column("bucket").to_numpy(zero_copy_only=False)[qm]
            start = np.searchsorted(hs, qb)
            reps = sids.size - start
            tot = int(reps.sum())
            if tot == 0:
                return pa.table({"file_id": pa.array([], pa.string()),
                                 "sid": pa.array([], pa.int64())})
            rowrep = np.repeat(np.arange(qf.size), reps)
            cum0 = np.zeros(qf.size, dtype=np.int64)
            np.cumsum(reps[:-1], out=cum0[1:])
            within = np.arange(tot, dtype=np.int64) - np.repeat(cum0, reps)
            return pa.table({
                "file_id": pa.array(qf[rowrep], pa.string()),
                "sid": pa.array(sids[within + np.repeat(start, reps)],
                                pa.int64())})

        pair_rel = src.map_batches(host_anchor_rel, batch_format="pyarrow") \
            .union(src.map_batches(query_anchor_rel,
                                   batch_format="pyarrow")) \
            .groupby([pcol, "h"]).map_groups(pair_fn,
                                             batch_format="pyarrow")
        budget = cfg.substring_visits_budget
        taken = pair_rel.take(budget + 1)
        if len(taken) <= budget:
            vmap: dict = {}
            for r in taken:
                f, s = r["file_id"], int(r["sid"])
                if s < 0:
                    vmap[f] = None
                elif vmap.get(f, ()) is not None:
                    vmap.setdefault(f, []).append(s)
            visits_ref = _ray.put({
                f: (None if v is None
                    else np.unique(np.asarray(v, np.int64)))
                for f, v in vmap.items()})

    def explode_shards(t: pa.Table) -> pa.Table:
        defs = _ray.get(defs_ref)
        blen = (t.column("size") if "size" in t.schema.names
                else pc.binary_length(t.column("content"))) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        # sub-min_len docs can be neither query (scan skips them) nor
        # host (a host must be strictly longer than a >=min_len query,
        # i.e. > min_len) — drop them before they ship anywhere
        keep = blen >= min_len
        if not keep.all():
            t = t.filter(pa.array(keep))
            blen = blen[keep]
        if t.num_rows == 0:
            return pa.table({
                "file_id": pa.array([], pa.string()),
                "content": pa.array([], pa.string()),
                pcol: pa.array([], t.schema.field(pcol).type),
                "_scan_id": pa.array([], pa.int64()),
                "role": pa.array([], pa.string())})
        gvals = np.asarray(t.column(pcol).to_pylist(), dtype=object)
        over = np.asarray([g in defs for g in gvals], dtype=bool) \
            if defs else np.zeros(len(gvals), dtype=bool)

        take_idx: list[np.ndarray] = []
        scan_ids: list[np.ndarray] = []
        roles: list[np.ndarray] = []
        base = np.flatnonzero(~over)
        if base.size:  # under-cap groups: one copy, role 'b', scan_id -1
            take_idx.append(base)
            scan_ids.append(np.full(base.size, -1, dtype=np.int64))
            roles.append(np.full(base.size, "b", dtype=object))
        if over.any():
            from deduplicate_ray.stages.joins import stable_hash
            vmap = _ray.get(visits_ref) if visits_ref is not None else None
            _miss = object()
            fid_np = np.asarray(t.column("file_id").to_pylist(),
                                dtype=object)
            bucket = _len_bucket(blen)
            for g in set(gvals[over].tolist()):
                rows = np.flatnonzero(over & (gvals == g))
                hi, nsub, off, _hf = defs[g]
                total_subs = int(off[-1] + nsub[-1])
                bk = bucket[rows]
                start = np.searchsorted(hi, bk)  # own shard; lo<=bk<=hi
                # host: exactly one copy into its length shard
                hosts = rows[blen[rows] > min_len]
                if hosts.size:
                    hstart = start[blen[rows] > min_len]
                    sub = (stable_hash(fid_np[hosts])
                           % nsub[hstart].astype(np.uint64)).astype(np.int64)
                    take_idx.append(hosts)
                    scan_ids.append(off[hstart] + sub)
                    roles.append(np.full(hosts.size, "h", dtype=object))
                # query side: anchored docs ship only to their candidate
                # sids from the visit map; anchorless docs (and overflow
                # sentinels) take the length-pruned fanout
                fan = np.ones(rows.size, dtype=bool)
                if vmap is not None:
                    has, _ = _first_anchor_col(t.column("content"), rows,
                                               min_len, gap)
                    v_rows: list[int] = []
                    v_lists: list[np.ndarray] = []
                    for li in np.flatnonzero(has):
                        v = vmap.get(fid_np[rows[li]], _miss)
                        if v is None:          # overflow sentinel → fanout
                            continue
                        fan[li] = False        # anchored: routed (or none)
                        if v is not _miss and v.size:
                            v_rows.append(rows[li])
                            v_lists.append(v)
                    if v_lists:
                        cnts = np.asarray([x.size for x in v_lists],
                                          np.int64)
                        take_idx.append(
                            np.repeat(np.asarray(v_rows, np.int64), cnts))
                        scan_ids.append(np.concatenate(v_lists))
                        roles.append(np.full(int(cnts.sum()), "q",
                                             dtype=object))
                frows = rows[fan]
                if frows.size:  # fanout: every sub-shard from own upward
                    qoff = off[start[fan]]
                    reps = total_subs - qoff
                    tot = int(reps.sum())
                    if tot:
                        rowrep = np.repeat(frows, reps)
                        cum0 = np.zeros(frows.size, dtype=np.int64)
                        np.cumsum(reps[:-1], out=cum0[1:])
                        within = np.arange(tot, dtype=np.int64) \
                            - np.repeat(cum0, reps)
                        take_idx.append(rowrep)
                        scan_ids.append(within + np.repeat(qoff, reps))
                        roles.append(np.full(tot, "q", dtype=object))
        idx = np.concatenate(take_idx)
        picked = t.select(["file_id", "content", pcol]) \
            .take(pa.array(idx, pa.int64()))
        return picked.append_column(
            "_scan_id", pa.array(np.concatenate(scan_ids), pa.int64())
        ).append_column(
            "role", pa.array(np.concatenate(roles), pa.string()))

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
    if _return_exploded:  # test hook: measure shipped (exploded) volume
        return exploded
    return exploded.groupby([pcol, "_scan_id"]).map_groups(
        scan, batch_format="pandas")


def add_ids_only(corpus: rd.Dataset) -> rd.Dataset:
    """Light prep for the substring pass: file_id only (no hashing)."""
    return corpus.map_batches(hashing.add_file_id, batch_format="pyarrow")
