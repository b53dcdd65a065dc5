"""Stage 2c — connected components over the candidate-edge relation.

LSH edges are not transitive, so the reference's hash-equality grouping
(implicit transitive closure, ``dupe_analysis.py:532-562``) generalizes to a
union-find. Not a Ray Data primitive; two physical strategies (SURVEY §4.3):

* **driver union-find** — when the edge count is small enough to hold on the
  driver (post-Stage-1-collapse candidate sets usually are), classic DSU
  with path compression; labels are canonicalized to the minimum member of
  each component for determinism.
* **distributed min-label propagation** — iterative: each round joins the
  symmetric edge relation with the current label table
  (hash-partitioned on the node key), takes the per-node minimum of
  neighbor labels, and materializes the (narrow) label table so lazy
  lineage doesn't recompute prior rounds.  Converges to the per-component
  minimum label in O(component diameter) rounds; convergence is detected by
  an order-independent checksum of (node,label) pairs going stable, with a
  ``max_iters`` backstop. Per-round row counts are logged (lineage metrics).

Anchor pseudo-nodes introduced by LSH salting (``~bucket:...``) sort after
real file_ids, so component minimum labels are always real file_ids; anchors
are dropped from the final label table.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Min

from deduplicate_ray.stages.lsh import ANCHOR_PREFIX

logger = logging.getLogger(__name__)

DRIVER_EDGE_LIMIT = 2_000_000


def _drop_anchor_rows(labels: rd.Dataset) -> rd.Dataset:
    def f(t: pa.Table) -> pa.Table:
        # int-chain label tables (lexicographic-rank node ids) can carry
        # no anchor pseudo-nodes — the int salting path bridges sub-buckets
        # with real ids (stages/lsh.py) — so non-string tables pass through
        if not pa.types.is_string(t.schema.field("node").type) and \
                not pa.types.is_large_string(t.schema.field("node").type):
            return t
        return t.filter(pc.invert(
            pc.starts_with(t.column("node"), ANCHOR_PREFIX)))

    return labels.map_batches(f, batch_format="pyarrow")


def driver_union_find(edge_rows: list[tuple[str, str]]) -> dict[str, str]:
    """Classic DSU with path compression + union by size; labels = min member."""
    parent: dict[str, str] = {}
    size: dict[str, int] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if size.get(ra, 1) < size.get(rb, 1):
            ra, rb = rb, ra
        parent[rb] = ra
        size[ra] = size.get(ra, 1) + size.get(rb, 1)
        parent.setdefault(ra, ra)

    # canonicalize to min member per component (type-agnostic: nodes may
    # be file-id strings or the int-chain's lexicographic-rank ids)
    comp_min: dict = {}
    nodes = set(parent)
    for a, b in edge_rows:
        nodes.add(a); nodes.add(b)
    for n in nodes:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    return {n: comp_min[find(n)] for n in nodes}


def _labels_checksum(labels: rd.Dataset) -> int:
    """Order-independent convergence probe: sum of a vectorized stable hash
    of (node, label) pairs — one C-speed pass per batch (the round-1
    version ran a per-row blake2b Python loop over the whole label table
    every round)."""
    from deduplicate_ray.stages.joins import stable_hash

    def hash_batch(t: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as _pc
        # int-chain labels arrive as int64 — cast to string for the probe
        node_s = _pc.cast(t.column("node"), pa.string()).to_pandas()
        label_s = _pc.cast(t.column("label"), pa.string()).to_pandas()
        joined = pd.Series(node_s).str.cat(label_s, sep="\x00")
        hs = (stable_hash(joined.to_numpy()) >> np.uint64(1)).astype(np.int64)
        # one-row XOR partial per batch: XOR is order-independent and
        # CLOSED under int64, unlike SUM whose partials overflow int64 in
        # Ray's reduce (observed: Arrow conversion falls back to pickling
        # Python bigints on every round). Nodes are unique per label table
        # so no pair can self-cancel.
        x = int(np.bitwise_xor.reduce(hs)) if hs.size else 0
        return pa.table({"h": pa.array([x], pa.int64())})

    parts = labels.map_batches(hash_batch,
                               batch_format="pyarrow").take_all()
    acc = np.int64(0)
    for p in parts:
        acc ^= np.int64(p["h"])
    return int(acc)


def connected_components(edges: rd.Dataset, *,
                         driver_limit: int = DRIVER_EDGE_LIMIT,
                         max_iters: int = 50,
                         num_partitions: int = 16,
                         checkpoint_dir: str | None = None) -> rd.Dataset:
    """edges ``(src, dst)`` → labels ``(node, label)`` for every endpoint;
    ``label`` = min file_id of the connected component.

    Distributed path detail: each round's label table is PINNED by a Parquet
    round-trip (``write_parquet`` → ``read_parquet``). ``materialize()`` is
    NOT enough here — in this Ray version an iteratively reused materialized
    dataset still drags its producing plan along, so per-round cost grows
    geometrically; the Parquet pin keeps rounds flat AND doubles as the
    union-find state checkpoint the north rule requires (a killed run
    resumes from the last complete round directory via ``_SUCCESS``
    markers).
    """
    # Pin the narrow edge relation once (no-op if the caller already
    # materialized/checkpointed it), then probe with a metadata-only
    # count(): the round-1 take(limit+1) probe pulled up to 2M edge rows to
    # the driver just to measure, and the lazy lineage then executed a
    # SECOND time for the distributed path's symmetric pin.
    edges = edges.select_columns(["src", "dst"]).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table(
            {"node": pa.array([], pa.string()), "label": pa.array([], pa.string())}))

    if n_edges <= driver_limit:
        # parallel arrow-block fetch: take_all() over pandas-backed blocks
        # (map_groups lineage) converts row-by-row — measured ~35 s for a
        # 47k-row edge table vs 0.1 s via to_arrow_refs
        import ray as _ray
        import pandas as _pd

        def _as_arrow(b):
            # to_arrow_refs hands back pandas blocks verbatim when the
            # lineage produced them (map_groups output) — normalize
            if isinstance(b, _pd.DataFrame):
                return pa.Table.from_pandas(b, preserve_index=False)
            return b

        blocks = [_as_arrow(b) for b in _ray.get(edges.to_arrow_refs())]
        tbl = pa.concat_tables([
            b.select(["src", "dst"]) for b in blocks if b.num_rows]) \
            if n_edges else pa.table({"src": [], "dst": []})
        mapping = driver_union_find(list(zip(
            tbl.column("src").to_pylist(), tbl.column("dst").to_pylist())))
        labels = rd.from_arrow(pa.table({
            "node": list(mapping.keys()), "label": list(mapping.values())}))
        return _drop_anchor_rows(labels)

    # ---- distributed min-label propagation --------------------------------
    import os
    import shutil
    import tempfile

    from deduplicate_ray.stages.joins import bucket_join

    root = checkpoint_dir or tempfile.mkdtemp(prefix="unionfind_")

    def _pin(ds: rd.Dataset, name: str) -> rd.Dataset:
        path = os.path.join(root, name)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            shutil.rmtree(path, ignore_errors=True)
            ds.write_parquet(path)
            open(os.path.join(path, "_SUCCESS"), "w").close()
        return rd.read_parquet(path)

    def swap(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays([t.column("dst"), t.column("src")],
                                    names=["src", "dst"])

    sym = _pin(
        edges.select_columns(["src", "dst"])
        .union(edges.select_columns(["src", "dst"])
               .map_batches(swap, batch_format="pyarrow"))
        .map_batches(lambda t: t.rename_columns(["node", "nbr"]),
                     batch_format="pyarrow"),
        "sym")

    # resume from the last complete round if the caller passed a durable dir
    start_round = 0
    labels = None
    for it in reversed(range(max_iters)):
        if os.path.exists(os.path.join(root, f"round_{it}", "_SUCCESS")):
            labels = rd.read_parquet(os.path.join(root, f"round_{it}"))
            start_round = it + 1
            break
    if labels is None:
        labels = _pin(
            sym.select_columns(["node"]).groupby("node").aggregate(
                Min("node", alias_name="label")), "round_init")

    prev_sum = None
    for it in range(start_round, max_iters):
        msgs = bucket_join(sym, labels, on="node", how="inner",
                           num_buckets=num_partitions)
        msgs = msgs.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("nbr"), t.column("label")], names=["node", "label"]),
            batch_format="pyarrow")
        new_labels = labels.union(msgs).groupby("node").aggregate(
            Min("label", alias_name="label"))
        labels = _pin(new_labels, f"round_{it}")
        cur = _labels_checksum(labels)
        logger.info("union-find round %d: checksum %d", it, cur)
        if cur == prev_sum:
            break
        prev_sum = cur
    return _drop_anchor_rows(labels)


def clusters_table(labels: rd.Dataset) -> rd.Dataset:
    """(node,label) → ``(file_id, cluster_id)``."""
    return labels.map_batches(
        lambda t: t.rename_columns(["file_id", "cluster_id"]),
        batch_format="pyarrow")
