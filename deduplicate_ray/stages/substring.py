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
concatenates the group's contents with a ``\\x00`` sentinel (never present in
text content) and uses C-speed ``str.find`` over the concatenation: cost
O(g * |S|) per group worst-case, with the candidate set shrunk by the
``min_containment_len`` floor. For very large groups a suffix-array build
(O(|S| log |S|)) amortizes repeated scans; the sentinel layout is already
SA-ready.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from deduplicate_ray.config import PipelineConfig
from deduplicate_ray.functions import hashing

SENTINEL = "\x00"


def containment_pairs_in_group(file_ids: list[str], contents: list[str],
                               min_len: int = 32) -> list[tuple[str, str]]:
    """(inner, outer) pairs where inner's content is a proper substring of
    outer's content. Equal contents are NOT reported (Stage 1 territory)."""
    order = np.argsort([len(c) for c in contents], kind="stable")
    concat = SENTINEL.join(contents)
    # start offset of each doc in the concatenation
    offs = np.zeros(len(contents) + 1, dtype=np.int64)
    for i, c in enumerate(contents):
        offs[i + 1] = offs[i] + len(c) + 1  # +1 for sentinel
    starts = offs[:-1]

    pairs: set[tuple[str, str]] = set()
    for idx in order:
        a = contents[idx]
        if len(a) < min_len:
            continue
        pos = concat.find(a)
        while pos != -1:
            holder = int(np.searchsorted(starts, pos, side="right") - 1)
            if holder != idx and len(contents[holder]) > len(a):
                pairs.add((file_ids[idx], file_ids[holder]))
            pos = concat.find(a, pos + 1)
    return sorted(pairs)


def containment_edges(corpus_with_ids: rd.Dataset,
                      cfg: PipelineConfig | None = None,
                      partition_col: str | None = None) -> rd.Dataset:
    """corpus rows (``file_id``, ``content``, partition col) →
    ``(src, dst)`` edge relation (src = embedded inner file, dst = host)."""
    cfg = cfg or PipelineConfig()
    pcol = partition_col or cfg.substring_partition_col
    min_len = cfg.min_containment_len

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        pairs = containment_pairs_in_group(
            g["file_id"].tolist(), g["content"].fillna("").tolist(), min_len)
        return pd.DataFrame({"src": [p[0] for p in pairs],
                             "dst": [p[1] for p in pairs]},
                            columns=["src", "dst"]).astype(str)

    cols = ["file_id", "content", pcol]
    return corpus_with_ids.select_columns(cols).groupby(pcol).map_groups(
        scan, batch_format="pandas")


def add_ids_only(corpus: rd.Dataset) -> rd.Dataset:
    """Light prep for the substring pass: file_id only (no hashing)."""
    return corpus.map_batches(hashing.add_file_id, batch_format="pyarrow")
