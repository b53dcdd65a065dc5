"""Directory roll-up + greedy keeper election (capability parity with the
reference's phase 2, ``deduplicate.py``).

The reference builds a mutable ``DupeFile``/``DupeDir`` object graph, walks it
deepest-first to fill per-dir counters (``load_fs``/``fill_parents``,
``deduplicate.py:133-200``), then greedily elects "keeper" directories and
cascades deletes (``calc_max``/``keep``, ``deduplicate.py:269-417``). Our
re-expression:

* **Roll-up (A3)** — each file row explodes to all its ancestor dir prefixes
  (``flat_map``-style batch expansion) followed by ONE ``groupby(dir)``
  aggregate. The ancestor-prefix explode replaces the reference's mutable
  bottom-up walk and removes its depth-ordering requirement (O1).
* **Keeper election (O2/O3/A4)** — greedy, driver-side over the *reduced*
  duplicate-membership table (after A3 the per-dir relation is << input).
  Tie-break order mirrors the reference's composite key
  (``calc_max``, ``deduplicate.py:269-323``): most remaining duplicate files
  first, then largest total count, then lexicographic path — deterministic.
* **Report (S5)** — the ``dupe_list`` table with
  ``(to_delete, keeper, keeper_dir, size)`` columns, the reference's CSV
  rows (``deduplicate.py:690-719``) as a Dataset; a delete-list table stands
  in for the filesystem delete sink (S6) by design.
"""

from __future__ import annotations

import posixpath

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Sum

from deduplicate_ray.config import PipelineConfig
from deduplicate_ray.functions.paths import add_dirpath


def ancestor_prefixes(repo: str, path: str) -> list[str]:
    """All dir prefixes of repo-namespaced path, deepest last:
    ('r', 'a/b/f.txt') -> ['r', 'r/a', 'r/a/b']."""
    out = [repo]
    d = posixpath.dirname(path)
    if d:
        parts = d.split("/")
        for i in range(1, len(parts) + 1):
            out.append(repo + "/" + "/".join(parts[:i]))
    return out


def dir_rollup(members: rd.Dataset, all_hashes: rd.Dataset | None = None) -> rd.Dataset:
    """Per-directory counters over every ancestor prefix.

    ``members`` = exact-dup membership rows (file_id, repo, path, size,
    exact_group_id); ``all_hashes`` = the full hashed relation (to count
    uniques too). Output: ``(dir, total_count, dupe_count, uniq_count,
    bytes)`` — the Ray analog of ``DupeDir.count/extra/count_total/...``
    (``deduplicate.py:66-72``, ``133-178``); because every ancestor gets a
    row, the ``*_total`` recursive counters are just this table's rows.
    """
    src = all_hashes if all_hashes is not None else members
    dup_ids = {r["file_id"] for r in members.select_columns(["file_id"]).take_all()} \
        if all_hashes is not None else None

    def explode(batch: pa.Table) -> pa.Table:
        repos = batch.column("repo").to_pylist()
        paths = batch.column("path").to_pylist()
        fids = batch.column("file_id").to_pylist()
        sizes = batch.column("size").to_pylist()
        dirs, is_dupe, szs = [], [], []
        for r, p, f, s in zip(repos, paths, fids, sizes):
            d = 1 if (dup_ids is None or f in dup_ids) else 0
            for pref in ancestor_prefixes(r, p):
                dirs.append(pref)
                is_dupe.append(d)
                szs.append(s)
        return pa.table({
            "dir": pa.array(dirs, pa.string()),
            "is_dupe": pa.array(is_dupe, pa.int64()),
            "size": pa.array(szs, pa.int64()),
        })

    exploded = src.map_batches(explode, batch_format="pyarrow")
    agg = exploded.groupby("dir").aggregate(
        Count(alias_name="total_count"),
        Sum("is_dupe", alias_name="dupe_count"),
        Sum("size", alias_name="bytes"),
    )
    return agg.map_batches(
        lambda t: t.append_column(
            "uniq_count",
            pa.compute.subtract(t.column("total_count"), t.column("dupe_count"))),
        batch_format="pyarrow")


def elect_keepers(members: rd.Dataset) -> rd.Dataset:
    """Greedy keeper election over exact-dup membership rows.

    Driver-side over the reduced membership table (the reference's phase-2
    object graph is likewise in-memory, ``deduplicate.py:478-537``; ours is
    bounded by the duplicate population, not the corpus).

    Loop invariant (mirrors ``calc_max`` + ``DupeDir.keep``,
    ``deduplicate.py:269-417``): repeatedly pick the directory holding the
    most not-yet-resolved duplicate files (ties: larger total member count,
    then lexicographically smallest dir); keep its members; every other copy
    in each kept file's group is marked deleted with ``deleted_by`` pointing
    at the keeper (the reference's ``DupeFile.deleted_by``,
    ``deduplicate.py:22``).

    Output: ``(file_id, exact_group_id, dir, size, is_kept, keeper,
    keeper_dir)`` — one row per duplicate file.
    """
    rows = members.select_columns(
        ["file_id", "exact_group_id", "repo", "path", "size"]).take_all()
    for r in rows:
        d = posixpath.dirname(r["path"])
        r["dir"] = r["repo"] + "/" + d if d else r["repo"]

    by_group: dict[str, list[dict]] = {}
    by_dir: dict[str, list[dict]] = {}
    for r in rows:
        by_group.setdefault(r["exact_group_id"], []).append(r)
        by_dir.setdefault(r["dir"], []).append(r)

    resolved: dict[str, dict] = {}  # file_id -> row with decision
    unresolved_groups = set(by_group)

    while unresolved_groups:
        # score dirs by remaining unresolved dupes
        best = None
        for d, drows in by_dir.items():
            remaining = sum(1 for r in drows if r["file_id"] not in resolved
                            and r["exact_group_id"] in unresolved_groups)
            if remaining == 0:
                continue
            key = (-remaining, -len(drows), d)
            if best is None or key < best[0]:
                best = (key, d)
        if best is None:
            break
        keep_dir = best[1]
        for r in by_dir[keep_dir]:
            gid = r["exact_group_id"]
            if r["file_id"] in resolved or gid not in unresolved_groups:
                continue
            # keep this copy, delete the rest of its group
            r2 = dict(r, is_kept=True, keeper=r["file_id"], keeper_dir=keep_dir)
            resolved[r["file_id"]] = r2
            for other in by_group[gid]:
                if other["file_id"] != r["file_id"] and other["file_id"] not in resolved:
                    resolved[other["file_id"]] = dict(
                        other, is_kept=False, keeper=r["file_id"],
                        keeper_dir=keep_dir)
            unresolved_groups.discard(gid)

    out = sorted(resolved.values(), key=lambda r: r["file_id"])
    return rd.from_arrow(pa.Table.from_pydict({
        "file_id": [r["file_id"] for r in out],
        "exact_group_id": [r["exact_group_id"] for r in out],
        "dir": [r["dir"] for r in out],
        "size": [r["size"] for r in out],
        "is_kept": [r["is_kept"] for r in out],
        "keeper": [r["keeper"] for r in out],
        "keeper_dir": [r["keeper_dir"] for r in out],
    }))


def dupe_report(keepers: rd.Dataset) -> rd.Dataset:
    """The reference's ``dupe_list.csv`` rows (S5,
    ``deduplicate.py:690-719``): one row per recommended delete, sorted by
    path for deterministic output (O4, ``deduplicate.py:697``)."""
    dels = keepers.filter(expr="is_kept == False")
    return dels.select_columns(["file_id", "keeper", "keeper_dir", "size"]) \
               .map_batches(lambda t: t.rename_columns(
                   ["to_delete", "keeper", "keeper_dir", "size"]),
                   batch_format="pyarrow") \
               .sort("to_delete")


def freed_bytes(report: rd.Dataset) -> int:
    """A5 — total bytes freed by the recommended deletes."""
    return report.sum("size") or 0
