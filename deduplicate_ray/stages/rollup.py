"""Directory roll-up + keeper election entry points (capability parity with
the reference's phase 2, ``deduplicate.py``).

* **Roll-up (A3)** — two-level: a vectorized dirname projection + partial
  ``groupby((repo, dir))`` reduces the corpus to one row per distinct
  directory, then ONLY that small dir relation explodes to ancestor
  prefixes and re-aggregates. This replaces the reference's mutable
  bottom-up walk (``load_fs``/``fill_parents``, ``deduplicate.py:133-200``)
  and removes its depth-ordering requirement (O1). Duplicate membership is
  marked with the vectorized ``pc.is_in`` kernel against a broadcast id set
  (``ray.put`` once, fetched once per worker) — never a closure-captured
  Python set probed per row.
* **Keeper election (O2/O3/A4)** — delegated to
  :mod:`deduplicate_ray.stages.keeper`, the reference-parity greedy
  recommender (5-key tiebreak, ``check_largest``, ``dupe_children``
  recursion, multi-pass re-seeding, dir-collapse cleanup).
* **Report (S5)** — the ``dupe_list`` table with
  ``(to_delete, keeper, keeper_dir, size)`` columns, the reference's CSV
  rows (``deduplicate.py:690-719``) as a Dataset; a delete-list table stands
  in for the filesystem delete sink (S6) by design.
"""

from __future__ import annotations

import posixpath

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from deduplicate_ray.stages import joins, keeper


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


def dir_rollup(members: rd.Dataset, all_hashes: rd.Dataset | None = None,
               broadcast_limit: int = joins.DEFAULT_BROADCAST_LIMIT,
               num_partitions: int = 16) -> rd.Dataset:
    """Per-directory counters over every ancestor prefix.

    ``members`` = exact-dup membership rows (file_id, repo, path, size,
    exact_group_id); ``all_hashes`` = the full hashed relation (to count
    uniques too). Output: ``(dir, total_count, dupe_count, uniq_count,
    bytes)`` — the Ray analog of ``DupeDir.count/extra/count_total/...``
    (``deduplicate.py:66-72``, ``133-178``); because every ancestor gets a
    row, the ``*_total`` recursive counters are just this table's rows.

    Physical plan: when ``all_hashes`` is given, duplicate membership is a
    broadcast semi-mark — dup file_ids are ``ray.put`` once and tested with
    one ``pc.is_in`` pass per batch (scale fallback: a bucketed left join
    marks membership distributedly past ``broadcast_limit`` ids).
    """
    if all_hashes is None:
        src = members.map_batches(
            lambda t: t.append_column(
                "is_dupe", pa.array(np.ones(t.num_rows, dtype=np.int64))),
            batch_format="pyarrow")
    else:
        ids = joins._try_broadcast_keys(
            members.select_columns(["file_id"]), "file_id", broadcast_limit)
        if ids is not None and not ids:
            src = all_hashes.map_batches(
                lambda t: t.append_column(
                    "is_dupe", pa.array(np.zeros(t.num_rows, dtype=np.int64))),
                batch_format="pyarrow")
        elif ids is not None:
            ref = ray.put(ids)

            def mark(t: pa.Table) -> pa.Table:
                vs = joins._cached_value_set(ref)
                dup = pc.cast(pc.fill_null(
                    pc.is_in(t.column("file_id"), value_set=vs), False),
                    pa.int64())
                return t.append_column("is_dupe", dup)

            src = all_hashes.map_batches(mark, batch_format="pyarrow")
        else:
            marked = joins.distinct_keys(
                members.select_columns(["file_id"]), "file_id").map_batches(
                lambda t: t.append_column(
                    "_dup", pa.array([1] * t.num_rows, pa.int8())),
                batch_format="pyarrow")
            joined = joins.bucket_join(
                all_hashes.select_columns(["file_id", "repo", "path", "size"]),
                marked, on="file_id", how="left",
                num_buckets=num_partitions)
            src = joined.map_batches(
                lambda t: t.append_column(
                    "is_dupe",
                    pc.cast(pc.is_valid(t.column("_dup")), pa.int64()))
                .drop_columns(["_dup"]),
                batch_format="pyarrow")

    # Two-level rollup: the full corpus is reduced to ONE row per distinct
    # immediate directory with a vectorized pass (RE2 dirname extraction —
    # no Python loop over file rows), and the ancestor-prefix explosion —
    # the only inherently row-wise string walk — runs on that far smaller
    # dir relation. At 10^12 files / 10^9 dirs this removes the per-FILE
    # Python loop and shrinks the explode-shuffle input ~depth×1000-fold.
    def to_dir(batch: pa.Table) -> pa.Table:
        # dirname(path) = greedy match before the last '/'; root files -> ""
        d = pc.fill_null(pc.struct_field(
            pc.extract_regex(batch.column("path"), r"^(?P<d>.*)/"), "d"), "")
        return pa.table({
            "repo": batch.column("repo"), "d": d,
            "is_dupe": batch.column("is_dupe"), "size": batch.column("size"),
        })

    direct = src.map_batches(to_dir, batch_format="pyarrow") \
        .groupby(["repo", "d"]).aggregate(
            Count(alias_name="total_count"),
            Sum("is_dupe", alias_name="dupe_count"),
            Sum("size", alias_name="bytes"))

    def explode(batch: pa.Table) -> pa.Table:
        repos = batch.column("repo").to_pylist()
        dnames = batch.column("d").to_pylist()
        dirs, idx = [], []
        for i, (r, d) in enumerate(zip(repos, dnames)):
            dirs.append(r)
            idx.append(i)
            if d:
                parts = d.split("/")
                for j in range(1, len(parts) + 1):
                    dirs.append(r + "/" + "/".join(parts[:j]))
                    idx.append(i)
        take = np.asarray(idx, dtype=np.int64)
        out = {"dir": pa.array(dirs, pa.string())}
        for col in ("total_count", "dupe_count", "bytes"):
            vals = batch.column(col).to_numpy(zero_copy_only=False)
            out[col] = pa.array(vals[take] if len(take) else
                                np.zeros(0, dtype=np.int64), pa.int64())
        return pa.table(out)

    agg = direct.map_batches(explode, batch_format="pyarrow") \
        .groupby("dir").aggregate(
            Sum("total_count", alias_name="total_count"),
            Sum("dupe_count", alias_name="dupe_count"),
            Sum("bytes", alias_name="bytes"))
    return agg.map_batches(
        lambda t: t.append_column(
            "uniq_count",
            pc.subtract(t.column("total_count"), t.column("dupe_count"))),
        batch_format="pyarrow")


def elect_keepers(members: rd.Dataset,
                  all_hashes: rd.Dataset | None = None,
                  num_partitions: int = 16) -> rd.Dataset:
    """Reference-parity greedy keeper election over exact-dup membership
    rows (see :mod:`deduplicate_ray.stages.keeper` for the algorithm and
    its fidelity notes).

    The driver graph holds only the duplicate population; when
    ``all_hashes`` is supplied, per-dir unique counts and the dir-edge
    relation are reduced distributedly first (the corpus never reaches the
    driver).

    Output: ``(file_id, exact_group_id, dir, size, is_kept, keeper,
    keeper_dir)`` — one row per duplicate file.
    """
    files, dwd, final_output, delete_lookup, _collapsed = keeper.elect(
        members, all_hashes, num_partitions=num_partitions)
    return rd.from_arrow(keeper.decisions_table(files, delete_lookup))


def full_report(members: rd.Dataset,
                all_hashes: rd.Dataset | None = None,
                num_partitions: int = 16) -> rd.Dataset:
    """The reference's ``dupe_list.csv`` with dir-collapse applied: one row
    per recommended delete — a file or a whole directory when the cleanup
    pass found it empty (``deduplicate.py:640-676``). Columns:
    ``(to_delete, keep_dir, keeper, size, is_dir)``."""
    _files, _dwd, final_output, _dl, _collapsed = keeper.elect(
        members, all_hashes, num_partitions=num_partitions)
    return rd.from_arrow(keeper.report_table(final_output))


def dupe_report(keepers: rd.Dataset) -> rd.Dataset:
    """Per-file delete rows from the decisions table (S5,
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
