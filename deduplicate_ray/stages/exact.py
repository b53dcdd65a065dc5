"""Stage 1 — exact duplicate detection (D1, A1, A2; SURVEY §2.5/§2.7).

Default mode: one vectorized pass adds ``sha256(content)`` per row, then the
core collision grouping — the Ray analog of the reference's
``GROUP BY {hash} HAVING COUNT(id) > 1`` (``dupe_analysis.py:391-407``) — is a
``groupby(sha256)`` count. ``exact_group_id`` is the sha256 itself (stable,
partition-independent), so group materialization never builds per-group path
lists (the reference's ``GROUP_CONCAT`` dicts, ``dupe_analysis.py:532-562``)
and rows stay columnar.

Faithful cascade mode replicates the reference's layered pruning
(size → beg_hash → rev_hash → optional full hash, ``dupe_analysis.py:367-389``):
each level computes its hash only for rows that still collide at the previous
level, so full-content hashing touches only survivors — the same economy the
reference gets from sampled reads, expressed as semi-joins against the
colliding-key sets.

Scale notes: the shuffle key is the hash itself (uniform by construction).
``content`` is dropped before any shuffle — only the narrow
``(file_id, repo, path, commit, lang, size, <hashes>)`` relation moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from deduplicate_ray.config import PipelineConfig
from deduplicate_ray.functions import hashing
from deduplicate_ray.functions.paths import make_exclude_filter
from deduplicate_ray.stages.joins import semi_join

HASH_COLS = ["file_id", "repo", "path", "commit", "lang", "size"]


def hash_corpus(corpus: rd.Dataset, cfg: PipelineConfig | None = None,
                keep_content: bool = False) -> rd.Dataset:
    """corpus → ``hashes`` relation: excludes filter, file_id, size, sha256
    (+ beg/rev cascade hashes when ``cfg.cascade``). Content is dropped unless
    ``keep_content`` (downstream shuffles must never carry it)."""
    cfg = cfg or PipelineConfig()
    ex = make_exclude_filter(cfg.excludes)

    def prep(batch: pa.Table) -> pa.Table:
        batch = ex(batch)
        batch = hashing.add_file_id(batch)
        batch = hashing.add_size(batch)
        batch = hashing.add_sha256(batch)
        if cfg.cascade:
            batch = hashing.add_cascade_hashes(batch, chunk=cfg.chunk)
        if not keep_content:
            batch = batch.drop_columns(["content"])
        return batch

    return corpus.map_batches(prep, batch_format="pyarrow",
                              batch_size=cfg.batch_size)


def colliding_keys(hashes: rd.Dataset, key: str = "sha256") -> rd.Dataset:
    """A1 — the core collision grouping: distinct ``key`` values with
    ``group_size >= 2`` and their total byte weight."""
    cols = [key] if key == "size" else [key, "size"]
    return (
        hashes.select_columns(cols)
        .groupby(key)
        .aggregate(Count(alias_name="group_size"), Sum("size", alias_name="bytes"))
        .filter(expr="group_size > 1")
    )


def exact_members(hashes: rd.Dataset, cfg: PipelineConfig | None = None,
                  key: str = "sha256") -> rd.Dataset:
    """Rows belonging to an exact-duplicate group, with
    ``exact_group_id`` = the hash value (A2 without list materialization)."""
    cfg = cfg or PipelineConfig()
    dup_keys = colliding_keys(hashes, key)
    members = semi_join(hashes, dup_keys, key,
                        num_partitions=cfg.num_partitions)
    return members.map_batches(
        lambda t: t.append_column("exact_group_id", t.column(key)),
        batch_format="pyarrow",
    )


def representatives(hashes: rd.Dataset, key: str = "sha256",
                    num_partitions: int | None = None) -> rd.Dataset:
    """Per-group canonical row election: min ``file_id`` per hash — the
    deterministic analog of the reference's keeper tiebreaks (O2,
    ``deduplicate.py:269-323``) for pipeline-internal use. Output:
    ``(key, rep_file_id)``.

    Physical plan: hash exchange on ``key`` + one vectorized pandas
    ``groupby.min`` per partition (``stages.exchange``) — Ray's sort-based
    aggregate ordered the whole narrow relation globally for a per-key
    min (part of a 99 s meta+reps phase at 3.6M rows / 8 cpus)."""
    from deduplicate_ray.stages.exchange import exchange
    from deduplicate_ray.stages.joins import default_num_buckets, stable_hash

    if num_partitions is None:
        num_partitions = default_num_buckets()

    def part_fn(t: pa.Table) -> np.ndarray:
        ks = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        return (stable_hash(ks) % np.uint64(num_partitions)).astype(np.int64)

    def min_per_key(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key not in t.schema.names:
            return pa.table({key: pa.array([], pa.string()),
                             "rep_file_id": pa.array([], pa.string())})
        gb = t.to_pandas().groupby(key, sort=False)["file_id"].min() \
            .reset_index()
        return pa.table({key: pa.array(gb[key].to_numpy(), pa.string()),
                         "rep_file_id": pa.array(gb["file_id"].to_numpy(),
                                                 pa.string())})

    return exchange(hashes.select_columns([key, "file_id"]),
                    part_fn, min_per_key, num_partitions)


def collapse_to_representatives(corpus_hashed: rd.Dataset,
                                cfg: PipelineConfig | None = None,
                                key: str = "sha256") -> rd.Dataset:
    """One row per distinct content hash — the Stage-2 input. Collapsing every
    exact-dup family to a single representative *before* MinHash is the single
    biggest band-bucket skew killer (SURVEY §4.3).

    ``corpus_hashed`` must carry ``file_id`` and ``key`` (from
    ``hash_corpus(keep_content=True)``).
    """
    cfg = cfg or PipelineConfig()
    reps = representatives(corpus_hashed, key)
    rep_ids = reps.select_columns(["rep_file_id"]).map_batches(
        lambda t: t.rename_columns(["file_id"]), batch_format="pyarrow"
    )
    return semi_join(corpus_hashed, rep_ids, "file_id",
                     num_partitions=cfg.num_partitions)


def exact_dedup(corpus: rd.Dataset, cfg: PipelineConfig | None = None) -> rd.Dataset:
    """Keep exactly one row (the representative) per distinct content —
    D1 'per-group first'. Returns the deduped corpus with hash columns."""
    hashed = hash_corpus(corpus, cfg, keep_content=True)
    return collapse_to_representatives(hashed, cfg)


# --------------------------------------------------------------------------
# faithful cascade mode
# --------------------------------------------------------------------------

def cascade_members(corpus: rd.Dataset, cfg: PipelineConfig) -> rd.Dataset:
    """Reference-parity cascade: prune by size collisions, then beg_hash,
    then rev_hash; final grouping key is ``rev_hash`` when
    ``cfg.complete_hash`` is False (reproducing the reference's sampled-hash
    false positives — pinned by the cascade_false_positive fixture) else the
    full ``sha256``.

    Level economy: each hash level is computed only for rows that survived
    the previous level, mirroring ``_compute_hashes``
    (``dupe_analysis.py:367-389``).
    """
    ex = make_exclude_filter(cfg.excludes)

    def level0(batch: pa.Table) -> pa.Table:
        batch = ex(batch)
        batch = hashing.add_file_id(batch)
        return hashing.add_size(batch)

    ds = corpus.map_batches(level0, batch_format="pyarrow", batch_size=cfg.batch_size)

    # level 1: size collisions
    ds = semi_join(ds, colliding_keys(ds, "size"), "size",
                   num_partitions=cfg.num_partitions)

    # level 2: beg_hash collisions (hash computed on survivors only)
    ds = ds.map_batches(
        lambda t: hashing.add_cascade_hashes(t, chunk=cfg.chunk),
        batch_format="pyarrow", batch_size=cfg.batch_size,
    )
    ds = semi_join(ds, colliding_keys(ds, "beg_hash"), "beg_hash",
                   num_partitions=cfg.num_partitions)

    # level 3: rev_hash collisions
    ds = semi_join(ds, colliding_keys(ds, "rev_hash"), "rev_hash",
                   num_partitions=cfg.num_partitions)

    if cfg.complete_hash:
        ds = ds.map_batches(hashing.add_sha256, batch_format="pyarrow",
                            batch_size=cfg.batch_size)
        key = "sha256"
        ds = semi_join(ds, colliding_keys(ds, key), key,
                       num_partitions=cfg.num_partitions)
    else:
        key = "rev_hash"

    ds = ds.map_batches(
        lambda t: t.append_column("exact_group_id", t.column(key))
                   .drop_columns(["content"]),
        batch_format="pyarrow",
    )
    return ds


def groups_as_sets(members: rd.Dataset) -> list[frozenset[str]]:
    """Driver-side helper for tests: materialize groups as frozensets of
    file_ids (small results only)."""
    rows = members.select_columns(["exact_group_id", "file_id"]).take_all()
    acc: dict[str, set[str]] = {}
    for r in rows:
        acc.setdefault(r["exact_group_id"], set()).add(r["file_id"])
    return [frozenset(v) for v in acc.values() if len(v) > 1]
