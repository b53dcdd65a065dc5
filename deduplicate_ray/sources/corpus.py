"""Corpus sources (S1/S7 analogs) and schema validation.

The reference's input is a filesystem walk (``dupe_analysis.py:173-232``);
ours is a partitioned Parquet read — blocks for free, columns pruned at the
read. Loose files can still be ingested via ``read_binary_files``.
"""

from __future__ import annotations

import posixpath

import pyarrow as pa
import ray.data as rd

from deduplicate_ray.fixtures import CORPUS_SCHEMA

REQUIRED_COLUMNS = tuple(CORPUS_SCHEMA.names)


def read_corpus(path: str | list[str], columns: list[str] | None = None) -> rd.Dataset:
    """Read the corpus Parquet table, pruning to the requested columns.

    Always pass ``columns`` when a stage needs only a subset — e.g. the
    Stage-2 signer needs only ``(repo, path, commit, content)``; shipping
    ``lang`` too is harmless, but a full-width read for a narrow stage is not.
    """
    # read with a pre-stripped schema: writer metadata (e.g. a `pandas`
    # blob) makes the arrow schema unhashable, and Ray's shuffle
    # schema-dedup logs a warning per task — stripping at the reader means
    # even the ReadParquet blocks themselves carry a clean schema
    import pyarrow.parquet as pq
    first = path[0] if isinstance(path, list) else path
    try:
        schema = pq.read_schema(first).remove_metadata()
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return rd.read_parquet(path, columns=columns, schema=schema)
    except (OSError, KeyError):
        ds = rd.read_parquet(path, columns=columns)
        return ds.map_batches(lambda t: t.replace_schema_metadata(None),
                              batch_format="pyarrow")


def validate_schema(ds: rd.Dataset) -> rd.Dataset:
    """Assert the input carries the required corpus columns (declared schema,
    no inference — SURVEY §1.2)."""
    names = set(ds.schema().names)
    missing = [c for c in REQUIRED_COLUMNS if c not in names]
    if missing:
        raise ValueError(f"corpus input missing columns: {missing}")
    return ds


def read_loose_files(paths: str | list[str], repo: str = "local",
                     commit: str = "worktree") -> rd.Dataset:
    """Ingest loose files from disk into corpus rows (S1 fallback:
    ``read_binary_files(include_paths=True)``). Text is decoded UTF-8 with
    replacement; ``lang`` is the file extension."""
    ds = rd.read_binary_files(paths, include_paths=True)

    def to_corpus(batch: pa.Table) -> pa.Table:
        ps = batch.column("path").to_pylist()
        contents = [
            (b or b"").decode("utf-8", errors="replace")
            for b in batch.column("bytes").to_pylist()
        ]
        return pa.Table.from_pydict(
            {
                "repo": [repo] * len(ps),
                "path": ps,
                "commit": [commit] * len(ps),
                "lang": [posixpath.splitext(p)[1].lstrip(".") for p in ps],
                "content": contents,
            },
            schema=CORPUS_SCHEMA,
        )

    return ds.map_batches(to_corpus, batch_format="pyarrow")


def _map_to_corpus(ds: rd.Dataset, text_col: str,
                   path_col: str | None, repo: str, commit: str,
                   lang_col: str | None) -> rd.Dataset:
    """Shared column-mapping for the external-dump readers (JSONL, CSV):
    null text coerces to '' (the corpus content contract is non-null —
    empty content hashes like an empty file, reference M2 semantics);
    a missing ``path_col`` gets a deterministic content-hash synthetic
    id, layout-independent across block splits."""
    def to_corpus(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = batch.num_rows
        text = pc.fill_null(batch.column(text_col).cast(pa.string()), "")
        if path_col is not None and path_col in batch.schema.names:
            path = pc.cast(batch.column(path_col), pa.string())
        else:
            import numpy as np
            from deduplicate_ray.stages.joins import stable_hash
            h = stable_hash(np.asarray(text.to_pylist(), dtype=object))
            path = pa.array(np.char.mod("%016x.txt", h), pa.string())
        lang = (batch.column(lang_col).cast(pa.string())
                if lang_col and lang_col in batch.schema.names
                else pa.array([""] * n, pa.string()))
        return pa.Table.from_pydict(
            {"repo": pa.array([repo] * n, pa.string()),
             "path": path,
             "commit": pa.array([commit] * n, pa.string()),
             "lang": lang,
             "content": text},
            schema=CORPUS_SCHEMA)

    return ds.map_batches(to_corpus, batch_format="pyarrow")


def read_jsonl_corpus(paths: str | list[str],
                      text_col: str = "text",
                      path_col: str | None = None,
                      repo: str = "jsonl",
                      commit: str = "snapshot",
                      lang_col: str | None = None) -> rd.Dataset:
    """Ingest newline-delimited JSON (the de-facto web-crawl text dump
    format) into corpus rows. ``ray.data.read_json`` parallelizes at file
    granularity — shard large dumps into many files upstream (one 100 GB
    .jsonl is one read task; 1000 shards stream)."""
    return _map_to_corpus(rd.read_json(paths), text_col, path_col,
                          repo, commit, lang_col)


def read_csv_corpus(paths: str | list[str],
                    text_col: str = "text",
                    path_col: str | None = None,
                    repo: str = "csv",
                    commit: str = "snapshot",
                    lang_col: str | None = None) -> rd.Dataset:
    """Ingest CSV exports into corpus rows — same mapping contract as
    :func:`read_jsonl_corpus` via the shared builder."""
    return _map_to_corpus(rd.read_csv(paths), text_col, path_col,
                          repo, commit, lang_col)


def scan_dirs(paths: str | list[str], repo: str = "local") -> rd.Dataset:
    """Directory side table for loose-file mode: one row per directory with
    direct file and subdir counts. This is the missing analog of the
    reference's walk-time empty-dir detection
    (``dupe_analysis.py:224-232`` seeds, ``:636-642`` census) — a content
    table has no rows for an empty directory, so the census must come from
    the ingest walk itself. The walk touches directory entries only (no
    file reads; O(#dirs), the same cost the reference pays single-threaded
    in ``os.walk``)."""
    import os
    dirs, n_files, n_subdirs = [], [], []
    for root in ([paths] if isinstance(paths, str) else paths):
        for dirpath, dirnames, filenames in os.walk(root):
            rel = os.path.relpath(dirpath, root)
            d = repo if rel == "." else f"{repo}/{rel.replace(os.sep, '/')}"
            dirs.append(d)
            n_files.append(len(filenames))
            n_subdirs.append(len(dirnames))
    return rd.from_arrow(pa.table({
        "dir": pa.array(dirs, pa.string()),
        "n_files": pa.array(n_files, pa.int64()),
        "n_subdirs": pa.array(n_subdirs, pa.int64())}))


def empty_dirs(dirs: rd.Dataset) -> rd.Dataset:
    """A6 empty-dir census over the :func:`scan_dirs` side table (the
    reference's ``empty_dirs`` report, ``dupe_analysis.py:636-642``)."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(t.column("n_files"), 0),
                       pc.equal(t.column("n_subdirs"), 0))
        return t.filter(mask).select(["dir"])

    return dirs.map_batches(f, batch_format="pyarrow")


def documents_as_corpus(sf_dir: str) -> rd.Dataset:
    """Adapt the driver testdata ``documents`` table
    (doc_id, text, lang, source, n_chars) to the corpus schema so the dedup
    pipelines run unchanged over it. ``repo``=source, ``path``=doc_id,
    ``commit``='' (single snapshot)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])
    ds = ds.map_batches(lambda t: t.replace_schema_metadata(None),
                        batch_format="pyarrow")
    # driver testdata is single-row-group parquet → one block; split so the
    # downstream pipeline parallelizes
    ds = ds.repartition(8)

    def adapt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "repo": batch.column("source").cast(pa.string()),
                "path": pa.array([f"doc{v}.txt" for v in batch.column("doc_id").to_pylist()]),
                "commit": pa.array([""] * n, pa.string()),
                "lang": batch.column("lang").cast(pa.string()),
                "content": batch.column("text").cast(pa.string()),
            },
            schema=CORPUS_SCHEMA,
        )

    return ds.map_batches(adapt, batch_format="pyarrow")
