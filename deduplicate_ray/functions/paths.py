"""Path projections and exclude filtering (M1, M6, M7).

The reference compiles fnmatch globs to one alternation regex and drops
matching files / prunes matching dirs during the walk
(``dupe_analysis.py:29-30``, ``:179-181``, ``:210-213``). Here the same glob
vocabulary filters the ``path`` column vectorized via
``pc.match_substring_regex`` inside ``map_batches``.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc


def _glob_to_re2(glob: str) -> str:
    """One fnmatch glob → an anchored RE2-compatible regex.

    ``fnmatch.translate`` emits ``(?s:...)\\Z`` which Arrow's RE2 engine
    rejects; this builds the same language with ``^...$`` anchors.
    fnmatch semantics: ``*`` and ``?`` match any char including '/'.
    """
    out = ["^"]
    for ch in glob:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    out.append("$")
    return "".join(out)


def excludes_regex(globs: tuple[str, ...] | list[str]) -> str | None:
    """fnmatch globs → one anchored alternation regex (reference analog of
    ``'|'.join(fnmatch.translate(g))``, ``dupe_analysis.py:29-30``)."""
    if not globs:
        return None
    return "|".join(_glob_to_re2(g) for g in globs)


def make_exclude_filter(globs: tuple[str, ...] | list[str], column: str = "path"):
    """Returns a ``map_batches`` body dropping rows whose path matches any
    glob. Globs like ``*/@*`` match against the full path string."""
    rx = excludes_regex(globs)

    def _filter(batch: pa.Table) -> pa.Table:
        if rx is None:
            return batch
        hit = pc.match_substring_regex(batch.column(column), rx)
        return batch.filter(pc.invert(pc.fill_null(hit, False)))

    return _filter


def human_size(n: int) -> str:
    """B→KB→…→YB formatting (M8, ``dupe_utils.py:53-67``) — driver-side
    report formatting only."""
    size = float(n)
    for unit in ["B", "KB", "MB", "GB", "TB", "PB", "EB", "ZB"]:
        if abs(size) < 1024.0:
            return f"{size:.2f} {unit}"
        size /= 1024.0
    return f"{size:.2f} YB"


def add_dirpath(batch: pa.Table) -> pa.Table:
    """Append ``dir = repo || '/' || dirname(path)`` (M6: ``os.path.dirname``
    per path, ``dupe_utils.py:14-16``; in the corpus model the directory key
    is namespaced by repo). Fully vectorized: RE2 dirname extraction + an
    element-wise binary join — no Python loop over rows."""
    d = pc.fill_null(pc.struct_field(
        pc.extract_regex(batch.column("path"), r"^(?P<d>.*)/"), "d"), "")
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    repo = batch.column("repo")
    if isinstance(repo, pa.ChunkedArray):
        repo = repo.combine_chunks()
    dirs = pc.if_else(pc.equal(d, ""), repo,
                      pc.binary_join_element_wise(repo, d, "/"))
    if isinstance(dirs, pa.ChunkedArray):
        dirs = dirs.combine_chunks()
    return batch.append_column("dir", dirs)


def add_depth(batch: pa.Table, column: str = "path") -> pa.Table:
    """Append ``depth`` = number of '/' separators in the path (M7 —
    the reference's in-memory recomputation, ``deduplicate.py:17-18``;
    its DB ``depth`` column is dead, see SURVEY §1.1)."""
    depth = pc.count_substring(batch.column(column), "/")
    return batch.append_column("depth", pc.cast(depth, pa.int32()))
