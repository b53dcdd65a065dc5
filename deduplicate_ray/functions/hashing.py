"""Content-hash batch UDFs (Stage 1 building blocks).

Re-expresses the reference's layered hash cascade (``dupe_analysis.py:420-452``)
over an Arrow ``content`` column instead of filesystem reads:

* ``size``      — byte length of content (``os.path.getsize`` analog, S2)
* ``beg_hash``  — sha1 of the first ``chunk`` bytes (M3)
* ``rev_hash``  — sha1 of (last ``chunk`` bytes ∥ centered middle window):
  byte-exact replication of ``f.seek(max(0, size - chunk)); read(chunk);
  f.seek(max(0, size//2 - chunk//2)); read(chunk)`` (M4,
  ``dupe_analysis.py:440-444``) — a parity-critical semantic pinned by the
  ``cascade_false_positive`` fixture.
* ``sha256``    — full-content sha256, the per-row invariant hash (M5;
  north_star uses sha256 where the reference used sha1).

Empty content gets the constant empty-digest on every level, matching the
reference's zero-size short-circuit (``dupe_analysis.py:31``, ``:335-340``) —
all empty files are mutual duplicates by construction (M2).

All functions are ``map_batches`` bodies: Arrow table in, Arrow table out,
``batch_format="pyarrow"`` (zero-copy from the object store). Hashing itself
is per-row ``hashlib`` (C implementation); the loop stays in Python but the
work is dominated by the C digest over the content bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _content_bytes(batch: pa.Table, column: str = "content") -> list:
    """Zero-copy per-row byte views of a utf-8 string column.

    Arrow strings ARE utf-8, so memoryview slices of the shared data
    buffer carry exactly the bytes ``str.encode()`` would produce — with
    no per-row Python string allocation or copy (the round-1 path built
    a PyString + a PyBytes per row, doubling the stage's memory traffic).
    hashlib accepts memoryviews directly. Nulls hash as empty."""
    col = batch.column(column).combine_chunks()
    if isinstance(col, pa.ChunkedArray):        # 0-chunk edge case
        col = pa.concat_arrays(col.chunks) if col.num_chunks \
            else pa.array([], pa.string())
    n = len(col)
    if n == 0:
        return []
    offs_buf, data_buf = col.buffers()[1], col.buffers()[2]
    width = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(offs_buf, dtype=width,
                         count=n + 1, offset=col.offset * np.dtype(width).itemsize)
    mv = memoryview(data_buf) if data_buf is not None else memoryview(b"")
    valid = np.ones(n, dtype=bool) if col.null_count == 0 else \
        np.asarray(pc.is_valid(col), dtype=bool)
    empty = memoryview(b"")
    return [mv[offs[i]:offs[i + 1]] if valid[i] else empty
            for i in range(n)]


def add_size(batch: pa.Table, column: str = "content") -> pa.Table:
    """Append ``size`` (int64, utf-8 byte length) — S2 without file I/O."""
    size = pc.binary_length(pc.cast(batch.column(column), pa.binary()))
    return batch.append_column("size", pc.cast(size, pa.int64()))


def add_sha256(batch: pa.Table, column: str = "content") -> pa.Table:
    """Append ``sha256`` (hex) of the full content — the Stage-1 invariant."""
    digests = [hashlib.sha256(b).hexdigest() for b in _content_bytes(batch, column)]
    return batch.append_column("sha256", pa.array(digests, pa.string()))


def add_cascade_hashes(batch: pa.Table, column: str = "content",
                       chunk: int = 1024) -> pa.Table:
    """Append ``beg_hash`` and ``rev_hash`` (sha1 hex, reference parity)."""
    begs, revs = [], []
    for b in _content_bytes(batch, column):
        n = len(b)
        begs.append(hashlib.sha1(b[:chunk]).hexdigest())
        h = hashlib.sha1()
        # last `chunk` bytes (capped at EOF exactly as f.read does)
        h.update(b[max(0, n - chunk): max(0, n - chunk) + chunk])
        # centered middle window
        mid = max(0, n // 2 - chunk // 2)
        h.update(b[mid: mid + chunk])
        revs.append(h.hexdigest())
    return batch.append_column("beg_hash", pa.array(begs, pa.string())) \
                .append_column("rev_hash", pa.array(revs, pa.string()))


def add_file_id(batch: pa.Table) -> pa.Table:
    """Append ``file_id = repo || ':' || commit || ':' || path`` (vectorized)."""
    fid = pc.binary_join_element_wise(
        batch.column("repo"), batch.column("commit"), batch.column("path"), ":"
    )
    return batch.append_column("file_id", fid)


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()
