"""JSON field extraction from string columns — the event-log enrich
step (``props`` payloads) a pipeline runs before aggregating.

No reference analog (the reference has no nested data,
``/root/reference/dupe_analysis.py:58-91`` is flat SQLite columns).

Two paths, same pinned semantics as DuckDB ``json_extract``:

* **regex fast path** (default): for scalar fields in FLAT objects, one
  RE2 ``extract_regex`` over the whole column — zero Python per row.
  Correct only when the field value is a JSON number/string without
  escapes and the key does not appear nested; callers assert that shape
  with ``assume_flat=True`` (the honest contract — machine-generated
  event props overwhelmingly satisfy it).
* **json.loads path** (``assume_flat=False``): per-row stdlib parse —
  handles nesting, escapes, unicode; the fallback when the shape is not
  guaranteed. Identical output on flat inputs (pinned by
  tests/test_jsonx.py on adversarial documents).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def extract_int_field(batch: pa.Table, column: str, field: str,
                      out: str | None = None,
                      assume_flat: bool = True) -> pa.Table:
    """Append int64 column ``out`` (default ``field``) = the JSON number
    at key ``field`` of ``column``; null when absent/not a number."""
    import re as _re

    out = out or field
    col = pc.fill_null(batch.column(column).cast(pa.string()), "")
    if assume_flat:
        # "<field>" : <number> — RE2-safe; the field name is escaped so
        # metacharacters can't widen the key match; the FULL JSON number
        # grammar is captured (no lookahead in RE2), then only integral
        # captures are kept — '{"k": 2.5}' yields null here exactly like
        # the loads path, never a truncated 2. The greedy '(?s).*' prefix
        # anchors to the LAST occurrence, matching json.loads duplicate-
        # key (last-wins) semantics and skipping key-shaped substrings in
        # EARLIER string values. Known exclusion vs the loads path: a
        # key-shaped substring inside a string value with no real key
        # after it still matches (e.g. '{"a": "\\"k\\": 9"}' -> 9, loads
        # -> null); pass assume_flat=False for untrusted nested payloads.
        pat = ('(?s).*"' + _re.escape(field)
               + '"\\s*:\\s*(?P<v>-?[0-9]+(?:\\.[0-9]+)?'
                 '(?:[eE][+-]?[0-9]+)?)')
        ext = pc.struct_field(pc.extract_regex(col, pat), "v")
        integral = pc.fill_null(
            pc.match_substring_regex(ext, "^-?[0-9]+$"), False)
        vals = pc.cast(pc.if_else(integral, ext,
                                  pa.scalar(None, pa.string())),
                       pa.int64())
    else:
        pys = []
        for s in col.to_pylist():
            try:
                v = json.loads(s).get(field)
            except (ValueError, AttributeError):
                v = None
            pys.append(v if isinstance(v, int) and not isinstance(v, bool)
                       else None)
        vals = pa.array(pys, pa.int64())
    return batch.append_column(out, vals)
