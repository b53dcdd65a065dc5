"""PII redaction: vectorized regex scrubbing of emails, IP addresses and
long digit runs (IDs / card numbers) — the standard pre-training privacy
pass (the BigCode/StarCoder pipelines publish exactly this shape).

All patterns are RE2-safe and run through Arrow's C++ regex kernels
(``replace_substring_regex`` / ``count_substring_regex``) — no Python
touches a row. DuckDB's ``regexp_replace(..., 'g')`` is also RE2, so the
transform is bit-identical to the SQL form (pinned by
tests/test_redact.py); order of application matters (an IPv4 contains
digit runs) and is pinned: email → ip → digit-run.

The driver ``documents`` testdata contains no PII-shaped tokens, so the
parity gate lives in pytest over synthetic text rather than a trivially
identity driver query.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, placeholder) — applied in order
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("digits", r"\b\d{9,}\b", "<ID>"),
)


def redact_pii(batch: pa.Table, column: str = "text",
               count_cols: bool = True) -> pa.Table:
    """Rewrite ``column`` with PII placeholders; optionally append one
    ``n_<name>`` int64 count column per pattern (counted on the ORIGINAL
    text, before any replacement)."""
    text = pc.fill_null(batch.column(column).cast(pa.string()), "")
    counts = {}
    if count_cols:
        for name, pat, _ in PII_PATTERNS:
            counts[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(text, pattern=pat), pa.int64())
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = pc.replace_substring_regex(out, pattern=pat,
                                         replacement=repl)
    i = batch.schema.get_field_index(column)
    batch = batch.set_column(i, column, out)
    for name, arr in counts.items():
        batch = batch.append_column(name, arr)
    return batch
