"""Text analysis batch UDFs for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

No reference analog (the reference never inspects content beyond hashing);
these are the first-class large-scale-pipeline operations the engine adds.
All are ``map_batches`` bodies over the ``documents`` schema
(``doc_id, text, lang, source, n_chars``) or any table with a text column.

Vectorization notes: counting/ratio kernels run on pandas ``str`` methods or
compiled regexes applied per row (C-level loops); the per-row Python work is
one regex call, not a char loop. The language-ID stopword sets are compiled
once per actor when used via the ``TextAnalyzer`` class.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WS = re.compile(r"\s+")
# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols
_BPEISH = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "und", "das", "ist", "von", "ein", "zu", "mit", "den"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "est", "dans", "que"},
    "es": {"el", "la", "de", "que", "y", "los", "en", "un", "una", "es"},
}


def token_count_ws(text: str) -> int:
    """Whitespace token count, DuckDB-oracle-compatible:
    ``array_length(regexp_split_to_array(trim(text), '\\s+'))`` — an empty
    or all-space string counts 1 (the empty token), matching SQL."""
    return len(_WS.split(text.strip()))


def token_count_bpeish(text: str) -> int:
    """Token count under the BPE-ish pre-tokenizer regex."""
    return len(_BPEISH.findall(text))


def token_count_ws_column(col) -> pa.Array:
    """Vectorized :func:`token_count_ws` over an Arrow string column —
    one RE2 pass instead of a Python loop per row. Identity used:
    tokens = 1 + (number of internal whitespace runs in the trimmed
    text); empty/all-space/null counts 1 (the empty token), matching
    both the scalar kernel and the DuckDB oracle. Parity with the
    scalar is pinned by ``tests/test_text.py::test_token_count_ws_column_parity``."""
    import pyarrow.compute as pc
    filled = pc.fill_null(col, "")
    trimmed = pc.utf8_trim_whitespace(filled)
    runs = pc.count_substring_regex(trimmed, r"\s+")
    out = pc.add(pc.cast(runs, pa.int64()), pa.scalar(1, pa.int64()))
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def add_token_counts(batch: pa.Table, column: str = "text") -> pa.Table:
    ws = token_count_ws_column(batch.column(column))
    texts = [(t or "") for t in batch.column(column).to_pylist()]
    bp = pa.array([token_count_bpeish(t) for t in texts], pa.int64())
    return batch.append_column("n_tokens_ws", ws) \
                .append_column("n_tokens_bpeish", bp)


_PUNCT_RE = r"[^\w\s]"
_EN_STOP_RE = r"\b(?:" + "|".join(sorted(_STOPWORDS["en"])) + r")\b"


def quality_frame(texts: list[str]) -> dict[str, np.ndarray]:
    """Quality signals per text: length, punct/digit/space/upper ratios,
    mean line length, stopword ratio (en).

    Fully vectorized: every signal is a pandas ``str.count`` regex pass
    (C loop) over the batch — the round-1 version ran
    ``sum(c.isdigit() for c in t)``-style pure-Python char loops per row
    (O(chars) Python per doc, a CPU sink at corpus scale). Signal
    definitions are regex-based: digits = ``\\d``, spaces = ``\\s``,
    uppercase = ``[A-Z]`` + Unicode uppercase via casefold trick is NOT
    attempted (ASCII uppercase is the boilerplate signal that matters),
    mean line length = non-newline chars / line count."""
    s = pd.Series(texts, dtype=object).fillna("")
    L = s.str.len().to_numpy(dtype=np.float64)
    safe = np.where(L == 0, 1.0, L)
    punct = s.str.count(_PUNCT_RE).to_numpy(dtype=np.float64)
    digit = s.str.count(r"\d").to_numpy(dtype=np.float64)
    space = s.str.count(r"\s").to_numpy(dtype=np.float64)
    upper = s.str.count(r"[A-Z]").to_numpy(dtype=np.float64)
    newlines = s.str.count(r"\n").to_numpy(dtype=np.float64)
    n_lines = newlines + 1.0
    mean_line = (L - newlines) / n_lines
    tokens = s.str.strip().str.split(r"\s+").str.len() \
        .fillna(0).to_numpy(dtype=np.float64)
    tokens_safe = np.where(tokens == 0, 1.0, tokens)
    stop_hits = s.str.lower().str.count(_EN_STOP_RE) \
        .to_numpy(dtype=np.float64)
    zero = L == 0
    out = {
        "n_chars_q": L.astype(np.int64),
        "punct_ratio": np.where(zero, 0.0, punct / safe),
        "digit_ratio": np.where(zero, 0.0, digit / safe),
        "space_ratio": np.where(zero, 0.0, space / safe),
        "upper_ratio": np.where(zero, 0.0, upper / safe),
        "mean_line_len": np.where(zero, 0.0, mean_line),
        "stopword_ratio": np.where(zero, 0.0,
                                   np.minimum(stop_hits / tokens_safe, 1.0)),
    }
    return out


def add_quality(batch: pa.Table, column: str = "text") -> pa.Table:
    texts = [(t or "") for t in batch.column(column).to_pylist()]
    for name, arr in quality_frame(texts).items():
        batch = batch.append_column(name, pa.array(arr))
    return batch


def quality_score(batch: pa.Table) -> pa.Table:
    """Composite 0-1 quality score from the signals (heuristic: penalize
    extreme punct/digit density and absent stopwords — boilerplate/garbage
    markers in web-scale corpora)."""
    import pyarrow.compute as pc
    punct = batch.column("punct_ratio")
    digit = batch.column("digit_ratio")
    stop = batch.column("stopword_ratio")
    score = pc.subtract(
        pa.scalar(1.0),
        pc.min_element_wise(
            pa.scalar(1.0),
            pc.add(pc.add(pc.multiply(punct, pa.scalar(1.5)),
                          pc.multiply(digit, pa.scalar(1.5))),
                   pc.multiply(pc.subtract(pa.scalar(0.3), pc.min_element_wise(
                       stop, pa.scalar(0.3))), pa.scalar(1.0)))))
    return batch.append_column("quality_score", score)


class TextAnalyzer:
    """Actor-pool text stage: per-language stopword alternation regexes
    compiled once per actor (__init__); per batch one vectorized
    ``str.count`` pass per language + argmax (__call__) — no per-word
    Python (round-1 ran a per-word set probe per row)."""

    def __init__(self, column: str = "text"):
        self.column = column
        self.langs = sorted(_STOPWORDS)
        self.patterns = {
            lang: re.compile(r"\b(?:" + "|".join(sorted(sw)) + r")\b")
            for lang, sw in _STOPWORDS.items()
        }

    def guess_lang(self, text: str) -> str:
        lowered = (text or "")[:2000].lower()
        best, best_hits = "unknown", 0
        for lang in self.langs:
            hits = len(self.patterns[lang].findall(lowered))
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def guess_lang_batch(self, texts: list[str]) -> list[str]:
        # cap at the first 2000 chars per doc: language is decidable from a
        # prefix, and the cap bounds per-row regex cost on huge docs
        s = pd.Series(texts, dtype=object).fillna("") \
            .str.slice(0, 2000).str.lower()
        hits = np.stack([
            s.str.count(self.patterns[lang].pattern)
            .to_numpy(dtype=np.int64) for lang in self.langs])
        best = np.argmax(hits, axis=0)
        none = hits.max(axis=0) == 0
        out = np.asarray(self.langs, dtype=object)[best]
        out[none] = "unknown"
        return out.tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [(t or "") for t in batch.column(self.column).to_pylist()]
        batch = batch.append_column(
            "lang_guess", pa.array(self.guess_lang_batch(texts)))
        for name, arr in quality_frame(texts).items():
            batch = batch.append_column(name, pa.array(arr))
        return quality_score(batch)


def rolling_fingerprint(text: str, window: int = 64) -> str:
    """Document fingerprint: min of rolling polynomial hashes over fixed
    windows (winnowing-style single-band sketch) — robust to local edits at
    the ends. Deterministic, engine-only (no SQL analog)."""
    b = (text or "").encode()
    if len(b) <= window:
        import hashlib
        return hashlib.blake2b(b, digest_size=8).hexdigest()
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    base = np.uint64(1099511628211)
    acc = np.zeros(len(arr) - window + 1, dtype=np.uint64)
    # window hash via prefix differences of powers would overflow; fold with
    # the strided sum (window is fixed, cost O(window) vector ops)
    for j in range(window):
        acc += arr[j: len(arr) - window + 1 + j] * (base ** np.uint64(window - 1 - j))
    return format(int(acc.min()), "016x")


def add_fingerprint(batch: pa.Table, column: str = "text") -> pa.Table:
    fps = [rolling_fingerprint(t or "")
           for t in batch.column(column).to_pylist()]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def add_normalized(batch: pa.Table, column: str = "text",
                   out: str = "norm_text") -> pa.Table:
    """Append the dedup-normalized form of ``column``: lowercase, every
    whitespace run collapsed to one space, leading/trailing space trimmed.

    The standard pre-key for normalized exact dedup of training text
    (catches reformatted copies byte-exact hashing misses). Fully
    vectorized — three Arrow C++ kernels, no Python over rows. The RE2
    ``\\s+`` here and DuckDB's ``regexp_replace(..., '\\s+', ' ', 'g')``
    (also RE2) agree byte-for-byte, which is what the SQL oracle of
    ``dedup_normalized_docs`` relies on.
    """
    import pyarrow.compute as pc
    col = batch.column(column)
    norm = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(col), r"\s+",
                                   replacement=" "),
        characters=" ")
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    return batch.append_column(out, norm)


def chunk_windows(batch: pa.Table, size: int = 256, overlap: int = 32,
                  id_col: str = "doc_id",
                  column: str = "text") -> pa.Table:
    """Explode each document into fixed-size overlapping character
    windows — the standard pre-tokenization chunking step of a training
    pipeline (context-length packing, embedding-model input prep).

    Output: ``(id_col, chunk_id:int64, chunk_text:string)`` with
    ``chunk_id`` 0-based; window ``i`` covers code points
    ``[i*stride, i*stride + size)`` where ``stride = size - overlap``;
    the last window may be shorter; every document emits at least one
    window (empty text → one empty chunk), so no rows are silently
    dropped.

    Fully vectorized: one ``utf8_length`` pass, then one
    ``utf8_slice_codeunits`` C++ kernel per window INDEX (bounded by the
    longest doc in the batch, each over only the still-alive rows) — no
    Python over rows or characters. Code-point slicing matches SQL
    ``substr``/``length`` semantics exactly, which the
    ``chunk_docs`` DuckDB oracle relies on.
    """
    import pyarrow.compute as pc
    if overlap >= size:
        raise ValueError("chunk overlap must be < size")
    stride = size - overlap
    txt = pc.coalesce(batch.column(column),
                      pa.scalar("", pa.string()))
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    ids = batch.column(id_col)
    lens = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
    n_chunks = 1 + -(-np.maximum(lens - size, 0) // stride)
    out_ids, out_cid, out_txt = [], [], []
    max_n = int(n_chunks.max()) if len(n_chunks) else 0
    for i in range(max_n):
        alive = pa.array(n_chunks > i)
        sl = pc.utf8_slice_codeunits(txt.filter(alive),
                                     start=i * stride,
                                     stop=i * stride + size)
        out_ids.append(ids.filter(alive))
        out_cid.append(pa.array(np.full(len(sl), i, np.int64)))
        out_txt.append(sl)
    id_type = batch.schema.field(id_col).type
    if not out_ids:
        return pa.table({id_col: pa.array([], id_type),
                         "chunk_id": pa.array([], pa.int64()),
                         "chunk_text": pa.array([], pa.string())})
    return pa.table({
        id_col: pa.concat_arrays([a.combine_chunks() if
                                  isinstance(a, pa.ChunkedArray) else a
                                  for a in out_ids]),
        "chunk_id": pa.concat_arrays(out_cid),
        "chunk_text": pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in out_txt]),
    })
