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


def add_token_counts(batch: pa.Table, column: str = "text") -> pa.Table:
    texts = [(t or "") for t in batch.column(column).to_pylist()]
    ws = pa.array([token_count_ws(t) for t in texts], pa.int64())
    bp = pa.array([token_count_bpeish(t) for t in texts], pa.int64())
    return batch.append_column("n_tokens_ws", ws) \
                .append_column("n_tokens_bpeish", bp)


def quality_frame(texts: list[str]) -> dict[str, np.ndarray]:
    """Quality signals per text: length, punct/digit/space/upper ratios,
    mean line length, stopword ratio (en)."""
    n = len(texts)
    out = {
        "n_chars_q": np.zeros(n, dtype=np.int64),
        "punct_ratio": np.zeros(n),
        "digit_ratio": np.zeros(n),
        "space_ratio": np.zeros(n),
        "upper_ratio": np.zeros(n),
        "mean_line_len": np.zeros(n),
        "stopword_ratio": np.zeros(n),
    }
    punct_re = re.compile(r"[^\w\s]")
    for i, t in enumerate(texts):
        t = t or ""
        L = len(t)
        out["n_chars_q"][i] = L
        if L == 0:
            continue
        out["punct_ratio"][i] = len(punct_re.findall(t)) / L
        out["digit_ratio"][i] = sum(c.isdigit() for c in t) / L
        out["space_ratio"][i] = sum(c.isspace() for c in t) / L
        out["upper_ratio"][i] = sum(c.isupper() for c in t) / L
        lines = t.splitlines() or [t]
        out["mean_line_len"][i] = float(np.mean([len(l) for l in lines]))
        words = [w.lower() for w in _WS.split(t.strip()) if w]
        if words:
            sw = _STOPWORDS["en"]
            out["stopword_ratio"][i] = sum(w in sw for w in words) / len(words)
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
    """Actor-pool text stage: stopword sets + regexes compiled once per
    actor (__init__), vectorized-ish scoring per batch (__call__)."""

    def __init__(self, column: str = "text"):
        self.column = column
        self.stop = {k: frozenset(v) for k, v in _STOPWORDS.items()}
        self.ws = _WS

    def guess_lang(self, text: str) -> str:
        words = [w.lower() for w in self.ws.split((text or "").strip()) if w][:200]
        if not words:
            return "unknown"
        best, best_hits = "unknown", 0
        for lang, sw in self.stop.items():
            hits = sum(w in sw for w in words)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [(t or "") for t in batch.column(self.column).to_pylist()]
        batch = batch.append_column(
            "lang_guess", pa.array([self.guess_lang(t) for t in texts]))
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
