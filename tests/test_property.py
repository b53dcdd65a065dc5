"""Property-based (hypothesis) checks of the pure kernels — no Ray
session needed, so examples run fast. These pin: tokenizer parity with a
Python reference under ADVERSARIAL array slicing (the Arrow 16.1
utf8_split_whitespace corruption class), KMV merge invariance, MinHash
row-order invariance and estimate concentration, and PII-redaction
parity with Python ``re``."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from deduplicate_ray.functions import redact
from deduplicate_ray.stages import sketch
from deduplicate_ray.stages.minhash import MinHashSigner, shingle_hashes
from deduplicate_ray.stages.tfidf import _term_explode

_ASCII_WS = st.text(
    alphabet=st.sampled_from(list("abcXYZ01 \t\n")), max_size=60)


@settings(max_examples=60, deadline=None)
@given(st.lists(_ASCII_WS, min_size=1, max_size=12),
       st.integers(min_value=0, max_value=11),
       st.integers(min_value=1, max_value=12))
def test_term_explode_matches_python_split_under_slicing(texts, off, ln):
    """Tokens from a SLICED table equal python str.split() of the same
    rows — with a priming call on the full table first, the exact
    sequence that corrupted utf8_split_whitespace (worked around with
    the RE2 splitter)."""
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    _term_explode(tbl, "text")                      # priming call
    off = min(off, len(texts) - 1)
    ln = min(ln, len(texts) - off)
    sl = tbl.slice(off, ln)
    doc_idx, terms = _term_explode(sl, "text")
    ref = []
    for i, t in enumerate(texts[off:off + ln]):
        ref.extend((i, w) for w in t.lower().split())
    assert list(zip(doc_idx.tolist(), terms.tolist())) == ref


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=0, max_size=400),
       st.integers(min_value=1, max_value=399),
       st.integers(min_value=4, max_value=64))
def test_kmv_split_merge_equals_whole(vals, cut, k):
    """Sketching two halves and merging gives the same estimate as
    sketching the whole array (mergeability)."""
    arr = np.asarray(vals, dtype=np.int64)
    cut = min(cut, len(arr))
    whole = sketch._estimate(sketch._kmv_partial(arr, k), k)
    a = sketch._kmv_partial(arr[:cut], k)
    b = sketch._kmv_partial(arr[cut:], k)
    merged = np.unique(np.concatenate([a, b]))[:k]
    assert sketch._estimate(merged, k) == whole


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet=st.sampled_from(list("abcd ")),
                        min_size=8, max_size=40),
                min_size=2, max_size=8),
       st.randoms(use_true_random=False))
def test_minhash_signature_row_order_invariant(texts, rnd):
    """A doc's signature depends only on its text, not its batch
    position."""
    signer = MinHashSigner()
    base = signer.signature_matrix(texts)
    perm = list(range(len(texts)))
    rnd.shuffle(perm)
    shuffled = signer.signature_matrix([texts[i] for i in perm])
    for out_pos, src in enumerate(perm):
        assert (shuffled[out_pos] == base[src]).all()


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("xyz ")), min_size=10,
               max_size=80),
       st.text(alphabet=st.sampled_from(list("xyz ")), min_size=10,
               max_size=80))
def test_minhash_estimate_tracks_true_jaccard(a, b):
    """|estimated − true| Jaccard within the 128-perm concentration
    bound (4σ ≈ 4·0.5/√128 ≈ 0.177) for arbitrary short texts."""
    signer = MinHashSigner()
    sa, sb = signer.signature_matrix([a, b])
    est = float((sa == sb).mean())
    ha = set(shingle_hashes(a, signer.k).tolist())
    hb = set(shingle_hashes(b, signer.k).tolist())
    if not ha and not hb:
        return
    true = len(ha & hb) / len(ha | hb) if (ha or hb) else 1.0
    assert abs(est - true) <= 0.18


_PII_TEXT = st.text(
    alphabet=st.sampled_from(list("ab9. @-x\t")), max_size=80)


@settings(max_examples=80, deadline=None)
@given(st.lists(_PII_TEXT, min_size=1, max_size=6))
def test_redact_matches_python_re(texts):
    """Arrow RE2 redaction chain == Python re.sub chain (same patterns,
    same order) on adversarial '@'/digit/dot soup."""
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    got = redact.redact_pii(tbl, count_cols=True)
    want = texts
    for _, pat, repl in redact.PII_PATTERNS:
        want = [re.sub(pat, repl, t) for t in want]
    assert got.column("text").to_pylist() == want
    for name, pat, _ in redact.PII_PATTERNS:
        counts = [len(re.findall(pat, t)) for t in texts]
        assert got.column(f"n_{name}").to_pylist() == counts
