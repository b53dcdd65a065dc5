"""Prime-then-slice determinism stress for the Arrow string kernels this
repo uses in hot paths.

Motivation: pyarrow 16.1's ``utf8_split_whitespace`` returns corrupt
splits on a SLICED input when a prior call in the same process ran on a
larger array (worked around in stages/tfidf.py with the RE2 splitter).
This tool checks every other string kernel we rely on for the same
stateful-corruption class: each kernel runs on the full array, then on
many slices, in a FRESH subprocess per kernel, comparing against a
pure-Python reference. Run: ``python tools/arrow_kernel_stress.py``.

CAVEAT: the split_whitespace corruption is corpus-sensitive — it does
NOT reproduce on this tool's corpus, only on the tfidf test corpus (the
deterministic repro is pinned by tests/test_property.py::
test_term_explode_matches_python_split_under_slicing). An ``ok`` here
means "no corruption in this configuration", not proof of safety.
"""

from __future__ import annotations

import subprocess
import sys

CHILD = r'''
import sys
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

name = sys.argv[1]
rng = np.random.Generator(np.random.PCG64(99))
words = ["w%d" % i for i in range(40)] + ["a.b", "x@y.zz", "10.0.0.7",
                                          "900000001234"]
texts = []
for d in range(121):
    n = int(rng.integers(1, 30))
    body = " ".join(rng.choice(words, size=n))
    texts.append("  " + body + "\t")
tbl = pa.table({"text": pa.array(texts, pa.string())})

def col(sl):
    return pc.fill_null(sl.column("text").cast(pa.string()), "")

KERNELS = {
    "utf8_lower": (lambda a: pc.utf8_lower(a).to_pylist(),
                   lambda ts: [t.lower() for t in ts]),
    "utf8_trim_whitespace": (
        lambda a: pc.utf8_trim_whitespace(a).to_pylist(),
        lambda ts: [t.strip() for t in ts]),
    "split_pattern_space": (
        lambda a: pc.list_flatten(pc.split_pattern(a, pattern=" "))
        .to_pylist(),
        lambda ts: [w for t in ts for w in t.split(" ")]),
    "split_pattern_regex_ws": (
        lambda a: pc.list_flatten(
            pc.split_pattern_regex(a, pattern=r"\s+")).to_pylist(),
        lambda ts: [w for t in ts
                    for w in __import__("re").split(r"\s+", t)]),
    "utf8_split_whitespace": (
        lambda a: pc.list_flatten(pc.utf8_split_whitespace(a)).to_pylist(),
        lambda ts: [w for t in ts for w in
                    __import__("re").split(r"[\s]+", t)]),
    "count_substring_regex": (
        lambda a: pc.count_substring_regex(a, pattern=r"\d+").to_pylist(),
        lambda ts: [len(__import__("re").findall(r"\d+", t)) for t in ts]),
    "match_substring_regex": (
        lambda a: pc.match_substring_regex(a, pattern=r"w1\b").to_pylist(),
        lambda ts: [bool(__import__("re").search(r"w1\b", t)) for t in ts]),
    "replace_substring_regex": (
        lambda a: pc.replace_substring_regex(
            a, pattern=r"\d+", replacement="#").to_pylist(),
        lambda ts: [__import__("re").sub(r"\d+", "#", t) for t in ts]),
    "extract_regex": (
        lambda a: [None if v is None else v["d"] for v in pc.extract_regex(
            a, r"(?P<d>w\d+)").to_pylist()],
        lambda ts: [(lambda m: m.group(1) if m else None)(
            __import__("re").search(r"(w\d+)", t)) for t in ts]),
    "utf8_slice_codeunits": (
        lambda a: pc.utf8_slice_codeunits(a, start=2, stop=9).to_pylist(),
        lambda ts: [t[2:9] for t in ts]),
    "binary_join_element_wise": (
        lambda a: pc.binary_join_element_wise(a, a, "|").to_pylist(),
        lambda ts: [t + "|" + t for t in ts]),
    "utf8_length": (
        lambda a: pc.utf8_length(a).to_pylist(),
        lambda ts: [len(t) for t in ts]),
}

kfn, ref = KERNELS[name]
bad = 0
kfn(col(tbl))                       # priming call on the full table
for off in range(0, 121, 3):
    for ln in (1, 4, 17, 121 - off):
        if ln <= 0 or off + ln > 121:
            continue
        got = kfn(col(tbl.slice(off, ln)))
        want = ref(texts[off:off + ln])
        if got != want:
            bad += 1
            if bad == 1:
                print(f"  first diff at slice({off},{ln})")
print(("BAD %d" % bad) if bad else "ok")
'''


def main() -> None:
    names = ["utf8_lower", "utf8_trim_whitespace", "split_pattern_space",
             "split_pattern_regex_ws", "utf8_split_whitespace",
             "count_substring_regex", "match_substring_regex",
             "replace_substring_regex", "extract_regex",
             "utf8_slice_codeunits", "binary_join_element_wise",
             "utf8_length"]
    failures = []
    for n in names:
        r = subprocess.run([sys.executable, "-c", CHILD, n],
                           capture_output=True, text=True)
        status = r.stdout.strip().splitlines()[-1] if r.stdout.strip() \
            else f"ERROR {r.stderr.strip()[-120:]}"
        print(f"{n:28s} {status}")
        if status != "ok":
            failures.append(n)
    print()
    print("failures:", failures or "none")
    # non-zero exit on corruption so CI / scripts invoking this fail loud
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
