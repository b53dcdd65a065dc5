"""Deterministic synthetic corpus generation (FIXTURES.md).

All tests and benches run on tables produced here — pure functions of
``(seed, scale)`` using ``numpy.random.Generator(PCG64(seed))``; re-running is
byte-identical. No external data.

Schema (BASELINE.json ``input_hint``)::

    repo: string, path: string, commit: string, lang: string, content: string

Fixture families mirror the reference's test scenarios translated from
filesystem trees to corpus rows (see the FIXTURES.md table for the mapping to
``test_dupe_analysis.py`` / ``test_deduplicate.py`` line ranges).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
from numpy.random import Generator, PCG64

CORPUS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

_VOCAB_WORDS = [
    "def", "return", "class", "self", "import", "for", "in", "if", "else",
    "while", "try", "except", "lambda", "yield", "assert", "with", "as",
    "value", "result", "index", "count", "total", "buffer", "stream", "node",
    "left", "right", "parent", "child", "queue", "stack", "hash", "key",
    "data", "item", "next", "prev", "size", "length", "offset", "chunk",
    "read", "write", "open", "close", "flush", "parse", "emit", "token",
]


def file_id(repo: str, commit: str, path: str) -> str:
    """Derived row identity: ``repo || ':' || commit || ':' || path``."""
    return f"{repo}:{commit}:{path}"


def _commit(rng: Generator) -> str:
    return bytes(rng.integers(0, 256, 20, dtype=np.uint8)).hex()


def _rand_digits(rng: Generator, n_chars: int) -> str:
    """Seeded pseudo-random digit text (mirrors the reference's random 8-digit
    padding, test_dupe_analysis.py:88-95)."""
    if n_chars <= 0:
        return ""
    return bytes(rng.integers(48, 58, n_chars, dtype=np.uint8)).decode()


def _rand_code(rng: Generator, n_lines: int) -> str:
    """Pseudo-code text: lines of vocab tokens — gives realistic shingle
    overlap structure for the near-dup families."""
    lines = []
    for _ in range(n_lines):
        k = int(rng.integers(4, 11))
        words = [_VOCAB_WORDS[int(i)] for i in rng.integers(0, len(_VOCAB_WORDS), k)]
        lines.append(" ".join(words))
    return "\n".join(lines) + "\n"


def _mutate_tokens(rng: Generator, text: str, frac: float) -> str:
    """Token-level edit: replace ~frac of tokens with other vocab tokens."""
    toks = text.split(" ")
    n_edit = max(1, int(len(toks) * frac))
    idx = rng.choice(len(toks), size=min(n_edit, len(toks)), replace=False)
    for i in idx:
        toks[int(i)] = _VOCAB_WORDS[int(rng.integers(0, len(_VOCAB_WORDS)))]
    return " ".join(toks)


@dataclass
class Fixture:
    """Rows plus the oracle: expected exact groups / clusters as frozensets of
    file_ids (only groups with >= 2 members listed)."""

    name: str
    rows: list[dict] = field(default_factory=list)
    exact_groups: list[frozenset[str]] = field(default_factory=list)
    near_clusters: list[frozenset[str]] = field(default_factory=list)
    containments: list[tuple[str, str]] = field(default_factory=list)  # (inner, outer)

    def add(self, repo: str, path: str, content: str, lang: str = "py",
            commit: str | None = None, rng: Generator | None = None) -> str:
        c = commit if commit is not None else _commit(rng)
        self.rows.append(
            {"repo": repo, "path": path, "commit": c, "lang": lang, "content": content}
        )
        return file_id(repo, c, path)

    def table(self) -> pa.Table:
        cols = {k: [r[k] for r in self.rows] for k in CORPUS_SCHEMA.names}
        return pa.Table.from_pydict(cols, schema=CORPUS_SCHEMA)


# --------------------------------------------------------------------------
# families
# --------------------------------------------------------------------------

def fx_exact_simple(seed: int = 42) -> Fixture:
    """One exact pair + two distinct files (test_dupe_analysis.py:246-265)."""
    rng = Generator(PCG64(seed))
    fx = Fixture("exact_simple")
    c1 = _rand_digits(rng, 6 * 1024)
    a = fx.add("org0/r0", "a/f1a.txt", c1, rng=rng)
    b = fx.add("org0/r0", "a/f1b.txt", c1, rng=rng)
    fx.add("org0/r0", "a/f2.txt", _rand_digits(rng, 3 * 1024), rng=rng)
    fx.add("org0/r0", "b/f3.txt", _rand_digits(rng, 4 * 1024), rng=rng)
    fx.exact_groups.append(frozenset({a, b}))
    return fx


def fx_size_prune(seed: int = 43) -> Fixture:
    """Same-size-prefix decoys: only the true copy groups; cascade pass-1 must
    prune unique sizes (test_dupe_analysis.py:267-294)."""
    rng = Generator(PCG64(seed))
    fx = Fixture("size_prune")
    base = _rand_digits(rng, 3 * 1024)
    a = fx.add("org0/r1", "a/f1a.txt", base, rng=rng)
    b = fx.add("org0/r1", "a/f1b.txt", base, rng=rng)
    # same size, shared 2KB prefix, different tail — NOT an exact dup
    fx.add("org0/r1", "a/f1c.txt", base[: 2 * 1024] + _rand_digits(rng, 1024), rng=rng)
    fx.add("org0/r1", "a/f1d.txt", base[:1024] + _rand_digits(rng, 2 * 1024), rng=rng)
    for i, sz in enumerate([32, 64, 128, 256, 512, 1024, 2048, 4096]):
        fx.add("org0/r1", f"b/u{i}.txt", _rand_digits(rng, sz), rng=rng)
    fx.exact_groups.append(frozenset({a, b}))
    return fx


def fx_cascade_false_positive(seed: int = 44) -> Fixture:
    """Pins the reference's sampled-hash offset semantics byte-exactly
    (dupe_analysis.py:440-444; test_dupe_analysis.py:469-526).

    f1c has the same size, same first 1KB, same middle 1KB (centered window
    ``[size//2 - 512, size//2 + 512)``), and same last 1KB as f1a, but differs
    elsewhere: cascade(rev_hash) mode must group {f1a, f1b, f1c};
    full-hash mode must group {f1a, f1b} only.
    """
    rng = Generator(PCG64(seed))
    fx = Fixture("cascade_false_positive")
    n = 5 * 1024
    base = _rand_digits(rng, n)
    a = fx.add("org0/r2", "a/f1a.txt", base, rng=rng)
    b = fx.add("org0/r2", "a/f1b.txt", base, rng=rng)
    # rebuild with the sampled windows intact, the rest replaced
    mid_lo, mid_hi = n // 2 - 512, n // 2 + 512
    fake = (
        base[:1024]
        + _rand_digits(rng, mid_lo - 1024)
        + base[mid_lo:mid_hi]
        + _rand_digits(rng, (n - 1024) - mid_hi)
        + base[n - 1024:]
    )
    assert len(fake) == n and fake != base
    c = fx.add("org0/r2", "a/f1c.txt", fake, rng=rng)
    fx.exact_groups.append(frozenset({a, b}))
    fx.near_clusters.append(frozenset({a, b, c}))  # cascade-mode grouping
    return fx


def fx_empty_content(seed: int = 45) -> Fixture:
    """Empty rows form one exact group — constant empty-hash rule
    (dupe_analysis.py:31, :335-340; test_dupe_analysis.py:551-579)."""
    rng = Generator(PCG64(seed))
    fx = Fixture("empty_content")
    dup = _rand_digits(rng, 2048)
    a = fx.add("org0/r3", "a/d1.txt", dup, rng=rng)
    b = fx.add("org0/r3", "b/d2.txt", dup, rng=rng)
    e1 = fx.add("org0/r3", "a/e1.txt", "", rng=rng)
    e2 = fx.add("org0/r3", "b/e2.txt", "", rng=rng)
    e3 = fx.add("org0/r3", "c/e3.txt", "", rng=rng)
    fx.add("org0/r3", "c/u1.txt", _rand_digits(rng, 100), rng=rng)
    fx.add("org0/r3", "c/u2.txt", _rand_digits(rng, 200), rng=rng)
    fx.exact_groups.append(frozenset({a, b}))
    fx.exact_groups.append(frozenset({e1, e2, e3}))
    return fx


def fx_excludes(seed: int = 46) -> Fixture:
    """Rows under paths matching ``*/@*`` / ``*/.*`` are dropped before
    hashing (dupe_analysis.py:29-30, :179-181)."""
    rng = Generator(PCG64(seed))
    fx = Fixture("excludes")
    dup = _rand_digits(rng, 1024)
    a = fx.add("org0/r4", "a/k1.txt", dup, rng=rng)
    b = fx.add("org0/r4", "b/k2.txt", dup, rng=rng)
    # excluded copies must not appear in any group
    fx.add("org0/r4", "a/@eaDir/k3.txt", dup, rng=rng)
    fx.add("org0/r4", "b/.hidden/k4.txt", dup, rng=rng)
    fx.add("org0/r4", "c/u1.txt", _rand_digits(rng, 512), rng=rng)
    fx.add("org0/r4", "c/u2.txt", _rand_digits(rng, 256), rng=rng)
    fx.exact_groups.append(frozenset({a, b}))
    return fx


def fx_cross_repo(seed: int = 47) -> Fixture:
    """Same content under different repos → one group spanning repos
    (test_dupe_analysis.py:296-314)."""
    rng = Generator(PCG64(seed))
    fx = Fixture("cross_repo")
    c = _rand_digits(rng, 2048)
    a = fx.add("org1/alpha", "src/x.py", c, rng=rng)
    b = fx.add("org2/beta", "lib/y.py", c, rng=rng)
    d = fx.add("org3/gamma", "y.py", c, rng=rng)
    fx.add("org1/alpha", "src/z.py", _rand_digits(rng, 2048), rng=rng)
    fx.exact_groups.append(frozenset({a, b, d}))
    return fx


def fx_nested_dirs(seed: int = 48) -> Fixture:
    """Same content at different path depths in one repo
    (test_dupe_analysis.py:316-375)."""
    rng = Generator(PCG64(seed))
    fx = Fixture("nested_dirs")
    c = _rand_digits(rng, 1536)
    a = fx.add("org0/r5", "top.txt", c, rng=rng)
    b = fx.add("org0/r5", "a/mid.txt", c, rng=rng)
    d = fx.add("org0/r5", "a/b/c/deep.txt", c, rng=rng)
    fx.add("org0/r5", "a/b/u.txt", _rand_digits(rng, 777), rng=rng)
    fx.exact_groups.append(frozenset({a, b, d}))
    return fx


def fx_near_dup(seed: int = 49, n_bases: int = 25) -> Fixture:
    """Known near-dup clusters: base pseudo-code files plus 1-5% token-edit
    variants; unrelated files as negatives (north_rule — no reference
    analog). Oracle labels drive the recall >= 0.99 check."""
    rng = Generator(PCG64(seed))
    fx = Fixture("near_dup")
    for i in range(n_bases):
        base = _rand_code(rng, int(rng.integers(30, 120)))
        members = [fx.add(f"org9/nd{i}", "base.py", base, rng=rng)]
        for v in range(int(rng.integers(1, 4))):
            frac = float(rng.uniform(0.01, 0.05))
            members.append(
                fx.add(f"org9/nd{i}", f"v{v}.py", _mutate_tokens(rng, base, frac), rng=rng)
            )
        fx.near_clusters.append(frozenset(members))
    for j in range(n_bases):
        fx.add(f"org9/neg{j}", "u.py", _rand_code(rng, int(rng.integers(20, 80))), rng=rng)
    return fx


def fx_embedded(seed: int = 50, n_pairs: int = 12) -> Fixture:
    """File A's content embedded verbatim inside larger file B, plus
    near-miss negatives — drives the Stage-3 suffix-array containment pass
    (generalizes dead code ``max_overlap``, deduplicate.py:242-260)."""
    rng = Generator(PCG64(seed))
    fx = Fixture("embedded")
    for i in range(n_pairs):
        inner = _rand_code(rng, int(rng.integers(10, 30)))
        outer = _rand_code(rng, int(rng.integers(5, 15))) + inner + _rand_code(
            rng, int(rng.integers(5, 15))
        )
        a = fx.add(f"org8/em{i}", "inner.py", inner, rng=rng)
        b = fx.add(f"org8/em{i}", "outer.py", outer, rng=rng)
        fx.containments.append((a, b))
        # near-miss negative: one token flipped inside the would-be embedding
        fx.add(f"org8/em{i}", "miss.py", _mutate_tokens(rng, outer, 0.02), rng=rng)
    return fx


def fx_skew_boilerplate(seed: int = 51, n_repos: int = 400) -> Fixture:
    """One license text + one ``__init__``-like stub repeated across 90% of
    repos + a long tail of uniques → band buckets >> salt threshold; salting
    must preserve recall and bound partition size (north_rule skew clause)."""
    rng = Generator(PCG64(seed))
    fx = Fixture("skew_boilerplate")
    license_txt = _rand_code(rng, 40)
    stub = "from . import core\n__all__ = ['core']\n"
    lic_ids, stub_ids = [], []
    for i in range(n_repos):
        repo = f"org7/sk{i}"
        if rng.random() < 0.9:
            lic_ids.append(fx.add(repo, "LICENSE", license_txt, lang="txt", rng=rng))
            stub_ids.append(fx.add(repo, "__init__.py", stub, rng=rng))
        fx.add(repo, "main.py", _rand_code(rng, int(rng.integers(5, 40))), rng=rng)
    fx.exact_groups.append(frozenset(lic_ids))
    fx.exact_groups.append(frozenset(stub_ids))
    return fx


ALL_FAMILIES = {
    "exact_simple": fx_exact_simple,
    "size_prune": fx_size_prune,
    "cascade_false_positive": fx_cascade_false_positive,
    "empty_content": fx_empty_content,
    "excludes": fx_excludes,
    "cross_repo": fx_cross_repo,
    "nested_dirs": fx_nested_dirs,
    "near_dup": fx_near_dup,
    "embedded": fx_embedded,
    "skew_boilerplate": fx_skew_boilerplate,
}


def unit_corpus(seed: int = 42) -> Fixture:
    """All families concatenated — the sf-unit pytest corpus."""
    out = Fixture("unit")
    for name, fn in ALL_FAMILIES.items():
        fx = fn()
        out.rows.extend(fx.rows)
        out.exact_groups.extend(fx.exact_groups)
        out.near_clusters.extend(fx.near_clusters)
        out.containments.extend(fx.containments)
    return out


def bench_corpus(n_rows: int = 200_000, seed: int = 42) -> pa.Table:
    """sf-bench corpus: log-normal content sizes, ~20% exact dups, ~10% near
    dups, boilerplate skew. Generated with vectorized numpy so 200k+ rows
    build in seconds."""
    rng = Generator(PCG64(seed))
    n_base = int(n_rows * 0.70)
    n_exact = int(n_rows * 0.20)
    n_near = n_rows - n_base - n_exact

    # base contents: log-normal char counts clipped to [128, 65536]
    sizes = np.clip(rng.lognormal(mean=7.2, sigma=1.0, size=n_base), 128, 65536).astype(np.int64)
    total = int(sizes.sum())
    blob = bytes(rng.integers(97, 123, total, dtype=np.uint8))  # a-z soup
    offs = np.concatenate([[0], np.cumsum(sizes)])
    contents = [blob[offs[i]: offs[i + 1]].decode() for i in range(n_base)]

    # 2% of bases are the boilerplate row, repeated (skew)
    boiler = contents[0]
    for i in rng.choice(n_base, size=max(1, n_base // 50), replace=False):
        contents[int(i)] = boiler

    repos = [f"org{int(i) % 97}/repo{int(i) % 1013}" for i in range(n_rows)]
    langs = ["py", "c", "java", "go", "txt"]

    rows_content: list[str] = list(contents)
    # exact dups: copies of random bases
    src = rng.integers(0, n_base, n_exact)
    rows_content.extend(contents[int(i)] for i in src)
    # near dups: base with a small random splice replaced
    src2 = rng.integers(0, n_base, n_near)
    for i in src2:
        c = contents[int(i)]
        if len(c) < 64:
            rows_content.append(c)
            continue
        pos = int(rng.integers(0, len(c) - 32))
        edit = bytes(rng.integers(97, 123, 16, dtype=np.uint8)).decode()
        rows_content.append(c[:pos] + edit + c[pos + 16:])

    commits = [bytes(rng.integers(0, 256, 20, dtype=np.uint8)).hex() for _ in range(256)]
    return pa.Table.from_pydict(
        {
            "repo": repos,
            "path": [f"src/d{int(i) % 37}/f{int(i)}.{langs[int(i) % 5]}" for i in range(n_rows)],
            "commit": [commits[int(i) % 256] for i in range(n_rows)],
            "lang": [langs[int(i) % 5] for i in range(n_rows)],
            "content": rows_content,
        },
        schema=CORPUS_SCHEMA,
    )


def write_corpus(table: pa.Table, path: str, row_group_size: int = 1024) -> None:
    """Write with small row groups: Ray's parquet read parallelizes at
    row-group granularity, so a single-row-group file would serialize the
    whole downstream pipeline into one block/task."""
    import pyarrow.parquet as pq

    pq.write_table(table, path, row_group_size=row_group_size)
