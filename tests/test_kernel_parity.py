"""Independent-implementation parity for the pinned hash kernels.

The pinned-relation oracles (tools/pin_hashes.py) let DuckDB recompute
pairing/bucketing/top-k logic independently, but the hash kernels
themselves (MinHash signature, SimHash, hyperplane signs, rolling
fingerprint, IVF k-means centroids) are pinned from the engine's own code — a kernel bug that
shifts both sides equally would pass. These tests close that loop: each
kernel family is recomputed here with a NAIVE pure-Python
implementation written directly from the published construction
(per-window polynomial hash + splitmix64 + per-perm multiply-add min;
per-token crc bit voting; per-plane dot-product sign; per-window min
hash; per-point spherical Lloyd's) sharing NO array code with the
production kernels, and asserted bit-equal (float kernels: equal to
within accumulation-order ulps). Reference analog: the reference validates dup groups against
structurally-KNOWN trees rather than against its own grouping code
(`/root/reference/test_dupe_analysis.py:174-195`) — an oracle that does
not share code with the implementation. tools/pin_hashes.py cites this
file as the independence evidence for the pinned kernels.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np

from deduplicate_ray import PipelineConfig

MASK = 0xFFFFFFFFFFFFFFFF

DOCS = [
    "",
    " ",
    "a",
    "ab",
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog!",
    "def f(x):\n    return x * 2\n",
    "def f(x):\n    return x * 3\n",
    "naïve café über — unicode content with ümlauts",
    "x " * 200,
    "import os\nimport sys\n" * 10,
    "the the the the repeated repeated tokens tokens tokens",
    "0123456789" * 30,
    "SELECT * FROM t WHERE a = 1; -- trailing comment",
] + [f"document number {i} with shared boilerplate header\n" +
     "lorem ipsum dolor sit amet " * (i % 7 + 1) for i in range(40)]


def _splitmix64(z: int) -> int:
    """Public-domain splitmix64 finalizer, pure-python ints."""
    z &= MASK
    z ^= z >> 30
    z = (z * 0xBF58476D1CE4E5B9) & MASK
    z ^= z >> 27
    z = (z * 0x94D049BB133111EB) & MASK
    z ^= z >> 31
    return z


def _naive_shingles(text: str, k: int) -> list[int]:
    """All k-byte window hashes of the utf-8 text: polynomial rolling
    hash (FNV-prime base) mod 2^64 → splitmix64, one int at a time."""
    b = text.encode()
    poly = 1099511628211
    if len(b) == 0:
        return [_splitmix64(0)]
    if len(b) < k:
        h = 0
        for v in b:
            h = (h * poly + v) & MASK
        return [_splitmix64(h)]
    out = []
    for i in range(len(b) - k + 1):
        h = 0
        for v in b[i:i + k]:
            h = (h * poly + v) & MASK
        out.append(_splitmix64(h))
    return out


def test_minhash_signature_parity_naive():
    from deduplicate_ray.stages.minhash import MinHashSigner
    cfg = PipelineConfig()
    signer = MinHashSigner(cfg)
    got = signer.signature_matrix(DOCS)
    # naive: per doc, per perm, min over shingles of (a*x + b) mod 2^64.
    # The perm constants are construction PARAMETERS (seeded from config),
    # not logic — read off the signer; everything else is recomputed.
    mult = [int(a) for a in signer.mult]
    add = [int(b) for b in signer.add]
    for d, text in enumerate(DOCS):
        sh = _naive_shingles(text, cfg.shingle_k)
        for p in range(cfg.num_perms):
            expect = min(((mult[p] * x + add[p]) & MASK) for x in sh)
            assert int(got[d, p]) == expect, (d, p)


def test_simhash_parity_naive():
    from deduplicate_ray.stages.simdedup import simhash_batch
    got = simhash_batch(DOCS)
    token_re = re.compile(r"\w+")
    for d, text in enumerate(DOCS):
        votes = [0] * 64
        for tok in token_re.findall((text or "").lower()):
            h = (zlib.crc32(tok.encode()) << 32) | \
                zlib.crc32(tok[::-1].encode() + b"#")
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        expect = 0
        for i in range(64):
            if votes[i] > 0:
                expect |= 1 << i
        assert int(got[d]) == expect, d


def test_hyperplane_signs_parity_naive():
    from deduplicate_ray.stages.similarity import hyperplane_signs
    rng = np.random.Generator(np.random.PCG64(7))
    vecs = rng.standard_normal((100, 16))
    planes = rng.standard_normal((6, 16))
    got = hyperplane_signs(vecs, planes)
    for i in range(100):
        expect = 0
        for p in range(6):
            dot = sum(float(vecs[i, d]) * float(planes[p, d])
                      for d in range(16))
            if dot >= 0:
                expect |= 1 << p
        assert int(got[i]) == expect, i


def test_kmeans_centroids_parity_naive():
    """Spherical Lloyd's recomputed with per-point pure-Python loops.
    The seeded init DRAW is a construction parameter read off the same
    public numpy Generator call (like the MinHash perm constants); the
    logic recomputed here is normalization, the lexsort canonicalization,
    nearest-centroid assignment (first-max tie-break) and the per-cluster
    mean + renormalize update. Float means accumulate in a different
    order than numpy's pairwise sum, so parity is asserted to 1e-9
    relative — far below anything a construction bug could hide under."""
    import math

    from deduplicate_ray.stages.similarity import train_kmeans

    rng = np.random.Generator(np.random.PCG64(11))
    sample = rng.standard_normal((120, 8))
    n_lists, iters, seed = 5, 4, 42
    got = train_kmeans(sample, n_lists, iters=iters, seed=seed)

    def norm_rows(rows):
        out = []
        for r in rows:
            n2 = 0.0
            for v in r:
                n2 += float(v) * float(v)
            n = math.sqrt(n2) or 1.0
            out.append([float(v) / n for v in r])
        return out

    s = norm_rows(sample.tolist())
    # np.lexsort(s.T) sorts points by the LAST component primarily
    s.sort(key=lambda row: tuple(reversed(row)))
    init = np.random.Generator(np.random.PCG64(seed)).choice(
        len(s), size=n_lists, replace=False)
    cents = [list(s[i]) for i in init]
    for _ in range(iters):
        assign = []
        for row in s:
            best, bi = None, 0
            for c, cent in enumerate(cents):
                dot = 0.0
                for a, b in zip(row, cent):
                    dot += a * b
                if best is None or dot > best:
                    best, bi = dot, c
            assign.append(bi)
        for c in range(n_lists):
            members = [s[i] for i in range(len(s)) if assign[i] == c]
            if members:
                cents[c] = [sum(col) / len(members)
                            for col in zip(*members)]
        cents = norm_rows(cents)
    assert got.shape == (n_lists, sample.shape[1])
    assert np.allclose(got, np.array(cents), rtol=1e-9, atol=1e-12)


def test_rolling_fingerprint_parity_naive():
    from deduplicate_ray.functions.text import rolling_fingerprint
    window = 64
    poly = 1099511628211
    for d, text in enumerate(DOCS):
        got = rolling_fingerprint(text, window=window)
        b = text.encode()
        if len(b) <= window:
            expect = hashlib.blake2b(b, digest_size=8).hexdigest()
        else:
            best = None
            for i in range(len(b) - window + 1):
                h = 0
                for v in b[i:i + window]:
                    h = (h * poly + v) & MASK
                best = h if best is None or h < best else best
            expect = format(best, "016x")
        assert got == expect, d
