"""Repo-level fork detection: file-fingerprint-set Jaccard between repos.

A source-code corpus at 10^12-file scale is dominated by forks — repos
sharing most of their files byte-for-byte (or prefix-for-prefix). This
stage lifts the reference's per-file collision idea
(``/root/reference/dupe_analysis.py:393-407``) one level up: the unit of
comparison is the REPO, represented by the set of its files'
fingerprints, and two repos are fork candidates when the Jaccard
similarity of those sets is high.

Plan (one wide shuffle end to end):

1. ``repo_fp`` — narrow ``(repo, fp)`` relation: the fingerprint is the
   pinned siphash of the first ``fp_len`` chars of content (the M3
   ``beg_hash`` cascade level — cheap, and prefix equality is the
   standard first-pass file identity), deduplicated per batch.
2. one hash exchange keyed on ``fp``: each reducer sees every (repo, fp)
   row of its fingerprint range, dedups globally, and emits LOCALLY
   AGGREGATED pair partials ``(repo_a, repo_b, n)`` — the diagonal
   ``repo_a == repo_b`` carries the per-repo distinct-fingerprint count,
   off-diagonal rows carry co-occurrence counts for each fp shared by
   2..``max_repos_per_fp`` repos. Fingerprints in MORE repos than the
   cap are ubiquitous boilerplate (a license header, an empty file):
   they carry no fork signal and would emit O(cap²) pairs each — they
   are excluded from pair emission (still counted in sizes), the same
   document-frequency cut every published fork-detection pipeline makes.
3. one small ``groupby(repo_a, repo_b).sum`` over the pair partials —
   bounded by the number of DISTINCT co-occurring repo pairs, not files.
4. Jaccard: ``shared / (|A| + |B| - shared)`` with the diagonal sizes
   broadcast (#repos ≪ #files; past the budget the sizes relation joins
   through the bucketed hash join instead).

Scale note: for corpora where even the capped pair relation explodes
(~every repo forked), ``repo_minhash_pairs`` sketches each repo's
fingerprint set with the existing MinHash signer machinery and feeds
LSH banding — sub-quadratic in #repos. Exact Jaccard on the candidate
pairs then reuses step 2 scoped by candidate set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from deduplicate_ray.stages import exchange as ex
from deduplicate_ray.stages import joins

_PAIR_SCHEMA = pa.schema([("repo_a", pa.string()),
                          ("repo_b", pa.string()),
                          ("n", pa.int64())])


def repo_fp(corpus: rd.Dataset, fp_len: int = 40,
            repo_col: str = "repo", content_col: str = "content"
            ) -> rd.Dataset:
    """Narrow ``(repo, fp)`` relation, deduplicated per batch. ``fp`` is
    the siphash of the first ``fp_len`` characters of content (int64
    bit-view — shuffle keys round-trip through Python ints)."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        prefix = pc.utf8_slice_codeunits(
            pc.fill_null(t.column(content_col).cast(pa.string()), ""),
            0, fp_len)
        fp = joins.stable_hash(
            np.asarray(prefix.to_pylist(), dtype=object)).view(np.int64)
        repo = np.asarray(t.column(repo_col).to_pylist(), dtype=object)
        order = np.lexsort((fp, repo))
        fp, repo = fp[order], repo[order]
        keep = np.ones(fp.size, dtype=bool)
        keep[1:] = (repo[1:] != repo[:-1]) | (fp[1:] != fp[:-1])
        return pa.table({repo_col: pa.array(repo[keep], pa.string()),
                         "fp": pa.array(fp[keep])})

    return corpus.select_columns([repo_col, content_col]).map_batches(
        f, batch_format="pyarrow")


def _pair_partials(max_repos_per_fp: int):
    """Reducer for the fp-keyed exchange: global (fp, repo) dedup, then
    per-fp pair + diagonal emission, locally aggregated."""
    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        repo = np.asarray(t.column(0).to_pylist(), dtype=object)
        fp = t.column("fp").to_numpy(zero_copy_only=False)
        order = np.lexsort((repo, fp))
        repo, fp = repo[order], fp[order]
        keep = np.ones(fp.size, dtype=bool)
        keep[1:] = (fp[1:] != fp[:-1]) | (repo[1:] != repo[:-1])
        repo, fp = repo[keep], fp[keep]
        a_parts = [repo]          # diagonal: one (r, r, 1) per (fp, repo)
        b_parts = [repo]
        _, starts, counts = np.unique(fp, return_index=True,
                                      return_counts=True)
        # pair emission only for fps shared by 2..cap repos (sorted order
        # within each fp group gives repo_a < repo_b for free)
        for s, c in zip(starts[counts > 1],
                        counts[counts > 1]):
            if c > max_repos_per_fp:
                continue
            g = repo[s:s + c]
            i, j = np.triu_indices(c, k=1)
            a_parts.append(g[i])
            b_parts.append(g[j])
        df = pd.DataFrame({"repo_a": np.concatenate(a_parts),
                           "repo_b": np.concatenate(b_parts)})
        agg = df.groupby(["repo_a", "repo_b"], sort=False).size() \
            .reset_index(name="n")
        return pa.Table.from_pandas(agg, schema=_PAIR_SCHEMA,
                                    preserve_index=False)
    return reduce_fn


def repo_pair_jaccard(corpus: rd.Dataset, min_shared: int = 1,
                      fp_len: int = 40, max_repos_per_fp: int = 64,
                      repo_col: str = "repo", content_col: str = "content",
                      size_broadcast_limit: int = 2_000_000,
                      n_parts: int | None = None) -> rd.Dataset:
    """Fork-candidate repo pairs: ``(repo_a, repo_b, shared_files,
    jaccard)`` for every pair sharing ≥ ``min_shared`` file fingerprints
    (ubiquitous fingerprints excluded per ``max_repos_per_fp``)."""
    from ray.data.aggregate import Sum

    rel = repo_fp(corpus, fp_len, repo_col, content_col)
    if n_parts is None:
        n_parts = joins.default_num_buckets()

    def part_fn(t: pa.Table) -> np.ndarray:
        fp = t.column("fp").to_numpy(zero_copy_only=False)
        return (fp.view(np.uint64) % np.uint64(n_parts)).astype(np.int64)

    partials = ex.exchange(rel, part_fn,
                           _pair_partials(max_repos_per_fp), n_parts)
    counts = partials.groupby(["repo_a", "repo_b"]).aggregate(
        Sum("n", alias_name="shared_files"))
    counts = counts.materialize()
    diag = counts.filter(expr="repo_a == repo_b")
    pairs = counts.filter(expr="repo_a != repo_b")
    n_repos = diag.count()
    if n_repos > size_broadcast_limit:
        # bucketed joins on each side key; sizes relation stays narrow
        sa = diag.select_columns(["repo_a", "shared_files"]) \
            .rename_columns(["repo_a", "n_a"])
        sb = diag.select_columns(["repo_a", "shared_files"]) \
            .rename_columns(["repo_b", "n_b"])
        joined = joins.bucket_join(
            joins.bucket_join(pairs, sa, on="repo_a"), sb, on="repo_b")

        def finish(t: pa.Table) -> pa.Table:
            sh = t.column("shared_files").to_numpy(zero_copy_only=False)
            na = t.column("n_a").to_numpy(zero_copy_only=False)
            nb = t.column("n_b").to_numpy(zero_copy_only=False)
            keep = sh >= min_shared
            jac = np.round(sh / (na + nb - sh), 6)
            return pa.table(
                {"repo_a": t.column("repo_a").filter(pa.array(keep)),
                 "repo_b": t.column("repo_b").filter(pa.array(keep)),
                 "shared_files": pa.array(sh[keep]),
                 "jaccard": pa.array(jac[keep])})
        return joined.map_batches(finish, batch_format="pyarrow")
    sizes = {r["repo_a"]: r["shared_files"] for r in diag.take_all()}
    sizes_ref = ray.put(sizes)

    def finish_broadcast(t: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        sh = t.column("shared_files").to_numpy(zero_copy_only=False)
        na = np.array([sz[r] for r in t.column("repo_a").to_pylist()],
                      dtype=np.int64)
        nb = np.array([sz[r] for r in t.column("repo_b").to_pylist()],
                      dtype=np.int64)
        keep = sh >= min_shared
        jac = np.round(sh / (na + nb - sh), 6)
        return pa.table(
            {"repo_a": t.column("repo_a").filter(pa.array(keep)),
             "repo_b": t.column("repo_b").filter(pa.array(keep)),
             "shared_files": pa.array(sh[keep]),
             "jaccard": pa.array(jac[keep])})

    return pairs.map_batches(finish_broadcast, batch_format="pyarrow")


def repo_minhash_pairs(corpus: rd.Dataset, num_perms: int = 128,
                       bands: int = 32, threshold: float = 0.5,
                       fp_len: int = 40, repo_col: str = "repo",
                       content_col: str = "content") -> rd.Dataset:
    """Sub-quadratic fork candidates: MinHash-sketch each repo's
    fingerprint SET (the existing per-perm multiply-add kernel over the
    fp values), band the signatures, and estimate Jaccard per banded
    candidate pair. Returns ``(repo_a, repo_b, est_jaccard)`` — feed the
    survivors back through :func:`repo_pair_jaccard` scoped to them for
    exact counts.

    Partitioning assumption: one repo's distinct-fingerprint set fits one
    reducer (a 10M-file monorepo = 80 MB of fps — fine); the signature
    relation is #repos × num_perms and rides a single groupby."""
    from ray.data.aggregate import Max

    from deduplicate_ray.config import PipelineConfig
    from deduplicate_ray.stages import minhash

    rel = repo_fp(corpus, fp_len, repo_col, content_col)
    cfg = PipelineConfig(num_perms=num_perms, lsh_bands=bands,
                         lsh_rows=num_perms // bands)
    signer = minhash.MinHashSigner(cfg)
    mult, add = signer.mult, signer.add
    r = num_perms // bands

    def sign_group(df: pd.DataFrame) -> pd.DataFrame:
        fps = df["fp"].to_numpy().view(np.uint64)
        # finalize before the multiply-add family (stated precondition:
        # inputs must be uniformly mixed; siphash fps already are, the
        # extra mix is belt-and-braces and costs one pass)
        fps = minhash._mix64(np.unique(fps))
        sig = (np.multiply.outer(fps, mult) + add).min(axis=0)
        return pd.DataFrame({repo_col: [df.iloc[0][repo_col]],
                             "sig": [sig.view(np.int64)]})

    sigs = rel.groupby(repo_col).map_groups(sign_group).materialize()

    def band_explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([(repo_col, pa.string()),
                              ("band", pa.int64()),
                              ("bh", pa.int64())]).empty_table()
        sig = np.stack([np.asarray(s, dtype=np.int64)
                        for s in t.column("sig").to_pylist()]) \
            .view(np.uint64)
        n = sig.shape[0]
        # band j folds signature columns j*r:(j+1)*r
        chunks = sig.reshape(n, bands, r)
        folded = np.zeros((n, bands), dtype=np.uint64)
        for i in range(r):
            folded = folded * np.uint64(1099511628211) + chunks[:, :, i]
        repo = np.repeat(
            np.asarray(t.column(repo_col).to_pylist(), dtype=object), bands)
        band = np.tile(np.arange(bands, dtype=np.int64), n)
        return pa.table({repo_col: pa.array(repo, pa.string()),
                         "band": pa.array(band),
                         "bh": pa.array(folded.reshape(-1).view(np.int64))})

    banded = sigs.map_batches(band_explode, batch_format="pyarrow")

    sig_map = {r_[repo_col]: np.asarray(r_["sig"], dtype=np.int64)
               for r_ in sigs.take_all()}
    sig_ref = ray.put(sig_map)

    def pairs_group(df: pd.DataFrame) -> pd.DataFrame:
        repos = sorted(set(df[repo_col]))
        if len(repos) < 2:
            return pd.DataFrame({"repo_a": pd.Series([], dtype=object),
                                 "repo_b": pd.Series([], dtype=object),
                                 "est_jaccard": pd.Series([], dtype=float)})
        sm = ray.get(sig_ref)
        out_a, out_b, out_j = [], [], []
        for i in range(len(repos)):
            for j in range(i + 1, len(repos)):
                est = float(np.mean(sm[repos[i]] == sm[repos[j]]))
                if est >= threshold:
                    out_a.append(repos[i])
                    out_b.append(repos[j])
                    out_j.append(round(est, 6))
        return pd.DataFrame({"repo_a": out_a, "repo_b": out_b,
                             "est_jaccard": out_j})

    cand = banded.groupby(["band", "bh"]).map_groups(pairs_group)
    # same pair can fire in several bands — one small groupby dedups
    return cand.groupby(["repo_a", "repo_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard"))
