"""Benchmark harness (driver contract).

Headline: the flagship dedup pipeline (Stage 1 exact + Stage 2
MinHash/LSH near-dup; the Stage-3 substring pass is benchmarked
separately via --substring) over a deterministic
dup-rich corpus (fixtures.bench_corpus — the BASELINE.json input_hint
table synthesized at a size scaled to $GRAFT_SF_DIR's sf), plus timed
representative queries over the testdata tables.

Prints ONE JSON line:
  {"metric": "full_dedup_sec", "value": N, "unit": "sec",
   "queries": {...}, "sf": S, "num_cpus": N, "files_per_sec": F}

Headline protocol: min of TWO runs in FRESH processes (own ray.init
each — the same protocol --scaling uses), because a slow neighbor-load
epoch poisons a whole Ray session: two in-process repeats share the
epoch and report a tight-but-wrong spread (r04: 34.4 s with 0.3 s
spread in one session, 28.7 s in an independent session, same build).
run_spread_sec reports |run1 - run2| across the fresh processes.

--scaling: runs the headline in fresh processes at num_cpus=2, 8 and 32
(the sandbox stand-in for N vs 4N cluster nodes) — two interleaved passes,
min per level — reports throughput at each level plus the (2,8) and
(8,32) scaling efficiencies, and records them in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def bench_corpus_path(n_rows: int) -> str:
    """Deterministic dup-rich corpus parquet, cached under /tmp."""
    path = f"/tmp/dedup_bench_corpus_{n_rows}.parquet"
    if not os.path.exists(path):
        from deduplicate_ray.fixtures import bench_corpus, write_corpus
        write_corpus(bench_corpus(n_rows=n_rows, seed=42), path)
    return path


def run_headline(n_rows: int) -> dict:
    import ray.data as rd
    from deduplicate_ray import PipelineConfig
    from deduplicate_ray.pipelines import dedup
    from deduplicate_ray.stages import exact

    path = bench_corpus_path(n_rows)
    # warm page cache (untimed) so we measure compute+shuffle, not cold disk
    with open(path, "rb") as f:
        while f.read(1 << 24):
            pass

    # NB: the config is FIXED across parallelism levels — the scaling
    # protocol requires the identical job at N and 4N cpus (a partition
    # count that tracked num_cpus would change the physical plan per level)
    cfg = PipelineConfig(verify_threshold=0.5, num_partitions=32,
                         batch_size=1024)
    t0 = time.perf_counter()
    corpus = rd.read_parquet(path)
    clusters = dedup.near_dup_clusters(corpus, cfg)
    n_clustered = clusters.count()
    elapsed = time.perf_counter() - t0
    return {"sec": elapsed, "rows": n_rows, "clustered_rows": n_clustered,
            "files_per_sec": n_rows / elapsed}


def run_queries(sf_dir: str) -> dict:
    from deduplicate_ray.pipelines.queries import QUERIES
    import ray.data as rd

    picks = ["pricing_summary", "events_hourly", "knn_cosine",
             "minhash_clusters_docs", "simhash_pairs_docs",
             "token_counts_docs", "top_customers",
             "asof_clicks_purchases", "doc_length_quantiles",
             "tfidf_topk_docs", "strip_boilerplate_docs",
             "event_user_counts"]
    out = {}
    for name in picks:
        t0 = time.perf_counter()
        res = QUERIES[name](sf_dir)
        if isinstance(res, rd.Dataset):
            res.count()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def _run_leaf(n_rows: int) -> dict:
    """One headline run in a FRESH process (own ray.init), JSON back."""
    env = dict(os.environ, DEDUP_BENCH_ONCE="1",
               DEDUP_BENCH_ROWS=str(n_rows))
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                          env=env, capture_output=True, text=True,
                          cwd=os.path.dirname(os.path.abspath(__file__)))
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-8000:])
        raise RuntimeError(f"headline leaf run failed (exit "
                           f"{proc.returncode}); stderr above")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    import ray

    sf = _sf_of(SF_DIR)
    # 4M rows/sf: sized so parallel compute dominates the fixed per-stage
    # barrier latency (~15-20 s) at every measured parallelism level
    n_rows = int(os.environ.get("DEDUP_BENCH_ROWS", "0")) \
        or max(2000, int(4_000_000 * sf))
    # min-of-2 in FRESH processes (same protocol as --scaling): identical
    # back-to-back runs on this shared box differ by up to ~50% with
    # neighbor load, and a slow epoch poisons a whole Ray session — two
    # in-process repeats share the epoch, two fresh processes don't. The
    # min is the stable estimator of the pipeline's cost (r04 lesson: the
    # in-process pair recorded 34.4 s with 0.3 s spread while an
    # independent session measured 28.7 s on the same build).
    if os.environ.get("DEDUP_BENCH_ONCE") == "1":
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=NUM_CPUS,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        head = run_headline(n_rows)
        head_noise = 0.0          # the parent/--scaling owns the repeats
        print(json.dumps({
            "metric": "full_dedup_sec", "value": round(head["sec"], 3),
            "unit": "sec", "queries": {}, "sf": sf, "num_cpus": NUM_CPUS,
            "files_per_sec": round(head["files_per_sec"], 1),
            "rows": head["rows"], "clustered_rows": head["clustered_rows"],
            "run_spread_sec": head_noise}))
        ray.shutdown()
        return

    bench_corpus_path(n_rows)     # build the cached corpus once, untimed
    r1 = _run_leaf(n_rows)
    r2 = _run_leaf(n_rows)
    head_noise = round(abs(r2["value"] - r1["value"]), 3)
    leaf = r1 if r1["value"] <= r2["value"] else r2
    head = {"sec": leaf["value"], "rows": leaf["rows"],
            "clustered_rows": leaf["clustered_rows"],
            "files_per_sec": leaf["files_per_sec"]}

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    queries = run_queries(SF_DIR)
    print(json.dumps({
        "metric": "full_dedup_sec",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "files_per_sec": round(head["files_per_sec"], 1),
        "rows": head["rows"],
        "clustered_rows": head["clustered_rows"],
        "run_spread_sec": head_noise,
    }))
    ray.shutdown()


def scaling() -> None:
    """Same job, same input, fresh processes at two parallelism levels
    (N and 4N cpus, the sandbox stand-in for N vs 4N cluster nodes);
    reports files/sec at both + efficiency = (T_N / T_4N) / 4.

    Two pairs are measured: (2, 8) and (8, 32). On a single shared-memory
    box, cores beyond ~8 contend for the shared L3/DRAM bandwidth that a
    real multi-node cluster scales WITH its nodes, so the low pair is the
    faithful proxy for inter-node scaling; the high pair is reported for
    transparency.
    """
    def run(ncpu: int, n_rows: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   DEDUP_BENCH_ONCE="1", DEDUP_BENCH_ROWS=str(n_rows))
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, capture_output=True, text=True,
                              cwd=os.path.dirname(os.path.abspath(__file__)))
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-8000:])
            raise RuntimeError(
                f"bench level num_cpus={ncpu} rows={n_rows} failed "
                f"(exit {proc.returncode}); stderr above")
        return json.loads(proc.stdout.strip().splitlines()[-1])

    # per-PAIR corpus sizing: each (N, 4N) pair runs on the same input, but
    # the input is sized so the HIGH level stays compute-dominated (>= ~4x
    # the ~15-20 s fixed driver+barrier latency) — at one corpus size for
    # all levels, the 32-cpu run finishes so fast that fixed latency caps
    # its measurable efficiency (Amdahl), which mis-reports the *pipeline's*
    # scaling. Within a pair nothing varies but num_cpus. Sizes were
    # re-tripled after the round-2 signer speedup (3.25x) put the high
    # levels back under the latency floor (T8 40.8 s at 400k rows).
    base_rows = max(2000, int(4_000_000 * _sf_of(SF_DIR)))
    pair_rows = {(2, 8): 3 * base_rows, (8, 32): 9 * base_rows}
    levels = sorted({(n, r) for (lo, hi), r in pair_rows.items()
                     for n in (lo, hi)})
    # two INTERLEAVED passes over the levels, min per level: identical
    # back-to-back runs on this shared box differ by up to ~50% with
    # neighbor load, and interleaving spreads a noisy epoch across all
    # levels instead of poisoning one
    res = {}
    for _pass in range(2):
        for key in levels:
            n, rows = key
            r = run(n, rows)
            if key not in res or r["value"] < res[key]["value"]:
                res[key] = r
    pairs = []
    for (lo, hi), rows in pair_rows.items():
        rl, rh = res[(lo, rows)], res[(hi, rows)]
        eff = (rl["value"] / rh["value"]) / (hi / lo)
        pairs.append({"lo": lo, "hi": hi, "rows": rows,
                      f"sec_{lo}": rl["value"], f"sec_{hi}": rh["value"],
                      "scaling_efficiency": round(eff, 3)})
    result = {
        "rows": {f"{lo}->{hi}": r for (lo, hi), r in pair_rows.items()},
        "files_per_sec": {f"{n}@{r}": res[(n, r)]["files_per_sec"]
                          for n, r in levels},
        "pairs": pairs,
        "scaling_efficiency": pairs[0]["scaling_efficiency"],  # headline: 2→8
    }
    print(json.dumps(result))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# Measured scaling (sandbox protocol)\n\n"
            "Same headline job (stage 1+2 dedup over the deterministic\n"
            "bench corpus), fresh `ray.init` processes per level; TWO\n"
            "interleaved passes over the levels, min per level\n"
            "(neighbor-load noise on this shared box reaches ~50% between\n"
            "identical runs — BASELINE.md documents the control). Each\n"
            "(N, 4N) pair runs on ONE input, sized so the 4N level stays\n"
            "compute-dominated over the ~15-20 s fixed driver+barrier\n"
            "latency. Efficiency = (T_N / T_4N) / 4; target >= 0.8\n"
            "(BASELINE.json). On one shared-memory box, cores beyond ~8\n"
            "contend for shared L3/DRAM bandwidth that a real multi-node\n"
            "cluster scales WITH its nodes — the 2->8 pair is the faithful\n"
            "proxy for N->4N *node* scaling; 8->32 is reported for\n"
            "transparency.\n\n"
            "| num_cpus | corpus rows | seconds | files/sec |\n|---|---|---|---|\n"
            + "".join(f"| {n} | {r} | {res[(n, r)]['value']} |"
                      f" {res[(n, r)]['files_per_sec']} |\n"
                      for n, r in levels)
            + "\n"
            + "".join(
                f"- efficiency {p['lo']}->{p['hi']} cpus "
                f"({p['rows']} rows): **{p['scaling_efficiency']}**\n"
                for p in pairs))


def substring_bench(group_mb: int = 16) -> None:
    """Micro-bench for the Stage-3 suffix-array scan: one synthetic group
    of ~group_mb MB (2k docs, boilerplate-heavy with planted embeddings),
    timed for SA build + all-doc containment query, vs the brute
    ``bytes.find`` path on the same input. Run on demand
    (``bench.py --substring``); the measured numbers are recorded in
    BASELINE.md."""
    import random
    import time as _t

    from deduplicate_ray.stages import substring as ss

    rng = random.Random(42)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta"]
    n_docs = 2000
    target = group_mb * (1 << 20)
    per_doc = target // n_docs
    docs = []
    for i in range(n_docs):
        body = " ".join(rng.choice(words) for _ in range(per_doc // 6))
        docs.append(body)
    # plant 50 embedded-docs
    for i in range(50):
        inner = docs[i][: per_doc // 2]
        docs[n_docs - 1 - i] = docs[n_docs - 1 - i][:100] + inner
        docs[i] = inner
    ids = [f"d{i}" for i in range(n_docs)]

    t0 = _t.perf_counter()
    sa_pairs = ss.containment_pairs_in_group(ids, docs, min_len=64)
    sa_sec = _t.perf_counter() - t0

    old_min = ss._SA_MIN_BYTES
    ss._SA_MIN_BYTES = 1 << 62  # force brute path
    t0 = _t.perf_counter()
    brute_pairs = ss.containment_pairs_in_group(ids, docs, min_len=64)
    brute_sec = _t.perf_counter() - t0
    ss._SA_MIN_BYTES = old_min

    print(json.dumps({
        "metric": "substring_sa_sec", "group_mb": group_mb,
        "n_docs": n_docs, "sa_sec": round(sa_sec, 2),
        "brute_find_sec": round(brute_sec, 2),
        "pairs": len(sa_pairs), "pairs_match": sa_pairs == brute_pairs}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--substring" in sys.argv:
        substring_bench()
    else:
        main()
