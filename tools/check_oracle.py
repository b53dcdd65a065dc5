"""Side-by-side oracle check, mimicking the driver's correctness gate:
run every queries() entry at a given sf dir, compare row count, schema
(column names), per-column dtype kind (the %.6g value hash is blind to
int64-vs-float64 — exactly the HUGEINT window-SUM class of oracle bug
that cost pack_shards_docs its r04 driver row) and order-insensitive
value hash against oracle_sql() via DuckDB.

Importable: ``check_queries(names, sf_dir)`` returns a list of failure
strings (used by tests/test_demoted_oracles.py to keep demoted-past-the-
driver-window queries verified in CI). CLI:
``python tools/check_oracle.py [sf_dir] [name ...]``
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    return hashlib.md5(
        canon(df).to_csv(index=False, float_format="%.6g").encode()
    ).hexdigest()


def _dtype_kind(dt) -> str:
    s = str(dt)
    if s.startswith("datetime"):
        return "datetime"
    return getattr(dt, "kind", s)  # i/u int, f float, b bool, O object


def check_queries(names=None, sf_dir: str = "/root/testdata/sf0.01",
                  verbose: bool = True) -> list:
    """Run the driver-shaped compare for the given query names (all
    registered queries when None). Returns failure strings; Ray must
    already be initialized by the caller (pytest fixture / main)."""
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if names is not None and name not in names:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001 — report, keep checking
            failures.append(
                f"{name}: query raised {type(e).__name__}: {str(e)[:200]}")
            if verbose:
                print(f"FAIL {failures[-1]}")
            continue
        if name not in oracles:
            if verbose:
                print(f"ok   {name}: rows-only ({len(got)} rows, "
                      f"cols {sorted(got.columns)})")
            continue
        exp = con.execute(oracles[name]).df()
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(
                f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        if not problems:
            kinds = [(c, _dtype_kind(got[c].dtype), _dtype_kind(exp[c].dtype))
                     for c in sorted(got.columns)]
            bad = [f"{c}: {g} != {e}" for c, g, e in kinds if g != e]
            if bad:
                problems.append("dtype kind mismatch (driver hash would "
                                "fail): " + "; ".join(bad))
        if not problems and value_hash(got) != value_hash(exp):
            g, e = canon(got), canon(exp)
            diff = (g != e) & ~(g.isna() & e.isna())
            problems.append(
                f"value hash mismatch ({int(diff.values.sum())} cells)")
            if verbose:
                print(g.compare(e).head(5) if g.shape == e.shape
                      else (g.head(), e.head()))
        if problems:
            failures.append(f"{name}: {'; '.join(problems)}")
            if verbose:
                print(f"FAIL {failures[-1]}")
        elif verbose:
            print(f"PASS {name}: {len(got)} rows")
    return failures


def main() -> None:
    import ray
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    failures = check_queries(only, sf_dir)
    print(f"\n{len(failures)} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
