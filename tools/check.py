#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the same parquet
tables, sorts columns by name, and compares row-by-row.

ORACLE_CACHE=<dir> (env) caches each oracle RESULT keyed by (oracle SQL,
fixture fingerprint), so a close run's three materialization-mode passes
execute every DuckDB side once instead of three times (the r11 close spent
354+278+787 s recomputing identical oracles). Only the oracle side is
cached — the Spark side re-executes per mode, which is the point of the
multi-mode gate. Pickle, not parquet: the dtype gate below compares pandas
dtypes exactly, and a parquet round-trip can coerce them.
"""
import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str, skip=()) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    # oracle-result cache (see module docstring): keyed by the SQL text, a
    # fixture fingerprint (path + size + mtime of every table), the DuckDB
    # version, and a harness-setup salt (the view-registration preamble +
    # pandas version, since the cached object is a pandas frame), so a
    # regenerated testdata dir, an edited oracle, a DuckDB upgrade, or a
    # loader change can never serve stale results (ADVICE r12)
    cache_dir = os.environ.get("ORACLE_CACHE")
    fixture_fp = ""
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        parts = [f"duckdb={duckdb.__version__}", f"pandas={pd.__version__}",
                 "setup=view-per-table:" + ",".join(TABLES)]
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            st = os.stat(p)
            parts.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
        fixture_fp = ";".join(parts)

    def run_oracle(name: str, sql: str) -> pd.DataFrame:
        if not cache_dir:
            return con.execute(sql).df()
        key = hashlib.sha256((fixture_fp + "\0" + sql).encode()).hexdigest()[:32]
        path = os.path.join(cache_dir, f"{name}-{key}.pkl")
        if os.path.exists(path):
            return pd.read_pickle(path)
        want = con.execute(sql).df()
        pd.to_pickle(want, path)
        return want

    n_pass = n_fail = 0
    slow = []  # (seconds, name) — oracle cost is part of the product
    t_start = time.time()
    for name, sql in sorted(oracles.items()):
        if any(s and s in name for s in skip):
            print(f"SKIP {name}")
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            t0 = time.time()
            want = run_oracle(name, sql)
            slow.append((time.time() - t0, name))
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        got_n, want_n = normalize(got), normalize(want)
        if list(got_n.columns) != list(want_n.columns):
            print(f"FAIL {name}: columns {list(got_n.columns)} vs {list(want_n.columns)}")
            n_fail += 1
            continue
        if len(got_n) != len(want_n):
            print(f"FAIL {name}: rows {len(got_n)} vs {len(want_n)}")
            n_fail += 1
            continue
        # dtype pinning: the driver's hasher canonicalizes per-dtype, so an
        # oracle column whose pandas dtype differs from the Spark parquet
        # dtype can hash-diverge even when values compare equal (round-8
        # postmortem: uncast DuckDB SUM -> HUGEINT -> float64 vs int64 on
        # q117/q154). Every oracle must arrive dtype-identical.
        bad_types = [(c, str(got_n[c].dtype), str(want_n[c].dtype))
                     for c in got_n.columns
                     if str(got_n[c].dtype) != str(want_n[c].dtype)]
        if bad_types:
            print(f"FAIL {name}: oracle dtype mismatch (uncast aggregate?): "
                  f"{bad_types}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(got_n, want_n,
                                          check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(got_n)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e)[:400]}")
            n_fail += 1
    total = time.time() - t_start
    print(f"\n{n_pass} pass / {n_fail} fail ({total:.1f}s)")
    # a slow oracle starves the driver's gate (round-7 postmortem: one
    # 13-minute oracle zeroed the round) — surface creep loudly
    for dt, name in sorted(slow, reverse=True)[:3]:
        if dt > 10:
            print(f"WARN slow oracle {name}: {dt:.1f}s — keep the suite in "
                  f"single-digit minutes (MATERIALIZED CTEs / equijoin pair sets)")
    if total > 300:
        print(f"WARN oracle suite took {total:.0f}s — the driver gate may time out")
    return 1 if n_fail else 0


if __name__ == "__main__":
    # argv[3:] = substrings of query names to skip (e.g. the O(n^2)-oracle
    # pairwise queries, which take >25 min in DuckDB at sf0.1)
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
