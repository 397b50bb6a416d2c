#!/usr/bin/env python3
"""Local self-check: compare Verify output parquet against DuckDB oracle.

Mirrors the driver's correctness gate: for each query in
oracle_sql.json, run the SQL in DuckDB over the sf tables, load the
Spark result parquet, sort columns by name, sort rows, and compare
values exactly. Usage:

    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # array/list cells (e.g. a raw array<double> output column) are
    # unhashable/unsortable as numpy arrays — canonicalize to tuples so
    # the row sort and compare still work (ADVICE r5 item 2).
    if hasattr(v, "tolist") and not hasattr(v, "is_integer"):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def canon(df):
    df = df[sorted(df.columns)]
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # fixture preflight (ADVICE r5 item 1): an empty/missing table makes
    # downstream "passes" meaningless — abort loudly instead.
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        n = con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
        if n == 0:
            print(f"ABORT: fixture table {t} is empty in {sf_dir}")
            return 2
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # coverage gate (ADVICE r5 item 1): every declared query must have a
    # Verify output; a missing entry is a FAIL, not a silent shrink.
    try:
        declared = json.load(open(f"{out_dir}/queries.json"))
    except FileNotFoundError:
        declared = sorted(oracle)
    import os
    for name in declared:
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"FAIL {name}: no Verify output (query did not run)")
            n_fail += 1
        elif name not in oracle:
            try:
                n = con.execute(
                    f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
                print(f"ROWS {name} ({n} rows, no oracle)")
            except Exception as e:
                print(f"FAIL {name}: rows-only result unreadable: {e}")
                n_fail += 1
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        cw, cg = canon(want), canon(got)
        if cw == cg:
            print(f"PASS {name} ({len(cg)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: oracle {len(cw)} rows vs spark {len(cg)} rows")
            if sorted(want.columns.tolist()) != sorted(got.columns.tolist()):
                print(f"  cols: oracle={sorted(want.columns)} spark={sorted(got.columns)}")
            else:
                diffs = 0
                for a, b in zip(cw, cg):
                    if a != b and diffs < 3:
                        print(f"  oracle: {a}\n  spark : {b}")
                        diffs += 1
                if len(cw) != len(cg):
                    only_w = set(cw) - set(cg)
                    only_g = set(cg) - set(cw)
                    for r in list(only_w)[:2]:
                        print(f"  only-oracle: {r}")
                    for r in list(only_g)[:2]:
                        print(f"  only-spark : {r}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
