#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles: mimics the driver's DuckDB
compare (column-name-sorted value comparison) so oracle bugs are caught
before the round gate. Usage: check_oracle.py <sfdir> <verify_out_dir>
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v

def frame_to_rows(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm(r[i]) for i in order) for r in cur.fetchall()]
    return sorted(cols), sorted(rows, key=lambda r: str(r))

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{outdir}/{name}"):
            continue  # query not dumped in this (filtered) run
        try:
            got_cols, got = frame_to_rows(
                con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"))
            exp_cols, exp = frame_to_rows(con.execute(sql))
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif got != exp:
            print(f"FAIL {name}: {len(got)} rows vs {len(exp)} rows")
            diffs = [(g, e) for g, e in zip(got, exp) if g != e]
            for g, e in diffs[:3]:
                print(f"  spark: {g}\n  duck : {e}")
            if len(got) == len(exp):
                print(f"  ({len(diffs)} differing rows)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
