#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 scripts/selfcheck.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet dir written by graft.Verify, runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB (tables = views over the sf
parquet), and compares: schema (arrow types), row count, and exact values
after sorting columns by name and rows by all columns.

Dev-tool only (driver-side python); the Scala library never depends on this.
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(table):
    """arrow Table -> (schema_desc, sorted list of row tuples)"""
    import pandas as pd
    df = table.to_pandas()
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    sch = {f.name: str(f.type) for f in table.schema}
    return sch, rows


def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            mine_files = glob.glob(f"{outdir}/{name}/*.parquet")
            mine = pq.read_table(mine_files[0]) if len(mine_files) == 1 else pq.read_table(f"{outdir}/{name}")
            theirs = con.sql(sql).arrow()
            ms, mr = canon(mine)
            ts, tr = canon(theirs)
            errs = []
            if set(ms) != set(ts):
                errs.append(f"columns differ: mine={sorted(ms)} oracle={sorted(ts)}")
            else:
                for c in ms:
                    if ms[c] != ts[c]:
                        errs.append(f"type[{c}]: mine={ms[c]} oracle={ts[c]}")
            if len(mr) != len(tr):
                errs.append(f"rows: mine={len(mr)} oracle={len(tr)}")
            if not errs:
                bad = 0
                for i, (a, b) in enumerate(zip(mr, tr)):
                    if not all(eq(x, y) for x, y in zip(a, b)):
                        if bad == 0:
                            errs.append(f"row {i} differs:\n  mine:   {a}\n  oracle: {b}")
                        bad += 1
                if bad:
                    errs.append(f"{bad} differing rows total")
            if errs:
                n_fail += 1
                print(f"FAIL {name}")
                for e in errs:
                    print(f"     {e}")
            else:
                n_pass += 1
                print(f"PASS {name} ({len(mr)} rows)")
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: EXCEPTION {type(e).__name__}: {e}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
