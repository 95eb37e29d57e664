#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the oracle SQL in DuckDB over the
same sf tables, sort columns by name, and compare row-by-row values.

Usage: python tools/local_verify.py <sfDir> <outDir> [query ...]
"""
import json, math, sys
import duckdb

def canon(rows):
    # strict: full-precision repr — mirrors the driver's value hashing.
    # (All 28 oracle queries are bit-exact across Spark and DuckDB
    # because every float output is ROUND()ed in both engines.)
    return [tuple("NaN" if isinstance(v, float) and math.isnan(v) else repr(v)
                  for v in row) for row in rows]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        try:
            exp = con.execute(sql).fetch_arrow_table()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            print(f"FAIL {name}: schema {gcols} != oracle {ecols}"); n_bad += 1; continue
        e_rows = canon(zip(*[exp.column(c).to_pylist() for c in ecols]))
        g_rows = canon(zip(*[got.column(c).to_pylist() for c in gcols]))
        if len(e_rows) != len(g_rows):
            print(f"FAIL {name}: rows {len(g_rows)} != oracle {len(e_rows)}"); n_bad += 1; continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(g_rows, e_rows)) if a != b]
        if diffs:
            i, a, b = diffs[0]
            print(f"FAIL {name}: {len(diffs)}/{len(e_rows)} rows differ; first at {i}:\n  got {a}\n  exp {b}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(e_rows)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
