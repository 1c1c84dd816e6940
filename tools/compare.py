#!/usr/bin/env python3
"""Dev-only harness mirror (NOT part of the Scala library; the library has
zero Python dependencies). Replicates the driver's correctness gate locally:
runs graft.Verify output against DuckDB oracles and diffs values.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
"""
import json, os, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        # Debug's dump mode writes the complete oracle json alongside a
        # PARTIAL result dump — skip (don't fail) entries with no dump,
        # unless the user asked for that query explicitly.
        if not only and not os.path.isdir(f"{out_dir}/{name}"):
            print(f"SKIP {name}: no dumped result")
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            failures += 1
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} vs oracle {ecols}")
            failures += 1
            continue
        g = got[gcols].sort_values(gcols, kind="mergesort").reset_index(drop=True)
        e = exp[ecols].sort_values(ecols, kind="mergesort").reset_index(drop=True)
        for c in gcols:  # dtype drift (int32 vs int64 etc.) — warn, since the
            if str(g[c].dtype) != str(e[c].dtype):  # driver may schema-check
                print(f"WARN {name}: dtype of {c}: {g[c].dtype} vs oracle {e[c].dtype}")
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs oracle {len(e)}")
            failures += 1
            continue
        grows = [tuple(norm(v) for v in r) for r in g.itertuples(index=False)]
        erows = [tuple(norm(v) for v in r) for r in e.itertuples(index=False)]
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(grows, erows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first at {i}:\n  got {a}\n  exp {b}")
            failures += 1
        else:
            print(f"OK   {name}: {len(g)} rows, {len(gcols)} cols hash-match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
