#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from <verifyOutDir>/oracle_sql.json in
DuckDB against the sfDir parquet tables, and compares values exactly
(columns sorted by name; both as-emitted row order and sorted rows).

This is a dev-only checker; the product library is pure Scala/Spark.
"""
import sys, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_df()
            exp = con.execute(oracle[name]).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        errs = []
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            errs.append(f"columns {gc} != {ec}")
        elif len(got) != len(exp):
            errs.append(f"rows {len(got)} != {len(exp)}")
        else:
            g = got[gc].reset_index(drop=True)
            e = exp[ec].reset_index(drop=True)
            for c in gc:
                if str(g[c].dtype) != str(e[c].dtype):
                    errs.append(f"dtype[{c}] {g[c].dtype} != {e[c].dtype}")
            if not errs and len(g):
                neq = (g != e) & ~(g.isna() & e.isna())
                if neq.any().any():
                    bad = neq.any(axis=1)
                    i = bad.idxmax()
                    errs.append(
                        f"{int(bad.sum())} mismatched rows; first at {i}:\n"
                        f"    spark: {g.loc[i].to_dict()}\n"
                        f"    duck : {e.loc[i].to_dict()}")
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    declared = set(oracle)
    extra = {g.rsplit('/', 1)[-1] for g in glob.glob(f"{out_dir}/*")
             if not g.endswith('.json')} - declared
    if extra:
        print(f"note: outputs without oracle (rows-only): {sorted(extra)}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
