#!/usr/bin/env python3
"""Time each DuckDB oracle query — the single-node reference engine —
on the same parquet tables the Spark bench reads, closing the round-11
verdict's "no external wall-time baseline exists" gap: BASELINE.json
demands "within 2x of baseline at the same SF" but the reference repo
publishes no numbers, so the honest baseline is the oracle itself
(same semantics, same data, an independent engine).

Usage: tools/bench_oracle.py <sfDir> <verifyOutDir> [runs]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify for the
SAME corpus — generated oracles inline per-corpus artifacts), times
each query `runs` times (default 3) in DuckDB and prints one JSON
object {"oracle_sec": {name: median_sec}, "sf": dir, "runs": N}.

Merge into the round's BENCH_local artifact with:
  python3 tools/merge_bench.py BENCH_local_rN.json oracle.json

Dev-only (the product library is pure Scala/Spark; duckdb is the
driver-side oracle engine, as in tools/check.py).
"""
import sys, json, time, statistics
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, runs: int = 3) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    secs = {}
    for name in sorted(oracle):
        try:
            con.execute(oracle[name]).fetchall()  # warmup (IO cache, plan)
            xs = []
            for _ in range(runs):
                t0 = time.perf_counter()
                con.execute(oracle[name]).fetchall()
                xs.append(time.perf_counter() - t0)
            secs[name] = round(statistics.median(xs), 3)
        except Exception as e:
            print(f"[oracle] {name} failed: {e}", file=sys.stderr)
            secs[name] = -1.0
    print(json.dumps({"oracle_sec": secs, "sf": sf_dir, "runs": runs}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 3))
