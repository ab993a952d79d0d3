#!/usr/bin/env python3
"""Merge tools/bench_oracle.py output into a BENCH_local artifact:
adds "oracle_sec" (per-query DuckDB median seconds) and
"oracle_total" next to the Spark medians so SURVEY §6 can read the
Spark-vs-single-node ratio per query.

Usage: tools/merge_bench.py <bench_json_path> <oracle_json_path>
(rewrites bench_json_path in place)."""
import sys, json, os


def main(bench_path: str, oracle_path: str) -> int:
    bench = json.load(open(bench_path))
    oracle = json.load(open(oracle_path))
    secs = oracle["oracle_sec"]
    bench["oracle_sec"] = secs
    ok = [v for v in secs.values() if v >= 0]
    bench["oracle_total"] = round(sum(ok), 3)
    bench["oracle_runs"] = oracle.get("runs")
    with open(bench_path, "w") as f:
        json.dump(bench, f)
    # committed oracle reference: graft.Bench echoes this total into its
    # compact stdout line, so the driver's BENCH artifact carries the
    # vs-baseline ratio without having to read the repo
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "oracle_ref.json")
    with open(ref_path, "w") as f:
        json.dump({"oracle_total": bench["oracle_total"],
                   "sf": oracle.get("sf"),
                   "runs": oracle.get("runs"),
                   "n_queries": len(secs),
                   "source": os.path.basename(bench_path)}, f)
    q = bench.get("queries", {})
    worst = sorted(((q[n] / secs[n], n) for n in q
                    if n in secs and secs[n] > 0 and q[n] > 0),
                   reverse=True)[:10]
    print(f"merged: spark_total={bench.get('value')} "
          f"oracle_total={bench['oracle_total']}")
    print("worst spark/oracle ratios:")
    for r, n in worst:
        print(f"  {n}: {r:.1f}x  (spark {q[n]}s vs duckdb {secs[n]}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
