#!/usr/bin/env python3
"""Spark-vs-DuckDB single-node throughput comparison on the oracled queries.

Usage: python3 tools/benchcmp.py <sfDir> <bench_json> [oracle_sql.json]

Times each oracle SQL in DuckDB (warm, best of 2) and prints it beside the
Spark per-query seconds from a graft.Bench JSON line. Driver-side tooling
only — the reference's own query layer IS DuckDB, so this is the
"matches-or-beats the reference's single-node throughput" check.
"""
import sys, json, time
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def main():
    sf_dir = sys.argv[1]
    bench = json.load(open(sys.argv[2]))
    oracle_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/verify_out/oracle_sql.json"
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    rows = []
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetchall()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        spark_s = bench["queries"].get(name)
        ratio = (spark_s / best) if (spark_s and best > 0) else float("nan")
        rows.append((name, spark_s, best, ratio))
    print(f"{'query':28} {'spark_s':>8} {'duck_s':>8} {'spark/duck':>10}")
    for name, s, d, r in rows:
        print(f"{name:28} {s:8.2f} {d:8.2f} {r:10.1f}")
    tot_s = sum(r[1] for r in rows if r[1])
    tot_d = sum(r[2] for r in rows)
    print(f"{'TOTAL (oracled only)':28} {tot_s:8.2f} {tot_d:8.2f} {tot_s/tot_d:10.1f}")

if __name__ == "__main__":
    main()
