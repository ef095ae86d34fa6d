#!/usr/bin/env python3
"""Spark-vs-DuckDB single-node throughput comparison on the oracled queries.

Usage: python3 tools/benchcmp.py <sfDir> <bench_json> [oracle_sql.json] [out.json] [prev_benchcmp.json]

Times each oracle SQL in DuckDB (warm, best of 2) and prints it beside the
Spark per-query seconds from a graft.Bench JSON line. Driver-side tooling
only — the reference's own query layer IS DuckDB, so this is the
"matches-or-beats the reference's single-node throughput" check.

The total is DECOMPOSED into subsets (ADVICE r7: an aggregate ratio hides
which side's spelling dominates):
  - relational-core  (q01..q34): reference-parity SQL, a fair DuckDB fight;
  - extension-oracle (x*): oracles deliberately spelled EXACT (recursive
    CTEs, all-pairs Jaccard, quantized-decimal folds) to pin semantics, so
    DuckDB-side time there overstates what a tuned native spelling would
    cost — call the headline from the core subset, not the aggregate.
If [out.json] is given the full per-query table and subtotals are written
there so the raw run can be checked in alongside any claim derived from it.
"""
import sys, json, time
import duckdb


def _time_once(con, sql):
    t0 = time.time()
    con.execute(sql).fetchall()
    return time.time() - t0

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
    # Host-drift sentinel (r11: the driver's bench read +18% on untouched
    # code from host load alone). A fixed scan+agg is timed warm best-of-5
    # in THIS session; round-over-round comparison reads the drift of this
    # number (and the Spark-side floor_* fields in the bench json) before
    # believing any per-query delta. Protocol: NOTES_r12.md.
    SENTINEL_SQL = "SELECT count(*), sum(l_quantity) FROM lineitem WHERE l_discount > 0.02"
    con.execute(SENTINEL_SQL).fetchall()  # warm
    duck_sentinel = min(_time_once(con, SENTINEL_SQL) for _ in range(5))
    spark_floor = {k: bench[k] for k in ("floor_launch_ms", "floor_q13_ms")
                   if k in bench}
    print(f"calibration: duck_sentinel_s={duck_sentinel:.4f} spark_floor={spark_floor}")
    prev_path = sys.argv[5] if len(sys.argv) > 5 else None
    if prev_path:
        try:
            prev = json.load(open(prev_path))
            ps = prev.get("calibration", {}).get("duck_sentinel_s")
            if ps:
                print(f"calibration drift vs {prev_path}: duck sentinel "
                      f"{ps:.4f} -> {duck_sentinel:.4f} s "
                      f"({(duck_sentinel/ps - 1)*100:+.1f}%)")
        except Exception as e:
            print(f"(no prior calibration: {e})")
    # Floor-subtracted Spark seconds (r14 verdict ask #3): sub-second queries
    # sit on a fixed per-job launch floor (~60-90 ms measured in the SAME
    # bench run) that a long-lived deployment pays once, not per query — at
    # 34 relational-core queries the floors alone are ~40% of that subtotal.
    # Report both spellings so the core-ratio gate is a number, not a
    # paragraph: raw (what a cold job pays) and minus-floor (steady-state).
    floor_s = bench.get("floor_launch_ms", 0.0) / 1000.0
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
        # a failed query carries the -1.0 sentinel in the bench detail file;
        # clamping it to 0.00 would silently IMPROVE the minus-floor subtotal
        # while the query's duck_s still counts — keep failures out of the
        # minus-floor column entirely (they already surface via n_failed)
        minus_floor = (max(0.0, spark_s - floor_s)
                       if spark_s is not None and spark_s >= 0 else None)
        rows.append((name, spark_s, best, ratio, minus_floor))
    print(f"{'query':28} {'spark_s':>8} {'-floor':>8} {'duck_s':>8} {'spark/duck':>10}")
    for name, s, d, r, mf in rows:
        ss = f"{s:8.2f}" if s is not None else "       -"
        mfs = f"{mf:8.2f}" if mf is not None else "       -"
        print(f"{name:28} {ss} {mfs} {d:8.2f} {r:10.1f}")

    def subtotal(label, pred):
        sub = [r for r in rows if pred(r[0])]
        ts = sum(r[1] for r in sub if r[1] and r[1] >= 0)  # -1.0 = failed sentinel
        tmf = sum(r[4] for r in sub if r[4] is not None)
        td = sum(r[2] for r in sub)
        print(f"{label:28} {ts:8.2f} {tmf:8.2f} {td:8.2f} "
              f"{ts/td if td else float('nan'):10.2f}"
              f"   (minus-floor ratio {tmf/td if td else float('nan'):.2f}, "
              f"{len(sub)} queries)")
        return {"label": label, "n": len(sub), "spark_s": round(ts, 3),
                "spark_s_minus_floor": round(tmf, 3),
                "duck_s": round(td, 3),
                "spark_over_duck": round(ts / td, 3) if td else None,
                "spark_over_duck_minus_floor":
                    round(tmf / td, 3) if td else None}
    subs = [
        subtotal("SUBTOTAL relational-core q*", lambda n: n.startswith("q")),
        subtotal("SUBTOTAL extension x*", lambda n: n.startswith("x")),
        subtotal("TOTAL (oracled only)", lambda n: True),
    ]
    if len(sys.argv) > 4:
        out = {
            "sf_dir": sf_dir, "bench_json": sys.argv[2],
            "calibration": {"duck_sentinel_s": round(duck_sentinel, 4),
                            **spark_floor},
            "queries": [{"name": n, "spark_s": s,
                         "spark_s_minus_floor":
                             round(mf, 4) if mf is not None else None,
                         "duck_s": round(d, 4),
                         "spark_over_duck": round(r, 3)}
                        for n, s, d, r, mf in rows],
            "subtotals": subs,
            "note": ("DuckDB side runs the ORACLE SQL — deliberately exact "
                     "spellings (recursive CTEs, all-pairs verify) for x*; "
                     "the relational-core q* subtotal is the fair "
                     "single-node throughput comparison."),
        }
        json.dump(out, open(sys.argv[4], "w"), indent=1)
        print(f"wrote {sys.argv[4]}")

if __name__ == "__main__":
    main()
