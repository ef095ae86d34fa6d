#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result, run the
matching oracle SQL from oracle_sql.json in DuckDB over views of the sfDir
tables, and compare rows/schema/values (columns sorted by name, rows sorted,
values canonicalized). Exit nonzero if any query mismatches.

Driver-side tooling only — the Scala engine never depends on this.
"""
import sys, os, json, math, glob
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr keeps full double precision; bit-identical doubles compare equal
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def table_rows(tbl):
    cols = sorted(tbl.column_names)
    pylist = tbl.select(cols).to_pylist()
    return cols, sorted(tuple(canon(r[c]) for c in cols) for r in pylist)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # tolerate partial table dirs (e.g. the ScaleStress corpus carries
        # only documents.parquet); a query whose oracle needs a missing
        # table still fails loudly at execution
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    import pyarrow.parquet as pq
    import pyarrow as pa
    failures = []
    # Queries that errored in graft.Verify (recorded since round 8) and
    # oracled queries with no output dir at all — both are hard failures:
    # a missing row must never read as green.
    err_path = os.path.join(out_dir, "errors.json")
    run_errors = json.load(open(err_path)) if os.path.exists(err_path) else {}
    for name, msg in sorted(run_errors.items()):
        print(f"{name}: VERIFY ERROR: {msg[:160]}")
        failures.append(name)
    man_path = os.path.join(out_dir, "manifest.json")
    attempted = set(json.load(open(man_path))) if os.path.exists(man_path) \
        else set(oracle)
    for name in sorted(set(oracle) & attempted):
        if name not in run_errors and not os.path.isdir(os.path.join(out_dir, name)):
            print(f"{name}: MISSING OUTPUT (oracled but never dumped)")
            failures.append(name)
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        spark_tbl = pa.concat_tables([pq.read_table(f) for f in files]) if files else None
        if name not in oracle:
            n = spark_tbl.num_rows if spark_tbl is not None else 0
            status = "ROWS-ONLY ok" if n > 0 else "ROWS-ONLY EMPTY"
            print(f"{name}: {status} ({n} rows)")
            if n == 0:
                failures.append(name)
            continue
        try:
            duck_tbl = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures.append(name)
            continue
        scols, srows = table_rows(spark_tbl)
        dcols, drows = table_rows(duck_tbl)
        if scols != dcols:
            print(f"{name}: COLUMN MISMATCH spark={scols} duck={dcols}")
            failures.append(name)
            continue
        # The driver's gate hashes through pandas, where DuckDB HUGEINT
        # (arrow decimal128) becomes float64 and hash-mismatches Spark's
        # int64 even when every value prints identically. str()-canon can't
        # see that, so flag any decimal-typed oracle column whose Spark twin
        # is an integer/float as a hard failure here.
        import pyarrow.types as pat
        tmix = []
        for c in scols:
            st, dt = spark_tbl.schema.field(c).type, duck_tbl.schema.field(c).type
            if pat.is_decimal(dt) and not pat.is_decimal(st):
                tmix.append(f"{c}: spark={st} duck={dt} (HUGEINT? add outer CAST AS BIGINT)")
        if tmix:
            print(f"{name}: ORACLE TYPE DRIFT " + "; ".join(tmix))
            failures.append(name)
            continue
        if len(srows) != len(drows):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(srows)} duck={len(drows)}")
            failures.append(name)
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"{name}: VALUE MISMATCH ({len(bad)}/{len(srows)} rows) first@{i}:")
            print(f"  cols : {scols}")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            failures.append(name)
        else:
            print(f"{name}: OK ({len(srows)} rows, {len(scols)} cols)")
    if failures:
        print(f"\nFAILED: {failures}")
        sys.exit(1)
    print("\nALL OK")

if __name__ == "__main__":
    main()
