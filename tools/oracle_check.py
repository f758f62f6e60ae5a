#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: oracle_check.py <sfdir> <verify_outdir>

Reads <verify_outdir>/oracle_sql.json, registers the fixture parquet tables
as DuckDB views, runs each oracle SQL, and compares against the Spark result
parquet dumped by graft.Verify. Compare is strict: column names (sorted),
then row-by-row exact equality after sorting all rows by all columns.
Reports per-query PASS/FAIL with first differing cell.
"""
import sys, os, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (DataGen dirs): glob the parts
            src = f"read_parquet('{p}/*.parquet')"
        elif os.path.exists(p):
            src = f"read_parquet('{p}')"
        else:
            continue
        sel = "SELECT *"
        if t == "events":
            # DataGen writes ts as raw BIGINT nanos (the driver fixtures'
            # physical type); mirror Tables.load's nanos -> floor-us decode
            # so the ts-based oracles run unchanged on scale fixtures.
            types = {c[0]: c[1] for c in
                     con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()}
            if types.get("ts") == "BIGINT":
                sel = "SELECT * REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS {sel} FROM {src}")
    sqls = json.load(open(f"{outdir}/oracle_sql.json"))
    npass = nfail = 0
    for name in sorted(sqls):
        sql = sqls[name]
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"[MISS] {name}: no spark output"); nfail += 1; continue
        try:
            oracle = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"[OERR] {name}: oracle failed: {str(e)[:200]}"); nfail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetch_arrow_table()
        ocols, gcols = sorted(oracle.column_names), sorted(got.column_names)
        if ocols != gcols:
            print(f"[FAIL] {name}: columns oracle={ocols} spark={gcols}"); nfail += 1; continue
        # The driver's hash is strict about Arrow types (int32 vs int64 fails
        # even when values match) — surface width mismatches as warnings.
        for c in ocols:
            ot = str(oracle.schema.field(c).type)
            gt = str(got.schema.field(c).type)
            if ot != gt and {ot, gt} != {"timestamp[us]", "timestamp[ns]"}:
                print(f"[TYPE] {name}.{c}: oracle={ot} spark={gt}")
        orows = sorted([tuple(norm(r[c]) for c in ocols) for r in oracle.to_pylist()],
                       key=lambda t: tuple((x is None, str(x)) for x in t))
        grows = sorted([tuple(norm(r[c]) for c in gcols) for r in got.to_pylist()],
                       key=lambda t: tuple((x is None, str(x)) for x in t))
        if len(orows) != len(grows):
            print(f"[FAIL] {name}: rows oracle={len(orows)} spark={len(grows)}"); nfail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(orows, grows)):
            if a != b:
                for j, (x, y) in enumerate(zip(a, b)):
                    eq = (x == y)
                    if isinstance(x, float) and isinstance(y, float):
                        eq = (x == y) or (math.isnan(x) and math.isnan(y))
                    if not eq:
                        bad = (i, ocols[j], x, y); break
                if bad: break
        if bad:
            i, c, x, y = bad
            print(f"[FAIL] {name}: row {i} col {c}: oracle={x!r} spark={y!r}")
            nfail += 1
        else:
            print(f"[PASS] {name} ({len(orows)} rows)")
            npass += 1
    print(f"== {npass} pass / {nfail} fail ==")
    return 1 if nfail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
