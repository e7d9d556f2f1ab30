#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables, load the Spark result parquet, and
compare as sorted multisets of rows (columns sorted by name, values
canonicalized). Usage: check.py <sfdir> <verify_outdir>
"""
import sys, json, math, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)

def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, name)
        if not os.path.isdir(path):
            continue
        files = glob.glob(f"{path}/*.parquet")
        got = con.execute(f"SELECT * FROM read_parquet({files!r})")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        if name not in oracle:
            print(f"{name:24s} rows-only  rows={len(grows)} {'OK' if len(grows) >= 0 else ''}")
            continue
        try:
            want = con.execute(oracle[name])
            wcols = [d[0] for d in want.description]
            wrows = want.fetchall()
        except Exception as e:
            print(f"{name:24s} ORACLE-ERR {str(e)[:120]}")
            fail += 1
            continue
        schema_ok = sorted(gcols) == sorted(wcols)
        if not schema_ok:
            print(f"{name:24s} SCHEMA-MISMATCH spark={sorted(gcols)} duck={sorted(wcols)}")
            fail += 1
            continue
        gk, wk = rows_key(gcols, grows), rows_key(wcols, wrows)
        if gk == wk:
            ok += 1
            print(f"{name:24s} OK rows={len(grows)}")
        else:
            fail += 1
            print(f"{name:24s} HASH-MISMATCH spark_rows={len(grows)} duck_rows={len(wrows)}")
            sg, sw = set(gk), set(wk)
            for r in list(sg - sw)[:3]:
                print(f"    spark-only: {r}")
            for r in list(sw - sg)[:3]:
                print(f"    duck-only:  {r}")
    print(f"\n{ok} OK, {fail} FAIL")
    return fail

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
