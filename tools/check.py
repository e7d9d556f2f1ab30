#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables, load the Spark result parquet, and
compare the way the driver does — both sides materialized into pandas,
columns sorted by name, then (a) per-column DTYPE equality and (b) sorted
multiset of canonicalized rows.

The dtype leg is the load-bearing part: the driver hashes typed pandas
values, so a DuckDB HUGEINT (sum(BIGINT)) that pandas materializes as
float64 mismatches a Spark int64 parquet column even when every value is
equal. Earlier versions of this script canonicalized through str() and
passed what the driver failed (r10 q154, r11 m05/m06/m08/t24). Now both
sides go through pandas exactly like the driver and int-vs-float column
dtype differences are a FAIL.

Usage: check.py <sfdir> <verify_outdir> [only_prefix...]
       check.py --selftest
"""
import sys, json, math, glob, os
import duckdb
import pandas as pd

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

def dtype_class(dt):
    """Collapse a pandas dtype to the class the driver's typed hash is
    sensitive to: int vs float vs bool vs datetime vs everything-else."""
    s = str(dt)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith("bool"):
        return "bool"
    if s.startswith("datetime"):
        return "datetime"
    return "other"

def df_rows_key(df):
    cols = sorted(df.columns)
    rows = df[cols].itertuples(index=False, name=None)
    return sorted(tuple(canon(v) for v in r) for r in rows)

def load_spark(con, path):
    # Through DuckDB like the driver (pandas.read_parquet would give DATE
    # columns object dtype and false-positive the dtype leg on every
    # driver-green date query — q34/q74/q108).
    files = sorted(glob.glob(f"{path}/*.parquet"))
    return con.execute(f"SELECT * FROM read_parquet({files!r})").df()

def compare(name, sdf, wdf):
    """Returns (ok, reason). Driver-faithful: schema by sorted names,
    per-column dtype class, then canonicalized sorted-row multiset."""
    if sorted(sdf.columns) != sorted(wdf.columns):
        return False, (f"SCHEMA-MISMATCH spark={sorted(sdf.columns)} "
                       f"duck={sorted(wdf.columns)}")
    for c in sorted(sdf.columns):
        sc, wc = dtype_class(sdf[c].dtype), dtype_class(wdf[c].dtype)
        # A column that is all-NULL on either side floats up in pandas;
        # int-vs-float is only meaningful when both sides have values.
        if sc != wc and not (sdf[c].isna().all() or wdf[c].isna().all()):
            return False, (f"DTYPE-MISMATCH col={c} spark={sdf[c].dtype} "
                           f"duck={wdf[c].dtype}")
    gk, wk = df_rows_key(sdf), df_rows_key(wdf)
    if gk != wk:
        detail = []
        sg, sw = set(gk), set(wk)
        for r in list(sg - sw)[:3]:
            detail.append(f"    spark-only: {r}")
        for r in list(sw - sg)[:3]:
            detail.append(f"    duck-only:  {r}")
        return False, (f"HASH-MISMATCH spark_rows={len(gk)} "
                       f"duck_rows={len(wk)}\n" + "\n".join(detail))
    return True, f"rows={len(gk)}"

def main(sfdir, outdir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, name)
        if not os.path.isdir(path):
            continue
        if only and not any(name.startswith(p) for p in only):
            continue
        sdf = load_spark(con, path)
        if name not in oracle:
            print(f"{name:24s} rows-only  rows={len(sdf)}")
            continue
        try:
            wdf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name:24s} ORACLE-ERR {str(e)[:120]}")
            fail += 1
            continue
        good, reason = compare(name, sdf, wdf)
        if good:
            ok += 1
            print(f"{name:24s} OK {reason}")
        else:
            fail += 1
            print(f"{name:24s} {reason}")
    print(f"\n{ok} OK, {fail} FAIL")
    return fail

def selftest():
    """Assert the dtype leg catches the exact r11 failure mode: DuckDB
    sum(BIGINT) -> HUGEINT -> pandas float64 vs a Spark-side int64."""
    con = duckdb.connect()
    spark_side = pd.DataFrame({"k": pd.array([1, 2], dtype="int64"),
                               "s": pd.array([10, 20], dtype="int64")})
    duck_side = con.execute(
        "SELECT k, sum(v) AS s FROM (VALUES (1, 10), (2, 20)) t(k, v) "
        "GROUP BY k ORDER BY k").df()
    assert dtype_class(duck_side["s"].dtype) == "float", \
        f"expected HUGEINT->float64, got {duck_side['s'].dtype}"
    good, reason = compare("hugeint", spark_side, duck_side)
    assert not good and "DTYPE-MISMATCH" in reason, \
        f"HUGEINT dtype artifact NOT caught: good={good} reason={reason}"
    duck_cast = con.execute(
        "SELECT k, CAST(sum(v) AS BIGINT) AS s "
        "FROM (VALUES (1, 10), (2, 20)) t(k, v) GROUP BY k ORDER BY k").df()
    good2, reason2 = compare("hugeint_cast", spark_side, duck_cast)
    assert good2, f"cast-to-BIGINT oracle should pass: {reason2}"
    print("selftest OK: HUGEINT dtype artifact caught; BIGINT cast passes")

if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
        sys.exit(0)
    sys.exit(1 if main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])) else 0)
