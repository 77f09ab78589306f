#!/usr/bin/env python3
"""Replicates the driver's correctness gate locally: for each query
output written by graft.Verify, run the corresponding oracle SQL in
DuckDB over the same sf tables and compare row count, column names, and
values (rows sorted, columns sorted by name — per the driver contract).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    # wrap as (null_flag, comparable) so rows with NULLs still sort
    if v is None:
        return (0, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "NaN")
        return (1, v)
    if hasattr(v, "isoformat"):
        return (1, v.isoformat())
    if isinstance(v, (list, tuple)):
        return (1, tuple(canon(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return (1, v.hex())
    return (1, v)

def table_rows(con, sql):
    # Relation API, not DBAPI cursor.description: DBAPI type codes
    # collapse HUGEINT/BIGINT/INTEGER/DOUBLE to one generic 'NUMBER',
    # which can never catch the window-SUM HUGEINT-vs-BIGINT class the
    # type gate exists for. rel.types carries the real DuckDB names.
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [str(t) for t in rel.types]
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    sorted_types = [types[i] for i in order]
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return sorted_cols, sorted_types, out

def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    results = {}
    import glob, os
    produced = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)}
    for name in sorted(produced):
        spark_sql = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
        try:
            scols, stypes, srows = table_rows(con, spark_sql)
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(srows)} rows)" if srows else "ROWS-ONLY-EMPTY"
            continue
        try:
            ocols, otypes, orows = table_rows(con, oracle[name])
        except Exception as e:
            results[name] = f"ORACLE-FAIL {e}"
            continue
        if scols != ocols:
            results[name] = f"SCHEMA-MISMATCH spark={scols} oracle={ocols}"
        # The driver hashes typed values, so a value-identical result with a
        # different oracle type (e.g. DuckDB window-SUM HUGEINT vs Spark
        # BIGINT) still fails there. Catch it here too.
        elif stypes != otypes:
            bad = [(c, s, o) for c, s, o in zip(scols, stypes, otypes) if s != o]
            results[name] = f"TYPE-MISMATCH {bad}"
        elif len(srows) != len(orows):
            results[name] = f"ROWCOUNT spark={len(srows)} oracle={len(orows)}"
        elif srows != orows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            results[name] = (f"VALUE-MISMATCH first at sorted row {bad}: "
                             f"spark={srows[bad]} oracle={orows[bad]}")
        else:
            results[name] = f"OK ({len(srows)} rows)"
    missing = set(oracle) - produced
    for name in missing:
        results[name] = "NO-OUTPUT"
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "rows-only")))
    for name in sorted(results):
        print(f"{'PASS' if results[name].startswith(('OK','rows-only')) else 'FAIL':4} {name}: {results[name]}")
    print(f"\n{n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1

def selftest():
    """The type gate must see real DuckDB type names — assert the exact
    regression it was added for: SUM(x) OVER () types as HUGEINT,
    distinct from an explicit BIGINT."""
    con = duckdb.connect()
    win = [str(t) for t in
           con.sql("SELECT SUM(x) OVER () AS s FROM (VALUES (1),(2)) t(x)").types]
    assert win == ["HUGEINT"], f"window SUM should be HUGEINT, got {win}"
    big = [str(t) for t in con.sql("SELECT CAST(SUM(x) AS BIGINT) AS s "
                                   "FROM (VALUES (1),(2)) t(x)").types]
    assert big == ["BIGINT"], f"CAST should be BIGINT, got {big}"
    assert win != big
    print("selftest OK: window SUM seen as HUGEINT, distinct from BIGINT")
    return 0

if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
