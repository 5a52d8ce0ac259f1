#!/usr/bin/env python3
"""Local mirror of the driver's t2 gate: compare Verify's parquet dumps
against SparkEntry.oracleSql run in DuckDB over the same sf dir."""
import sys, json, math
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        scols = sorted(spark_rel.columns)
        sdf = spark_rel.df()[scols]
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}"); fails += 1; continue
    try:
        duck_rel = con.sql(sql)
        dcols = sorted(duck_rel.columns)
        ddf = duck_rel.df()[dcols] if dcols == scols else None
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    if dcols != scols:
        print(f"FAIL {name}: columns differ spark={scols} duck={dcols}"); fails += 1; continue
    sd = {c: str(t) for c, t in sdf.dtypes.items()}
    dd = {c: str(t) for c, t in ddf.dtypes.items()}
    dtdiff = {c: (sd[c], dd[c]) for c in sd if sd[c] != dd[c]}
    if dtdiff:
        print(f"FAIL {name}: dtypes differ {dtdiff}"); fails += 1; continue
    if len(sdf) != len(ddf):
        print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}"); fails += 1; continue
    bad = None
    for c in scols:
        sv, dv = sdf[c].tolist(), ddf[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            eq = (a == b) or (a is None and b is None)
            if not eq:
                try:
                    if isinstance(a, float) and isinstance(b, float):
                        eq = (math.isnan(a) and math.isnan(b)) or a == b
                except Exception:
                    pass
            if not eq:
                # pandas NaN for nulls
                try:
                    if (a != a) and (b != b): eq = True
                    elif (a != a) or (b != b): eq = False
                except Exception: pass
            if not eq:
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: first diff col={c} row={i} spark={a!r} duck={b!r}"); fails += 1
    else:
        print(f"OK   {name}: {len(sdf)} rows")
print(f"\n{len(oracle)-fails}/{len(oracle)} oracle queries match")
# rows-only queries
import os
for name in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, name)
    if os.path.isdir(p) and name not in oracle:
        n = con.sql(f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
        print(f"ROWS {name}: {n}")
