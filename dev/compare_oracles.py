#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare (see VERDICT/
CORRECTNESS): for each query with an oracle, load the Spark parquet
result and the DuckDB result of the oracle SQL over the same sf tables,
sort columns by name, sort rows, and hash. Usage:
    python3 dev/compare_oracles.py /tmp/verify_r2 /root/testdata/sf0.01 [query ...]
"""
import sys, json, glob, hashlib
import duckdb, pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def h(df):
    return hashlib.sha256(df.to_csv(index=False, float_format="%.10g").encode()).hexdigest()[:12]

fails = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    try:
        spark = pd.concat([pd.read_parquet(p) for p in
                           sorted(glob.glob(f"{outdir}/{name}/*.parquet"))])
        duck = con.execute(oracle[name]).df()
        s, d = canon(spark), canon(duck)
        rows = len(s) == len(d)
        schema = list(s.columns) == list(d.columns)
        # normalize dtypes for hashing: driver compares values
        hs, hd = h(s), h(d)
        ok = rows and schema and hs == hd
        print(f"{name}: rows={rows}({len(s)}/{len(d)}) schema={schema} hash={hs==hd}"
              + ("" if ok else " <-- FAIL"))
        if not ok:
            fails += 1
            if not schema:
                print("  spark cols:", list(s.columns), "dtypes:", list(map(str, s.dtypes)))
                print("  duck  cols:", list(d.columns), "dtypes:", list(map(str, d.dtypes)))
            if rows and schema and hs != hd:
                neq = (s != d) & ~(s.isna() & d.isna())
                bad = neq.any(axis=1)
                print("  first diffs:")
                print(pd.concat([s[bad].head(3).add_suffix("_spark"),
                                 d[bad].head(3).add_suffix("_duck")], axis=1))
    except Exception as e:
        fails += 1
        print(f"{name}: ERR {str(e).splitlines()[0] if str(e) else type(e)}")
print("FAILS:", fails)
