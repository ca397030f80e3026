import duckdb, glob, json, sys, math
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f'{out}/oracle_sql.json'))
def canon(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = []
for name in sorted(oracle):
    files = glob.glob(f'{out}/{name}/*.parquet')
    if not files:
        print(f'{name}: NO SPARK OUTPUT'); fails.append(name); continue
    sdf = pd.concat([pd.read_parquet(f) for f in files])
    ddf = con.execute(oracle[name]).df()
    s, d = canon(sdf), canon(ddf)
    if list(s.columns) != list(d.columns):
        print(f'{name}: COLUMN MISMATCH spark={list(s.columns)} duck={list(d.columns)}'); fails.append(name); continue
    if len(s) != len(d):
        print(f'{name}: ROWCOUNT spark={len(s)} duck={len(d)}'); fails.append(name); continue
    ok = True
    for c in s.columns:
      try:
        a, b = s[c], d[c]
        # STRICT: mimic the driver's exact hash compare — stringified
        # values must match bit-for-bit. A DuckDB HUGEINT (sum of ints)
        # comes back as float ("1.0" vs spark's "1") and MUST flag here.
        astr = a.astype(str).values
        bstr = b.astype(str).values
        if not (astr == bstr).all():
            mism = (astr != bstr)
            near = ''
            if a.dtype.kind == 'f' and b.dtype.kind == 'f':
                if (abs(a.fillna(-9e9).values - b.fillna(-9e9).values) < 1e-9).all():
                    near = ' (within 1e-9 — ulp/format drift, still a driver FAIL)'
            print(f'{name}: VALUE MISMATCH col {c}{near}')
            print('  spark:', a[mism].head(3).tolist(), ' duck:', b[mism].head(3).tolist())
            print('  dtypes: spark', a.dtype, 'duck', b.dtype)
            ok = False
      except Exception as e:
        # dtype mismatch (e.g. object vs float) must flag THIS query, not
        # abort the whole oracle sweep
        print(f'{name}: COMPARE ERROR col {c}: {e}'); ok = False
    if not ok: fails.append(name)
    else: print(f'{name}: OK ({len(s)} rows)')
print('FAILS:', fails if fails else 'none')
