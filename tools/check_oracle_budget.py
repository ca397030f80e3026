#!/usr/bin/env python3
"""check_oracle.py with a per-query wall-clock budget — for scale-factor
confidence runs (sf1+) where a handful of deliberately-quadratic DuckDB
oracles (brute-force yardsticks like q33/q82, all-pairs shingle joins
like q21) are infeasible to replay at full size. Each oracle runs in its
own subprocess with a hard timeout (SIGALRM cannot interrupt DuckDB's
C++ execution); queries whose ORACLE exceeds the budget are reported as
ORACLE_TIMEOUT (the Spark side already produced its result; the oracle
replay is the bottleneck) and listed separately from real failures.

Usage: python3 tools/check_oracle_budget.py <sfdir> <outdir> [budget_s=180] [json_out]

With json_out, also writes a machine-checkable per-query record
(r9 verdict #4: "hash-green at sf1" should be an artifact, not prose):
{"_meta": {...}, "<query>": {"status": "OK|ORACLE_TIMEOUT|...", "detail": ...}}
"""
import json, multiprocessing as mp, subprocess, sys

sf = sys.argv[1]
out = sys.argv[2]
budget = int(sys.argv[3]) if len(sys.argv) > 3 else 180
json_out = sys.argv[4] if len(sys.argv) > 4 else None


def check_one(name, sql, q):
    """Runs in a subprocess: replay the oracle, compare, report."""
    import duckdb, glob, os
    import pandas as pd

    def canon(df):
        df = df[sorted(df.columns)]
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    files = glob.glob(f'{out}/{name}/*.parquet')
    if not files:
        q.put((name, 'NO_SPARK_OUTPUT', ''))
        return
    sdf = pd.concat([pd.read_parquet(f) for f in files])
    con = duckdb.connect()
    for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
              'lineitem', 'events', 'documents', 'embeddings']:
        # testdata tables are single files; Spark-generated scale dirs
        # (ScaleDataGen) are directories of part files
        path = f'{sf}/{t}.parquet'
        pat = f'{path}/*.parquet' if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    try:
        ddf = con.execute(sql).df()
    except Exception as e:
        q.put((name, 'ORACLE_ERROR', str(e)[:200]))
        return
    s, d = canon(sdf), canon(ddf)
    if list(s.columns) != list(d.columns):
        q.put((name, 'COLUMN_MISMATCH',
               f'spark={list(s.columns)} duck={list(d.columns)}'))
        return
    if len(s) != len(d):
        q.put((name, 'ROWCOUNT', f'spark={len(s)} duck={len(d)}'))
        return
    for c in s.columns:
        a, b = s[c], d[c]
        if not (a.astype(str).values == b.astype(str).values).all():
            ok = False
            try:
                af = a.astype(float).values
                bf = b.astype(float).values
                ok = not (abs(af - bf) > 1e-9).any()
            except (ValueError, TypeError):
                pass
            if not ok:
                q.put((name, 'VALUE_MISMATCH', c))
                return
    q.put((name, 'OK', f'{len(s)} rows'))


if __name__ == '__main__':
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    fails, timeouts = [], []
    record = {}
    for name in sorted(oracle):
        q = mp.Queue()
        p = mp.Process(target=check_one, args=(name, oracle[name], q))
        p.start()
        p.join(budget)
        if p.is_alive():
            p.terminate()
            p.join()
            print(f'{name}: ORACLE_TIMEOUT (> {budget}s)', flush=True)
            timeouts.append(name)
            record[name] = {'status': 'ORACLE_TIMEOUT', 'detail': f'> {budget}s'}
            continue
        try:
            n, status, detail = q.get_nowait()
        except Exception:
            print(f'{name}: WORKER_DIED (exit {p.exitcode})', flush=True)
            fails.append(name)
            record[name] = {'status': 'WORKER_DIED', 'detail': f'exit {p.exitcode}'}
            continue
        print(f'{n}: {status} {detail}'.rstrip(), flush=True)
        record[name] = {'status': status, 'detail': detail}
        if status != 'OK':
            fails.append(name)

    print(f'\nFAILS: {fails if fails else "none"}')
    print(f'ORACLE_TIMEOUTS (oracle infeasible at this sf, Spark result '
          f'produced): {timeouts if timeouts else "none"}')
    if json_out:
        try:
            sha = subprocess.run(['git', 'rev-parse', 'HEAD'],
                                 capture_output=True, text=True).stdout.strip()
        except Exception:
            sha = 'unknown'
        meta = {'sf_dir': sf, 'budget_s': budget, 'git_head': sha,
                'n_queries': len(record),
                'n_ok': sum(1 for r in record.values() if r['status'] == 'OK'),
                'n_fail': len(fails), 'n_oracle_timeout': len(timeouts)}
        with open(json_out, 'w') as f:
            json.dump({'_meta': meta, **record}, f, indent=1)
        print(f'wrote {json_out}')
    sys.exit(1 if fails else 0)
