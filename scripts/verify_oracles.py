"""Full correctness gate: run EVERY oracle-backed queries() entry against
its DuckDB oracle on one sf dir (default sf0.01) and report per-query
rows/hash status — the same comparison shape the round driver applies.

    PYTHONPATH=/root/repo python scripts/verify_oracles.py [sf_dir]
"""
import json, sys, time
import ray, duckdb, pandas as pd, pyarrow as pa
ray.init(address='local', num_cpus=16, include_dashboard=False, logging_level='ERROR')
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as E
qs, osql = E.queries(), E.oracle_sql()
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in 'region nation customer supplier part orders lineitem events documents embeddings'.split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
results = {}
for name, fn in qs.items():
    if name not in osql:
        continue
    t0 = time.time()
    try:
        res = fn(sf)
        if isinstance(res, pd.DataFrame):
            df = res
        elif isinstance(res, pa.Table):
            df = res.to_pandas()
        else:
            tabs = [b for b in res.iter_batches(batch_format='pyarrow') if b.num_rows]
            df = (pa.concat_tables(tabs, promote_options='default').to_pandas()
                  if tabs else pd.DataFrame())
        odf = con.execute(osql[name]).df()
        cols = sorted(odf.columns)
        # a correctly-empty Ray result may be a columnless DataFrame (no
        # non-empty batches) — project it onto the oracle's columns so the
        # 0-row compare is apples-to-apples instead of a false BAD
        a = (df[cols].sort_values(cols).reset_index(drop=True) if len(df)
             else odf.iloc[0:0][cols].reset_index(drop=True))
        b = odf[cols].sort_values(cols).reset_index(drop=True)
        ok_rows = len(a) == len(b)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
            ok_hash = True
        except Exception:
            ok_hash = False
        results[name] = {'rows': ok_rows, 'hash': ok_hash, 'n': len(a), 'sec': round(time.time()-t0, 2)}
    except Exception as e:
        results[name] = {'err': f'{type(e).__name__}: {str(e)[:150]}'}
    status = results[name]
    flag = 'OK' if status.get('hash') else 'BAD'
    print(flag, name, json.dumps(status), flush=True)
bad = [k for k, v in results.items() if not v.get('hash')]
print('TOTAL', len(results), 'BAD', len(bad), bad, flush=True)
ray.shutdown()
