"""Driver-style hash gate: reads the Spark output with pyarrow (NOT duckdb)
and the oracle with duckdb.fetchdf, sorts columns by name, sorts rows,
renders every cell to str, and hashes — reproducing the driver's two-reader
setup that caught the q_part_decimal DECIMAL render divergence in r2.
Usage: python tools/check_oracle.py [sfDir] [outDir]
"""
import duckdb, json, glob, sys, hashlib
import pyarrow.parquet as pq

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","documents","embeddings","events"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def render(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("|".join(str(c) for c in row).encode())
        h.update(b"\n")
    return h.hexdigest()

oracle = json.load(open(f"{out}/oracle_sql.json"))
bad = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out}/{name}/*.parquet")
    sdf = pq.ParquetDataset(files).read().to_pandas()
    odf = con.execute(sql).fetchdf()
    status = "OK"
    if sorted(sdf.columns) != sorted(odf.columns):
        status = f"COLS {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    elif len(sdf) != len(odf):
        status = f"ROWS {len(sdf)} vs {len(odf)}"
    elif render(sdf) != render(odf):
        status = "HASH MISMATCH"
    if status != "OK":
        bad += 1
        print(f"{name}: {status} ({len(sdf)} rows)")
print(f"{'ALL GREEN' if bad == 0 else f'{bad} FAILED'} / {len(oracle)} oracle queries (driver-style str-render hash)")
