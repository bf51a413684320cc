"""Driver-style hash gate: reads the Spark output with pyarrow (NOT duckdb)
and the oracle with duckdb.fetchdf, sorts columns by name, sorts rows,
renders every cell to str, and hashes — reproducing the driver's two-reader
setup that caught the q_part_decimal DECIMAL render divergence in r2.
Usage: python tools/check_oracle.py [sfDir] [outDir]
"""
import duckdb, json, glob, os, sys, hashlib
import pyarrow.parquet as pq

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","documents","embeddings","events"]:
    # driver fixtures are single pyarrow files; scale fixtures (sf1) are
    # Spark-written DIRECTORIES of part files - glob those
    path = f"{sf}/{t}.parquet"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

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
rows = {}
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
    rows[name] = {
        "rows_match": len(sdf) == len(odf),
        "schema_match": sorted(sdf.columns) == sorted(odf.columns),
        "hash_match": status == "OK",
        "spark_rows": len(sdf), "oracle_rows": len(odf),
        "err": None if status == "OK" else status,
    }
    if status != "OK":
        bad += 1
        print(f"{name}: {status} ({len(sdf)} rows)")
if len(sys.argv) > 3:  # optional: driver-style JSON artifact path
    json.dump(rows, open(sys.argv[3], "w"), indent=2)
print(f"{'ALL GREEN' if bad == 0 else f'{bad} FAILED'} / {len(oracle)} oracle queries (driver-style str-render hash)")
