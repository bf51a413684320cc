"""Scale-gate harness: driver-style hash compare of a graft.Verify output
dir against the DuckDB oracles it dumped, written as a CORRECTNESS-shaped
JSON dict ({query: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}).

Same two-reader discipline as check_oracle.py (Spark output via pyarrow,
oracle via duckdb.fetchdf, columns sorted by name, rows sorted, every cell
str-rendered, sha256) — the setup that caught the q_part_decimal DECIMAL
render divergence in r2.

Usage: python tools/check_scale.py <sfDir> <verifyOutDir> <resultJson> [only,names]
"""
import duckdb, json, glob, os, sys, hashlib
import pyarrow.parquet as pq

sf, out, result = sys.argv[1], sys.argv[2], sys.argv[3]
only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings", "events"]:
    path = f"{sf}/{t}.parquet"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")


def render(df):
    # Byte-stream-identical to the original per-row loop (cells
    # str()-rendered, |-joined, \n-terminated, after the same sorts) but
    # vectorized: the itertuples loop costs ~30 min on a 60M-row sf10
    # relation; Series.map(str) + string concat is ~20x faster and
    # applies the SAME str() to the same numpy scalars on BOTH readers,
    # so the r2 DECIMAL-divergence sensitivity is preserved.
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256()
    if len(df) == 0:
        return h.hexdigest()
    cols = [df[c].map(str) for c in df.columns]
    joined = cols[0]
    for c in cols[1:]:
        joined = joined + "|" + c
    for start in range(0, len(joined), 2_000_000):
        part = joined.iloc[start:start + 2_000_000]
        h.update(("\n".join(part.tolist()) + "\n").encode())
    return h.hexdigest()


oracle = json.load(open(f"{out}/oracle_sql.json"))
rows = {}
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": 0, "oracle_rows": 0, "err": None}
    try:
        files = glob.glob(f"{out}/{name}/*.parquet")
        sdf = pq.ParquetDataset(files).read().to_pandas()
        odf = con.execute(sql).fetchdf()
        rec["spark_rows"], rec["oracle_rows"] = len(sdf), len(odf)
        if sorted(sdf.columns) != sorted(odf.columns):
            rec["err"] = f"COLS {sorted(sdf.columns)} vs {sorted(odf.columns)}"
        else:
            rec["schema_match"] = True
            if len(sdf) != len(odf):
                rec["err"] = f"ROWS {len(sdf)} vs {len(odf)}"
            else:
                rec["rows_match"] = True
                if render(sdf) == render(odf):
                    rec["hash_match"] = True
                else:
                    rec["err"] = "HASH MISMATCH"
    except Exception as e:
        rec["err"] = f"{type(e).__name__}: {e}"[:300]
    rows[name] = rec
    print(name, "OK" if rec["hash_match"] else rec["err"], flush=True)

json.dump(rows, open(result, "w"), indent=2, sort_keys=True)
green = sum(1 for r in rows.values() if r["hash_match"])
print(f"{green}/{len(rows)} hash-green -> {result}")
