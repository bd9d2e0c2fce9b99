#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads <verify_out_dir>/<name>/ parquet (Spark output) and oracle_sql.json,
runs each oracle SQL in DuckDB against the sf parquet tables, and compares:
row count, column names (sorted), and a value hash with columns sorted by
name and rows sorted by all columns.
Dev-only tool; the shipped library is the Scala code under src/.
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm_cell(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if v != v: return "NaN"
        if v == 0.0: return "0"  # collapse -0.0 / 0.0
        return repr(v)  # full round-trip precision: local PASS predicts driver PASS
    if isinstance(v, bytes): return v.hex()
    import datetime
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        # tz-aware (Spark LTZ parquet) vs naive (DuckDB) render differently;
        # session TZ is UTC so strip tzinfo for a fair instant compare.
        return str(v.replace(tzinfo=None))
    return str(v)

def table_hash(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    rows = []
    data = {c: tbl.column(c).to_pylist() for c in cols}
    n = tbl.num_rows
    for i in range(n):
        rows.append("\x01".join(norm_cell(data[c][i]) for c in cols))
    rows.sort()
    h = hashlib.sha256()
    for r in rows: h.update(r.encode()); h.update(b"\n")
    return h.hexdigest(), cols, n

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        stbl = pq.read_table(spark_dir)
        try:
            dtbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        sh, scols, sn = table_hash(stbl)
        dh, dcols, dn = table_hash(dtbl)
        if scols != dcols:
            print(f"FAIL {name}: cols spark={scols} duck={dcols}"); n_fail += 1
        elif sn != dn:
            print(f"FAIL {name}: rows spark={sn} duck={dn}"); n_fail += 1
        elif sh != dh:
            print(f"FAIL {name}: hash mismatch ({sn} rows)")
            # show first diff
            srows = sorted("\x01".join(norm_cell(x) for x in row) for row in zip(*[stbl.column(c).to_pylist() for c in scols]))
            drows = sorted("\x01".join(norm_cell(x) for x in row) for row in zip(*[dtbl.column(c).to_pylist() for c in dcols]))
            for a, b in zip(srows, drows):
                if a != b:
                    print(f"  spark: {a.replace(chr(1), ' | ')}")
                    print(f"  duck : {b.replace(chr(1), ' | ')}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({sn} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
