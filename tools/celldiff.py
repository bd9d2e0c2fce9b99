#!/usr/bin/env python3
"""Cell-by-cell diff of a Verify output vs the DuckDB oracle, zero
normalization: exact Python repr of every value, plus arrow types.

Usage: python3 tools/celldiff.py <verify_out_dir> <sf_dir> <query>
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def load_spark(d):
    files = sorted(glob.glob(f"{d}/*.parquet"))
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files])

def main():
    out_dir, sf_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    ora = con.execute(sql).fetch_arrow_table()
    spk = load_spark(f"{out_dir}/{name}")
    print("spark schema:", {f.name: str(f.type) for f in spk.schema})
    print("oracle schema:", {f.name: str(f.type) for f in ora.schema})
    cols = sorted(set(spk.column_names) & set(ora.column_names))
    # sort rows identically: by full row repr
    def rows(tbl):
        data = {c: tbl.column(c).to_pylist() for c in cols}
        rs = [tuple(data[c][i] for c in cols) for i in range(tbl.num_rows)]
        return sorted(rs, key=lambda r: tuple(repr(x) for x in r))
    rs, ro = rows(spk), rows(ora)
    if len(rs) != len(ro):
        print(f"ROW COUNT spark={len(rs)} oracle={len(ro)}"); return
    ndiff = 0
    for i, (a, b) in enumerate(zip(rs, ro)):
        for c, va, vb in zip(cols, a, b):
            if repr(va) != repr(vb) or type(va) is not type(vb):
                ndiff += 1
                if ndiff <= 20:
                    print(f"row {i} col {c}: spark={va!r} ({type(va).__name__}) oracle={vb!r} ({type(vb).__name__})")
    print(f"total cell diffs: {ndiff} over {len(rs)} rows x {len(cols)} cols")

if __name__ == "__main__":
    main()
