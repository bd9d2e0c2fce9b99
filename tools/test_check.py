#!/usr/bin/env python3
"""Self-test for tools/check.py's first-diff artifact (r12): a FAIL must
leave <out>/<name>.diff.txt naming the divergent row/column and both
engines' rendered cells. Run: python3 tools/test_check.py (exit 0 = pass).

Exercises three FAIL classes (hash, rows, columns) plus a PASS control,
all against self-contained oracle SQL (no sf tables needed)."""
import json, os, subprocess, sys, tempfile

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))


def dump(out, name, tbl):
    os.makedirs(f"{out}/{name}", exist_ok=True)
    pq.write_table(tbl, f"{out}/{name}/part-0.parquet")


def main():
    out = tempfile.mkdtemp(prefix="check_selftest_")
    sf = tempfile.mkdtemp(prefix="check_selftest_sf_")  # no tables: fine
    # hash mismatch: row 1's v differs (20 vs 21)
    dump(out, "t_hash", pa.table({"k": pa.array([1, 2], pa.int64()),
                                  "v": pa.array([10, 20], pa.int64())}))
    # row-count mismatch: spark has an extra row
    dump(out, "t_rows", pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
    # column mismatch: spark column named wrong
    dump(out, "t_cols", pa.table({"wrong": pa.array([1], pa.int64())}))
    # control: identical
    dump(out, "t_pass", pa.table({"k": pa.array([7], pa.int64())}))
    oracle = {
        "t_hash": "SELECT * FROM (VALUES (CAST(1 AS BIGINT), CAST(10 AS BIGINT)),"
                  " (2, 21)) AS t(k, v) ORDER BY k",
        "t_rows": "SELECT * FROM (VALUES (CAST(1 AS BIGINT)), (2)) AS t(k) ORDER BY k",
        "t_cols": "SELECT CAST(1 AS BIGINT) AS k",
        "t_pass": "SELECT CAST(7 AS BIGINT) AS k",
    }
    with open(f"{out}/oracle_sql.json", "w") as f:
        json.dump(oracle, f)

    r = subprocess.run([sys.executable, f"{HERE}/check.py", out, sf],
                       capture_output=True, text=True)
    assert r.returncode == 1, (r.stdout, r.stderr)
    assert "PASS t_pass" in r.stdout, r.stdout
    assert "== 1 pass, 3 fail ==" in r.stdout, r.stdout

    dt = open(f"{out}/t_hash.diff.txt").read()
    assert "fail: hash" in dt and "columns ['v']" in dt, dt
    assert "spark=int:20" in dt.replace("\n", " ") and "duck =int:21" in dt, dt
    assert not os.path.exists(f"{out}/t_pass.diff.txt")
    assert "fail: rows" in open(f"{out}/t_rows.diff.txt").read()
    assert "fail: columns" in open(f"{out}/t_cols.diff.txt").read()
    print("check.py first-diff self-test: PASS")


if __name__ == "__main__":
    main()
