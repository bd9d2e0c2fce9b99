#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads <verify_out_dir>/<name>/ parquet (Spark output) and oracle_sql.json,
runs each oracle SQL in DuckDB against the sf parquet tables, and compares:
row count, column names (sorted), arrow TYPES per column, and a
type-tagged value hash with columns sorted by name and rows in DELIVERED
order (round-11 hardening: the driver's hash is order-sensitive, and the
old row-sort here is exactly what let the r10 q_bm25_topk red cell ship —
value-identical rows, nondeterministic order, local PASS / driver FAIL.
Every entry carries a total ORDER BY, so delivered order must agree).

STRICT by design (round-3 hardening): the round-2 version stripped tzinfo,
collapsed -0.0 and ignored arrow types, which hid exactly the deltas the
driver checks (LTZ vs naive timestamps, HUGEINT vs BIGINT sums, decimal
scale). A local PASS must predict a driver PASS, so types are now part of
both the schema check and the cell normalization.

CHECK_CC_MODE=invariants switches q_dedup_components to the bounded
structural-invariant oracle (tools/cc_invariants.py) instead of the SQL
compare — the wired fallback for scales/corpora where even the r9
inverted-index oracle SQL is too slow (the r8 all-pairs oracle could not
run past sf0.1 at all; the structural mode is linear in the output).
Dev-only tool; the shipped library is the Scala code under src/.
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm_type(t: pa.DataType) -> str:
    # Collapse variants the driver's hash provably ignores (calibrated vs
    # CORRECTNESS_r02: int width doesn't matter — q7's int32 l_year passed;
    # decimal-vs-int, tz-awareness and decimal scale DO — q12/q_join_right/
    # q_events_timeseries/q_fn_decimal failed). Keep everything else strict.
    if pa.types.is_integer(t): return "int"
    if pa.types.is_large_string(t): return "string"
    if pa.types.is_large_binary(t): return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type)}>"
    if pa.types.is_timestamp(t):
        # unit differences (us vs ns) are harness artifacts; tz is semantic.
        return f"timestamp[tz={t.tz}]"
    return str(t)

def norm_cell(v, t: pa.DataType):
    if v is None: return "NULL"
    if isinstance(v, float):
        if v != v: return "NaN"
        return repr(v)  # keeps -0.0 distinct from 0.0, full precision
    if isinstance(v, bytes): return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x, t.value_type) for x in v) + "]"
    import datetime
    if isinstance(v, datetime.datetime):
        return str(v)  # tz-aware renders with offset; naive without — intended
    return str(v)

def table_sig(tbl: pa.Table, sort_rows=True):
    """sort_rows=True (the fuzz comparator: probes carry no ORDER BY, row
    order is legitimately engine-specific); the catalog gate below passes
    False — the driver's hash is order-sensitive and every catalog entry
    carries a total ORDER BY, so delivered order must agree."""
    cols = sorted(tbl.column_names)
    types = {c: norm_type(tbl.schema.field(c).type) for c in cols}
    data = {c: tbl.column(c).to_pylist() for c in cols}
    ftypes = {c: tbl.schema.field(c).type for c in cols}
    rows = []
    for i in range(tbl.num_rows):
        rows.append("\x01".join(
            types[c] + "\x02" + norm_cell(data[c][i], ftypes[c]) for c in cols))
    if sort_rows:
        rows.sort()
    h = hashlib.sha256()
    for r in rows: h.update(r.encode()); h.update(b"\n")
    return h.hexdigest(), cols, types, tbl.num_rows, rows

def write_diff_artifact(out_dir, name, kind, detail, srows=None, drows=None,
                        scols=None):
    """First-diff observability (r12): every FAIL leaves <out_dir>/
    <name>.diff.txt naming WHICH row/column/value diverged, so a red cell
    is diagnosable from the artifact alone instead of costing a blind
    re-derivation round (the q_bm25_topk lesson: two rounds red with no
    way to see which cell the driver's oracle disagreed on)."""
    lines = [f"query: {name}", f"fail: {kind}", detail]
    if srows is not None and drows is not None:
        shown = 0
        for i, (a, b) in enumerate(zip(srows, drows)):
            if a == b:
                continue
            acells, bcells = a.split("\x01"), b.split("\x01")
            cols = scols or [f"c{j}" for j in range(len(acells))]
            diffcols = [c for c, x, y in zip(cols, acells, bcells) if x != y]
            lines.append(f"row {i} differs in columns {diffcols}:")
            for c, x, y in zip(cols, acells, bcells):
                if x != y:
                    lines.append(f"  {c}: spark={x.replace(chr(2), ':')}")
                    lines.append(f"  {c}: duck ={y.replace(chr(2), ':')}")
            shown += 1
            if shown >= 5:
                lines.append("... (first 5 differing rows shown; "
                             "tools/celldiff.py for the full dump)")
                break
        if len(srows) != len(drows):
            lines.append(f"row counts: spark={len(srows)} duck={len(drows)}")
    path = os.path.join(out_dir, f"{name}.diff.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # multi-file table (the partition-count robustness sweeps write
            # <table>.parquet/ directories of part files)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        spark_dir = f"{out_dir}/{name}"
        if name == "q_dedup_components" and \
                os.environ.get("CHECK_CC_MODE") == "invariants":
            import cc_invariants
            ok = cc_invariants.validate(
                spark_dir, sf_dir=sf_dir,
                log=lambda m: print(f"  [cc] {m}"))
            print(("PASS" if ok else "FAIL") + f" {name} (structural invariants)")
            n_pass += ok; n_fail += (not ok)
            continue
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        stbl = pq.read_table(spark_dir)
        try:
            dtbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        sh, scols, stypes, sn, srows = table_sig(stbl, sort_rows=False)
        dh, dcols, dtypes, dn, drows = table_sig(dtbl, sort_rows=False)
        if scols != dcols:
            print(f"FAIL {name}: cols spark={scols} duck={dcols}"); n_fail += 1
            write_diff_artifact(out_dir, name, "columns",
                                f"spark={scols} duck={dcols}")
        elif stypes != dtypes:
            diffs = [f"{c}: spark={stypes[c]} duck={dtypes[c]}"
                     for c in scols if stypes[c] != dtypes[c]]
            print(f"FAIL {name}: types differ: " + "; ".join(diffs)); n_fail += 1
            write_diff_artifact(out_dir, name, "types", "; ".join(diffs))
        elif sn != dn:
            print(f"FAIL {name}: rows spark={sn} duck={dn}"); n_fail += 1
            write_diff_artifact(out_dir, name, "rows",
                                f"spark={sn} duck={dn}", srows, drows, scols)
        elif sh != dh:
            print(f"FAIL {name}: hash mismatch ({sn} rows)")
            for a, b in zip(srows, drows):
                if a != b:
                    print(f"  spark: {a.replace(chr(1), ' | ')}")
                    print(f"  duck : {b.replace(chr(1), ' | ')}")
                    break
            p = write_diff_artifact(out_dir, name, "hash",
                                    f"{sn} rows, value-level divergence",
                                    srows, drows, scols)
            print(f"  first-diff artifact: {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({sn} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
