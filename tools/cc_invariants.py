"""Structural validation for q_dedup_components — the bounded oracle mode.

Usage: python3 tools/cc_invariants.py <verify_out>/q_dedup_components \
           [--sf-dir DIR] [--stride N --copies K]

Since r9 the entry's primary DuckDB oracle is itself scale-safe (exact
collapse + inverted-index by-gram join + closure over representatives —
LlmOps.qDedupComponentsSql), hash-verified at sf1 in ~10s. This module is
the wired FALLBACK for scales/corpora where even that is too slow: five
structural invariants that jointly pin clustering correctness in one
linear pass, without re-deriving the pair graph.

Generic invariants (any corpus):
  1. labels are cluster minima          4. exact-duplicate docs (same
  2. labels are members                    lower(text) md5) share a
  3. is_dup agrees with label identity     cluster  [needs --sf-dir]
Planted-corpus invariants (the sf1 generator: K copies at doc_id
stride N — pass --stride/--copies):
  5. every copy set lands in ONE cluster, and no cluster undercuts K.

check.py runs this instead of the SQL compare when CHECK_CC_MODE=invariants.
Exit 1 on any failure.
"""
import sys
import duckdb


def validate(out_dir, sf_dir=None, stride=None, copies=None, log=print):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW cc AS SELECT * FROM read_parquet('{out_dir}/*.parquet')")
    checks = {
        "labels_are_minima": """
            SELECT count(*) FROM (
              SELECT cluster_id, min(doc_id) m FROM cc GROUP BY 1
              HAVING min(doc_id) != cluster_id)""",
        "labels_are_members": """
            SELECT count(*) FROM (SELECT DISTINCT cluster_id FROM cc) l
            WHERE cluster_id NOT IN (SELECT doc_id FROM cc)""",
        "is_dup_consistent": """
            SELECT count(*) FROM cc WHERE is_dup != (doc_id != cluster_id)""",
    }
    if sf_dir:
        # exact duplicates are jaccard-1.0 pairs: same-cluster is a hard
        # requirement whatever the near-dup threshold. Directory-layout
        # tables (the 13-file sweeps) need the glob form, same as check.py.
        import os
        p = f"{sf_dir}/documents.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"""CREATE VIEW src AS
            SELECT doc_id, md5(lower(text)) AS tkey
            FROM read_parquet('{p}')""")
        checks["exact_dups_share_cluster"] = """
            SELECT count(*) FROM (
              SELECT s.tkey FROM cc JOIN src s USING (doc_id)
              GROUP BY s.tkey HAVING count(DISTINCT cc.cluster_id) > 1)"""
    if stride:
        checks["copies_share_cluster"] = f"""
            SELECT count(*) FROM (
              SELECT doc_id % {stride} AS base, count(DISTINCT cluster_id) c
              FROM cc GROUP BY 1 HAVING count(DISTINCT cluster_id) > 1)"""
    bad = 0
    for name, q in checks.items():
        v = con.execute(q).fetchone()[0]
        log(("PASS" if v == 0 else "FAIL") + f" {name} {v}")
        bad += (v != 0)
    if copies:
        lo, hi = con.execute(
            "SELECT min(c), max(c) FROM "
            "(SELECT count(*) c FROM cc GROUP BY cluster_id)").fetchone()
        ok = lo >= copies
        log(("PASS" if ok else "FAIL") +
            f" cluster_sizes in [{lo},{hi}] (expect >={copies})")
        bad += (not ok)
    n = con.execute("SELECT count(*) FROM cc").fetchone()[0]
    log(f"rows: {n}")
    return bad == 0


def _arg(flag, cast=str):
    return cast(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else None


if __name__ == "__main__":
    ok = validate(sys.argv[1],
                  sf_dir=_arg("--sf-dir"),
                  stride=_arg("--stride", int),
                  copies=_arg("--copies", int))
    sys.exit(0 if ok else 1)
