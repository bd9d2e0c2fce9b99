"""Structural validation for q_dedup_components at scales where its
brute-force DuckDB oracle is quadratic-bound (sf >= 1).

Usage: python3 tools/cc_invariants.py <verify_out>/q_dedup_components

The five invariants jointly pin connected-components correctness without
re-deriving the clustering: the sf1 generator plants 10 copies of each
base doc at doc_id stride 5000, so every copy set must land in ONE
cluster, labels must be cluster minima AND members, is_dup must agree
with label identity, and no cluster may undercut the planted size.
Used by the sf1 soaks (docs/PLANS_r08.md); exit 1 on any failure.
"""
import duckdb, sys
out = sys.argv[1]  # q_dedup_components output dir
con = duckdb.connect()
con.execute(f"CREATE VIEW cc AS SELECT * FROM read_parquet('{out}/*.parquet')")
checks = {
  # every base doc's 10 copies (stride 5000 in the sf1 build) share one cluster
  "copies_share_cluster": """
    SELECT count(*) FROM (
      SELECT doc_id % 5000 AS base, count(DISTINCT cluster_id) c
      FROM cc GROUP BY 1 HAVING count(DISTINCT cluster_id) > 1)""",
  # labels are cluster minima
  "labels_are_minima": """
    SELECT count(*) FROM (
      SELECT cluster_id, min(doc_id) m FROM cc GROUP BY 1
      HAVING min(doc_id) != cluster_id)""",
  # labels are members
  "labels_are_members": """
    SELECT count(*) FROM (SELECT DISTINCT cluster_id FROM cc) l
    WHERE cluster_id NOT IN (SELECT doc_id FROM cc)""",
  # is_dup consistency
  "is_dup_consistent": """
    SELECT count(*) FROM cc WHERE is_dup != (doc_id != cluster_id)""",
}
bad = 0
for name, q in checks.items():
    v = con.execute(q).fetchone()[0]
    print(("PASS" if v == 0 else "FAIL"), name, v)
    bad += (v != 0)
lo, hi = con.execute(
  "SELECT min(c), max(c) FROM (SELECT count(*) c FROM cc GROUP BY cluster_id)").fetchone()
ok = lo >= 10
print(("PASS" if ok else "FAIL"), f"cluster_sizes in [{lo},{hi}] (expect >=10)")
bad += (not ok)
n = con.execute("SELECT count(*) FROM cc").fetchone()[0]
print("rows:", n)
sys.exit(1 if bad else 0)
