#!/usr/bin/env python3
"""Differential query fuzzer: random-but-seeded SQL over the fixture
schema, executed by BOTH the engine (graft.FuzzRunner -> parquet) and
DuckDB, compared with the same driver-calibrated signature as
tools/check.py (cols sorted by name, rows sorted, type-tagged hash).

The reference ships the same idea as its random query generator
(tests/comparison/discrepancy_searcher.py + query_generator.py, which
cross-checks Impala against Postgres on random SELECTs); this is the
Spark-era analogue, and it is the correctness ratchet the golden catalog
can't provide: COMPOSITION coverage (joins x aggs x windows x set-ops x
subqueries) far beyond the ~126 hand-written entries.

Dialect envelope — every emitted query is valid, DETERMINISTIC and
semantically identical in Spark SQL and DuckDB by construction:
  - integer sums wrapped CAST(SUM(e) AS BIGINT) (DuckDB sums to HUGEINT,
    which arrows as decimal128 and would fail the type gate);
  - doubles appear only in comparisons and MIN/MAX/COUNT (exact IEEE
    semantics both sides); no SUM/AVG(double) — float-accumulation
    parity is FunctionCorpus territory (Parity.dsum), not composition;
  - || for concat (null-safe in both; concat() is not), explicit NULLS
    FIRST on every ORDER BY (defaults differ), LIMIT only under a total
    order (ORDER BY every output column);
  - timestamps: compared against TIMESTAMP literals, projected only as
    CAST(.. AS DATE) (naive-vs-UTC arrow tags differ on raw projection);
  - % and / only by nonzero literals (both C-style sign, / is float div
    of ints in both);
  - grand-total grouping forms (ROLLUP/CUBE/GROUPING SETS incl. ())
    only over generation-time-verified NON-EMPTY input: over an empty
    input the standard and DuckDB emit one grand-total row, Spark's
    Expand-based grouping emits none (seed-44 catch at sf0.01).

Grammar v2 (seed-43 corpus) adds, still inside the envelope:
ROLLUP/CUBE/GROUPING SETS, aggregate FILTER (WHERE ...) clauses,
HAVING on summed values, CTE pipelines (WITH agg AS ... re-filtered /
re-unioned), uncorrelated scalar subqueries in projections,
NTILE/FIRST_VALUE/LAST_VALUE and RANGE frames, INTERSECT ALL /
EXCEPT ALL, EXTRACT(YEAR|MONTH|DAY FROM ts) and trim/replace string
leaves. Committed corpora are self-contained JSONL — replay never
re-runs the generator, so grammar growth can't silently drift an
already-committed corpus.

Dialect axis (--dialect; the seed-45 corpus): queries are emitted as
PAIRS — the engine side composes Impala-dialect functions (nvl-family,
strleft/strright, quotient/fmod, adddate/months_add/dayname,
istrue-family, type-limit constants) into random join trees, group
keys, HAVING and subqueries; the oracle_sql side is the ANSI DuckDB
spelling proven equivalent one-function-at-a-time by the curated
FunctionCorpus entries. This fuzzes the DIALECT LAYER under
composition — builder arity/type-resolution bugs that a projection
corpus can't reach.

Each corpus record carries the SF basename it was generated (and
DuckDB-verified) against, so the offline replay runs it on the same
data — --sf is therefore a real fuzzing axis: the same grammar at a
larger SF samples different literal pools (different selectivities) and
pushes multi-batch hash tables and spills the sf0.001 corpora never hit.

Usage:
  python3 tools/fuzz.py [--seed 42] [--n 1000] [--sf /root/testdata/sf0.001]
                        [--out /tmp/fuzz] [--skip-engine] [--corpus-only]
Exit 0 iff every query hash-matches.
"""
import argparse, hashlib, json, os, random, re, subprocess, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import table_sig  # the driver-calibrated comparator

import duckdb
import pyarrow.parquet as pq

# ---------------------------------------------------------------- schema
TABLES = {
    "lineitem": dict(
        ints=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        strs=["l_returnflag", "l_linestatus"],
        dbls=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        # NOTE: (l_orderkey, l_linenumber) is NOT unique in the synthetic
        # data (1161 duplicate pairs at sf0.001) — verify_unique() will
        # drop any declared key that doesn't hold, which excludes the
        # table from window generation (window ORDER BY must be TOTAL or
        # LAG/frames are legitimately nondeterministic — found by this
        # fuzzer's first 1000-query run, 2/1000 divergences).
        ts=["l_shipdate"], uniq=[]),
    "orders": dict(
        ints=["o_orderkey", "o_custkey"],
        strs=["o_orderstatus", "o_orderpriority"],
        dbls=["o_totalprice"], ts=["o_orderdate"], uniq=["o_orderkey"]),
    "customer": dict(
        ints=["c_custkey", "c_nationkey"], strs=["c_name", "c_mktsegment"],
        dbls=["c_acctbal"], ts=[], uniq=["c_custkey"]),
    "supplier": dict(
        ints=["s_suppkey", "s_nationkey"], strs=["s_name"],
        dbls=["s_acctbal"], ts=[], uniq=["s_suppkey"]),
    "part": dict(
        ints=["p_partkey", "p_size"], strs=["p_name", "p_brand", "p_type"],
        dbls=["p_retailprice"], ts=[], uniq=["p_partkey"]),
    "nation": dict(
        ints=["n_nationkey", "n_regionkey"], strs=["n_name"], dbls=[],
        ts=[], uniq=["n_nationkey"]),
    "region": dict(
        ints=["r_regionkey"], strs=["r_name"], dbls=[], ts=[],
        uniq=["r_regionkey"]),
}
# FK equi-edges (child, parent, child_col, parent_col)
EDGES = [
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
    ("lineitem", "supplier", "l_suppkey", "s_suppkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("supplier", "nation", "s_nationkey", "n_nationkey"),
    ("nation", "region", "n_regionkey", "r_regionkey"),
]
JOIN_TYPES = ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]


def verify_unique(con):
    """Window ORDER BY keys must be TOTAL orders or the query is
    legitimately nondeterministic in both engines. Trust nothing: check
    every declared unique key against the actual data at this SF and
    drop any that fails (the table then generates no window queries)."""
    for t, cols in TABLES.items():
        if not cols["uniq"]:
            continue
        k = ", ".join(cols["uniq"])
        dups = con.execute(
            f"SELECT count(*) FROM (SELECT {k} FROM {t} "
            f"GROUP BY {k} HAVING count(*) > 1)").fetchone()[0]
        if dups:
            print(f"[fuzz] note: {t} key ({k}) has {dups} duplicate "
                  f"groups — excluded from window generation")
            cols["uniq"] = []


def sample_literals(con, sf_dir):
    """Deterministic per-column literal pools drawn from the data, so
    generated predicates hit non-degenerate selectivities at any SF."""
    pools = {}
    for t, cols in TABLES.items():
        for kind in ("ints", "strs", "dbls", "ts"):
            for c in cols[kind]:
                rows = con.execute(
                    f"SELECT DISTINCT {c} FROM {t} WHERE {c} IS NOT NULL "
                    f"ORDER BY {c} LIMIT 41").fetchall()
                vals = [r[0] for r in rows]
                step = max(1, len(vals) // 8)
                pools[(t, c)] = vals[::step][:8] or vals
    return pools


class Gen:
    # generator revision for the common-dialect grammar: bump when the
    # grammar's RNG-consumption pattern changes (see gen_corpus note)
    GRAMMAR_REV = 2

    def __init__(self, rng, pools, probe=None):
        # probe(sql) -> rows: generation-time DuckDB escape hatch for
        # rules that depend on the data, not the grammar. Deterministic
        # for a fixed (seed, sf): the data is fixed, so probe results are.
        self.rng, self.pools, self.probe = rng, pools, probe

    def input_nonempty(self, frm, pred):
        """True iff FROM frm WHERE pred yields at least one row.

        Grand-total grouping sets (ROLLUP/CUBE/GROUPING SETS with ())
        over an EMPTY input are a known dialect delta: the standard (and
        DuckDB) emit one all-NULL/zero-count grand-total row, Spark's
        Expand-based implementation emits none (the internal grouping-id
        column makes even the () set a grouped aggregate). Found by the
        seed-44 sf0.01 run — a selective predicate emptied the join. The
        generator only emits grand-total forms over provably non-empty
        input; empty input falls back to plain GROUP BY, where both
        engines agree (0 rows)."""
        if self.probe is None:
            return True
        try:
            return bool(self.probe(f"SELECT 1 FROM {frm} WHERE {pred} LIMIT 1"))
        except Exception:
            return False

    # ----------------------------------------------------------- helpers
    def pick(self, xs):
        return xs[self.rng.randrange(len(xs))]

    def lit_of(self, t, c, kind):
        pool = self.pools.get((t, c)) or []
        if not pool:
            return "1" if kind == "int" else "'x'"
        v = self.pick(pool)
        if kind == "int":
            return str(int(v))
        if kind == "str":
            return "'" + str(v).replace("'", "''") + "'"
        if kind == "dbl":
            return repr(float(v))
        return f"TIMESTAMP '{v}'"  # ts

    # --------------------------------------------------- expressions
    def int_expr(self, cols, depth=2):
        """cols: list of (table, col) int columns in scope."""
        if depth <= 0 or self.rng.random() < 0.45:
            if self.rng.random() < 0.8 and cols:
                t, c = self.pick(cols)
                return f"{t}.{c}"
            return str(self.rng.randrange(1, 50))
        r = self.rng.random()
        a = self.int_expr(cols, depth - 1)
        if r < 0.22:
            return f"({a} + {self.int_expr(cols, depth - 1)})"
        if r < 0.38:
            return f"({a} - {self.int_expr(cols, depth - 1)})"
        if r < 0.50:
            return f"({a} * {self.rng.randrange(2, 8)})"
        if r < 0.62:
            return f"({a} % {self.rng.randrange(2, 14)})"
        if r < 0.72:
            return f"abs({a})"
        if r < 0.82:
            b = self.int_expr(cols, depth - 1)
            fn = self.pick(["greatest", "least"])
            return f"{fn}({a}, {b})"
        return (f"(CASE WHEN {a} > {self.rng.randrange(0, 40)} "
                f"THEN {self.int_expr(cols, depth - 1)} "
                f"ELSE {self.int_expr(cols, depth - 1)} END)")

    def str_expr(self, cols, depth=1):
        if not cols:
            return "'k'"
        t, c = self.pick(cols)
        base = f"{t}.{c}"
        if depth <= 0 or self.rng.random() < 0.5:
            return base
        r = self.rng.random()
        if r < 0.2:
            return f"upper({base})"
        if r < 0.4:
            return f"lower({base})"
        if r < 0.6:
            j = self.rng.randrange(1, 4)
            return f"substr({base}, {j}, {self.rng.randrange(1, 9)})"
        if r < 0.7:
            return f"trim({base})"
        if r < 0.8:
            a = self.pick("aeorst")
            return f"replace({base}, '{a}', '{self.pick('xyz_')}')"
        return f"({base} || {self.str_expr(cols, 0)})"

    def predicate(self, scope, depth=2):
        """scope: dict table -> TABLES[table] restricted to in-scope tables."""
        tabs = list(scope)
        if depth > 0 and self.rng.random() < 0.4:
            a = self.predicate(scope, depth - 1)
            b = self.predicate(scope, depth - 1)
            op = self.pick(["AND", "AND", "OR"])
            neg = "NOT " if self.rng.random() < 0.12 else ""
            return f"{neg}({a} {op} {b})"
        t = self.pick(tabs)
        cols = scope[t]
        r = self.rng.random()
        if cols["ints"] and r < 0.40:
            c = self.pick(cols["ints"])
            op = self.pick(["<", "<=", "=", "<>", ">", ">="])
            if self.rng.random() < 0.25:
                lo = self.lit_of(t, c, "int")
                hi = self.lit_of(t, c, "int")
                return f"{t}.{c} BETWEEN least({lo},{hi}) AND greatest({lo},{hi})"
            if self.rng.random() < 0.25:
                lits = ", ".join(self.lit_of(t, c, "int") for _ in range(3))
                return f"{t}.{c} IN ({lits})"
            return f"{t}.{c} {op} {self.lit_of(t, c, 'int')}"
        if cols["strs"] and r < 0.70:
            c = self.pick(cols["strs"])
            if self.rng.random() < 0.35:
                v = self.lit_of(t, c, "str").strip("'")
                pat = self.pick([f"{v[:2]}%", f"%{v[-2:]}", f"%{v[1:3]}%",
                                 f"{v[:1]}_%"]) if len(v) >= 3 else f"{v}%"
                return f"{t}.{c} LIKE '{pat}'"
            op = self.pick(["=", "<>", "<", ">"])
            return f"{t}.{c} {op} {self.lit_of(t, c, 'str')}"
        if cols["dbls"] and r < 0.9:
            c = self.pick(cols["dbls"])
            op = self.pick(["<", "<=", ">", ">="])
            return f"{t}.{c} {op} {self.lit_of(t, c, 'dbl')}"
        if cols["ts"]:
            c = self.pick(cols["ts"])
            op = self.pick(["<", ">=", ">"])
            return f"{t}.{c} {op} {self.lit_of(t, c, 'ts')}"
        if cols["ints"]:
            c = self.pick(cols["ints"])
            return f"{t}.{c} >= {self.lit_of(t, c, 'int')}"
        return "1 = 1"

    # ------------------------------------------------------ FROM clause
    def from_clause(self, n_joins):
        """Random connected subtree of the FK graph; returns (sql, scope).

        The scope dict is built from the JOIN ORDER list, not the `used`
        set: iterating a set of strings depends on the per-process hash
        seed, which silently made generation process-dependent (same
        seed, different corpus across interpreter runs — caught when a
        --skip-engine re-compare mismatched every query). Committed
        corpora were never affected (frozen JSONL), but determinism for
        a fixed (seed, sf) must hold across processes."""
        start = self.pick(list(TABLES))
        used = {start}
        order = [start]
        sql = start
        for _ in range(n_joins):
            cand = [e for e in EDGES
                    if (e[0] in used) != (e[1] in used)]
            if not cand:
                break
            c, p, ck, pk = self.pick(cand)
            new = p if c in used else c
            jt = self.pick(JOIN_TYPES)
            sql += f" {jt} {new} ON {c}.{ck} = {p}.{pk}"
            used.add(new)
            order.append(new)
        return sql, {t: TABLES[t] for t in order}

    def int_cols(self, scope):
        return [(t, c) for t in scope for c in scope[t]["ints"]]

    def str_cols(self, scope):
        return [(t, c) for t in scope for c in scope[t]["strs"]]

    # ------------------------------------------------------- query kinds
    def q_select(self):
        """Select-project-filter, optional DISTINCT / total-order LIMIT."""
        frm, scope = self.from_clause(self.rng.randrange(0, 3))
        ic, sc = self.int_cols(scope), self.str_cols(scope)
        projs = []
        for i in range(self.rng.randrange(2, 5)):
            r = self.rng.random()
            if r < 0.45 or not sc:
                projs.append(f"{self.int_expr(ic)} AS c{i}")
            elif r < 0.8:
                projs.append(f"{self.str_expr(sc)} AS c{i}")
            else:
                t = self.pick([t for t in scope
                               if scope[t]["dbls"] or scope[t]["ts"]]
                              or list(scope))
                if scope[t]["ts"] and (self.rng.random() < 0.4 or
                                       not scope[t]["dbls"]):
                    c = self.pick(scope[t]["ts"])
                    if self.rng.random() < 0.35:
                        part = self.pick(["YEAR", "MONTH", "DAY"])
                        projs.append(
                            f"CAST(EXTRACT({part} FROM {t}.{c}) AS BIGINT)"
                            f" AS c{i}")
                    else:
                        projs.append(f"CAST({t}.{c} AS DATE) AS c{i}")
                elif scope[t]["dbls"]:
                    c = self.pick(scope[t]["dbls"])
                    projs.append(f"{t}.{c} AS c{i}")
                else:
                    projs.append(f"{self.int_expr(ic)} AS c{i}")
        if self.rng.random() < 0.15:
            # uncorrelated scalar subquery as an extra projected column
            st = self.pick([t for t in TABLES if TABLES[t]["ints"]])
            sic = [(st, c) for c in TABLES[st]["ints"]]
            agg = self.pick(["MIN", "MAX"])
            tt, cc = self.pick(sic)
            projs.append(
                f"(SELECT {agg}({tt}.{cc}) FROM {st} "
                f"WHERE {self.predicate({st: TABLES[st]}, 1)}) AS c{len(projs)}")
        distinct = "DISTINCT " if self.rng.random() < 0.25 else ""
        sql = (f"SELECT {distinct}{', '.join(projs)} FROM {frm} "
               f"WHERE {self.predicate(scope)}")
        if self.rng.random() < 0.3:
            order = ", ".join(f"c{i} NULLS FIRST" for i in range(len(projs)))
            sql += f" ORDER BY {order} LIMIT {self.rng.randrange(5, 200)}"
        return sql

    def agg_fn(self, ic, scope):
        r = self.rng.random()
        if r < 0.1:
            # aggregate FILTER clause (identical per-row semantics in both)
            flt = f" FILTER (WHERE {self.predicate(scope, 0)})"
            if self.rng.random() < 0.5:
                return f"CAST(SUM({self.int_expr(ic, 1)}){flt} AS BIGINT)"
            return f"COUNT(*){flt}"
        if r < 0.3:
            return f"CAST(SUM({self.int_expr(ic)}) AS BIGINT)"
        if r < 0.45:
            return "COUNT(*)"
        if r < 0.6:
            return f"COUNT(DISTINCT {self.int_expr(ic, 1)})"
        if r < 0.75:
            return f"{self.pick(['MIN', 'MAX'])}({self.int_expr(ic, 1)})"
        dbls = [(t, c) for t in scope for c in scope[t]["dbls"]]
        if dbls and r < 0.9:
            t, c = self.pick(dbls)
            return f"{self.pick(['MIN', 'MAX'])}({t}.{c})"
        sc = self.str_cols(scope)
        if sc:
            t, c = self.pick(sc)
            return f"{self.pick(['MIN', 'MAX', 'COUNT'])}({t}.{c})"
        return "COUNT(*)"

    def q_agg(self):
        frm, scope = self.from_clause(self.rng.randrange(0, 4))
        ic, sc = self.int_cols(scope), self.str_cols(scope)
        keys = []
        for i in range(self.rng.randrange(0, 3)):
            if sc and self.rng.random() < 0.6:
                keys.append(self.str_expr(sc, 0))
            elif ic:
                t, c = self.pick(ic)
                keys.append(f"({t}.{c} % {self.rng.randrange(2, 20)})"
                            if self.rng.random() < 0.5 else f"{t}.{c}")
        aggs = [self.agg_fn(ic, scope)
                for _ in range(self.rng.randrange(1, 4))]
        projs = [f"{k} AS g{i}" for i, k in enumerate(keys)] + \
                [f"{a} AS a{i}" for i, a in enumerate(aggs)]
        pred = self.predicate(scope, 1)
        sql = f"SELECT {', '.join(projs)} FROM {frm} WHERE {pred}"
        if keys:
            kl = ", ".join(keys)
            r = self.rng.random()
            if len(keys) >= 2 and r < 0.22 and self.input_nonempty(frm, pred):
                form = self.pick([f"ROLLUP({kl})", f"CUBE({kl})",
                                  "GROUPING SETS ((" + kl + "), ("
                                  + keys[0] + "), ())"])
                sql += f" GROUP BY {form}"
            else:
                sql += f" GROUP BY {kl}"
            if self.rng.random() < 0.4:
                if self.rng.random() < 0.5:
                    sql += f" HAVING COUNT(*) > {self.rng.randrange(0, 4)}"
                else:
                    sql += (f" HAVING CAST(SUM({self.int_expr(ic, 1)}) AS "
                            f"BIGINT) > {self.rng.randrange(0, 5000)}")
        return sql

    def q_window(self):
        t = self.pick([x for x in TABLES if TABLES[x]["uniq"]])
        scope = {t: TABLES[t]}
        ic = self.int_cols(scope)
        uniq = ", ".join(f"{t}.{c}" for c in TABLES[t]["uniq"])
        part = ""
        if TABLES[t]["strs"] and self.rng.random() < 0.8:
            part = f"PARTITION BY {self.str_expr(self.str_cols(scope), 0)} "
        # deterministic order: optional non-unique prefix + unique key tail
        prefix = ""
        if ic and self.rng.random() < 0.5:
            tt, c = self.pick(ic)
            prefix = f"({tt}.{c} % 7), "
        over = f"({part}ORDER BY {prefix}{uniq})"
        r = self.rng.random()
        if r < 0.22:
            w = f"ROW_NUMBER() OVER {over}"
        elif r < 0.38:
            w = f"{self.pick(['RANK', 'DENSE_RANK'])}() OVER {over}"
        elif r < 0.50:
            w = f"NTILE({self.rng.randrange(2, 8)}) OVER {over}"
        elif r < 0.66:
            fn = self.pick(["LAG", "LEAD"])
            w = f"{fn}({self.int_expr(ic, 1)}, 1, 0) OVER {over}"
        elif r < 0.78:
            if self.rng.random() < 0.5:
                frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
                fn = "FIRST_VALUE"
            else:
                frame = "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"
                fn = "LAST_VALUE"
            over = f"({part}ORDER BY {prefix}{uniq} {frame})"
            w = f"{fn}({self.int_expr(ic, 1)}) OVER {over}"
        else:
            frame = self.pick([
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
                "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
                f"ROWS BETWEEN {self.rng.randrange(1, 5)} PRECEDING "
                f"AND CURRENT ROW"])
            over = f"({part}ORDER BY {prefix}{uniq} {frame})"
            w = f"CAST(SUM({self.int_expr(ic, 1)}) OVER {over} AS BIGINT)"
        keys = ", ".join(f"{t}.{c} AS k{i}"
                         for i, c in enumerate(TABLES[t]["uniq"]))
        return (f"SELECT {keys}, {w} AS w0 FROM {t} "
                f"WHERE {self.predicate(scope, 1)}")

    def q_setop(self):
        t = self.pick(list(TABLES))
        scope = {t: TABLES[t]}
        ic, sc = self.int_cols(scope), self.str_cols(scope)
        projs = []
        for i in range(self.rng.randrange(1, 3)):
            projs.append(f"{self.int_expr(ic, 1)} AS c{i}" if not sc or
                         self.rng.random() < 0.5
                         else f"{self.str_expr(sc, 0)} AS c{i}")
        op = self.pick(["UNION ALL", "UNION", "INTERSECT", "EXCEPT",
                        "INTERSECT ALL", "EXCEPT ALL"])
        p = ", ".join(projs)
        return (f"SELECT {p} FROM {t} WHERE {self.predicate(scope, 1)} "
                f"{op} SELECT {p} FROM {t} WHERE {self.predicate(scope, 1)}")

    def q_subquery(self):
        child, parent, ck, pk = self.pick(EDGES)
        outer, inner = ((child, parent) if self.rng.random() < 0.5
                        else (parent, child))
        okey = ck if outer == child else pk
        ikey = pk if outer == child else ck
        oscope = {outer: TABLES[outer]}
        iscope = {inner: TABLES[inner]}
        ic = self.int_cols(oscope)
        projs = ", ".join(f"{self.int_expr(ic, 1)} AS c{i}"
                          for i in range(2))
        r = self.rng.random()
        if r < 0.35:
            sub = (f"{outer}.{okey} IN (SELECT {inner}.{ikey} FROM {inner} "
                   f"WHERE {self.predicate(iscope, 1)})")
        elif r < 0.55:
            sub = (f"{outer}.{okey} NOT IN (SELECT {inner}.{ikey} "
                   f"FROM {inner} WHERE {self.predicate(iscope, 1)})")
        elif r < 0.85:
            neg = "NOT " if self.rng.random() < 0.4 else ""
            sub = (f"{neg}EXISTS (SELECT 1 FROM {inner} WHERE "
                   f"{inner}.{ikey} = {outer}.{okey} AND "
                   f"{self.predicate(iscope, 1)})")
        else:
            iic = self.int_cols(iscope)
            agg = self.pick(["MIN", "MAX"])
            tt, cc = self.pick(iic)
            sub = (f"{outer}.{okey} <= (SELECT {agg}({tt}.{cc}) "
                   f"FROM {inner} WHERE {self.predicate(iscope, 1)})")
        return (f"SELECT {projs} FROM {outer} WHERE {sub} "
                f"AND {self.predicate(oscope, 1)}")

    def q_cte(self):
        """CTE pipeline: aggregate once under a name, then re-filter /
        re-aggregate / self-union the named result. Exercises WITH-clause
        reuse (one definition consumed 1-2 times) on top of the same
        dialect envelope: every numeric that leaves the CTE is already
        BIGINT, so downstream arithmetic stays integer-exact."""
        frm, scope = self.from_clause(self.rng.randrange(0, 3))
        ic, sc = self.int_cols(scope), self.str_cols(scope)
        if sc and self.rng.random() < 0.6:
            key = self.str_expr(sc, 0)
        else:
            t, c = self.pick(ic)
            key = (f"({t}.{c} % {self.rng.randrange(2, 20)})"
                   if self.rng.random() < 0.5 else f"{t}.{c}")
        cte = (f"WITH agg AS (SELECT {key} AS k, "
               f"CAST(SUM({self.int_expr(ic, 1)}) AS BIGINT) AS s, "
               f"COUNT(*) AS n FROM {frm} "
               f"WHERE {self.predicate(scope, 1)} GROUP BY {key})")
        r = self.rng.random()
        if r < 0.4:
            # re-aggregate the aggregate (two-level rollup pipeline)
            return (f"{cte} SELECT COUNT(*) AS c0, "
                    f"CAST(SUM(s) AS BIGINT) AS c1, MIN(n) AS c2 "
                    f"FROM agg WHERE n > {self.rng.randrange(0, 3)}")
        if r < 0.7:
            # re-filter the named result on a computed column
            return (f"{cte} SELECT k AS c0, s AS c1, n AS c2 FROM agg "
                    f"WHERE s > {self.rng.randrange(0, 5000)} "
                    f"OR n <= {self.rng.randrange(1, 4)}")
        # consume the CTE twice: disjoint-ish filters re-unioned
        return (f"{cte} SELECT k AS c0, s AS c1 FROM agg "
                f"WHERE n > {self.rng.randrange(1, 4)} "
                f"UNION ALL SELECT k, s FROM agg "
                f"WHERE s <= {self.rng.randrange(0, 100)}")

    def query(self):
        r = self.rng.random()
        if r < 0.20: return self.q_select()
        if r < 0.45: return self.q_agg()
        if r < 0.60: return self.q_window()
        if r < 0.74: return self.q_setop()
        if r < 0.88: return self.q_subquery()
        return self.q_cte()


class DialectGen(Gen):
    # rev 2 = dq_window added + query_pair rebalanced (seeds 47+);
    # committed seeds 45/46 were drawn at rev 1
    GRAMMAR_REV = 2

    """Dialect-axis grammar: every query is emitted as a PAIR — the
    engine side composes Impala-dialect functions (the ImpalaFunctions
    registry: nvl-family, strleft/strright, quotient/fmod, adddate/
    months_add/dayname, istrue-family, type-limit constants) into random
    join trees / aggregates / subqueries; the oracle side is the ANSI
    DuckDB spelling of the same semantics. The curated FunctionCorpus
    entries prove each translation in isolation (left/right, floor-div,
    ts + INTERVAL, nullif/coalesce, IS [NOT] DISTINCT FROM); this
    grammar is the COMPOSITION ratchet for the dialect layer itself —
    dialect calls inside join predicates, group keys, HAVING and
    subqueries, where builder arity/type-resolution bugs would hide.

    Expressions are (engine_sql, duck_sql) tuples; neutral combinators
    format both sides identically. Envelope rules (integer-exact
    aggregates, doubles only compared, total-order LIMIT, NULLS FIRST)
    are inherited unchanged. quotient numerators are abs()-wrapped so
    the proven floor-division oracle (floor == trunc for non-negative
    numerators) stays exact."""

    DAYS = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
            "Saturday", "Sunday"]

    def both(self, s):
        return (s, s)

    def fmt(self, eng, duck, *args):
        if not args:  # already-final strings; .format would choke on
            return (eng, duck)  # literal braces in data-drawn literals
        return (eng.format(*[a[0] for a in args]),
                duck.format(*[a[1] for a in args]))

    # ------------------------------------------------- paired expressions
    def d_int(self, cols, depth=2):
        r = self.rng.random()
        if depth <= 0 or r < 0.30:
            if cols and self.rng.random() < 0.85:
                t, c = self.pick(cols)
                return self.both(f"{t}.{c}")
            return self.both(str(self.rng.randrange(1, 50)))
        a = self.d_int(cols, depth - 1)
        if r < 0.38:
            t, c = self.pick(cols) if cols else (None, None)
            col = self.both(f"{t}.{c}") if cols else self.both("7")
            k = self.rng.randrange(2, 12)
            kind = self.rng.randrange(4)
            if kind == 0:
                return self.fmt("zeroifnull({0})", "coalesce({0}, 0)", col)
            if kind == 1:
                return self.fmt(f"nullifzero(({{0}} % {k}))",
                                f"nullif(({{0}} % {k}), 0)", col)
            if kind == 2:
                lit = self.lit_of(t, c, "int") if cols else "3"
                return self.fmt(f"isnull(nullifzero(({{0}} % {k})), {lit})",
                                f"coalesce(nullif(({{0}} % {k}), 0), {lit})",
                                col)
            return self.fmt(f"quotient(abs({{0}}), {k})",
                            f"CAST(floor(abs({{0}}) / {k}) AS BIGINT)", a)
        if r < 0.48:
            return self.fmt("({0} + {1})", "({0} + {1})",
                            a, self.d_int(cols, depth - 1))
        if r < 0.58:
            return self.fmt("({0} - {1})", "({0} - {1})",
                            a, self.d_int(cols, depth - 1))
        if r < 0.66:
            k = self.rng.randrange(2, 8)
            return self.fmt(f"({{0}} * {k})", f"({{0}} * {k})", a)
        if r < 0.74:
            k = self.rng.randrange(2, 14)
            return self.fmt(f"({{0}} % {k})", f"({{0}} % {k})", a)
        if r < 0.82:
            b = self.d_int(cols, depth - 1)
            fn = self.pick(["greatest", "least"])
            return self.fmt(f"{fn}({{0}}, {{1}})", f"{fn}({{0}}, {{1}})", a, b)
        if r < 0.90:
            # type-limit constants clamp a computed value (engine folds the
            # call; oracle uses the literal the constant denotes)
            lim, v = self.pick([("max_smallint()", 32767),
                                ("max_tinyint()", 127),
                                ("min_tinyint()", -128)])
            return self.fmt(f"least({{0}}, {lim})", f"least({{0}}, {v})", a)
        p = self.d_pred_atom({t: TABLES[t] for t, _ in cols} if cols else {})
        b = self.d_int(cols, depth - 1)
        return self.fmt("(CASE WHEN {0} THEN {1} ELSE {2} END)",
                        "(CASE WHEN {0} THEN {1} ELSE {2} END)", p, a, b)

    def d_str(self, cols, depth=1):
        if not cols:
            return self.both("'k'")
        t, c = self.pick(cols)
        base = self.both(f"{t}.{c}")
        if depth <= 0 or self.rng.random() < 0.35:
            return base
        r = self.rng.random()
        if r < 0.30:
            n = self.rng.randrange(1, 9)
            return self.fmt(f"strleft({{0}}, {n})", f"left({{0}}, {n})", base)
        if r < 0.55:
            n = self.rng.randrange(1, 7)
            return self.fmt(f"strright({{0}}, {n})", f"right({{0}}, {n})", base)
        if r < 0.70:
            fn = self.pick(["upper", "lower", "trim"])
            return self.fmt(f"{fn}({{0}})", f"{fn}({{0}})", base)
        if r < 0.85:
            return self.fmt("({0} || {1})", "({0} || {1})",
                            base, self.d_str(cols, 0))
        n = self.rng.randrange(1, 6)
        return self.fmt(f"strleft(upper({{0}}), {n})",
                        f"left(upper({{0}}), {n})", base)

    def d_date(self, t, c):
        """Timestamp arithmetic projected as DATE (envelope rule)."""
        n = self.rng.randrange(1, 400)
        fn, unit = self.pick([
            ("adddate", "DAY"), ("subdate", "DAY"),
            ("days_add", "DAY"), ("days_sub", "DAY"),
            ("weeks_add", "WEEK"), ("months_add", "MONTH"),
            ("months_sub", "MONTH"), ("years_add", "YEAR"),
            ("hours_add", "HOUR")])
        if unit in ("MONTH", "YEAR"):
            n = self.rng.randrange(1, 30)
        sign = "-" if fn.endswith("_sub") or fn == "subdate" else "+"
        return (f"CAST({fn}({t}.{c}, {n}) AS DATE)",
                f"CAST({t}.{c} {sign} INTERVAL {n} {unit} AS DATE)")

    def d_pred_atom(self, scope):
        tabs = [t for t in scope]
        if not tabs:
            return self.both("1 = 1")
        t = self.pick(tabs)
        cols = scope[t]
        r = self.rng.random()
        if cols["ints"] and r < 0.40:
            ic = [(t, c) for c in cols["ints"]]
            e = self.d_int(ic, 1)
            c = self.pick(cols["ints"])
            op = self.pick(["<", "<=", "=", "<>", ">", ">="])
            lit = self.lit_of(t, c, "int")
            inner = self.fmt(f"{{0}} {op} {lit}", f"{{0}} {op} {lit}", e)
            wr = self.rng.random()
            if wr < 0.25:
                return self.fmt("istrue({0})",
                                "(({0}) IS NOT DISTINCT FROM true)", inner)
            if wr < 0.35:
                return self.fmt("isnotfalse({0})",
                                "(NOT (({0}) IS NOT DISTINCT FROM false))",
                                inner)
            return inner
        if cols["strs"] and r < 0.65:
            sc = [(t, c) for c in cols["strs"]]
            e = self.d_str(sc, 1)
            c = self.pick(cols["strs"])
            op = self.pick(["=", "<>", "<", ">"])
            lit = self.lit_of(t, c, "str")
            if self.rng.random() < 0.3:
                n = self.rng.randrange(1, 4)
                v = lit.strip("'")[:n].replace("'", "''")
                return self.fmt(f"strleft({t}.{c}, {n}) = '{v}'",
                                f"left({t}.{c}, {n}) = '{v}'")
            return self.fmt(f"{{0}} {op} {lit}", f"{{0}} {op} {lit}", e)
        if cols["dbls"] and r < 0.80:
            c = self.pick(cols["dbls"])
            k = self.pick(["2.5", "3.75", "7.5"])
            op = self.pick(["<", ">="])
            lit = self.pick(["0.5", "1.0", "1.75", "2.0"])
            if self.rng.random() < 0.5:
                # Seed-45's first catch: DuckDB fmod is FLOOR-mod (result
                # sign follows the divisor: fmod(-5.3, 2.5) = 2.2) where
                # Impala/Spark/C fmod is truncation-mod (sign follows the
                # dividend: -0.3) — divergent on every negative dividend
                # (11/1000 queries via the 11 negative c_acctbal rows).
                # The engine matches the reference (math-functions.cc
                # delegates to C fmod); the oracle folds the sign instead:
                # C-fmod(x,k) = sign(x) * fmod(|x|,k), exact because the
                # positive-case remainders are bit-identical both sides.
                return (f"fmod({t}.{c}, {k}) {op} {lit}",
                        f"(CASE WHEN {t}.{c} >= 0 THEN fmod({t}.{c}, {k}) "
                        f"ELSE -fmod(-{t}.{c}, {k}) END) {op} {lit}")
            op2 = self.pick(["<", "<=", ">", ">="])
            return self.both(f"{t}.{c} {op2} {self.lit_of(t, c, 'dbl')}")
        if cols["ts"]:
            c = self.pick(cols["ts"])
            if self.rng.random() < 0.5:
                d = self.pick(self.DAYS)
                return self.both(f"dayname({t}.{c}) = '{d}'")
            op = self.pick(["<", ">=", ">"])
            return self.both(f"{t}.{c} {op} {self.lit_of(t, c, 'ts')}")
        if cols["ints"]:
            c = self.pick(cols["ints"])
            kind = self.rng.randrange(3)
            if kind == 0:
                return self.fmt(f"nonnullvalue({t}.{c})",
                                f"({t}.{c} IS NOT NULL)")
            if kind == 1:
                return self.fmt(f"nullvalue(nullifzero({t}.{c} % 5))",
                                f"(nullif({t}.{c} % 5, 0) IS NULL)")
            return self.both(f"{t}.{c} >= {self.lit_of(t, c, 'int')}")
        return self.both("1 = 1")

    def d_pred(self, scope, depth=2):
        if depth > 0 and self.rng.random() < 0.4:
            a = self.d_pred(scope, depth - 1)
            b = self.d_pred(scope, depth - 1)
            op = self.pick(["AND", "AND", "OR"])
            neg = "NOT " if self.rng.random() < 0.12 else ""
            return self.fmt(f"{neg}({{0}} {op} {{1}})",
                            f"{neg}({{0}} {op} {{1}})", a, b)
        return self.d_pred_atom(scope)

    # -------------------------------------------------------- query kinds
    def d_proj(self, scope, i):
        ic, sc = self.int_cols(scope), self.str_cols(scope)
        tcols = [(t, c) for t in scope for c in scope[t]["ts"]]
        r = self.rng.random()
        if r < 0.40 or (not sc and not tcols):
            e = self.d_int(ic)
        elif r < 0.75 or not tcols:
            e = self.d_str(sc)
        else:
            t, c = self.pick(tcols)
            e = self.d_date(t, c)
        return self.fmt(f"{{0}} AS c{i}", f"{{0}} AS c{i}", e)

    def dq_select(self):
        frm, scope = self.from_clause(self.rng.randrange(0, 3))
        projs = [self.d_proj(scope, i)
                 for i in range(self.rng.randrange(2, 5))]
        pred = self.d_pred(scope)
        distinct = "DISTINCT " if self.rng.random() < 0.2 else ""
        pair = self.fmt(
            f"SELECT {distinct}{{0}} FROM {frm} WHERE {{1}}",
            f"SELECT {distinct}{{0}} FROM {frm} WHERE {{1}}",
            (", ".join(p[0] for p in projs), ", ".join(p[1] for p in projs)),
            pred)
        if self.rng.random() < 0.3:
            order = ", ".join(f"c{i} NULLS FIRST" for i in range(len(projs)))
            lim = self.rng.randrange(5, 200)
            pair = self.fmt(f"{{0}} ORDER BY {order} LIMIT {lim}",
                            f"{{0}} ORDER BY {order} LIMIT {lim}", pair)
        return pair

    def dq_agg(self):
        frm, scope = self.from_clause(self.rng.randrange(0, 4))
        ic, sc = self.int_cols(scope), self.str_cols(scope)
        tcols = [(t, c) for t in scope for c in scope[t]["ts"]]
        keys = []
        for _ in range(self.rng.randrange(1, 3)):
            r = self.rng.random()
            if sc and r < 0.45:
                t, c = self.pick(sc)
                n = self.rng.randrange(1, 4)
                keys.append((f"strleft({t}.{c}, {n})", f"left({t}.{c}, {n})"))
            elif tcols and r < 0.65:
                t, c = self.pick(tcols)
                keys.append(self.both(f"dayname({t}.{c})"))
            elif ic:
                t, c = self.pick(ic)
                k = self.rng.randrange(2, 20)
                if self.rng.random() < 0.4:
                    keys.append((f"zeroifnull(nullifzero({t}.{c} % {k}))",
                                 f"coalesce(nullif({t}.{c} % {k}, 0), 0)"))
                else:
                    keys.append(self.both(f"({t}.{c} % {k})"))
        if not keys:
            keys = [self.both("1")]
        aggs = []
        for _ in range(self.rng.randrange(1, 4)):
            r = self.rng.random()
            if r < 0.35:
                aggs.append(self.fmt("CAST(SUM({0}) AS BIGINT)",
                                     "CAST(SUM({0}) AS BIGINT)",
                                     self.d_int(ic, 1)))
            elif r < 0.55:
                aggs.append(self.both("COUNT(*)"))
            elif r < 0.70:
                aggs.append(self.fmt("COUNT(DISTINCT {0})",
                                     "COUNT(DISTINCT {0})",
                                     self.d_int(ic, 1)))
            elif r < 0.85 or not sc:
                fn = self.pick(["MIN", "MAX"])
                aggs.append(self.fmt(f"{fn}({{0}})", f"{fn}({{0}})",
                                     self.d_int(ic, 1)))
            else:
                fn = self.pick(["MIN", "MAX"])
                aggs.append(self.fmt(f"{fn}({{0}})", f"{fn}({{0}})",
                                     self.d_str(sc, 1)))
        pred = self.d_pred(scope, 1)
        eng_projs = [f"{k[0]} AS g{i}" for i, k in enumerate(keys)] + \
                    [f"{a[0]} AS a{i}" for i, a in enumerate(aggs)]
        duck_projs = [f"{k[1]} AS g{i}" for i, k in enumerate(keys)] + \
                     [f"{a[1]} AS a{i}" for i, a in enumerate(aggs)]
        eng = (f"SELECT {', '.join(eng_projs)} FROM {frm} "
               f"WHERE {pred[0]} GROUP BY {', '.join(k[0] for k in keys)}")
        duck = (f"SELECT {', '.join(duck_projs)} FROM {frm} "
                f"WHERE {pred[1]} GROUP BY {', '.join(k[1] for k in keys)}")
        if self.rng.random() < 0.35:
            hv = self.rng.randrange(0, 4)
            eng += f" HAVING COUNT(*) > {hv}"
            duck += f" HAVING COUNT(*) > {hv}"
        return (eng, duck)

    def dq_subquery(self):
        child, parent, ck, pk = self.pick(EDGES)
        outer, inner = ((child, parent) if self.rng.random() < 0.5
                        else (parent, child))
        okey = ck if outer == child else pk
        ikey = pk if outer == child else ck
        oscope = {outer: TABLES[outer]}
        iscope = {inner: TABLES[inner]}
        ic = self.int_cols(oscope)
        projs = [self.fmt(f"{{0}} AS c{i}", f"{{0}} AS c{i}",
                          self.d_int(ic, 1)) for i in range(2)]
        ipred = self.d_pred(iscope, 1)
        r = self.rng.random()
        if r < 0.4:
            sub = self.fmt(
                f"{outer}.{okey} IN (SELECT {inner}.{ikey} FROM {inner} "
                f"WHERE {{0}})",
                f"{outer}.{okey} IN (SELECT {inner}.{ikey} FROM {inner} "
                f"WHERE {{0}})", ipred)
        elif r < 0.75:
            neg = "NOT " if self.rng.random() < 0.4 else ""
            sub = self.fmt(
                f"{neg}EXISTS (SELECT 1 FROM {inner} WHERE "
                f"{inner}.{ikey} = {outer}.{okey} AND {{0}})",
                f"{neg}EXISTS (SELECT 1 FROM {inner} WHERE "
                f"{inner}.{ikey} = {outer}.{okey} AND {{0}})", ipred)
        else:
            iic = self.int_cols(iscope)
            agg = self.pick(["MIN", "MAX"])
            e = self.d_int(iic, 1)
            sub = self.fmt(
                f"{outer}.{okey} <= (SELECT {agg}({{0}}) FROM {inner} "
                f"WHERE {{1}})",
                f"{outer}.{okey} <= (SELECT {agg}({{0}}) FROM {inner} "
                f"WHERE {{1}})", e, ipred)
        opred = self.d_pred(oscope, 1)
        return self.fmt(
            f"SELECT {projs[0][0]}, {projs[1][0]} FROM {outer} "
            f"WHERE {{0}} AND {{1}}",
            f"SELECT {projs[0][1]}, {projs[1][1]} FROM {outer} "
            f"WHERE {{0}} AND {{1}}",
            sub, opred)

    def dq_window(self):
        """Analytic functions over DIALECT expressions — the AnalyticEval
        surface (SURVEY §2.5) composed with the dialect layer: partition
        keys, order-by prefixes and function arguments all draw from the
        paired Impala/ANSI expression grammar. Window functions themselves
        are spelled identically in both engines; determinism comes from
        the same total-order envelope as the common grammar (unique-key
        tail verified against the data by verify_unique)."""
        t = self.pick([x for x in TABLES if TABLES[x]["uniq"]])
        scope = {t: TABLES[t]}
        ic = self.int_cols(scope)
        sc = self.str_cols(scope)
        uniq = ", ".join(f"{t}.{c}" for c in TABLES[t]["uniq"])
        part = ("", "")
        pr = self.rng.random()
        if sc and pr < 0.55:
            e = self.d_str(sc, 1)
            part = (f"PARTITION BY {e[0]} ", f"PARTITION BY {e[1]} ")
        elif ic and pr < 0.80:
            tt, c = self.pick(ic)
            k = self.rng.randrange(2, 9)
            part = (f"PARTITION BY zeroifnull(nullifzero({tt}.{c} % {k})) ",
                    f"PARTITION BY coalesce(nullif({tt}.{c} % {k}, 0), 0) ")
        prefix = ("", "")
        if ic and self.rng.random() < 0.5:
            e = self.d_int(ic, 1)
            # Explicit NULLS FIRST: dialect int expressions are NULLABLE
            # (nullifzero &c), and window ORDER BY null placement defaults
            # DIFFER — Spark puts NULLs first in ASC, DuckDB (and Impala
            # since 1.2.1) last, which changes ROWS-frame contents. Found
            # by this grammar's first run (f47_0396); pinned executably in
            # DialectSpec. The engine keeps Spark's default; portable SQL
            # spells the placement, exactly like the top-level ORDER BY
            # envelope rule.
            prefix = (f"{e[0]} NULLS FIRST, ", f"{e[1]} NULLS FIRST, ")
        over = (f"({part[0]}ORDER BY {prefix[0]}{uniq})",
                f"({part[1]}ORDER BY {prefix[1]}{uniq})")
        r = self.rng.random()
        if r < 0.20:
            fn = self.pick(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"])
            w = self.fmt(f"{fn} OVER {{0}}", f"{fn} OVER {{0}}", over)
        elif r < 0.35:
            n = self.rng.randrange(2, 8)
            w = self.fmt(f"NTILE({n}) OVER {{0}}",
                         f"NTILE({n}) OVER {{0}}", over)
        elif r < 0.60:
            fn = self.pick(["LAG", "LEAD"])
            e = self.d_int(ic, 1)
            w = self.fmt(f"{fn}({{0}}, 1, 0) OVER {{1}}",
                         f"{fn}({{0}}, 1, 0) OVER {{1}}", e, over)
        elif r < 0.78:
            if self.rng.random() < 0.5:
                frame, fn = ("ROWS BETWEEN UNBOUNDED PRECEDING AND "
                             "CURRENT ROW"), "FIRST_VALUE"
            else:
                frame, fn = ("ROWS BETWEEN CURRENT ROW AND UNBOUNDED "
                             "FOLLOWING"), "LAST_VALUE"
            over = (over[0][:-1] + f" {frame})", over[1][:-1] + f" {frame})")
            e = self.d_int(ic, 1)
            w = self.fmt(f"{fn}({{0}}) OVER {{1}}",
                         f"{fn}({{0}}) OVER {{1}}", e, over)
        else:
            frame = self.pick([
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
                "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
                f"ROWS BETWEEN {self.rng.randrange(1, 5)} PRECEDING "
                f"AND CURRENT ROW"])
            over = (over[0][:-1] + f" {frame})", over[1][:-1] + f" {frame})")
            e = self.d_int(ic, 1)
            w = self.fmt("CAST(SUM({0}) OVER {1} AS BIGINT)",
                         "CAST(SUM({0}) OVER {1} AS BIGINT)", e, over)
        keys = ", ".join(f"{t}.{c} AS k{i}"
                         for i, c in enumerate(TABLES[t]["uniq"]))
        pred = self.d_pred(scope, 1)
        return self.fmt(
            f"SELECT {keys}, {{0}} AS w0 FROM {t} WHERE {{1}}",
            f"SELECT {keys}, {{0}} AS w0 FROM {t} WHERE {{1}}",
            w, pred)

    def query_pair(self):
        r = self.rng.random()
        if r < 0.32:
            return self.dq_select()
        if r < 0.64:
            return self.dq_agg()
        if r < 0.84:
            return self.dq_subquery()
        return self.dq_window()


class NestedGen(Gen):
    # rev 1 = first nested-type grammar (round 10)
    GRAMMAR_REV = 1

    """Nested-type grammar (v4): array/map/struct/JSON-path expressions —
    the claimed JSON-superset surface that previously had only curated
    coverage. Values are CONSTRUCTED inline from flat columns (array(),
    named_struct(), map(), concat-built JSON documents), then consumed
    through the nested eval paths: element_at with data-dependent
    indices, struct field access (incl. a field of an exploded struct),
    explode/posexplode as lateral generators, size/sort_array,
    get_json_object over nested paths.

    Oracle strategy: DuckDB computes the FLAT TRUTH of each expression
    (e.g. engine `element_at(array(a,b,c), 1 + ic % 3)` pairs with
    `CASE ic % 3 WHEN 0 THEN a ... END`) rather than mirroring the
    nested construction — the oracle's job is ground truth, and a flat
    reformulation can't share a nested-eval bug with the engine. Same
    envelope rules as the dialect grammar (integer-exact values,
    comparator sorts rows)."""

    def nexpr(self, scope):
        """One paired (engine, duck) projection over in-scope columns.

        Ints are coalesce-wrapped (outer joins make them nullable, and
        null-in-nested semantics legitimately differ: Spark's least()
        skips nulls while sort_array puts them first; a null JSON
        fragment nulls the whole concat) and indices go through abs()
        (element_at's 1-based domain rejects 0/negatives) — both sides
        of each pair see the IDENTICAL wrapped input, so the envelope
        constrains values without hiding nested-eval bugs."""
        ics = self.int_cols(scope)
        scs = self.str_cols(scope)
        t, a = self.pick(ics)
        t2, b = self.pick(ics)
        t3, c = self.pick(ics)
        ea, eb, ec = (f"coalesce({t}.{a}, -1)", f"coalesce({t2}.{b}, -1)",
                      f"coalesce({t3}.{c}, -1)")
        r = self.rng.random()
        if r < 0.22:  # array + data-dependent index
            if self.rng.random() < 0.5:
                idx = self.rng.randrange(1, 4)
                return (f"element_at(array({ea}, {eb}, {ec}), {idx})",
                        [ea, eb, ec][idx - 1])
            return (f"element_at(array({ea}, {eb}, {ec}), "
                    f"CAST(1 + abs({ea}) % 3 AS INT))",
                    f"CASE (abs({ea}) % 3) WHEN 0 THEN {ea} WHEN 1 THEN {eb} "
                    f"WHEN 2 THEN {ec} END")
        if r < 0.36:  # array size / sorted head
            if self.rng.random() < 0.5:
                return (f"size(array({ea}, {eb}, {ec}))", "3")
            return (f"element_at(sort_array(array({ea}, {eb}, {ec})), 1)",
                    f"least({ea}, {eb}, {ec})")
        if r < 0.56:  # struct construction + field access
            f1 = f"named_struct('x', {ea}, 'y', {eb})"
            d1 = f"struct_pack(x := {ea}, y := {eb})"
            fld = self.pick(["x", "y"])
            return (f"({f1}).{fld}", f"({d1}).{fld}")
        if r < 0.74:  # map with a data-dependent key
            if scs:
                ts, s = self.pick(scs)
                es = f"{ts}.{s}"
                cond = f"{es} > {self.lit_of(ts, s, 'str')}"
            else:
                cond = f"{ea} % 2 = 0"
            return (f"element_at(map('k1', {ea}, 'k2', {eb}), "
                    f"CASE WHEN {cond} THEN 'k1' ELSE 'k2' END)",
                    f"CASE WHEN {cond} THEN {ea} ELSE {eb} END")
        if r < 0.9:  # JSON path over a constructed document
            if self.rng.random() < 0.5:
                return (f"get_json_object(concat('{{\"p\":', CAST({ea} AS STRING), "
                        f"',\"q\":', CAST({eb} AS STRING), '}}'), '$.q')",
                        f"CAST({eb} AS VARCHAR)")
            return (f"get_json_object(concat('{{\"o\":{{\"p\":', "
                    f"CAST({ea} AS STRING), '}}}}'), '$.o.p')",
                    f"CAST({ea} AS VARCHAR)")
        # struct field through an array element (pruning through nesting)
        return (f"element_at(array(named_struct('v', {ea}), "
                f"named_struct('v', {eb})), 2).v", eb)

    def query_pair(self):
        """SELECT of 2-3 nested projections (or an explode shape) over a
        random FK join tree with a common-dialect predicate."""
        frm, scope = self.from_clause(self.rng.randrange(0, 2))
        pred = self.predicate(scope)
        if self.rng.random() < 0.25:  # lateral generator shape
            ics = self.int_cols(scope)
            t, a = self.pick(ics)
            t2, b = self.pick(ics)
            ea, eb = f"{t}.{a}", f"{t2}.{b}"
            key_t, key_c = self.pick(ics)
            key = f"{key_t}.{key_c}"
            if self.rng.random() < 0.5:
                eng = (f"SELECT k0, ev FROM (SELECT {key} AS k0, "
                       f"explode(array({ea}, {eb})) AS ev "
                       f"FROM {frm} WHERE {pred}) sub")
                duck = (f"SELECT {key} AS k0, UNNEST([{ea}, {eb}]) AS ev "
                        f"FROM {frm} WHERE {pred}")
            else:  # posexplode: position must ride along
                eng = (f"SELECT k0, p, ev FROM (SELECT {key} AS k0, "
                       f"posexplode(array({ea}, {eb})) AS (p, ev) "
                       f"FROM {frm} WHERE {pred}) sub")
                duck = (f"SELECT {key} AS k0, "
                        f"UNNEST([0, 1]) AS p, UNNEST([{ea}, {eb}]) AS ev "
                        f"FROM {frm} WHERE {pred}")
            return eng, duck
        n_proj = self.rng.randrange(2, 4)
        pairs = [self.nexpr(scope) for _ in range(n_proj)]
        esel = ", ".join(f"{e} AS c{i}" for i, (e, _) in enumerate(pairs))
        dsel = ", ".join(f"{d} AS c{i}" for i, (_, d) in enumerate(pairs))
        return (f"SELECT {esel} FROM {frm} WHERE {pred}",
                f"SELECT {dsel} FROM {frm} WHERE {pred}")


class WriteGen(Gen):
    # rev 1 = first write-path grammar (round 10)
    GRAMMAR_REV = 1

    """Write-path grammar (v3): INSERT INTO / INSERT OVERWRITE
    [PARTITION] / CTAS round-trips — the reference's insert.test family
    (dynamic partitions, static-partition overwrite, self-insert, NULL
    partition keys) as differential fuzz. Each record is a DML SCRIPT:

      setup        engine statements (CREATE/CTAS/INSERTs), run in order
      sql          probe SELECT over the written table (rows sorted by
                   the comparator, so no ORDER BY needed)
      teardown     DROP statements (engine catalog stays clean)
      oracle_setup / oracle_sql   the DuckDB translation

    DuckDB has no partitioned storage, so the oracle models CONTENT
    semantics: a dynamic-partition INSERT is content-equivalent to a
    plain INSERT SELECT (partitioning moves bytes, not rows); a STATIC
    partition OVERWRITE is DELETE-where-partition-value then INSERT —
    exactly the reference's semantics. NULL partition keys ride NULLIF
    on the partition column (the __HIVE_DEFAULT_PARTITION__ path: the
    null lands in the default partition on disk but must read back as
    SQL NULL)."""

    TYPE_MAP = {"int": ("BIGINT", "BIGINT"), "dbl": ("DOUBLE", "DOUBLE"),
                "str": ("STRING", "VARCHAR")}

    def __init__(self, rng, pools, probe=None, seed=0):
        super().__init__(rng, pools, probe)
        self.seed = seed
        self.counter = 0

    def target_cols(self, t):
        """2-4 source columns (>=1 int, >=1 str when available), aliased
        a0.. with engine/duck DDL types."""
        cols = []
        spec = TABLES[t]
        ints = [c for c in spec["ints"]]
        strs = [c for c in spec["strs"]]
        dbls = [c for c in spec["dbls"]]
        self.rng.shuffle(ints); self.rng.shuffle(strs); self.rng.shuffle(dbls)
        picked = [("int", ints[0])] + ([("str", strs[0])] if strs else [])
        for kind, pool in (("int", ints[1:]), ("dbl", dbls), ("str", strs[1:])):
            for c in pool:
                if len(picked) >= 4:
                    break
                if self.rng.random() < 0.4:
                    picked.append((kind, c))
        for i, (kind, c) in enumerate(picked):
            cols.append(dict(kind=kind, src=c, alias=f"a{i}",
                             etype=self.TYPE_MAP[kind][0],
                             dtype=self.TYPE_MAP[kind][1]))
        return cols

    def select_parts(self, t, cols, null_part_col=None):
        """(select_list, from_where_tail) for an INSERT-feeding SELECT —
        kept as PARTS so callers composing variants (the statpart oracle
        appends a partition literal to the select list) never have to
        re-split the SQL text on " FROM ", which would miscut if a sampled
        string literal ever contained that substring."""
        scope = {t: TABLES[t]}
        pred = self.predicate(scope, depth=1)
        parts = []
        for c in cols:
            e = f"{t}.{c['src']}"
            if c["kind"] == "int":
                e = f"CAST({e} AS BIGINT)"
            if null_part_col == c["alias"]:
                lit = self.lit_of(t, c["src"], c["kind"])
                e = f"NULLIF({e}, {lit})"
            # alias ALWAYS: engines derive different auto-names from
            # expressions (Spark keeps the cast child's name, DuckDB the
            # full expression text), and CTAS turns those into schema
            parts.append(f"{e} AS {c['alias']}")
        return ", ".join(parts), f"FROM {t} WHERE {pred}"

    def src_select(self, t, cols, null_part_col=None):
        """SELECT feeding an INSERT: single-table filtered projection in
        target-column order; optionally NULLIF-wraps one column so NULL
        partition/general NULL handling is exercised."""
        sel, tail = self.select_parts(t, cols, null_part_col)
        return f"SELECT {sel} {tail}"

    def values_rows(self, t, cols, n_rows):
        rows = []
        for _ in range(n_rows):
            vals = []
            for c in cols:
                if self.rng.random() < 0.15:
                    vals.append("NULL")
                else:
                    vals.append(self.lit_of(t, c["src"], c["kind"]))
            rows.append("(" + ", ".join(vals) + ")")
        return ", ".join(rows)

    def script(self):
        """One round-trip record; returns a dict (no name/sf/grammar —
        gen_corpus stamps those)."""
        t = self.pick([x for x in TABLES if TABLES[x]["strs"]])
        cols = self.target_cols(t)
        tbl = f"fz_w{self.seed}_{self.counter}"
        self.counter += 1
        ddl_e = ", ".join(f"{c['alias']} {c['etype']}" for c in cols)
        ddl_d = ", ".join(f"{c['alias']} {c['dtype']}" for c in cols)
        setup = [f"DROP TABLE IF EXISTS {tbl}"]
        oset = [f"DROP TABLE IF EXISTS {tbl}"]
        kind = self.pick(["ctas", "append", "values", "overwrite",
                          "dynpart", "statpart", "self_insert"])
        if kind == "ctas":
            body = self.src_select(t, cols)
            setup.append(f"CREATE TABLE {tbl} USING parquet AS {body}")
            oset.append(f"CREATE TABLE {tbl} AS {body}")
        elif kind == "values":
            setup.append(f"CREATE TABLE {tbl} ({ddl_e}) USING parquet")
            oset.append(f"CREATE TABLE {tbl} ({ddl_d})")
            for _ in range(self.rng.randrange(1, 3)):
                vals = self.values_rows(t, cols, self.rng.randrange(1, 4))
                stmt = f"INSERT INTO {tbl} VALUES {vals}"
                setup.append(stmt); oset.append(stmt)
        elif kind in ("append", "overwrite", "self_insert"):
            setup.append(f"CREATE TABLE {tbl} ({ddl_e}) USING parquet")
            oset.append(f"CREATE TABLE {tbl} ({ddl_d})")
            for _ in range(self.rng.randrange(1, 3)):
                body = self.src_select(t, cols)
                setup.append(f"INSERT INTO {tbl} {body}")
                oset.append(f"INSERT INTO {tbl} {body}")
            if kind == "overwrite":
                body = self.src_select(t, cols)
                setup.append(f"INSERT OVERWRITE TABLE {tbl} {body}")
                oset.append(f"DELETE FROM {tbl}")
                oset.append(f"INSERT INTO {tbl} {body}")
            elif kind == "self_insert":
                c0 = cols[0]["alias"]
                lit = self.lit_of(t, cols[0]["src"], cols[0]["kind"])
                stmt = f"INSERT INTO {tbl} SELECT * FROM {tbl} WHERE {c0} >= {lit}"
                setup.append(stmt); oset.append(stmt)
        else:  # dynpart / statpart: partition column = last (a string col)
            pcol = dict(kind="str", src=self.pick(TABLES[t]["strs"]),
                        alias="p", etype="STRING", dtype="VARCHAR")
            cols = cols + [pcol]
            ddl_e = ", ".join(f"{c['alias']} {c['etype']}" for c in cols)
            ddl_d = ", ".join(f"{c['alias']} {c['dtype']}" for c in cols)
            setup.append(
                f"CREATE TABLE {tbl} ({ddl_e}) USING parquet PARTITIONED BY (p)")
            oset.append(f"CREATE TABLE {tbl} ({ddl_d})")
            null_part = "p" if self.rng.random() < 0.4 else None
            body = self.src_select(t, cols, null_part_col=null_part)
            setup.append(f"INSERT INTO {tbl} {body}")
            oset.append(f"INSERT INTO {tbl} {body}")
            if kind == "statpart":
                pv = self.lit_of(t, pcol["src"], "str")
                sel2, tail2 = self.select_parts(t, cols[:-1])
                setup.append(
                    f"INSERT OVERWRITE TABLE {tbl} PARTITION (p={pv}) "
                    f"SELECT {sel2} {tail2}")
                oset.append(f"DELETE FROM {tbl} WHERE p = {pv}")
                oset.append(f"INSERT INTO {tbl} SELECT {sel2}, {pv} {tail2}")
        probe = f"SELECT * FROM {tbl}"
        return dict(kind=kind, setup=setup, sql=probe,
                    teardown=[f"DROP TABLE IF EXISTS {tbl}"],
                    oracle_setup=oset, oracle_sql=probe)


class DdlGen(WriteGen):
    # rev 1 = first DDL-sequence grammar (round 11)
    GRAMMAR_REV = 1

    """DDL-sequence grammar (v5): CREATE [PARTITIONED] -> ALTER (add
    columns / rename table / add+drop partitions / tblproperties /
    analyze) -> INSERT -> DESCRIBE/SHOW -> probe, as statement SEQUENCES
    (the reference's AnalyzerTest/ParserTest breadth over sql-parser.y,
    exercised as catalog-lifecycle fuzz rather than curated specs).

    DuckDB models the CATALOG SEMANTICS, not the storage:
      - ADD COLUMNS -> ADD COLUMN: pre-existing rows read NULL in both
        (Spark: missing parquet column; DuckDB: fill-NULL).
      - RENAME TO is common syntax.
      - ADD PARTITION is content-neutral (an empty partition has no
        rows) -> no-op; DROP PARTITION (p=v) -> DELETE WHERE p = v,
        exactly the reference's drop-partition semantics.
      - TBLPROPERTIES / ANALYZE / SHOW / DESCRIBE mid-sequence are
        engine-only (content-neutral); their non-failure IS the check.
      - the probe is either SELECT * (content semantics) or, on
        non-partitioned tables, DESCRIBE itself — the generator KNOWS the
        expected post-ALTER schema and synthesizes the oracle as VALUES
        (col_name, data_type, comment), so schema evolution is
        hash-checked, not just non-crashing.

    Column-position trap, by construction: after ADD COLUMNS on a
    partitioned table Spark's schema is (data cols.., new cols.., p)
    while DuckDB's is creation-order + appended — positional INSERTs
    would diverge silently, so every post-CREATE INSERT carries an
    explicit column list and the comparator's by-name column sort does
    the rest."""

    DESC_TYPE = {"BIGINT": "bigint", "DOUBLE": "double", "STRING": "string"}

    def script(self):
        t = self.pick([x for x in TABLES if TABLES[x]["strs"]])
        cols = self.target_cols(t)
        tbl = f"fz_d{self.seed}_{self.counter}"
        self.counter += 1
        partitioned = self.rng.random() < 0.4
        # engine-side schema tracker: list of (name, engine_type) in
        # Spark's display order — data cols first, partition col LAST
        schema = [(c["alias"], c["etype"]) for c in cols]
        setup, oset = [f"DROP TABLE IF EXISTS {tbl}"], [f"DROP TABLE IF EXISTS {tbl}"]
        pcol = None
        if partitioned:
            pcol = dict(kind="str", src=self.pick(TABLES[t]["strs"]),
                        alias="p", etype="STRING", dtype="VARCHAR")
            ddl_e = ", ".join(f"{c['alias']} {c['etype']}" for c in cols + [pcol])
            ddl_d = ", ".join(f"{c['alias']} {c['dtype']}" for c in cols + [pcol])
            setup.append(
                f"CREATE TABLE {tbl} ({ddl_e}) USING parquet PARTITIONED BY (p)")
            oset.append(f"CREATE TABLE {tbl} ({ddl_d})")
            schema.append(("p", "STRING"))
        else:
            ddl_e = ", ".join(f"{c['alias']} {c['etype']}" for c in cols)
            ddl_d = ", ".join(f"{c['alias']} {c['dtype']}" for c in cols)
            setup.append(f"CREATE TABLE {tbl} ({ddl_e}) USING parquet")
            oset.append(f"CREATE TABLE {tbl} ({ddl_d})")

        def insert_now(cur_name):
            """INSERT with an explicit column list covering the FULL
            current schema (added cols get literals / NULL)."""
            names = [n for n, _ in schema]
            sel, tail = self.select_parts(t, cols)
            extras = []
            for n, ty in schema:
                if n == "p" or any(c["alias"] == n for c in cols):
                    continue
                if self.rng.random() < 0.3:
                    extras.append(f"CAST(NULL AS {ty}) AS {n}")
                elif ty == "STRING":
                    extras.append(f"'x{len(extras)}' AS {n}")
                else:
                    extras.append(f"CAST({self.rng.randrange(100)} AS {ty}) AS {n}")
            parts = [sel] + extras
            if partitioned:
                # p last in the engine schema; reorder the select to the
                # explicit list order (data cols, added cols, p)
                psel = f"{t}.{pcol['src']} AS p"
                parts = parts + [psel]
            collist = ", ".join(
                [c["alias"] for c in cols] +
                [n for n, _ in schema
                 if n != "p" and not any(c["alias"] == n for c in cols)] +
                (["p"] if partitioned else []))
            stmt = f"INSERT INTO {tbl_ref[0]} ({collist}) SELECT {', '.join(parts)} {tail}"
            setup.append(stmt); oset.append(stmt)

        tbl_ref = [tbl]  # current name (RENAME TO mutates it)
        insert_now(tbl)

        n_ops = self.rng.randrange(2, 5)
        zi = 0
        for _ in range(n_ops):
            op = self.pick(["addcol", "insert", "tblprops", "analyze",
                            "rename", "partops", "show"])
            cur = tbl_ref[0]
            if op == "addcol":
                ty = self.pick(["BIGINT", "DOUBLE", "STRING"])
                name = f"z{zi}"; zi += 1
                setup.append(f"ALTER TABLE {cur} ADD COLUMNS ({name} {ty})")
                oset.append(
                    f"ALTER TABLE {cur} ADD COLUMN {name} "
                    f"{'VARCHAR' if ty == 'STRING' else ty}")
                # Spark displays added cols after data cols, before p
                if partitioned:
                    schema.insert(len(schema) - 1, (name, ty))
                else:
                    schema.append((name, ty))
            elif op == "insert":
                insert_now(cur)
            elif op == "tblprops":
                setup.append(
                    f"ALTER TABLE {cur} SET TBLPROPERTIES ('graft.fuzz'='1')")
                setup.append(f"SHOW TBLPROPERTIES {cur}")
            elif op == "analyze":
                setup.append(f"ANALYZE TABLE {cur} COMPUTE STATISTICS")
            elif op == "rename" and cur == tbl:  # at most one rename
                new = f"{tbl}_r"
                setup.append(f"ALTER TABLE {cur} RENAME TO {new}")
                oset.append(f"ALTER TABLE {cur} RENAME TO {new}")
                tbl_ref[0] = new
            elif op == "partops" and partitioned:
                lit = self.lit_of(t, pcol["src"], "str")
                setup.append(
                    f"ALTER TABLE {cur} ADD IF NOT EXISTS PARTITION (p='zz_empty')")
                if self.rng.random() < 0.6:
                    setup.append(
                        f"ALTER TABLE {cur} DROP IF EXISTS PARTITION (p={lit})")
                    oset.append(f"DELETE FROM {cur} WHERE p = {lit}")
                setup.append(f"SHOW PARTITIONS {cur}")
            elif op == "show":
                setup.append(self.pick(
                    [f"DESCRIBE {cur}", f"SHOW COLUMNS IN {cur}",
                     f"SHOW CREATE TABLE {cur}"]))

        cur = tbl_ref[0]
        if not partitioned and self.rng.random() < 0.4:
            # schema probe: DESCRIBE vs the generator's tracked schema
            kind = "ddl_describe"
            probe = f"DESCRIBE {cur}"
            rows = ", ".join(
                f"('{n}', '{self.DESC_TYPE[ty]}', CAST(NULL AS VARCHAR))"
                for n, ty in schema)
            oracle = (f"SELECT * FROM (VALUES {rows}) "
                      f"AS d(col_name, data_type, comment)")
        else:
            kind = "ddl_content"
            probe = f"SELECT * FROM {cur}"
            oracle = probe
        return dict(kind=kind, setup=setup, sql=probe,
                    teardown=[f"DROP TABLE IF EXISTS {tbl}",
                              f"DROP TABLE IF EXISTS {tbl}_r"],
                    oracle_setup=oset, oracle_sql=oracle)


def gen_corpus(seed, n, sf_dir, dialect=False, write=False, nested=False,
               ddl=False):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    verify_unique(con)
    scripted = write or ddl
    cls = (DdlGen if ddl else WriteGen if write else NestedGen if nested
           else DialectGen if dialect else Gen)
    g = (cls(random.Random(seed), sample_literals(con, sf_dir),
             probe=lambda q: con.execute(q).fetchall(), seed=seed)
         if scripted else
         cls(random.Random(seed), sample_literals(con, sf_dir),
             probe=lambda q: con.execute(q).fetchall()))
    out, seen = [], set()
    i = 0
    while len(out) < n:
        script = None
        if scripted:
            script = g.script()
            # dedup key must normalize the per-script table name
            # (fz_[wd]{seed}_{counter} is unique every call, so raw setup
            # tuples NEVER collide and the dedup would be dead code)
            sql, oracle = tuple(
                re.sub(r"fz_[wd]\d+_\d+", "<T>", s) for s in script["setup"]), None
        elif dialect or nested:
            sql, oracle = g.query_pair()
        else:
            sql, oracle = g.query(), None
        i += 1
        if sql in seen:
            continue
        seen.add(sql)
        if scripted:
            rec = {"name": f"f{seed}_{len(out):04d}", **{
                k: v for k, v in script.items()},
                "sf": os.path.basename(os.path.normpath(sf_dir)),
                "grammar": cls.GRAMMAR_REV}
            out.append(rec)
            continue
        # sf rides along so the offline replay (FuzzCorpusSpec) runs each
        # corpus against the data it was DuckDB-verified on; corpora
        # without the field (seeds 42/43) default to sf0.001 there.
        # grammar records the generator revision the corpus was drawn
        # from: grammar growth changes RNG consumption, so SAME-seed
        # regeneration under a LATER grammar produces a different stream
        # — committed corpora are frozen files (never re-derived), and
        # the tag makes any accidental cross-version regeneration
        # detectable instead of silently divergent. History: dialect
        # corpora seeds 45/46 were drawn at dialect-grammar rev 1
        # (pre-dq_window); seeds 47+ at rev 2.
        rec = {"name": f"f{seed}_{len(out):04d}", "sql": sql,
               "sf": os.path.basename(os.path.normpath(sf_dir)),
               "grammar": cls.GRAMMAR_REV}
        if oracle is not None and oracle != sql:
            rec["oracle_sql"] = oracle
        out.append(rec)
    con.close()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/fuzz")
    ap.add_argument("--corpus-only", action="store_true",
                    help="write queries.jsonl and exit")
    ap.add_argument("--skip-engine", action="store_true",
                    help="reuse an existing engine output dir")
    ap.add_argument("--dialect", action="store_true",
                    help="dialect-axis grammar: engine runs Impala-dialect "
                         "SQL, DuckDB runs the paired ANSI translation")
    ap.add_argument("--write", action="store_true",
                    help="write-path grammar (v3): INSERT/CTAS/partition "
                         "round-trip scripts instead of SELECT queries")
    ap.add_argument("--nested", action="store_true",
                    help="nested-type grammar (v4): array/map/struct/JSON "
                         "expressions vs a flat-truth DuckDB oracle")
    ap.add_argument("--ddl", action="store_true",
                    help="DDL-sequence grammar (v5): CREATE/ALTER/INSERT/"
                         "DESCRIBE/SHOW lifecycle scripts with DuckDB "
                         "modeling the catalog semantics")
    ap.add_argument("--replay", metavar="CORPUS_JSONL",
                    help="skip generation and re-validate a committed "
                         "frozen corpus (e.g. src/test/resources/fuzz/"
                         "corpus_seed42.jsonl) against DuckDB — the only "
                         "honest validation path for corpora drawn at an "
                         "earlier grammar rev, where same-seed "
                         "regeneration emits a different stream")
    ap.add_argument("--max-print", type=int, default=8)
    a = ap.parse_args()

    os.makedirs(a.out, exist_ok=True)
    if a.replay:
        corpus = [json.loads(l) for l in open(a.replay)]
        # committed corpora are single-sf; records without the field are
        # the seed-42/43 era (drawn and verified at sf0.001)
        sfs = {q.get("sf", "sf0.001") for q in corpus}
        assert len(sfs) == 1, f"mixed-sf corpus: {sfs}"
        a.sf = f"/root/testdata/{sfs.pop()}"
        print(f"[fuzz] replaying {len(corpus)} frozen queries from "
              f"{a.replay} at {a.sf}")
    else:
        corpus = gen_corpus(a.seed, a.n, a.sf, dialect=a.dialect,
                            write=a.write, nested=a.nested, ddl=a.ddl)
    qfile = f"{a.out}/queries.jsonl"
    with open(qfile, "w") as f:
        for q in corpus:
            f.write(json.dumps(q) + "\n")
    print(f"[fuzz] wrote {len(corpus)} queries -> {qfile}")
    if a.corpus_only:
        return

    eng_dir = f"{a.out}/engine"
    if not a.skip_engine:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=a.sf)
        rc = subprocess.run(
            ["sbt", "-batch", f"runMain graft.FuzzRunner {qfile} {eng_dir}"],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))).returncode
        if rc != 0:
            print(f"[fuzz] engine run failed rc={rc}"); sys.exit(2)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{a.sf}/{t}.parquet')")
    errors = [json.loads(l) for l in
              open(f"{eng_dir}/errors.json")] if \
        os.path.exists(f"{eng_dir}/errors.json") else []
    err_names = {e["name"] for e in errors}
    n_pass = n_fail = 0
    fails = []
    for q in corpus:
        # dialect-axis corpora carry a paired ANSI oracle_sql; DuckDB runs
        # that side, the engine always runs "sql" (the Impala dialect).
        name, sql = q["name"], q.get("oracle_sql", q["sql"])
        if name in err_names:
            n_fail += 1; fails.append((name, "engine_error", q["sql"])); continue
        try:
            for stmt in q.get("oracle_setup", []):
                con.execute(stmt)
            dtbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            n_fail += 1; fails.append((name, f"duckdb_error: {e}", sql))
            continue
        stbl = pq.read_table(f"{eng_dir}/{name}.parquet")
        sh, scols, stypes, sn, srows = table_sig(stbl)
        dh, dcols, dtypes, dn, drows = table_sig(dtbl)
        if (scols, stypes, sn, sh) == (dcols, dtypes, dn, dh):
            n_pass += 1
        else:
            n_fail += 1
            why = ("cols" if scols != dcols else
                   "types" if stypes != dtypes else
                   f"rows {sn} vs {dn}" if sn != dn else "hash")
            detail = ""
            if why == "types":
                detail = "; ".join(f"{c}: {stypes[c]} vs {dtypes[c]}"
                                   for c in scols if stypes[c] != dtypes[c])
            elif why == "hash":
                for x, y in zip(srows, drows):
                    if x != y:
                        detail = (f"spark={x.replace(chr(1), ' | ')} "
                                  f"duck={y.replace(chr(1), ' | ')}")
                        break
            fails.append((name, f"{why} {detail}".strip(), sql))
    print(f"[fuzz] seed={a.seed} n={len(corpus)} sf={a.sf}: "
          f"{n_pass} pass, {n_fail + len(err_names)} fail "
          f"({len(err_names)} engine errors)")
    for name, why, sql in fails[:a.max_print]:
        print(f"  FAIL {name}: {why}\n    {sql}")
    with open(f"{a.out}/results.json", "w") as f:
        json.dump({"seed": a.seed, "n": len(corpus), "sf": a.sf,
                   "pass": n_pass, "fail": n_fail,
                   "fails": [{"name": n, "why": w, "sql": s}
                             for n, w, s in fails]}, f, indent=1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
