#!/usr/bin/env python3
"""Scale-curve soak: run the heavy catalog families at increasing scale
factors and fit per-entry scaling exponents.

The r8 sf1 soak caught a real quadratic by hand (q_dedup_components went
136x for 10x data — an n-gram posting-list kernel invisible at every
driver SF); this tool makes that check repeatable and mechanical. For
each adjacent pair of scale factors it computes

    alpha = log(t2/t1) / log(sf2/sf1)

per entry and flags anything with alpha > --thresh whose absolute time at
the larger SF also exceeds --floor seconds (sub-second entries are mostly
fixed overhead; their exponents are noise). alpha ~ 1 is linear scaling,
the 100 TB contract; alpha >= 2 is the class of bug this exists to catch.

Each SF runs as its own JVM (sbt runMain graft.Bench <entries>) with
SPARK_GRAFT_ISOLATE_N=0 — the curve wants one steady-state number per
(entry, SF), not the contention-adjudication pair the driver bench wants.

Usage:
  python3 tools/soak.py [--sfs dir1,dir2,...] [--entries a,b,... ]
                        [--out /tmp/soak] [--thresh 1.35] [--floor 0.75]
Writes out/soak.json and prints a markdown table. Exit 1 iff any entry is
flagged superlinear.
"""
import argparse, json, math, os, re, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The families whose cost is data-dependent enough for a curve to mean
# something: the LLM-pipeline operators (the 100 TB surface), plus the
# shuffle-heaviest relational shapes as a control group.
HEAVY = [
    # dedup family
    "q_dedup_exact", "q_dedup_lines", "q_dedup_minhash",
    "q_dedup_minhash_prod", "q_dedup_minhash_prod_raw", "q_dedup_ngram",
    "q_dedup_simhash", "q_dedup_components", "q_dedup_cosine",
    "q_dedup_cosine_ivf", "q_contamination", "q_dedup_substring",
    # similarity search
    "q_sim_search", "q_sim_search_lsh", "q_sim_search_ivf",
    "q_sim_search_q8", "q_sim_search_q8_raw",
    # text / pipeline ops
    "q_pipeline_e2e", "q_split_leakage_safe", "q_text_stats",
    "q_rep_filters", "q_quality_filter", "q_mix_weighted", "q_vocab_topk",
    "q_vocab_topk_approx", "q_bm25_topk",
    "q_pack", "q_chunk", "q_text_scrub", "q_text_fingerprints",
    "q_sessionize",
    # relational control group
    "q1_agg", "q3_join", "q9_profit", "q18_large_orders",
    "q21_waiting_supplier", "q_stress_selfjoin", "q_window_frames",
    "q_agg_approx", "q_perf_agg_highcard", "q_perf_string_grep",
]


def run_sf(sf_dir, entries, out_dir):
    # Bench writes to SPARK_GRAFT_BENCH_OUT — pointed INSIDE the soak out
    # dir so a soak can never touch the repo's committed bench_result.json
    # (r11: a killed run clobbered it before the finally-restore below
    # could fire; Bench itself now also refuses to write the repo artifact
    # for non-driver SF dirs, this is belt and braces).
    bench_out = f"{out_dir}/bench_{tag(sf_dir)}.json"
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_ISOLATE_N="0",
               SPARK_GRAFT_BENCH_OUT=bench_out)
    # Soak corpora are 10-30x the driver SF; the default 8g heap is what
    # killed the r11 sf10d run mid-sweep ("stopped SparkContext" = local-
    # mode OOM) and stalls allocation at sf30d. Respect an explicit
    # caller setting, otherwise give soak benches a corpus-scale heap.
    env.setdefault("SPARK_DRIVER_MEM", "48g")
    rc = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench " + " ".join(entries)],
        env=env, cwd=REPO, stdout=open(f"{out_dir}/sbt_{tag(sf_dir)}.log", "w"),
        stderr=subprocess.STDOUT).returncode
    if rc != 0:
        print(f"[soak] bench failed rc={rc} at {sf_dir} "
              f"(see {out_dir}/sbt_{tag(sf_dir)}.log)")
        sys.exit(2)
    with open(bench_out) as f:
        return json.load(f)


def tag(sf_dir):
    return os.path.basename(sf_dir.rstrip("/"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="/root/testdata/sf0.1,/tmp/sf1,/tmp/sf3")
    ap.add_argument("--entries", default=",".join(HEAVY))
    ap.add_argument("--out", default="/tmp/soak")
    ap.add_argument("--thresh", type=float, default=1.35)
    ap.add_argument("--floor", type=float, default=0.75)
    ap.add_argument("--fit-only", action="store_true",
                    help="skip the benches; refit from the Bench JSON "
                         "lines already in <out>/sbt_<tag>.log (for "
                         "re-running the analysis after a fit bug)")
    a = ap.parse_args()
    sfs = a.sfs.split(",")
    entries = a.entries.split(",")
    os.makedirs(a.out, exist_ok=True)

    # Bench writes the repo's bench_result.json (the driver artifact) —
    # snapshot it and restore after the sweep so a soak never clobbers
    # the committed driver numbers.
    bench_path = f"{REPO}/bench_result.json"
    saved = open(bench_path).read() if os.path.exists(bench_path) else None

    results = {}  # tag -> bench json
    try:
        for d in sfs:
            if a.fit_only:
                with open(f"{a.out}/sbt_{tag(d)}.log") as f:
                    line = [l for l in f if l.startswith('{"metric"')][-1]
                results[tag(d)] = json.loads(line)
                continue
            print(f"[soak] running {len(entries)} entries at {d} ...")
            results[tag(d)] = run_sf(d, entries, a.out)
    finally:
        if saved is not None:
            with open(bench_path, "w") as f:
                f.write(saved)

    tags = [tag(d) for d in sfs]
    # Bench quotes non-numeric sf tags (sf1d -> "1d"); the numeric scale
    # for the exponent fit is the leading number of the tag.
    def scale(v):
        m = re.match(r"[0-9.]+", str(v))
        if not m:
            raise ValueError(f"cannot read a scale factor from sf tag {v!r}")
        return float(m.group(0))
    sf_of = {t: scale(results[t]["sf"]) for t in tags}
    flagged = []
    lines = ["| entry | " + " | ".join(f"{t} (s)" for t in tags) +
             " | " + " | ".join(f"α {tags[i]}→{tags[i+1]}"
                                for i in range(len(tags) - 1)) + " |",
             "|---|" + "---|" * (2 * len(tags) - 1)]
    for e in entries:
        ts = [results[t]["queries"].get(e) for t in tags]
        alphas = []
        for i in range(len(tags) - 1):
            t1, t2 = ts[i], ts[i + 1]
            if t1 and t2 and t1 > 0:
                al = math.log(t2 / t1) / math.log(sf_of[tags[i + 1]] / sf_of[tags[i]])
                alphas.append(al)
                if al > a.thresh and t2 > a.floor:
                    flagged.append((e, tags[i], tags[i + 1], al, t1, t2))
            else:
                alphas.append(None)
        lines.append(
            "| " + e + " | " +
            " | ".join("-" if t is None else f"{t:.2f}" for t in ts) + " | " +
            " | ".join("-" if al is None else f"{al:.2f}" for al in alphas) + " |")
    report = "\n".join(lines)
    print(report)
    failed = {t: results[t].get("failed", {}) for t in tags
              if results[t].get("failed")}
    with open(f"{a.out}/soak.json", "w") as f:
        json.dump({"sfs": {t: sf_of[t] for t in tags},
                   "times": {t: results[t]["queries"] for t in tags},
                   "failed": failed,
                   "flagged": [dict(entry=e, frm=f1, to=f2, alpha=al,
                                    t1=t1, t2=t2)
                               for e, f1, f2, al, t1, t2 in flagged]},
                  f, indent=1)
    with open(f"{a.out}/soak.md", "w") as f:
        f.write(report + "\n")
    if failed:
        print(f"[soak] FAILED entries: {failed}")
        sys.exit(2)
    if flagged:
        print("[soak] SUPERLINEAR entries flagged:")
        for e, f1, f2, al, t1, t2 in flagged:
            print(f"  {e}: {f1}={t1:.2f}s -> {f2}={t2:.2f}s (alpha {al:.2f})")
        sys.exit(1)
    print(f"[soak] all {len(entries)} entries within alpha<={a.thresh} "
          f"(or below {a.floor}s floor)")


if __name__ == "__main__":
    main()
