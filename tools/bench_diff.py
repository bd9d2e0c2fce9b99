#!/usr/bin/env python3
"""Round-over-round bench attribution (VERDICT_r10 "What's missing" #3).

Usage: python3 tools/bench_diff.py OLD.json NEW.json [threshold]

Both inputs are bench_result.json / BENCH_rN.json lines from graft.Bench.
For each entry the EFFECTIVE time is min(sweep, isolated) — the
contention-free estimate; the sweep-vs-isolated gap within one file is
contention evidence, never plan evidence. Classification per entry:

  REGRESSED   eff_new > threshold * eff_old      (real candidates: the
              isolated number moved too, so it's code or data, not noise)
  improved    eff_new < eff_old / threshold
  contention  sweep_new > threshold * eff_new    (the sweep number alone
              spiked; the isolated twin sits at historical level)
  ok          everything else
  new / gone  entry exists in only one file

Exit code 1 iff any entry is REGRESSED — wire it into the round protocol
so an unattributed slowdown fails loudly instead of ghosting the bench.
"""
import json, sys


def load(path):
    with open(path) as f:
        txt = f.read().strip()
    # bench output is one JSON line, possibly with an sbt "[info] " prefix
    start = txt.find("{")
    doc = json.loads(txt[start:])
    if "queries" in doc:
        return doc.get("queries", {}), doc.get("isolated", {})
    # the driver's BENCH_rN.json wraps a TRUNCATED escaped fragment of the
    # bench line under "tail" — recover whatever (name, seconds) pairs
    # survive; the leading cut may drop early entries (they diff as "gone")
    import re
    tail = doc.get("tail", "")
    blocks = {}
    # isolated map follows the queries map in the emitted line; split on
    # the labels so an entry isolated AND swept lands in both maps
    parts = re.split(r'"(isolated|resweep|baseline_regressed|failed)"\s*:', tail)
    pair = re.compile(r'"(q[^"]*)"\s*:\s*([0-9.]+)')

    def pairs(seg):
        return {m.group(1): float(m.group(2)) for m in pair.finditer(seg)}

    sweep, iso = pairs(parts[0]), {}
    for j in range(1, len(parts) - 1, 2):
        if parts[j] == "isolated":
            iso = pairs(parts[j + 1])
    return sweep, iso


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old_sweep, old_iso = load(sys.argv[1])
    new_sweep, new_iso = load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    def eff(sweep, iso, name):
        t = sweep.get(name)
        if t is None:
            return None
        return min(t, iso.get(name, t))

    names = sorted(set(old_sweep) | set(new_sweep))
    rows, regressed = [], []
    for n in names:
        eo, en = eff(old_sweep, old_iso, n), eff(new_sweep, new_iso, n)
        if eo is None:
            cls = "new"
            ratio = None
        elif en is None:
            cls = "gone"
            ratio = None
        else:
            ratio = en / eo if eo > 0 else float("inf")
            if ratio > thr and en > 0.2:  # sub-200ms jitter is not a signal
                cls = "REGRESSED"
                regressed.append(n)
            elif ratio < 1 / thr and eo > 0.2:
                cls = "improved"
            elif new_sweep.get(n, 0) > thr * en and en > 0.2:
                cls = "contention"
            else:
                cls = "ok"
        rows.append((ratio if ratio is not None else -1, n, eo, en, cls))

    rows.sort(key=lambda r: -r[0])
    print(f"{'entry':32} {'old_eff':>8} {'new_eff':>8} {'ratio':>6}  class")
    for ratio, n, eo, en, cls in rows:
        if cls == "ok" and (en or 0) < 0.2:
            continue  # keep the report readable; tiny stable entries elided
        f_eo = f"{eo:8.3f}" if eo is not None else "       -"
        f_en = f"{en:8.3f}" if en is not None else "       -"
        f_r = f"{ratio:6.2f}" if ratio and ratio > 0 else "     -"
        print(f"{n:32} {f_eo} {f_en} {f_r}  {cls}")
    tot_o = sum(v for v in (eff(old_sweep, old_iso, n) for n in old_sweep) if v)
    tot_n = sum(v for v in (eff(new_sweep, new_iso, n) for n in new_sweep) if v)
    print(f"\ntotal effective: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({len(old_sweep)} -> {len(new_sweep)} entries)")
    if regressed:
        print(f"REGRESSED ({len(regressed)}): {', '.join(regressed)}")
        sys.exit(1)


if __name__ == "__main__":
    main()
