#!/usr/bin/env python3
"""Multi-JVM executor-separation axis (VERDICT_r09 "Next round" #1).

local[32] runs everything in ONE JVM: closures are never serialized,
UDA partial buffers never cross a process boundary, broadcasts share the
driver's heap, and file-sink commit protocols run driver-side. The
reference is permanently multi-process (rows cross real process
boundaries through its data-stream senders), so a whole class of bug —
non-serializable closures, buffer serialize/deserialize asymmetry,
task-side commit races — is structurally invisible to every local[N]
run. `local-cluster[2,16,4096]` is Spark's cheapest real-process axis: a
standalone master + 2 workers that FORK executor JVMs, with a real
BlockManager transfer path between them.

This tool makes the axis repeatable:
  1. runs the full catalog (graft.Verify) under
     SPARK_GRAFT_MASTER=local-cluster[2,16,4096],
  2. compares every entry against the DuckDB oracle (tools/check.py) —
     the same gate as the driver's CORRECTNESS file,
  3. optionally re-runs chosen ScalaTest suites on the same master
     (--suites graft.functions.TopKFrontSpec,...).

Worker/executor scratch goes to --workdir (default /tmp/spark-work) via
SPARK_WORKER_DIR so nothing lands under SPARK_HOME.

Usage:
  python3 tools/cluster_run.py [--sf /root/testdata/sf0.01]
      [--master local-cluster[2,16,4096]] [--out /tmp/cluster_verify]
      [--entries a,b,...] [--suites Suite1,Suite2] [--skip-verify]
Exit 0 iff every checked entry passes (and suites, if given, are green).
"""
import argparse, os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--master", default="local-cluster[2,16,4096]")
    ap.add_argument("--out", default="/tmp/cluster_verify")
    ap.add_argument("--workdir", default="/tmp/spark-work")
    ap.add_argument("--entries", default="",
                    help="comma-separated subset (default: full catalog)")
    ap.add_argument("--suites", default="",
                    help="comma-separated ScalaTest suites to also run "
                         "under the cluster master")
    ap.add_argument("--skip-verify", action="store_true")
    a = ap.parse_args()

    os.makedirs(a.workdir, exist_ok=True)
    env = dict(os.environ,
               SPARK_GRAFT_MASTER=a.master,
               SPARK_WORKER_DIR=a.workdir,
               # binary distributions don't carry launcher/target build
               # dirs; without this the Worker's executor-command builder
               # probes them and dies with "Cannot find any build
               # directories" before the executor JVM ever forks
               SPARK_SCALA_VERSION="2.13",
               SPARK_GRAFT_CPUS="32")
    rc_total = 0

    if not a.skip_verify:
        entries = " " + " ".join(a.entries.split(",")) if a.entries else ""
        print(f"[cluster] Verify on {a.master} at {a.sf}")
        rc = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {a.sf} {a.out}{entries}"],
            env=env, cwd=REPO).returncode
        if rc != 0:
            print(f"[cluster] Verify rc={rc}")
            return rc
        check = [sys.executable, os.path.join(REPO, "tools", "check.py"),
                 a.out, a.sf] + ([e for e in a.entries.split(",") if e]
                                 if a.entries else [])
        rc = subprocess.run(check, cwd=REPO).returncode
        rc_total |= rc

    if a.suites:
        names = " ".join(a.suites.split(","))
        print(f"[cluster] suites on {a.master}: {names}")
        rc = subprocess.run(
            ["sbt", "-batch", f"testOnly {names}"],
            env=env, cwd=REPO).returncode
        rc_total |= rc

    print(f"[cluster] done rc={rc_total}")
    return rc_total


if __name__ == "__main__":
    sys.exit(main())
