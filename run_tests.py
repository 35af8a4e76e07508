#!/usr/bin/env python3
"""Sharded test runner: the full pytest suite split across N worker
processes, each with its own SparkSession (r11 verdict item 4 — the
single-process suite hit 42 min and was rationing the full gate).

Why not pytest-xdist: not installed in the frozen environment.  This
does the same job at the file granularity, which is the safe unit
here — module-scoped fixtures and catalog table names (test_bucketed,
test_joins write `saveAsTable` tables) never split across workers,
and each worker runs in its OWN working directory so the cwd-relative
`spark-warehouse/` and any derby droppings are isolated per process.

Scheduling is longest-processing-time-first over recorded per-file
durations (`tests/.shard_durations.json`, refreshed after every green
run — the first run falls back to file size as the proxy).  Worker
count defaults to 4 with SPARK_GRAFT_CPUS split evenly so the workers
oversubscribe the box only mildly (Spark local tasks are rarely
CPU-saturated in these tests; mild oversubscription beats idle cores).

Usage:
    python run_tests.py                # full suite, 4 workers
    python run_tests.py -n 6           # more workers
    python run_tests.py -k pattern     # forwarded to every worker

Exit code is non-zero if ANY worker fails; each worker's full output
lands in /tmp/spark_graft_tests/worker-N.log and failures are
reprinted at the end.  NOTE: do not run concurrently with bench.py
timing runs — the load distorts recorded walls.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
DURATIONS_PATH = os.path.join(REPO, "tests", ".shard_durations.json")
LOG_DIR = "/tmp/spark_graft_tests"


def _test_files() -> list[str]:
    return sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))


def _load_durations() -> dict:
    try:
        with open(DURATIONS_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _assign(files: list[str], n: int) -> list[list[str]]:
    """LPT bin packing: heaviest file onto the lightest worker."""
    durations = _load_durations()

    def weight(path: str) -> float:
        return durations.get(os.path.basename(path)) \
            or os.path.getsize(path) / 1000.0

    bins: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(n)]
    for f in sorted(files, key=weight, reverse=True):
        i = min(range(n), key=lambda j: bins[j][0])
        bins[i] = (bins[i][0] + weight(f), bins[i][1] + [f])
    return [b[1] for b in bins]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--workers", type=int, default=4)
    ap.add_argument("-k", default=None, help="forwarded to pytest -k")
    ap.add_argument("--cpus", type=int, default=None,
                    help="total local[N] cores to split across workers "
                         "(default: SPARK_GRAFT_CPUS or 32)")
    args = ap.parse_args()

    files = _test_files()
    shards = [s for s in _assign(files, args.workers) if s]
    total_cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    per_worker = max(2, total_cpus // len(shards))
    os.makedirs(LOG_DIR, exist_ok=True)

    t0 = time.time()
    procs = []
    for i, shard in enumerate(shards):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(per_worker)
        env["SPARK_GRAFT_DRIVER_MEM"] = env.get(
            "SPARK_GRAFT_DRIVER_MEM", "8g")
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        cwd = tempfile.mkdtemp(prefix=f"shard{i}-",
                               dir=tempfile.gettempdir())
        # "-m 'slow or not slow'" overrides pytest.ini's default
        # exclusion: the sharded runner is the FULL gate — every test
        # including the slow e2e/restart tier runs here, while the
        # driver's plain `pytest tests/` runs the in-window tier
        cmd = [sys.executable, "-m", "pytest", "-q",
               "-m", "slow or not slow",
               "--durations=0", "--durations-min=0.1",
               "-p", "no:cacheprovider"] \
            + (["-k", args.k] if args.k else []) + shard
        log = open(os.path.join(LOG_DIR, f"worker-{i}.log"), "w")
        procs.append((i, shard, log,
                      subprocess.Popen(cmd, cwd=cwd, env=env,
                                       stdout=log, stderr=log)))
        print(f"worker {i}: {len(shard)} files, local[{per_worker}] "
              f"-> {log.name}")

    failed = []
    summary = {"passed": 0, "failed": 0, "skipped": 0, "xfailed": 0,
               "xpassed": 0}
    file_secs: dict = {}
    for i, shard, log, p in procs:
        rc = p.wait()
        log.close()
        text = open(log.name, errors="replace").read()
        if rc != 0:
            failed.append((i, rc))
        for key in summary:
            m = re.search(rf"(\d+) {key}", text)
            if m:
                summary[key] += int(m.group(1))
        # roll per-test durations up to per-file for the next LPT
        # (r13 fix: workers run from a temp cwd, so durations print
        # bare file names — the old `tests/\S+` pattern never
        # matched and the book was never written)
        for dur, _, testid in re.findall(
                r"([0-9.]+)s (call|setup|teardown)\s+(\S+?::\S+)",
                text):
            fname = testid.split("::")[0].split("/")[-1]
            file_secs[fname] = file_secs.get(fname, 0.0) + float(dur)

    wall = time.time() - t0
    print(f"\n{summary} in {wall:.0f}s wall "
          f"({len(shards)} workers)")
    if failed:
        for i, rc in failed:
            print(f"worker {i} FAILED rc={rc} — tail of its log:")
            tail = open(os.path.join(LOG_DIR, f"worker-{i}.log"),
                        errors="replace").read()[-3000:]
            print(tail)
        return 1
    # green run: refresh the duration book so the next split is tighter
    if file_secs and not args.k:
        book = _load_durations()
        book.update({k: round(v, 1) for k, v in file_secs.items()})
        with open(DURATIONS_PATH, "w") as f:
            json.dump(dict(sorted(book.items())), f, indent=1)
            f.write("\n")
        print(f"durations refreshed: {DURATIONS_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
