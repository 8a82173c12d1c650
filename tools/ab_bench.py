"""Interleaved A/B bench harness for config / code experiments.

Runs bench.py in subprocesses, alternating the A and B environment
(A B A B ...), and reports per-query best-of-all-trials plus the
probe range, so a noisy host cannot vote: a contended pass can
inflate one trial, but the min over interleaved trials of each arm
compares like with like.

Usage:
  python tools/ab_bench.py --queries q1,q2 --trials 3 \
      [--a-env K=V ...] [--b-env K=V ...]

Prints one JSON line: {"queries": [...], "trials": N,
  "a": {q: [secs...]}, "b": {...}, "a_min": {...}, "b_min": {...},
  "probes_a": [...], "probes_b": [...]}
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(queries: str, extra_env: dict[str, str]) -> dict:
    env = dict(os.environ)
    env["BENCH_QUERIES"] = queries
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    env.update(extra_env)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, env=env, cwd=REPO)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--a-env", action="append", default=[])
    ap.add_argument("--b-env", action="append", default=[])
    args = ap.parse_args()
    a_env = dict(kv.split("=", 1) for kv in args.a_env)
    b_env = dict(kv.split("=", 1) for kv in args.b_env)

    res = {"a": {}, "b": {}, "probes_a": [], "probes_b": []}
    for t in range(args.trials):
        for arm, env in (("a", a_env), ("b", b_env)):
            r = run_once(args.queries, env)
            res[f"probes_{arm}"].append(r["probe_sec"])
            for q, s in r["queries"].items():
                res[arm].setdefault(q, []).append(s)
            print(f"# trial {t} arm {arm}: {r['queries']} "
                  f"probe={r['probe_sec']}", file=sys.stderr)
    out = {"queries": args.queries.split(","), "trials": args.trials,
           **res,
           "a_min": {q: min(v) for q, v in res["a"].items()},
           "b_min": {q: min(v) for q, v in res["b"].items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
