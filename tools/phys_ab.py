"""Interleaved same-host A/B of the physical-query family between two
repo checkouts (e.g. the round-2 head and the current head) — the
attribution run for the r02->r03 bench inflation on
bm25_and_phys_topk / bm25_stopword_topk / bm25_phrase_topk.

Each sample = a FRESH python process (fresh JVM, fresh /dev/shm scratch
wiped first so every sample pays the same scratch-index build) running
the three queries once at sf0.1/local[32] — the same conditions as the
graded bench, but isolated from bench.py's 50-query ordering.  Samples
alternate A,B,A,B,... so host IPC drift hits both sides equally.

Usage: python tools/phys_ab.py <repo_a> <repo_b> [rounds=3]
Prints one JSON line with per-query medians for both sides.
"""
from __future__ import annotations

import json
import shutil
import statistics
import subprocess
import sys

QUERIES = ["bm25_and_phys_topk", "bm25_stopword_topk", "bm25_phrase_topk"]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from marc_solr_profiling_spark.queries import QUERIES
from marc_solr_profiling_spark.session import get_spark
spark = get_spark(app_name="phys_ab", master="local[32]",
                  shuffle_partitions=32)
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm footers
out = {}
for name in %(queries)s:
    t0 = time.time()
    QUERIES[name](spark, sf_dir).count()
    out[name] = round(time.time() - t0, 3)
print("RESULT " + json.dumps(out))
"""


def wipe_scratch() -> None:
    import glob
    import os

    for p in glob.glob("/dev/shm/msps_*"):
        shutil.rmtree(p, ignore_errors=True)
        if os.path.exists(p):
            os.remove(p)


def run_side(repo: str) -> dict:
    wipe_scratch()
    script = CHILD % {"queries": QUERIES}
    proc = subprocess.run(
        [sys.executable, "-c", script, repo],
        capture_output=True, text=True, timeout=1200,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"no RESULT from {repo}:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-2000:]}")


def main() -> None:
    repo_a, repo_b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    samples: dict[str, list[dict]] = {"a": [], "b": []}
    for r in range(rounds):
        for side, repo in (("a", repo_a), ("b", repo_b)):
            got = run_side(repo)
            samples[side].append(got)
            print(f"# round {r} {side}={repo}: {got}", file=sys.stderr)
    meds = {
        side: {
            q: statistics.median(s[q] for s in runs) for q in QUERIES
        }
        for side, runs in samples.items()
    }
    print(json.dumps({
        "repo_a": repo_a, "repo_b": repo_b, "rounds": rounds,
        "samples": samples, "medians": meds,
        "ratio_b_over_a": {
            q: round(meds["b"][q] / meds["a"][q], 2) for q in QUERIES
        },
    }))


if __name__ == "__main__":
    main()
