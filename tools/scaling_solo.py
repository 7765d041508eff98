"""Solo window measurement for one parallelism level (the local[32]
absolute-throughput / ceiling row of BENCH.md).

The concurrent v4 protocol (tools/scaling_bench.py) cannot include
local[32]: 1+2+4+8+32 > 32 host cores, so there is no disjoint pinning.
This driver runs ONE level, unpinned, through the same warmup + windowed
rep-loop machinery (tools/scaling_job.py) and reports window-credit
throughput. Because it runs in a DIFFERENT wall window than the
concurrent levels, its numbers are comparable only up to the hypervisor
noise band — reported for transparency, not graded.

Usage: python tools/scaling_solo.py <cpus> [n_docs] [build_win_s] [query_win_s]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

from scaling_bench import N_QUERIES, credit, wait_files  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 220000
    build_win = float(sys.argv[3]) if len(sys.argv) > 3 else 600.0
    query_win = float(sys.argv[4]) if len(sys.argv) > 4 else 180.0

    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    corpus_dir = os.environ.get("SPARK_GRAFT_CORPUS_DIR")
    own_corpus = corpus_dir is None or not os.path.exists(
        os.path.join(corpus_dir, "_SUCCESS"))
    if own_corpus:
        corpus_dir = tempfile.mkdtemp(prefix="solo_corpus_", dir=tmp_root)
        gen = subprocess.run(
            [sys.executable, os.path.join(HERE, "gen_corpus.py"),
             str(n_docs), corpus_dir],
            capture_output=True, text=True, timeout=1200, cwd=REPO,
        )
        if gen.returncode != 0:
            raise RuntimeError(f"corpus gen failed:\n{gen.stderr[-2000:]}")
    barrier = tempfile.mkdtemp(prefix="solo_barrier_", dir=tmp_root)

    env = dict(os.environ)
    env["SPARK_GRAFT_CORPUS_DIR"] = corpus_dir
    logf = open(f"/tmp/scale_solo_c{cpus}.log", "w")
    p = subprocess.Popen(
        [sys.executable, os.path.join(HERE, "scaling_job.py"),
         str(cpus), str(n_docs), str(N_QUERIES), barrier],
        stdout=subprocess.PIPE, stderr=logf, text=True, cwd=REPO, env=env,
    )
    try:
        wait_files([os.path.join(barrier, f"ready_{cpus}")], timeout=3000)
        b0 = time.time()
        open(os.path.join(barrier, "start_build"), "w").close()
        time.sleep(build_win)
        b1 = time.time()
        open(os.path.join(barrier, "stop_build"), "w").close()
        wait_files([os.path.join(barrier, f"build_done_{cpus}")], timeout=2400)
        q0 = time.time()
        open(os.path.join(barrier, "start_query"), "w").close()
        time.sleep(query_win)
        q1 = time.time()
        open(os.path.join(barrier, "stop_query"), "w").close()
        out, _ = p.communicate(timeout=1800)
        if p.returncode != 0:
            raise RuntimeError(f"solo level failed rc={p.returncode}")
        r = json.loads(out.strip().splitlines()[-1])
    finally:
        if p.poll() is None:
            p.kill()
        shutil.rmtree(barrier, ignore_errors=True)
        if own_corpus:
            shutil.rmtree(corpus_dir, ignore_errors=True)

    bc = credit(r["build_reps"], b0, b1)
    qc = credit(r["query_reps"], q0, q1)
    print(json.dumps({
        "cpus": cpus,
        "n_docs": n_docs,
        "build_credit": round(bc, 3),
        "query_credit": round(qc, 3),
        "build_docs_per_sec": round(bc * n_docs / (b1 - b0), 1),
        "queries_per_sec": round(qc * N_QUERIES / (q1 - q0), 2),
        "build_reps": len(r["build_reps"]),
        "query_reps": len(r["query_reps"]),
    }))


if __name__ == "__main__":
    main()
