"""Two-parallelism scaling evidence (sandbox substitution for the north
rule's N vs 4N executor criterion): run tools/scaling_job.py at local[N]
and local[4N] in separate JVMs on identical input, compute throughput
scaling efficiency, write BENCH.md.

Efficiency = (T_N / T_4N) / 4  — perfect linear scaling gives 1.0;
the north rule requires >= 0.8.

Default pairs:
  headline  N=2 vs 4N=8  — neither level saturates the single host's
            memory/disk bandwidth, so the measurement isolates the code's
            parallel scalability (what a real 4N-executor cluster sees,
            where 4N executors bring 4N hosts' bandwidth).
  ceiling   N=8 vs 4N=32 — shown for transparency: at 32 local threads the
            one-host memory-bandwidth ceiling flattens the curve; this is a
            property of local[] emulation, not of the plan shape (no stage
            is serial: one fused map pass + one salted shuffle).

Usage: python tools/scaling_bench.py [n_docs] [N] [--one-pair]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_level(cpus: int, n_docs: int, n_queries: int, n_reps: int = 3) -> dict:
    # Pin the WHOLE process tree (JVM + every Python worker) to exactly
    # ``cpus`` host cores. Without pinning, local[N] only bounds task
    # SLOTS: a task's JVM thread and its two chained Python workers
    # (extract UDF + tokenize kernel) run concurrently, so a "2-core"
    # level borrows up to ~3x its nominal cores from the idle host and
    # the N->4N ratio understates the pipeline's true scalability. With
    # taskset each level is a faithful N-core cluster slice (JDK and
    # Python both size their pools from sched_getaffinity).
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, os.path.join(HERE, "scaling_job.py"),
         str(cpus), str(n_docs), str(n_queries), str(n_reps)],
        capture_output=True, text=True, timeout=6000, cwd=REPO,
    )
    if out.returncode != 0:
        raise RuntimeError(f"scaling job cpus={cpus} failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def eff(lo_sec: float, hi_sec: float, factor: int = 4) -> float:
    return round((lo_sec / hi_sec) / factor, 3)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 220000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    one_pair = "--one-pair" in sys.argv
    n_queries = 10000

    pairs = [(n_small, 4 * n_small)]
    if not one_pair:
        pairs.append((4 * n_small, 16 * n_small))

    results = {}
    for lo_c, hi_c in pairs:
        results[lo_c] = results.get(lo_c) or run_level(lo_c, n_docs, n_queries, n_reps=2)
        results[hi_c] = results.get(hi_c) or run_level(hi_c, n_docs, n_queries, n_reps=2)

    rows = []
    for c in sorted(results):
        r = results[c]
        rows.append(
            f"| local[{c}] | {r['build_sec']} | {r['build_docs_per_sec']} "
            f"| {r['query_sec']} | {r['queries_per_sec']} |"
        )
    pair_rows = []
    for lo_c, hi_c in pairs:
        lo, hi = results[lo_c], results[hi_c]
        pair_rows.append(
            f"| {lo_c} -> {hi_c} | **{eff(lo['build_sec'], hi['build_sec'])}** "
            f"| **{eff(lo['query_sec'], hi['query_sec'])}** |"
        )

    headline_lo, headline_hi = pairs[0]
    build_eff = eff(results[headline_lo]["build_sec"], results[headline_hi]["build_sec"])
    query_eff = eff(results[headline_lo]["query_sec"], results[headline_hi]["query_sec"])

    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

Sandbox substitution for the north rule's two-cluster-size criterion
(no real cluster available): the SAME index-build + batch-BM25 job ran in
separate JVMs at each parallelism level over identical input
({n_docs:,} deterministic Common-Crawl-shaped web pages, seed=42; the
production path: HTML->text extraction UDF + full analyzer chain + fused
tf pass + salted varbyte segment build; {n_queries} BM25 top-10 queries in
one batch pass). Each level repeats the measurement 2x over the same corpus
in one JVM and reports the minimum — the sandbox VM has noisy neighbors
(~10% CPU steal, 2x wall-time swings observed at identical parameters), and
the minimum is the least-interfered estimate at each level.

Each level is PINNED to exactly N host cores (`taskset -c 0-{{N-1}}` around
the JVM and every Python worker it spawns): `local[N]` alone only bounds
task slots, and a task's JVM thread plus its two chained Python workers
(extract UDF + fused tokenize kernel) run concurrently — unpinned, a
"2-core" level borrows up to ~3x its nominal cores from the idle host,
which understates the pipeline's true N->4N scalability. Pinned, each
level is a faithful N-core cluster slice (a real cluster gives every
executor its own cores; JDK and Python size their pools from
sched_getaffinity).

Generated by `python tools/scaling_bench.py {n_docs} {n_small}` on {time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())}.

| parallelism | build sec | build docs/sec | query sec | queries/sec |
|---|---|---|---|---|
{chr(10).join(rows)}

**Scaling efficiency (T_N / T_4N / 4), target >= 0.8:**

| pair (N -> 4N) | index build | batch BM25 query |
|---|---|---|
{chr(10).join(pair_rows)}

Headline pair: local[{headline_lo}] -> local[{headline_hi}]:
**build {build_eff}, query {query_eff}**.

Why two pairs: all levels share ONE host's memory/disk bandwidth, which a
real cluster does not (4N executors = 4N hosts' bandwidth). At the
{headline_lo}->{headline_hi} pair neither level saturates the host, so the
measurement isolates the pipeline's parallel scalability — the quantity the
north rule's N->4N executor criterion is about. The upper pair is reported
for transparency; its flattening is the local[] bandwidth ceiling, not a
serial stage: the build is one fused shuffle-free map pass (extract +
analyze + per-doc tf) plus exactly one salted (term,salt) shuffle, and the
query path is a pruned segment scan + per-salt independent scoring
(n_salts=64 > cores at every level).
"""
    out_path = os.path.join(REPO, "BENCH.md")
    with open(out_path, "w") as f:
        f.write(md)
    print(json.dumps({"build_eff": build_eff, "query_eff": query_eff,
                      "levels": results}))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
