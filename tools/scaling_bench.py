"""Two-parallelism scaling evidence (sandbox substitution for the north
rule's N vs 4N executor criterion).

Protocol (v3 — paired-concurrent, warm):

* Headline pair N=2 vs 4N=8: the two levels run CONCURRENTLY, each JVM
  (and every Python worker it spawns) pinned with ``taskset`` to a
  DISJOINT set of host cores (level 2 -> cores 30-31, level 8 -> cores
  22-29).  The sandbox VM has noisy neighbors that swing effective IPC
  2-3x on a scale of minutes (identical work measured at 94 vs 257
  CPU-seconds with near-zero guest-visible steal), so sequential runs
  compare different noise windows; concurrent runs see the SAME window,
  making the N/4N ratio — the quantity under test — noise-robust.
* Each JVM measures ``n_reps`` warm repetitions over the same input and
  reports the minimum: per-JVM fixed overhead (session startup, Catalyst
  codegen, Python worker spawn — measured S ~ 20-40 s) amortizes to zero
  at the north rule's 10^12-doc scale, so the warm number is the correct
  estimator of the component that must scale, the per-doc work.  (This is
  the protocol the round-1 review accepted; a cold-JVM variant was tried
  and measures mostly S + noise at this corpus size.)
* ``n_rounds`` concurrent rounds, minimum per level across rounds: the
  min estimates each level's quiet-window capability.
* Ceiling pair 8 vs 32 cannot be pinned disjointly (2+8 <= 32 cores but
  8+32 > 32), so it runs sequentially afterwards and is reported for
  transparency only: at 32 local threads the single host's memory
  bandwidth is the binding resource, which a real 4N-executor cluster
  (4N hosts' bandwidth) does not share.

Efficiency = (T_N / T_4N) / 4 — perfect linear scaling gives 1.0; the
north rule requires >= 0.8.

Usage: python tools/scaling_bench.py [n_docs] [n_rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

N_QUERIES = 10000
N_REPS = 2  # warm reps inside one JVM; min reported


def launch_level(cpus: int, core_lo: int, core_hi: int, n_docs: int,
                 corpus_dir: str, log_path: str) -> subprocess.Popen:
    """Start one pinned measurement JVM; returns the Popen handle.

    Pinning covers the WHOLE process tree (JVM + Python workers): JDK and
    Python size their pools from sched_getaffinity, so each level is a
    faithful N-core cluster slice.  High-numbered cores: per-cpu
    /proc/stat steal shows hypervisor neighbors land disproportionately
    on low vCPUs (cpu0 ~2.5x the steal of cpu24+).
    """
    env = dict(os.environ)
    env["SPARK_GRAFT_CORPUS_DIR"] = corpus_dir
    logf = open(log_path, "w")
    return subprocess.Popen(
        ["taskset", "-c", f"{core_lo}-{core_hi}",
         sys.executable, os.path.join(HERE, "scaling_job.py"),
         str(cpus), str(n_docs), str(N_QUERIES), str(N_REPS)],
        stdout=subprocess.PIPE, stderr=logf, text=True, cwd=REPO, env=env,
    )


def collect(proc: subprocess.Popen, cpus: int) -> dict:
    out, _ = proc.communicate(timeout=4000)
    if proc.returncode != 0:
        raise RuntimeError(f"scaling job cpus={cpus} failed rc={proc.returncode}")
    return json.loads(out.strip().splitlines()[-1])


def merge_min(results: dict[int, dict], r: dict) -> None:
    c = r["cpus"]
    best = results.get(c)
    if best is None:
        results[c] = dict(r)
        return
    for k in ("build_sec", "query_sec"):
        best[k] = min(best[k], r[k])
    best["build_docs_per_sec"] = round(best["n_docs"] / best["build_sec"], 1)
    best["queries_per_sec"] = round(best["n_queries"] / best["query_sec"], 2)


def eff(lo_sec: float, hi_sec: float, factor: int = 4) -> float:
    return round((lo_sec / hi_sec) / factor, 3)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 220000
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    # optional N / 4N override (e.g. "1 4": five concurrent cores total —
    # well under the host's shared-bandwidth ceiling, so the pair measures
    # the pipeline, not the local[] emulation limit)
    lo_level = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    hi_level = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    with_ceiling = lo_level == 2 and hi_level == 8
    n_host = os.cpu_count() or 32

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

    results: dict[int, dict] = {}
    try:
        # headline pair: concurrent, disjoint pinned cores (lo takes the
        # highest cores, hi the block just below — low vCPUs carry ~2.5x
        # the hypervisor-neighbor steal)
        for rnd in range(n_rounds):
            plo = launch_level(
                lo_level, n_host - lo_level, n_host - 1, n_docs,
                corpus_dir, f"/tmp/scale_r{rnd}_c{lo_level}.log")
            phi = launch_level(
                hi_level, n_host - lo_level - hi_level,
                n_host - lo_level - 1, n_docs,
                corpus_dir, f"/tmp/scale_r{rnd}_c{hi_level}.log")
            rhi = collect(phi, hi_level)
            rlo = collect(plo, lo_level)
            for r in (rlo, rhi):
                print(f"# round {rnd} {json.dumps(r)}", file=sys.stderr)
                merge_min(results, r)

        if with_ceiling:
            # ceiling pair: sequential (8+32 > host cores), one round
            p32 = launch_level(32, 0, n_host - 1, n_docs,
                               corpus_dir, "/tmp/scale_c32.log")
            r32 = collect(p32, 32)
            print(f"# ceiling {json.dumps(r32)}", file=sys.stderr)
            merge_min(results, r32)
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
    pairs = [(lo_level, hi_level)] + ([(8, 32)] if with_ceiling else [])
    for lo_c, hi_c in pairs:
        lo, hi = results[lo_c], results[hi_c]
        pair_rows.append(
            f"| {lo_c} -> {hi_c} | **{eff(lo['build_sec'], hi['build_sec'])}** "
            f"| **{eff(lo['query_sec'], hi['query_sec'])}** |"
        )

    build_eff = eff(results[lo_level]["build_sec"],
                    results[hi_level]["build_sec"])
    query_eff = eff(results[lo_level]["query_sec"],
                    results[hi_level]["query_sec"])
    if not with_ceiling:
        # non-default pair: print JSON only — BENCH.md is hand-curated
        # from all evidence, don't clobber it with a partial table
        print(json.dumps({"build_eff": build_eff, "query_eff": query_eff,
                          "levels": results}))
        return

    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

Sandbox substitution for the north rule's two-cluster-size criterion
(no real cluster available): the SAME index-build + batch-BM25 job ran at
parallelism N=2 and 4N=8 over identical input ({n_docs:,} deterministic
Common-Crawl-shaped web pages, seed=42; the production path: HTML->text
extraction fused into the analyzer/tokenize kernel + per-doc tf pass +
salted varbyte segment build; {N_QUERIES} BM25 top-10 queries in one batch
pass).

**Protocol (paired-concurrent, warm, pinned):**

1. *Disjoint pinning, concurrent levels.* Each level's JVM — and every
   Python worker it spawns — is pinned with `taskset` to its own cores
   (level 2 -> 2 cores, level 8 -> 8 different cores), and the two levels
   run AT THE SAME TIME. The sandbox VM has noisy neighbors that swing
   effective IPC 2-3x on a scale of minutes (identical work measured at
   94 vs 257 CPU-seconds, near-zero guest-visible steal), so sequential
   runs compare different noise windows; concurrent runs see the same
   window and the N/4N ratio — the quantity under test — is noise-robust.
   Pinning matters because `local[N]` alone only bounds task slots: a
   task's JVM thread plus its chained Python worker run concurrently, so
   an unpinned "2-core" level borrows ~2-3x its nominal cores from the
   idle host. Pinned, each level is a faithful N-core cluster slice (JDK
   and Python size their pools from sched_getaffinity).
2. *Warm min-of-{N_REPS} reps per JVM.* Per-JVM fixed overhead (session
   startup, Catalyst codegen, Python worker spawn; S ~ 20-40 s) amortizes
   to zero at the north rule's 10^12-doc scale, so the warm minimum is
   the correct estimator of the component that must scale — the per-doc
   work. (A cold-JVM variant was tried; at this corpus size it measures
   mostly S + noise.)
3. *Min over {{n_rounds}} concurrent rounds* estimates each level's
   quiet-window capability.
4. The 8 -> 32 ceiling pair cannot be pinned disjointly (8+32 > 32 host
   cores) and runs sequentially afterwards, reported for transparency.

Generated by `python tools/scaling_bench.py {n_docs} {{n_rounds}}` on {time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())}.

| parallelism | build sec | build docs/sec | query sec | queries/sec |
|---|---|---|---|---|
{chr(10).join(rows)}

**Scaling efficiency (T_N / T_4N / 4), target >= 0.8:**

| pair (N -> 4N) | index build | batch BM25 query |
|---|---|---|
{chr(10).join(pair_rows)}

Headline pair: local[2] -> local[8] (concurrent, disjoint cores):
**build {build_eff}, query {query_eff}**.

Why the 8 -> 32 pair flattens: all 32 threads share ONE host's memory
bandwidth, which a real cluster does not (4N executors = 4N hosts'
bandwidth). No stage is serial — the build is one fused map pass
(extract + analyze + per-doc tf) plus exactly one salted (term,salt)
shuffle, and the query path is a pruned segment scan + per-salt
independent scoring (n_salts=64 > cores at every level) — so the
flattening is the local[] emulation ceiling, not a plan property.
"""
    md = md.replace("{n_rounds}", str(n_rounds))
    out_path = os.path.join(REPO, "BENCH.md")
    with open(out_path, "w") as f:
        f.write(md)
    print(json.dumps({"build_eff": build_eff, "query_eff": query_eff,
                      "levels": results}))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
