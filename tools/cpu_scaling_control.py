"""Pure-CPU control: is the sandbox's aggregate capacity the binding limit?

Runs groups of identical hash+str-churn workers (no Spark, no memory
pressure) pinned like the scaling bench: group A = 2 procs on cores 30-31,
group B = 8 procs on cores 22-29, CONCURRENTLY; then 32 procs on all cores.
Prints per-group aggregate rate (units/sec). If even this shows << 4x
from 2 -> 8 cores, the ceiling is the hypervisor's capacity allocation,
not any property of the measured pipeline.
"""
import os, subprocess, sys, time, json

WORK = "3000000"
BURN = "/tmp/burn.py"

def group(n, lo, hi):
    ps = []
    for i in range(n):
        ps.append(subprocess.Popen(
            ["taskset", "-c", f"{lo}-{hi}", sys.executable, BURN],
            stdout=subprocess.PIPE, text=True))
    return ps

def collect(ps, label, t0):
    for p in ps:
        p.wait()
    dt = time.time() - t0
    n = len(ps)
    print(json.dumps({"group": label, "procs": n,
                      "wall_sec": round(dt, 2),
                      "aggregate_rate": round(n * 3.0 / dt, 3)}))  # Munits/s
    return n * 3.0 / dt

t0 = time.time()
a = group(2, 30, 31)
b = group(8, 22, 29)
rb = collect(b, "8procs_cores22-29", t0)
ra = collect(a, "2procs_cores30-31", t0)
t0 = time.time()
c = group(32, 0, 31)
rc = collect(c, "32procs_all", t0)
print(json.dumps({"eff_2_to_8": round(ra and (rb / ra) / 4, 3),
                  "eff_8_to_32": round(rb and (rc / rb) / 4, 3)}))
