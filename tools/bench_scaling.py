"""N-vs-4N scaling-efficiency evidence (BASELINE.md protocol).

No real cluster exists in the sandbox, so the north rule's "N vs 4N
executors" criterion is evidenced as local[N] vs local[4N] on IDENTICAL
input: same fixture (seed 42, cached), same job, subprocess-isolated
Spark sessions, interleaved levels, medians.

Two workloads:
- ``crawl`` (profile drain_giant): the full polite crawl — one giant
  fetch round, the steady-state shape of a 10^10-URL frontier where
  per-round driver time is amortized.
- ``decode``: the pure data phase (scan → Arrow decode+validate UDF →
  reduce), isolating data-parallel scaling from driver coordination.

The same box also runs tools/hw_ceiling.py (no Spark): the hardware's
own N→4N ceiling. A single VM's 4× core jump downclocks / contends in a
way 4× more MACHINES does not, so BENCH/BASELINE.md reports raw
efficiency AND efficiency normalized to the measured hardware ceiling.

Usage: python tools/bench_scaling.py [n_pages] [runs] [mode] [N[,N...]] [tag]
  mode: crawl | decode   levels: N vs 4N pairs, default "8" → (8,32)
  tag: optional suffix for the output file (e.g. "tmpfs" →
  BENCH/scaling_crawl_tmpfs.json) so A/B isolation arms (shuffle+corpus
  dirs on /dev/shm vs the virtio disk) don't clobber the disk record.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, n_pages: int, mode: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        PEGASUS_BENCH_PAGES=str(n_pages),
        PEGASUS_BENCH_PROFILE="drain_giant",
        PEGASUS_BENCH_MODE=("decode" if mode == "decode" else "crawl"),
        # one shuffle partition per core (2×cpus over-fragments small
        # rounds; task-launch overhead dominates at higher parallelism)
        PEGASUS_SHUFFLE_PARTS=str(cpus),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"bench failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    mode = sys.argv[3] if len(sys.argv) > 3 else "crawl"
    ns = [int(x) for x in (sys.argv[4].split(",") if len(sys.argv) > 4 else ["8"])]
    key = "urls_per_sec" if mode == "crawl" else "images_per_sec"
    wall_key = "crawl_sec" if mode == "crawl" else "decode_sec"

    levels = sorted({c for n in ns for c in (n, 4 * n)})
    raw: dict[int, list[dict]] = {c: [] for c in levels}
    for i in range(runs):
        for cpus in levels:  # interleaved so machine drift hits all levels
            t0 = time.time()
            r = run_once(cpus, n_pages, mode)
            raw[cpus].append(r)
            print(f"local[{cpus}] run {i}: {r[wall_key]}s, {r[key]} {key} "
                  f"(subprocess {time.time()-t0:.0f}s)", flush=True)

    results = {}
    for cpus, rs in raw.items():
        rs_sorted = sorted(rs, key=lambda r: r[key])
        results[cpus] = rs_sorted[len(rs_sorted) // 2]  # median by throughput

    summary = {"mode": mode, "n_pages": n_pages, "runs": runs}
    for n in ns:
        lo, hi = results[n][key], results[4 * n][key]
        summary[f"eff_{n}_to_{4*n}"] = round((hi / lo) / 4, 3)
        # this VM's throughput drifts 2-3x on ~minutes timescales (see
        # BENCH/BASELINE.md noise section), which can swamp a
        # median-of-levels comparison. The N and 4N runs of one pass run
        # back-to-back (~minutes apart), so the PER-PASS throughput ratio
        # is far less drift-exposed: report the median of per-pass
        # efficiencies alongside the median-of-levels form.
        pass_effs = [
            round((raw[4 * n][i][key] / raw[n][i][key]) / 4, 3)
            for i in range(runs)
        ]
        summary[f"pass_effs_{n}_to_{4*n}"] = pass_effs
        summary[f"eff_median_of_passes_{n}_to_{4*n}"] = sorted(pass_effs)[len(pass_effs) // 2]
        summary[f"local{n}_{key}"] = lo
        summary[f"local{4*n}_{key}"] = hi
        summary[f"local{n}_{wall_key}"] = results[n][wall_key]
        summary[f"local{4*n}_{wall_key}"] = results[4 * n][wall_key]
    print(json.dumps(summary, indent=2))

    suffix = "" if n_pages == 150_000 else f"_{n_pages // 1000}k"
    if len(sys.argv) > 5:
        suffix += f"_{sys.argv[5]}"
    out_path = os.path.join(REPO, "BENCH", f"scaling_{mode}{suffix}.json")
    with open(out_path, "w") as f:
        json.dump({"levels": {str(k): v for k, v in results.items()},
                   "all_runs": {str(k): v for k, v in raw.items()},
                   "summary": summary}, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
