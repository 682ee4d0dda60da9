"""Benchmark driver: headline BM25 index build + query throughput.

Prints ONE JSON line:
  {"metric": "bm25_build_search", "value": <total sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": <sf>, "num_cpus": N}

--scaling: runs the same job in fresh processes at num_cpus=8 and 32 and
reports both throughputs + scaling efficiency (the sandbox stand-in for the
N-node vs 4N-node cluster criterion in BASELINE.json).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def _cpu_ticks() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from /proc/stat — quantifies hypervisor
    noise on shared boxes so scaling numbers carry their measurement context."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def run_bench() -> dict:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = os.path.basename(os.path.normpath(sf_dir))

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from remote_vector_index_builder_ray import BuildConfig, build_index, search
    from remote_vector_index_builder_ray.fixtures import ensure_fixture

    fx = ensure_fixture(sf_name)  # cached on disk; generation cost not timed
    index_dir = f"/tmp/bench_index_{sf_name}_{num_cpus}"
    shutil.rmtree(index_dir, ignore_errors=True)

    # warm the OS page cache so we measure compute + shuffle, not cold disk
    for p in fx["transcripts"]:
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass
    # warm the Ray worker pool (steady-state measurement: worker process
    # spawn + per-worker imports are per-process one-offs, not pipeline cost)
    import ray.data as _rd

    _rd.range(num_cpus * 4096, override_num_blocks=num_cpus * 2).map_batches(
        lambda b: b, batch_size=2048
    ).materialize()

    from remote_vector_index_builder_ray.state.memory_monitor import MemoryMonitor

    timings: dict[str, float] = {}
    st0 = _cpu_ticks()
    t0 = time.time()
    with MemoryMonitor() as mem:
        man = build_index(
            BuildConfig(
                input_paths=fx["transcripts"],
                index_dir=index_dir,
            )
        )
    timings["build"] = time.time() - t0
    st1 = _cpu_ticks()
    timings["steal_pct_build"] = round(
        100.0 * (st1[0] - st0[0]) / max(1, st1[1] - st0[1]), 2
    )
    timings["driver_peak_mb"] = mem.report()["peak_mb"]
    n_turns = man["stats"]["N"]

    modes = ("bmw",) if os.environ.get("GRAFT_SCALING") == "1" else ("bmw", "exhaustive")
    import pandas as pd

    qdf = pd.read_parquet(fx["queries"])
    for mode in modes:
        # warm the searcher actor pool (spawn + per-actor index-metadata load)
        # with a 8-query prefix: steady-state QPS, same policy as the build's
        # worker-pool warm-up above
        search(index_dir, qdf.head(8), mode=mode).count()
        t0 = time.time()
        n_rows = search(index_dir, fx["queries"], mode=mode).count()
        timings[f"search_{mode}"] = time.time() - t0
        assert n_rows > 0

    if os.environ.get("GRAFT_SCALING") != "1":
        # feature-mode timings (not part of the headline value): filtered +
        # conjunctive over the same index; phrase over a positional build,
        # whose extra cost is measured separately as build_positions
        t0 = time.time()
        search(index_dir, fx["queries"], mode="bmw",
               where=[("role", "=", "user")]).count()
        timings["search_filtered"] = time.time() - t0
        t0 = time.time()
        search(index_dir, fx["queries"], mode="bmw", operator="and").count()
        timings["search_and"] = time.time() - t0

        pos_dir = index_dir + "_pos"
        shutil.rmtree(pos_dir, ignore_errors=True)
        t0 = time.time()
        build_index(
            BuildConfig(input_paths=fx["transcripts"], index_dir=pos_dir,
                        positions=True)
        )
        timings["build_positions"] = time.time() - t0
        # phrase workload: the first two tokens of each reference query
        qp = qdf.assign(
            text=qdf["text"].str.split().str[:2].str.join(" ")
        )
        search(pos_dir, qp.head(8), mode="phrase").count()  # warm the pool
        t0 = time.time()
        search(pos_dir, qp, mode="phrase").count()
        timings["search_phrase"] = time.time() - t0
        shutil.rmtree(pos_dir, ignore_errors=True)

    # stage-level breakdown from the manifest (lineage metrics)
    for stage, m in man["stages"].items():
        timings[f"stage_{stage}"] = round(m.get("sec", 0.0), 3)
    timings["turns_per_sec_build"] = round(n_turns / timings["build"], 1)

    total = timings["build"] + timings["search_bmw"]
    out = {
        "metric": "bm25_build_search",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_name,
        "num_cpus": num_cpus,
        "n_turns": int(n_turns),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        # scaling runs use a larger fixture: efficiency is only meaningful when
        # per-core compute dominates fixed job latency (see BASELINE.md)
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SCALING="1",
            GRAFT_SF_DIR=os.environ.get("GRAFT_SCALING_SF_DIR", "/tmp/graft_fixtures/sfscale"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # default pair 2,8: the only N vs 4N pair whose both legs stay under this
    # single box's DRAM-bandwidth ceiling (see BASELINE.md scaling notes)
    pair = os.environ.get("GRAFT_SCALING_CPUS", "2,8")
    lo, hi = (int(x) for x in pair.split(","))
    r_lo, r_hi = run(lo), run(hi)
    # the BASELINE.json scaling criterion is about BUILD throughput
    # (turns/sec); efficiency = speedup / cpu-ratio, 1.0 = perfectly linear
    b_lo, b_hi = r_lo["queries"]["build"], r_hi["queries"]["build"]
    eff = (b_lo / b_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus": [lo, hi],
        f"steal_pct_{lo}": r_lo["queries"].get("steal_pct_build"),
        f"steal_pct_{hi}": r_hi["queries"].get("steal_pct_build"),
        f"build_sec_{lo}": b_lo,
        f"build_sec_{hi}": b_hi,
        f"turns_per_sec_{lo}": round(r_lo["n_turns"] / b_lo, 1),
        f"turns_per_sec_{hi}": round(r_hi["n_turns"] / b_hi, 1),
        f"total_sec_{lo}": r_lo["value"],
        f"total_sec_{hi}": r_hi["value"],
        "sf": r_hi["sf"],
        "n_turns": r_hi["n_turns"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
