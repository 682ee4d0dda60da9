"""Benchmark sweep harness: index configs x search workloads -> per-run JSON
plus a merged summary — the analog of the reference's workload sweep
(``benchmarking/workload/workload.py:54-138``: per-config indexing metrics,
``benchmarking/search/search_indices.py:27-55``: timed search + throughput)
and its results merger (``benchmarking/results.py:125-201``).

    python scripts/sweep.py [--quick]

Env:
  GRAFT_SWEEP_SF      fixture name (default sf0.01; sf0.1 for real numbers)
  GRAFT_SWEEP_OUT     output dir (default /tmp/graft_sweeps)
  RAY_GRAFT_CPUS      cluster size (default 32)

Each config gets one JSON file named by its parameters; `summary.json` merges
them sorted by total time. This is also the validation harness for search-mode
work: every config's bmw results are asserted rank-identical to exhaustive.
"""

from __future__ import annotations

import itertools
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run_config(fx, out_dir: str, block_size: int, num_buckets: int | None,
               k1: float, b: float) -> dict:
    import pandas as pd

    from remote_vector_index_builder_ray import BuildConfig, build_index, search
    from remote_vector_index_builder_ray.config import BM25Config

    name = f"bs{block_size}_nb{num_buckets or 'auto'}_k1{k1}_b{b}"
    index_dir = os.path.join(out_dir, "index_" + name)
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.time()
    man = build_index(
        BuildConfig(
            input_paths=fx["transcripts"],
            index_dir=index_dir,
            bm25=BM25Config(k1=k1, b=b, block_size=block_size),
            num_buckets=num_buckets,
        )
    )
    build_sec = time.time() - t0
    n_turns = man["stats"]["N"]

    qdf = pd.read_parquet(fx["queries"])
    rec = {
        "config": {"block_size": block_size, "num_buckets": int(man["num_buckets"]),
                   "requested_buckets": num_buckets, "k1": k1, "b": b},
        "build_sec": round(build_sec, 3),
        "turns_per_sec": round(n_turns / build_sec, 1),
        "stage_sec": {k: round(v.get("sec", 0.0), 3) for k, v in man["stages"].items()},
        "n_turns": int(n_turns),
    }
    results = {}
    for mode in ("bmw", "exhaustive"):
        search(index_dir, qdf.head(8), mode=mode).count()  # warm actor pool
        t0 = time.time()
        res = search(index_dir, qdf, mode=mode).to_pandas()
        sec = time.time() - t0
        rec[f"search_{mode}_sec"] = round(sec, 3)
        rec[f"search_{mode}_qps"] = round(len(qdf) / sec, 1)
        results[mode] = res.sort_values(["query_id", "rank"]).reset_index(drop=True)
    # rank-identity gate across modes for EVERY config (scores bit-equal)
    pd.testing.assert_frame_equal(results["bmw"], results["exhaustive"])
    rec["modes_rank_identical"] = True
    rec["total_sec"] = round(rec["build_sec"] + rec["search_bmw_sec"], 3)
    with open(os.path.join(out_dir, name + ".json"), "w") as f:
        json.dump(rec, f, indent=1)
    shutil.rmtree(index_dir, ignore_errors=True)
    return rec


def main() -> int:
    quick = "--quick" in sys.argv
    sf_name = os.environ.get("GRAFT_SWEEP_SF", "sf0.01")
    out_root = os.environ.get("GRAFT_SWEEP_OUT", "/tmp/graft_sweeps")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    out_dir = os.path.join(out_root, f"{sf_name}_{num_cpus}cpu")
    os.makedirs(out_dir, exist_ok=True)

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from remote_vector_index_builder_ray.fixtures import ensure_fixture

    fx = ensure_fixture(sf_name)

    if quick:
        grid = [(128, None, 1.2, 0.75), (64, 32, 0.9, 0.4)]
    else:
        grid = list(itertools.product(
            (64, 128, 256),          # block_size (block-max granularity)
            (None, 32, 128),         # num_buckets (merge fan-out / file count)
            ((1.2, 0.75), (0.9, 0.4)),  # (k1, b) scoring variants
        ))
        grid = [(bs, nb, k1b[0], k1b[1]) for bs, nb, k1b in grid]

    rows = []
    for bs, nb, k1, b in grid:
        rec = run_config(fx, out_dir, bs, nb, k1, b)
        print(json.dumps({"cfg": rec["config"], "total_sec": rec["total_sec"],
                          "turns_per_sec": rec["turns_per_sec"],
                          "qps_bmw": rec["search_bmw_qps"]}))
        rows.append(rec)
    rows.sort(key=lambda r: r["total_sec"])
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump({"sf": sf_name, "num_cpus": num_cpus, "runs": rows}, f, indent=1)
    print(f"wrote {len(rows)} configs -> {out_dir}/summary.json")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
