# -*- coding: utf-8 -*-
"""Benchmark driver: headline lint pipelines over $GRAFT_SF_DIR.

Default: run each headline pipeline once under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` and print ONE JSON
line ``{"metric", "value", "unit", "queries", "sf", "num_cpus", ...}``.

``--scaling``: run the flagship pipeline in two FRESH processes at
num_cpus=N and num_cpus=4N on the same input (the sandbox stand-in for the
north_rule's N vs 4N node clusters; see BASELINE.md) and report both
throughputs plus scaling efficiency = thr_4N / (4 * thr_N).

N defaults to 2 (vs 8): this single node has a measured memory-bandwidth
wall (total throughput flat from ~8 workers up), so larger pairs measure
the RAM subsystem, not the engine — on a real 4x-node cluster each node
brings its own bandwidth.  BASELINE.md records the whole per-core curve
and several pairs.  The scaling input is the sf1
synthetic table (~4M docs) so fixed session costs amortize; each measured
process warms up on sf0.001 first and reports the best of 2 trials.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray(num_cpus: int):
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")


def _consume(result) -> int:
    """Materialize a result fully.  Datasets are counted distributedly —
    pulling every block to the driver would serialize the benchmark."""
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.count()
    return len(result)


def headline_queries():
    from osmlint import queries as q
    return {
        "lint_flags": q.lint_flags,              # flagship: decode+PIP+checks+dedup
        "lint_summary_per_map": q.lint_summary_per_map,
        "pip_tile_join": q.pip_tile_join,
        "knn_dup_names": q.knn_dup_names,
    }


def n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as pq
    from osmlint import synth
    d = synth.generate(sf_dir)
    return pq.read_table(os.path.join(d, "flat.parquet"),
                         columns=["osm_id"]).num_rows


def _cpu_sample(dt: float = 1.0) -> tuple[float, float]:
    """(idle_frac, steal_frac) over a ``dt``-second /proc/stat window."""
    def read():
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        v = [int(x) for x in parts[:8]]
        return v, sum(v)
    a, ta = read()
    time.sleep(dt)
    b, tb = read()
    tot = max(tb - ta, 1)
    return (b[3] - a[3]) / tot, (b[7] - a[7]) / tot


def wait_for_idle(budget_s: float) -> None:
    """Measurement hygiene, not a speed-up: this box is co-tenant noisy
    (identical runs measured 17.6 s and 65.0 s an hour apart; loadavg
    under-reports it — 4% historical steal), so hold the timed region
    for up to ``budget_s`` seconds until one 1-second /proc/stat window
    shows >=97% idle and 0 steal.  If the box never quiets, run anyway —
    the budget bounds the wait and the sample is reported as-is either
    way.  Disable with GRAFT_BENCH_WAIT=0."""
    deadline = time.time() + budget_s
    while time.time() < deadline:
        idle, steal = _cpu_sample()
        if idle >= 0.97 and steal == 0.0:
            return
    return


def run_once(sf_dir: str, num_cpus: int, names=None) -> dict:
    from osmlint import synth
    synth.generate(sf_dir)        # cache synth tables outside the timed region
    _init_ray(num_cpus)
    qs = headline_queries()
    if names:
        qs = {k: v for k, v in qs.items() if k in names}
    out, rows = {}, {}
    for name, fn in qs.items():
        t0 = time.time()
        rows[name] = _consume(fn(sf_dir))
        out[name] = round(time.time() - t0, 3)
    return {"queries": out, "rows": rows}


SCALING_SF = os.environ.get("GRAFT_SCALING_SF", "sf1")
SCALING_N = int(os.environ.get("GRAFT_SCALING_N", "2"))


def _scaling_inner(num_cpus: int) -> dict:
    import time as _t
    from osmlint import pipeline, synth
    d = synth.generate(SCALING_SF)
    _init_ray(num_cpus)
    pipeline.flags_dataset(synth.generate(0.001), dedup=True).count()  # warmup
    best, rows = None, 0
    import osmlint
    for _ in range(2):
        # measure the FULL pipeline every trial: the registered in-memory
        # caches (collision table, broadcast refs, raster band) would
        # otherwise let trial 2 skip the dedup pre-pass.  The flagship
        # touches no disk checkpoints (those are shingle-family only and
        # cleared via clear_caches(purge_disk=True) when needed).  One
        # public clear — a registry tripwire test asserts every module
        # cache dict is registered, so a future cache can't quietly
        # inflate efficiency.
        osmlint.clear_caches()
        t0 = _t.time()
        rows = pipeline.flags_dataset(d, dedup=True).count()
        dt = _t.time() - t0
        best = dt if best is None else min(best, dt)
    import pyarrow.parquet as pq
    nd = pq.read_table(os.path.join(d, "flat.parquet"),
                       columns=["osm_id"]).num_rows
    return {"sec": round(best, 2), "docs": nd,
            "docs_per_s": round(nd / best, 1), "flag_rows": rows}


def main():
    if "--inner" in sys.argv:
        if "--scale-run" in sys.argv:
            print(json.dumps(_scaling_inner(NUM_CPUS)))
            return
        r = run_once(SF_DIR, NUM_CPUS, names={"lint_flags"})
        nd = n_docs(SF_DIR)
        t = r["queries"]["lint_flags"]
        print(json.dumps({"sec": t, "docs": nd, "docs_per_s": round(nd / t, 1)}))
        return

    if "--scaling" in sys.argv:
        # INTERLEAVED rounds: the sandbox is co-tenant noisy (observed
        # 17% throughput swings between identical runs), and scaling
        # efficiency divides two noisy numbers.  Each round runs the
        # (N, 4N) pair back-to-back in fresh processes so both arms see
        # similar ambient load; the reported efficiency is each round's
        # PAIRED ratio, plus their max/median across rounds.
        n, n4 = SCALING_N, 4 * SCALING_N
        rounds = int(os.environ.get("GRAFT_SCALING_ROUNDS", "2"))
        per_round = []
        res = {}
        for _ in range(rounds):
            rr = {}
            for cpus in (n, n4):
                env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus))
                p = subprocess.run([sys.executable, __file__, "--inner",
                                    "--scale-run"],
                                   capture_output=True, text=True, env=env,
                                   cwd=os.path.dirname(os.path.abspath(__file__)))
                line = p.stdout.strip().splitlines()[-1]
                rr[cpus] = json.loads(line)
            per_round.append(
                round(rr[n4]["docs_per_s"] / (4.0 * rr[n]["docs_per_s"]), 3))
            for cpus in (n, n4):
                if (cpus not in res
                        or rr[cpus]["docs_per_s"] > res[cpus]["docs_per_s"]):
                    res[cpus] = rr[cpus]
        effs = sorted(per_round)
        median = effs[len(effs) // 2] if len(effs) % 2 else round(
            (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3)
        print(json.dumps({
            "metric": f"lint-check+PIP-tile-join scaling ({n} vs {n4} CPUs, "
                      "fresh processes, paired interleaved rounds)",
            "unit": "docs/s",
            "sf": SCALING_SF, "docs": res[n4]["docs"],
            f"docs_per_s_{n}": res[n]["docs_per_s"],
            f"docs_per_s_{n4}": res[n4]["docs_per_s"],
            f"sec_{n}": res[n]["sec"], f"sec_{n4}": res[n4]["sec"],
            "per_round_efficiency": per_round,
            # headline key is the MEDIAN paired round (max-of-N would be
            # upward-biased under the documented co-tenant noise);
            # the best round is exposed under an explicit name
            "scaling_efficiency": median,
            "scaling_efficiency_best_round": max(per_round),
        }))
        return

    wait_for_idle(float(os.environ.get("GRAFT_BENCH_WAIT", "120")))
    t_all0 = time.time()
    r = run_once(SF_DIR, NUM_CPUS)
    total = round(time.time() - t_all0, 3)
    nd = n_docs(SF_DIR)
    print(json.dumps({
        "metric": "lint-check + PIP-tile-join throughput (headline pipelines, total wall sec)",
        "value": total, "unit": "sec",
        "queries": r["queries"], "rows": r["rows"],
        "docs": nd,
        "docs_per_s_flagship": round(nd / r["queries"]["lint_flags"], 1),
        "sf": SF_DIR, "num_cpus": NUM_CPUS,
    }))
    import ray
    ray.shutdown()


if __name__ == "__main__":
    main()
