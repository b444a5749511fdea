"""Timing methodology shared by bench.py and tools/scale_probe.py.

Every timed run builds a FRESH DataFrame from the query function and
executes it end-to-end. Re-executing a previously-executed DataFrame
object would serve cached shuffle outputs — Spark keeps the shuffle
files of a physical-plan instance and schedules repeat actions as
"skipped stages", so only the post-shuffle tail would run and the number
would measure cached-shuffle serving, not execution. A fresh build per
run derives a new plan instance (new RDD lineage), so every scan, map,
and shuffle stage genuinely re-executes.

Catalyst compile cost (Python plan construction + analysis/optimization/
physical planning) is measured INSIDE each run — between fn() and the
forced executedPlan — and reported as a separate column rather than
excluded by plan reuse: the execution number stays an honest full-DAG
time, and the compile column makes the engine's fixed per-query overhead
visible instead of hidden (an engine serving a repeated workload would
amortize it through a plan cache; a cold query pays it once).

Queries whose fn() materializes data mid-build (localCheckpoint —
``rebuild_per_run=True``) are timed end-to-end with compile folded into
the execution number: the split would park real execution inside the
compile window.
"""

from __future__ import annotations

import statistics
import time


def time_query(spark, q, sf_dir: str, runs: int = 3) -> tuple[float, float]:
    """Median (exec_seconds, compile_seconds) over `runs` fresh builds."""
    import gc

    execs, compiles = [], []
    for _ in range(runs):
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        df._jdf.queryExecution().executedPlan()  # force the compile phase
        t1 = time.perf_counter()
        df.toPandas()
        t2 = time.perf_counter()
        if q.rebuild_per_run:
            execs.append(t2 - t0)
            compiles.append(0.0)
        else:
            execs.append(t2 - t1)
            compiles.append(t1 - t0)
        # Reclaim this run's plan garbage (shuffle files, broadcasts)
        # OUTSIDE the timed window: fresh-build runs generate real
        # per-run garbage, and the async ContextCleaner's block removal
        # otherwise lands inside the next run's timing.
        del df
        gc.collect()
        spark._jvm.System.gc()
        time.sleep(0.2)
    return statistics.median(execs), statistics.median(compiles)
