"""Progress reporting for long-running queries and builds.

The reference exposes per-query ``progress()`` as the max consumed
fraction of its posting-list operands (``/root/reference/src/query/
mod.rs:148-157``, ``operators.rs:177-181``).  Spark already tracks the
equivalent — task completion per stage — so the Spark-native analog is a
poller over ``SparkContext.statusTracker()`` scoped to a job group: no
instrumentation in the operators themselves, works for ANY action (build,
search, epoch merge) on a 1000-executor cluster exactly as on local mode.

Usage::

    with report_progress(spark, lambda ev: print(ev)) as _:
        engine.search("hash join", k=10).collect()

Events are emitted from a daemon thread every ``interval`` seconds while
work is running, plus one final ``done=True`` event; ``fraction`` is
completed/total tasks across the scope's jobs, monotone per job set.
"""

from __future__ import annotations

import threading
import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass
from typing import Callable


@dataclass(frozen=True)
class ProgressEvent:
    n_jobs: int
    active_stages: int
    tasks_done: int
    tasks_total: int
    fraction: float  # 0.0 .. 1.0 over tasks seen so far
    done: bool


def _snapshot(tracker, group: str) -> tuple[int, int, int, int]:
    jobs = tracker.getJobIdsForGroup(group)
    tasks_done = tasks_total = active = 0
    for jid in jobs:
        jinfo = tracker.getJobInfo(jid)
        if jinfo is None:
            continue
        for sid in jinfo.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is None:
                continue
            tasks_total += sinfo.numTasks
            tasks_done += sinfo.numCompletedTasks
            if sinfo.numActiveTasks > 0:
                active += 1
    return len(jobs), active, tasks_done, tasks_total


@contextmanager
def report_progress(
    spark,
    callback: Callable[[ProgressEvent], None],
    interval: float = 0.5,
    description: str = "perlin_spark job",
):
    """Scope a block of Spark actions under a job group and stream
    task-level progress events to ``callback`` while they run."""
    sc = spark.sparkContext
    group = f"perlin-progress-{uuid.uuid4().hex[:12]}"
    stop = threading.Event()
    tracker = sc.statusTracker()

    def poll() -> None:
        best_done = 0
        while not stop.wait(interval):
            n_jobs, active, done, total = _snapshot(tracker, group)
            if total == 0:
                continue
            best_done = max(best_done, done)
            callback(
                ProgressEvent(
                    n_jobs=n_jobs,
                    active_stages=active,
                    tasks_done=best_done,
                    tasks_total=total,
                    fraction=min(1.0, best_done / total),
                    done=False,
                )
            )

    sc.setJobGroup(group, description, interruptOnCancel=False)
    t = threading.Thread(target=poll, daemon=True)
    t.start()
    try:
        yield group
    finally:
        stop.set()
        t.join(timeout=5)
        n_jobs, active, done, total = _snapshot(tracker, group)
        sc.setJobGroup("", "")
        callback(
            ProgressEvent(
                n_jobs=n_jobs,
                active_stages=0,
                tasks_done=done,
                tasks_total=total,
                fraction=1.0,
                done=True,
            )
        )
