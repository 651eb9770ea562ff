"""Observability: stage timers, progress/running-info, profiler hooks.

TPU-native counterpart of the reference's tracing/metrics surface
(SURVEY.md §5): Timer (util/timer.h:39) wrapped around pipeline stages,
SfMRunningInfo worker telemetry (map_reduce/running_info.h:62-121) and
the SfMMaster::ShowProgress terminal dashboard (master.cpp:66-108) —
replaced by structured in-process records plus optional jax.profiler
traces (the reference has no structured tracing at all).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time


@dataclasses.dataclass
class StageTimer:
    """Hierarchical named stage timing (ref: per-stage wall-clock report,
    distributed_mapper_controller.cpp:215-225)."""
    records: dict = dataclasses.field(default_factory=dict)
    _starts: dict = dataclasses.field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.records[name] = self.records.get(name, 0.0) \
                + time.perf_counter() - t0

    def report(self) -> str:
        lines = ["Elapsed time (s):"]
        for k, v in self.records.items():
            lines.append(f"  {k:>24s}: {v:9.3f}")
        return "\n".join(lines)

    def as_json(self) -> str:
        return json.dumps(self.records)


@dataclasses.dataclass
class RunningInfo:
    """Cluster-job telemetry (ref SfMRunningInfo running_info.h:62-121)."""
    idle: bool = True
    in_progress: bool = False
    completed: bool = False
    running_time_s: float = 0.0
    total_image_num: int = 0
    registered_image_num: int = 0
    total_matching_pairs: int = 0
    matched_image_pairs: int = 0

    def reset(self) -> None:
        self.__init__()


class ProgressMonitor:
    """In-process dashboard over parallel cluster jobs (ref ShowProgress).

    Collects one RunningInfo per job; `render()` returns the table the
    reference printed to the terminal every second.
    """

    def __init__(self):
        self.jobs: dict[int, RunningInfo] = {}
        self._t0 = time.perf_counter()

    def job(self, job_id: int) -> RunningInfo:
        return self.jobs.setdefault(job_id, RunningInfo())

    def start(self, job_id: int, total_images: int) -> None:
        info = self.job(job_id)
        info.idle = False
        info.in_progress = True
        info.total_image_num = total_images

    def update(self, job_id: int, registered: int) -> None:
        self.job(job_id).registered_image_num = registered

    def complete(self, job_id: int) -> None:
        info = self.job(job_id)
        info.in_progress = False
        info.completed = True
        info.running_time_s = time.perf_counter() - self._t0

    def all_completed(self) -> bool:
        return all(j.completed for j in self.jobs.values()) \
            and bool(self.jobs)

    def render(self) -> str:
        rows = [f"{'job':>4} {'status':>12} {'progress':>12} {'time':>8}"]
        for jid, j in sorted(self.jobs.items()):
            status = ("done" if j.completed
                      else "running" if j.in_progress else "idle")
            prog = f"{j.registered_image_num}/{j.total_image_num}"
            rows.append(f"{jid:>4} {status:>12} {prog:>12} "
                        f"{j.running_time_s:8.1f}")
        return "\n".join(rows)


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """jax.profiler trace around a pipeline stage (None = no-op)."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
