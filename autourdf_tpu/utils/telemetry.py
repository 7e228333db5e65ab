"""Lightweight stage telemetry (the observability the reference lacks).

The reference's only instrumentation is tqdm bars and loss prints
(SURVEY §5).  Here every pipeline stage records wall-clock, device, and
stage-specific metrics into ``data/telemetry.json`` — enough to see where
time goes across runs without attaching a profiler — plus an opt-in hook
into jax's trace profiler for deep dives.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field


@dataclass
class Telemetry:
    path: str | None = None
    records: list[dict] = field(default_factory=list)

    @contextlib.contextmanager
    def stage(self, name: str, **meta):
        t0 = time.time()
        rec = {"stage": name, "start": t0, **meta}
        try:
            yield rec
        finally:
            rec["seconds"] = round(time.time() - t0, 3)
            self.records.append(rec)
            if self.path:
                self.flush()

    def flush(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        existing = []
        if os.path.exists(self.path):
            try:
                with open(self.path) as f:
                    existing = json.load(f)
            except (json.JSONDecodeError, OSError):
                existing = []
        with open(self.path, "w") as f:
            json.dump(existing + self.records, f, indent=1)
        self.records = []


@contextlib.contextmanager
def jax_trace(log_dir: str | None):
    """Opt-in jax profiler trace (view with tensorboard/xprof)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
