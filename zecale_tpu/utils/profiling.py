"""Phase profiler + jax.profiler trace capture — the TPU-native analog of
libff's block profiler (reference: enter_block/leave_block hierarchical
timings, aggregator_test.cpp:91-97,234-243; SURVEY.md section 5).

Usage:
    prof = PhaseProfiler()
    with prof.phase("setup"):
        ...
    with prof.phase("prove"):
        with prof.phase("prove/fft"):
            ...
    prof.report()            # hierarchical stdout table
    prof.to_json(path)       # machine-readable artifact for the bench

Set ZECALE_JAX_TRACE=<dir> to additionally capture a jax.profiler trace
(TensorBoard format) around every top-level phase.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional


class PhaseProfiler:
    def __init__(self, trace_dir: Optional[str] = None):
        self.records: List[dict] = []
        self._stack: List[str] = []
        self.trace_dir = trace_dir or os.environ.get("ZECALE_JAX_TRACE")

    @contextlib.contextmanager
    def phase(self, name: str):
        full = "/".join(self._stack + [name]) if self._stack else name
        self._stack.append(name)
        tracing = self.trace_dir and len(self._stack) == 1
        if tracing:
            import jax

            jax.profiler.start_trace(
                os.path.join(self.trace_dir, name.replace("/", "_"))
            )
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            if tracing:
                import jax

                jax.profiler.stop_trace()
            self._stack.pop()
            self.records.append(
                {"phase": full, "seconds": round(dt, 4),
                 "depth": full.count("/")}
            )

    def merge_timings(self, prefix: str, timings: Dict[str, float]):
        """Fold a {name: seconds} dict (e.g. a prover's internal marks)
        into the report under ``prefix/``."""
        for k, v in timings.items():
            self.records.append(
                {"phase": f"{prefix}/{k}", "seconds": round(v, 4),
                 "depth": prefix.count("/") + 1}
            )

    def report(self, file=None) -> None:
        import sys

        f = file or sys.stderr
        print("== phase timings ==", file=f)
        for rec in self.records:
            indent = "  " * rec["depth"]
            name = rec["phase"].rsplit("/", 1)[-1]
            print(f"{indent}{name:<28s} {rec['seconds']:>9.3f}s", file=f)

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"phases": self.records}, f, indent=1)

    def total(self, phase: str) -> float:
        return sum(
            r["seconds"] for r in self.records if r["phase"] == phase
        )
