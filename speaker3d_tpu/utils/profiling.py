"""Training-step profiling (new capability — the reference has no
systematic tracing, only AverageMeters; SURVEY.md §5).

`StepTracer` wraps jax.profiler around a window of train steps and writes a
TensorBoard-loadable trace (host + device timelines, XLA HLO annotations):

    tracer = StepTracer(profile_dir, start_step=2, num_steps=5)
    for i, batch in enumerate(loader):
        tracer.before_step(global_step)
        state, metrics = train_step(state, batch)
        tracer.after_step(global_step, wait_for=metrics["loss"])

The window starts AFTER the first step by default so the one-off compile is
not mixed into the kernel timeline. On the tunneled-TPU harness the device
timeline may be empty (the PJRT plugin does not stream device traces back);
host-side tracing and CPU runs are always captured.
"""

from __future__ import annotations

from typing import Optional


class StepTracer:
    def __init__(self, profile_dir: Optional[str], start_step: int = 2,
                 num_steps: int = 5):
        self.profile_dir = profile_dir
        self.start = start_step
        self.stop = start_step + num_steps
        self._active = False
        self._done = False

    def before_step(self, step: int) -> None:
        if (self.profile_dir and not self._done and not self._active
                and step >= self.start):
            import jax

            jax.profiler.start_trace(self.profile_dir)
            self._active = True

    def after_step(self, step: int, wait_for=None) -> None:
        if self._active and step + 1 >= self.stop:
            import jax

            if wait_for is not None:
                jax.block_until_ready(wait_for)
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            print(f"profiler trace ({self.start}..{step}) -> "
                  f"{self.profile_dir}")

    def close(self) -> None:
        """Stop an in-flight trace (e.g. epoch ended inside the window)."""
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            self._done = True
