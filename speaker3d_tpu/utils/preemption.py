"""Preemption-safe training (new capability — the reference's only failure
story is torchrun restart + per-epoch checkpoints; SURVEY.md §5).

`GracefulShutdown` converts SIGTERM/SIGINT into a cooperative flag the
training loop checks once per step; the trainer then checkpoints the live
state and exits 0. The checkpoint is written under the PREVIOUS epoch's
label with the current (mid-epoch) weights and step counter, so recovery
re-runs the interrupted epoch's data order while schedules resume from the
exact step — the standard redo-partial-epoch semantics for preemptible
fleets. A second signal aborts immediately (the default handler).
"""

from __future__ import annotations

import signal


class GracefulShutdown:
    """Cooperative SIGTERM/SIGINT latch.

    >>> shutdown = GracefulShutdown()
    ... for batch in loader:
    ...     step(...)
    ...     if shutdown.requested: break
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self.requested = False
        self._previous = {}
        for sig in signals:
            try:
                self._previous[sig] = signal.signal(sig, self._handler)
            except (ValueError, OSError):
                pass  # non-main thread or unsupported signal

    def _handler(self, sig, frame):
        if self.requested:  # second signal: give up cooperating
            previous = self._previous.get(sig, signal.SIG_DFL)
            signal.signal(sig, previous)
            raise KeyboardInterrupt(f"second signal {sig}")
        self.requested = True
        print(f"[preemption] signal {sig} received: will checkpoint and "
              f"exit at the next step boundary", flush=True)

    def restore(self):
        for sig, prev in self._previous.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass

    def finalize(self):
        """restore(); then, if a preemption was handled, exit the process
        WITHOUT running interpreter/PJRT teardown.

        On the tunneled-TPU harness the plugin's client destructor aborts
        from its worker threads during normal exit AFTER the preemption
        checkpoint is durably on disk (measured r4, tools/soak_train.py
        phase 1: rc=-6 with a valid checkpoint). The checkpoint is the
        recovery contract; os._exit(0) makes the exit code honest too.
        No-op when no signal was received (in-process callers unaffected)."""
        self.restore()
        if self.requested:
            import os
            import sys

            sys.stdout.flush()
            sys.stderr.flush()
            os._exit(0)


def save_preemption_checkpoint(checkpointer, epoch_counter, epoch: int,
                               states) -> str:
    """Write the mid-epoch state so recovery re-runs the interrupted epoch:
    the epoch counter is rewound to epoch-1 before saving (recover restores
    it, and the `for epoch in counter` loop replays epoch `epoch`)."""
    epoch_counter.current = max(epoch - 1, 0)
    d = checkpointer.save_checkpoint(max(epoch - 1, 0), states)
    print(f"[preemption] checkpoint saved to {d}; exiting", flush=True)
    return d
