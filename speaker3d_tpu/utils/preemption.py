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

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT),
                 poll_interval: int = 8):
        self.requested = False
        # multi-process: how many poll() calls between collective
        # all-gathers (1 = every step); see poll()
        self.poll_interval = max(1, int(poll_interval))
        self._preempted = False  # last COLLECTIVE decision (multi-process)
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

    def poll(self) -> bool:
        """Step-boundary check, POD-AWARE: returns True when ANY process of
        the pod has received a signal, and latches `requested` on every
        rank so the save/exit paths behave uniformly.

        A preemption usually lands on ONE rank of a pod (the reference's
        torchrun story simply dies and restarts, speakerlab/bin/
        train.py:82-116); without agreement the surviving ranks would hang
        in the next collective against a dead peer. Must be called at the
        same step boundary on every process — it is itself a collective
        when process_count > 1 (a [nproc] bool all-gather; zero overhead
        single-process)."""
        import jax

        if jax.process_count() == 1:
            return self.requested
        # Keep the collective off the per-step critical path: a blocking
        # host fetch every step would serialize the async dispatch
        # pipeline the train loops protect. All ranks call poll() once per
        # step, so the call counters stay in phase and the all-gather runs
        # on the same step everywhere; detection lags a signal by at most
        # poll_interval steps. Skipped calls return the last COLLECTIVE
        # decision (never the local flag — see below).
        self._poll_calls = getattr(self, "_poll_calls", -1) + 1
        if self._poll_calls % self.poll_interval:
            return self._preempted
        import numpy as np
        from jax.experimental import multihost_utils

        # Snapshot the flag BEFORE the collective and return the COLLECTIVE
        # decision, never the live flag: a signal delivered between the
        # all-gather and the return would otherwise make this rank break
        # while its peers (who saw the pre-signal False) continue — the
        # ranks then deadlock pairing a poll against an exit barrier
        # (measured: tests/test_multihost.py kill-one leg). A late signal
        # is simply picked up by the next poll.
        local = bool(self.requested)
        flags = multihost_utils.process_allgather(
            np.asarray([local], dtype=np.bool_))
        decision = bool(np.any(flags))
        if decision and not local:
            print("[preemption] peer rank requested shutdown: joining at "
                  "this step boundary", flush=True)
        if decision:
            self.requested = True
        self._preempted = decision
        return decision

    def restore(self):
        for sig, prev in self._previous.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass

    def finalize(self, preempted=None):
        """restore(); then, if a preemption was handled, exit the process
        WITHOUT running interpreter/PJRT teardown.

        On the tunneled-TPU harness the plugin's client destructor aborts
        from its worker threads during normal exit AFTER the preemption
        checkpoint is durably on disk (measured r4, tools/soak_train.py
        phase 1: rc=-6 with a valid checkpoint). The checkpoint is the
        recovery contract; os._exit(0) makes the exit code honest too.
        No-op when no signal was received (in-process callers unaffected).

        ``preempted``: on a multi-process pod, pass the COLLECTIVE decision
        from poll() — every rank must take the same exit path, and the raw
        local flag can diverge (a signal landing after a rank's last poll
        would make it os._exit while its peers continue into a collective
        against a dead task — measured as a coordination-service fatal in
        tests/test_multihost.py). Single-process keeps the local-flag
        behavior regardless."""
        self.restore()
        import jax

        if preempted is None or jax.process_count() == 1:
            preempted = self.requested
        if preempted:
            import os
            import sys

            if jax.process_count() > 1:
                # exit barrier: a rank must not die while a peer is still
                # finishing its side of the last collective or writing the
                # preemption checkpoint (rank 0 saves between the final
                # poll() and this point). Without it the surviving rank
                # reads a reset Gloo socket mid-allgather (measured:
                # tests/test_multihost.py kill-one leg). Best-effort: if a
                # peer died hard anyway, still exit.
                try:
                    from jax.experimental import multihost_utils

                    multihost_utils.sync_global_devices("preemption_exit")
                except Exception as e:  # noqa: BLE001
                    print(f"[preemption] exit barrier failed ({e}); "
                          f"exiting anyway", flush=True)
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
