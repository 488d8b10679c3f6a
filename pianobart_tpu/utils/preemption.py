"""Graceful preemption for long training runs.

Production accelerator jobs get preempted — spot reclaim, maintenance
events, scheduler SIGTERM.  The reference loses everything since its last
epoch-end ``torch.save`` (``main.py:65-100`` saves once per epoch and never
reloads optimizer state, SURVEY §5).  Here:

* :class:`PreemptionGuard` turns the first SIGTERM/SIGINT into a flag;
* the runners (``train/runner.py``) poll it at dispatch/batch boundaries,
  write the rotating mid-epoch ``safety`` checkpoint
  (``train/state.py:CheckpointManager.save_safety`` — params + optimizer +
  epoch) and raise :class:`Preempted`;
* the CLI exits with :data:`EXIT_PREEMPTED` (75, ``EX_TEMPFAIL`` — the
  conventional "transient, requeue me" code) so schedulers restart the job;
  re-running with ``--resume`` restarts the interrupted epoch from the
  safety slot.

A second signal while the graceful save is in flight restores the previous
handlers and re-raises ``KeyboardInterrupt`` — the escape hatch when the
save itself hangs.
"""
from __future__ import annotations

import signal
import sys
from typing import Optional

__all__ = ["EXIT_PREEMPTED", "Preempted", "PreemptionGuard"]

# os.EX_TEMPFAIL: "temporary failure, retry" — what requeue-on-preempt
# schedulers conventionally look for.
EXIT_PREEMPTED = 75


class Preempted(RuntimeError):
    """Raised by a runner after the graceful safety checkpoint is written."""


class PreemptionGuard:
    """First SIGTERM/SIGINT sets :attr:`requested`; second one re-raises.

    Install from the main thread only (CPython restricts ``signal.signal``);
    :meth:`install` is a no-op (returns ``None``) elsewhere so library users
    on worker threads degrade to no preemption handling instead of crashing.
    """

    SIGNALS = (signal.SIGTERM, signal.SIGINT)

    def __init__(self) -> None:
        self.requested = False
        self._prev: dict = {}

    def install(self) -> Optional["PreemptionGuard"]:
        try:
            for s in self.SIGNALS:
                self._prev[s] = signal.signal(s, self._handle)
        except ValueError:  # not the main thread
            self._prev.clear()
            return None
        return self

    def uninstall(self) -> None:
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev.clear()

    def _handle(self, signum, frame):
        if self.requested:
            # Second signal: the user (or scheduler) wants out NOW.
            self.uninstall()
            raise KeyboardInterrupt
        self.requested = True
        name = signal.Signals(signum).name
        print(f"[preempt] caught {name}: finishing the in-flight step, "
              f"saving a safety checkpoint, then exiting {EXIT_PREEMPTED}; "
              f"signal again to abort immediately", file=sys.stderr)
