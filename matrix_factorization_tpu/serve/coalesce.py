"""Request-coalescing serving: micro-batched device dispatch.

The measured serving gap this closes (benchmarks/serving_latency.py):
one user's full-catalog ``recommend`` costs a whole device program
(~69ms warm on this image's tunnel, dominated by dispatch RTT), while
``recommend_batch`` amortizes one program over a cohort (2.39ms/user at
256 users).  A threaded HTTP server that dispatches each request's
program independently therefore pays the single-user path times N under
concurrent load — the reference's FastAPI app has the same flaw
(``project_template/app/api.py:90-134``), but TPU-first serving should
not.

:class:`CoalescingRecommender` fronts any fitted model with a
``recommend_batch``: concurrent ``recommend`` calls enqueue, a
dispatcher thread collects a micro-batch for up to ``window_ms``
(or ``max_batch`` requests, whichever first) and issues ONE device
program; each caller gets exactly its own user's rows back.  Requests
for the same user with the same exclusion set share one scored row;
same user with DIFFERENT exclusion sets split into separate dispatches
(``items_known_map`` is keyed by user and cannot express both).

Latency math: a lone request pays +window_ms; at an offered load of R
requests/s the expected batch is ``R * window_ms`` and per-user device
cost shrinks toward the batch rate — the win crosses over at a handful
of concurrent clients (measured: ``benchmarks/serving_latency.py
--concurrency``).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Any, Optional


class _Pending:
    __slots__ = ("user", "amount", "known", "event", "result", "error")

    def __init__(self, user, amount, known):
        self.user = user
        self.amount = amount
        self.known = known  # tuple or None
        self.event = threading.Event()
        self.result = None
        self.error = None


class CoalescingRecommender:
    """Micro-batching front for ``model.recommend``.

    Thread-safe; callers block until their batch's device program
    returns.  ``window_ms`` bounds the added latency for a lone request;
    ``max_batch`` bounds the device program's cohort size.
    """

    def __init__(self, model, window_ms: float = 2.0, max_batch: int = 256):
        if not hasattr(model, "recommend_batch"):
            raise TypeError("model has no recommend_batch")
        self.model = model
        self.window_ms = float(window_ms)
        self.max_batch = int(max_batch)
        self.dispatches = 0  # device programs issued (observability)
        self.served = 0  # requests answered
        self._q: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="coalesce-dispatch")
        self._closed = False
        self._thread.start()

    # -- caller side --------------------------------------------------------
    def recommend(self, user: Any, amount: int = 10,
                  items_known=None, timeout: float = 60.0):
        """Top-``amount`` rows for ``user`` — same frame schema as
        ``model.recommend_batch`` restricted to this user."""
        if self._closed:
            raise RuntimeError("CoalescingRecommender is closed")
        req = _Pending(user, int(amount),
                       tuple(items_known) if items_known else None)
        self._q.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError(f"recommend({user!r}) timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def close(self) -> None:
        self._closed = True
        self._q.put(None)
        self._thread.join(timeout=5.0)

    # -- dispatcher side ----------------------------------------------------
    def _collect(self):
        """Block for the first request, then gather up to max_batch more
        within the window."""
        first = self._q.get()
        if first is None:
            return None
        batch = [first]
        deadline = time.monotonic() + self.window_ms / 1e3
        while len(batch) < self.max_batch:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                nxt = self._q.get(timeout=left)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-post the shutdown sentinel
                break
            batch.append(nxt)
        return batch

    def _loop(self) -> None:
        while True:
            batch = self._collect()
            if batch is None:
                return
            # group by amount; within a group, one scored row per
            # (user, known) — a user requested twice with different
            # exclusion sets goes to a second dispatch
            by_amount: dict = {}
            for req in batch:
                by_amount.setdefault(req.amount, []).append(req)
            for amount, reqs in by_amount.items():
                remaining = reqs
                while remaining:
                    slot_of: dict = {}
                    later = []
                    for req in remaining:
                        cur = slot_of.get(req.user)
                        if cur is None:
                            slot_of[req.user] = [req.known, [req]]
                        elif cur[0] == req.known:
                            cur[1].append(req)
                        else:
                            later.append(req)
                    self._dispatch(amount, slot_of)
                    remaining = later

    def _dispatch(self, amount: int, slot_of: dict) -> None:
        users = list(slot_of.keys())
        known_map = {u: list(s[0]) for u, s in slot_of.items()
                     if s[0] is not None}
        try:
            frame = self.model.recommend_batch(
                users, amount=amount, items_known_map=known_map or None)
            self.dispatches += 1
            # recommend_batch concatenates per-user frames in input
            # order; split on the user_id column (order-preserving)
            for u, (_, reqs) in slot_of.items():
                rows = frame[frame["user_id"] == u].reset_index(drop=True)
                for req in reqs:
                    req.result = rows
                    self.served += 1
                    req.event.set()
        except Exception as e:  # noqa: BLE001 — propagate to every caller
            for _, reqs in slot_of.values():
                for req in reqs:
                    req.error = e
                    req.event.set()
