"""Backlog monitor → dynamic partition planning (reference S13/S5).

The reference polls Cloud Monitoring every `monitoring.interval`
(600 s default, min 30 s) for ``num_undelivered_messages`` /
``num_unacked_messages_by_region`` and plans
``clamp(ceil(backlog/threshold), 1, max)`` input partitions per batch,
optionally split by region (PubsubSubscriptionMonitor.scala:51-220).
Here the metric source is the broker's backlog gauge; the arithmetic
lives in ``options.calculate_partitions`` / ``plan_partitioning`` so it
is unit-testable without any I/O.

In Spark terms this is elastic *source* parallelism — admission
control like maxOffsetsPerTrigger, but adjusting task count rather
than rows per task, so one 10k-message trigger and one 2.5M-message
trigger both run with ~10k messages per task.
"""

from __future__ import annotations

import math
import threading
import time

from .broker import FileBroker
from .options import PartitioningInfo, PubsubReadOptions, plan_partitioning

MIN_REFRESH_INTERVAL_S = 30.0  # PubsubSubscriptionMonitor.scala:37-39


class BacklogMonitor:
    def __init__(
        self,
        broker: FileBroker,
        subscription: str,
        opts: PubsubReadOptions,
        refresh_interval_s: float = 600.0,
        auto_refresh: bool = False,
    ):
        self.broker = broker
        self.subscription = subscription
        self.opts = opts
        self.refresh_interval_s = max(
            MIN_REFRESH_INTERVAL_S if auto_refresh else 0.0, refresh_interval_s
        )
        self._last_refresh = 0.0
        self._info = PartitioningInfo(total_partitions=opts.num_partitions)
        self._backlog = 0
        self._lock = threading.Lock()
        self._timer: threading.Timer | None = None
        self._stopped = False
        if auto_refresh:
            self._schedule()

    # -- refresh ----------------------------------------------------------
    def refresh(self) -> None:
        by_region = self.broker.backlog_by_region(self.subscription)
        with self._lock:
            self._backlog = sum(by_region.values())
            self._info = plan_partitioning(
                by_region,
                threshold=self.opts.backlog_threshold,
                max_partitions=self.opts.max_dynamic_partitions,
                split_threshold=self.opts.region_split_threshold,
            )
            self._last_refresh = time.time()

    def maybe_refresh(self) -> None:
        if time.time() - self._last_refresh >= self.refresh_interval_s:
            self.refresh()

    def _schedule(self) -> None:
        # daemon timer like the reference's java.util.Timer(isDaemon=true)
        # (PubsubSubscriptionMonitor.scala:212-220). Caller holds no
        # lock in __init__; _tick/stop serialize on self._lock so a
        # stop() landing while a tick is EXECUTING (Timer.cancel is a
        # no-op once fired) cannot be undone by the tick's reschedule
        # (r15 review: the unconditional finally-reschedule resurrected
        # a stopped monitor forever).
        self._timer = threading.Timer(self.refresh_interval_s, self._tick)
        self._timer.daemon = True
        self._timer.start()

    def _tick(self) -> None:
        try:
            self.refresh()
        finally:
            with self._lock:
                if not self._stopped:
                    self._schedule()

    def stop(self) -> None:
        with self._lock:
            self._stopped = True
            if self._timer is not None:
                self._timer.cancel()
                self._timer = None

    # -- planning inputs ----------------------------------------------------
    @property
    def backlog(self) -> int:
        with self._lock:
            return self._backlog

    def partitioning_info(self) -> PartitioningInfo:
        self.maybe_refresh()
        with self._lock:
            return self._info

    def batches_to_drain(self, capacity_per_batch: int) -> int:
        """availableNow batch estimate: max(backlog / capacity, 1)
        (PubsubSubscriptionMonitor.scala:96-113; the reference divides
        by partitions×500 because the Pull API returns ~half the cap in
        practice — the FileBroker returns exactly the cap, so we divide
        by the true capacity)."""
        self.maybe_refresh()
        with self._lock:
            return max(1, math.ceil(self._backlog / max(1, capacity_per_batch)))
