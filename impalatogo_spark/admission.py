"""Admission control: per-pool concurrency caps with FIFO queueing.

Reference parity: the reference's admission controller
(`be/src/scheduling/admission-controller.cc`) gates query execution per
request pool — a query is ADMITTED immediately while the pool has a free
slot, QUEUED (FIFO) when `max_requests` are already running, and REJECTED
when the queue itself is full (`max_queued`) or the queue wait exceeds
the timeout (`queue_timeout_ms`, reference default 60 s). Pool selection
is the REQUEST_POOL query option (`be/src/service/query-options.cc`).

Spark-native mapping: Spark has no admission layer — the FAIR scheduler
(pool = `spark.scheduler.pool` local property) only WEIGHTS running
queries. This module adds the missing admit/queue/reject stage in front
of job submission; the engine/server call `admit()` before running a
statement and `release()` after. Everything is driver-side bookkeeping
(a condition variable and counters) — zero cost on the executor path, so
the 100 TB posture is unchanged.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field


class AdmissionRejected(Exception):
    """Raised when a pool rejects a query (queue full or disabled pool)."""


class AdmissionTimeout(Exception):
    """Raised when a queued query exceeds the pool's queue timeout."""


@dataclass
class PoolConfig:
    # <= 0 mirrors the reference's "unlimited" convention
    # (admission-controller.cc: max_requests <= 0 -> no cap)
    max_requests: int = 0
    max_queued: int = 200  # reference default_pool_max_queued
    queue_timeout_ms: int = 60000  # reference queue_wait_timeout_ms
    # memory-based admission (admission-controller.cc mem_resources:
    # a query is admitted when the pool's aggregate admitted memory +
    # this query's to-admit memory fits under the cap; a single query
    # larger than the whole pool is REJECTED outright)
    max_mem_resources: int = 0  # bytes; <= 0 -> no memory gate


@dataclass
class PoolStats:
    admitted: int = 0
    queued: int = 0
    rejected: int = 0
    timed_out: int = 0
    running: int = 0
    waiting: int = 0
    running_mem: int = 0  # bytes admitted to currently-running queries
    # completed admission order, for tests/readouts (query labels)
    admission_order: list = field(default_factory=list)


class AdmissionController:
    """FIFO per-pool admission. Thread-safe; one instance per server."""

    def __init__(self):
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._configs: dict[str, PoolConfig] = {}
        self._stats: dict[str, PoolStats] = {}
        # FIFO ticket queue per pool: admission strictly in arrival order,
        # like the reference's queue (no barging when a slot frees up).
        self._queues: dict[str, list[int]] = {}
        self._next_ticket = 0

    def configure_pool(self, pool: str, max_requests: int | None = None,
                       max_queued: int | None = None,
                       queue_timeout_ms: int | None = None,
                       max_mem_resources: int | None = None) -> PoolConfig:
        with self._lock:
            cfg = self._configs.setdefault(pool, PoolConfig())
            if max_requests is not None:
                cfg.max_requests = int(max_requests)
            if max_queued is not None:
                cfg.max_queued = int(max_queued)
            if queue_timeout_ms is not None:
                cfg.queue_timeout_ms = int(queue_timeout_ms)
            if max_mem_resources is not None:
                cfg.max_mem_resources = int(max_mem_resources)
            self._cv.notify_all()
            return cfg

    def _pool(self, pool: str) -> tuple[PoolConfig, PoolStats, list]:
        cfg = self._configs.setdefault(pool, PoolConfig())
        st = self._stats.setdefault(pool, PoolStats())
        q = self._queues.setdefault(pool, [])
        return cfg, st, q

    def admit(self, pool: str = "default", label: str = "",
              mem: int = 0) -> None:
        """Block until admitted. Raises AdmissionRejected / AdmissionTimeout.

        `mem` is the query's to-admit memory estimate in bytes (the
        reference uses the planner's per-host estimate or MEM_LIMIT,
        admission-controller.cc CanAccommodateMaxInitialReservation);
        pass 0 to skip the memory gate for this query."""

        def _grant(st):
            st.admitted += 1
            st.running += 1
            st.running_mem += mem
            st.admission_order.append(label)

        with self._cv:
            cfg, st, q = self._pool(pool)
            if cfg.max_mem_resources > 0 and mem > cfg.max_mem_resources:
                # a query that can never fit is rejected, not queued
                # (reference: "request memory needed ... is greater than
                # pool max mem resources")
                st.rejected += 1
                raise AdmissionRejected(
                    f"pool {pool}: query memory estimate {mem} B exceeds "
                    f"pool max mem resources {cfg.max_mem_resources} B"
                )

            def _fits(cfg, st):
                return ((cfg.max_requests <= 0
                         or st.running < cfg.max_requests)
                        and (cfg.max_mem_resources <= 0 or mem <= 0
                             or st.running_mem + mem
                             <= cfg.max_mem_resources))

            if cfg.max_requests <= 0 and cfg.max_mem_resources <= 0:
                _grant(st)  # unlimited pool: fast path
                return
            if _fits(cfg, st) and not q:
                _grant(st)
                return
            if len(q) >= cfg.max_queued:
                st.rejected += 1
                raise AdmissionRejected(
                    f"pool {pool}: queue full ({cfg.max_queued} queued)"
                )
            ticket = self._next_ticket
            self._next_ticket += 1
            q.append(ticket)
            st.queued += 1
            st.waiting += 1
            deadline = time.monotonic() + cfg.queue_timeout_ms / 1000.0
            try:
                while True:
                    cfg = self._configs[pool]
                    if q and q[0] == ticket and _fits(cfg, st):
                        q.pop(0)
                        _grant(st)
                        # Wake the next FIFO waiter: when 2+ slots free in a
                        # burst, release() only notified once before this
                        # waiter consumed the wakeup — without a re-notify the
                        # next head-of-queue sleeps until its queue timeout.
                        self._cv.notify_all()
                        return
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        st.timed_out += 1
                        raise AdmissionTimeout(
                            f"pool {pool}: admission queue wait exceeded "
                            f"{cfg.queue_timeout_ms} ms"
                        )
                    self._cv.wait(timeout=remaining)
            except BaseException:
                if ticket in q:
                    q.remove(ticket)
                self._cv.notify_all()
                raise
            finally:
                st.waiting -= 1

    def release(self, pool: str = "default", mem: int = 0) -> None:
        with self._cv:
            _, st, _ = self._pool(pool)
            st.running = max(0, st.running - 1)
            st.running_mem = max(0, st.running_mem - mem)
            self._cv.notify_all()

    def stats(self, pool: str | None = None) -> dict:
        """Readout: per-pool counters (the SHOW ADMISSION equivalent of the
        reference's /admission debug endpoint)."""
        with self._lock:
            pools = [pool] if pool else sorted(
                set(self._configs) | set(self._stats)
            )
            out = {}
            for p in pools:
                cfg, st, q = self._pool(p)
                out[p] = {
                    "max_requests": cfg.max_requests,
                    "max_queued": cfg.max_queued,
                    "queue_timeout_ms": cfg.queue_timeout_ms,
                    "max_mem_resources": cfg.max_mem_resources,
                    "running_mem": st.running_mem,
                    "admitted": st.admitted,
                    "queued_total": st.queued,
                    "rejected": st.rejected,
                    "timed_out": st.timed_out,
                    "running_now": st.running,
                    "waiting_now": st.waiting,
                }
            return out

    def admission_order(self, pool: str = "default") -> list:
        with self._lock:
            return list(self._stats.setdefault(pool, PoolStats()).admission_order)
