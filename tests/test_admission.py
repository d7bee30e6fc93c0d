"""Admission controller unit tests (impalatogo_spark/admission.py).

Reference semantics: be/src/scheduling/admission-controller.cc — per-pool
max_requests gate, FIFO queue bounded by max_queued, queue_timeout_ms.
Pure driver-side bookkeeping, so these tests run without Spark.
"""

from __future__ import annotations

import threading
import time

import pytest

from impalatogo_spark.admission import (AdmissionController,
                                        AdmissionRejected, AdmissionTimeout)


def test_unlimited_pool_never_blocks():
    ac = AdmissionController()
    for i in range(10):
        ac.admit("default", label=f"q{i}")
    assert ac.stats("default")["default"]["running_now"] == 10
    for _ in range(10):
        ac.release("default")
    assert ac.stats("default")["default"]["running_now"] == 0


def test_cap2_bounds_concurrency_and_preserves_fifo_order():
    """With max_requests=2 and 6 staggered workers, at most 2 run at once
    and admission happens strictly in arrival order."""
    ac = AdmissionController()
    ac.configure_pool("etl", max_requests=2)
    running = []
    peak = []
    lock = threading.Lock()

    def worker(i):
        ac.admit("etl", label=f"q{i}")
        with lock:
            running.append(i)
            peak.append(len(running))
        time.sleep(0.15)
        with lock:
            running.remove(i)
        ac.release("etl")

    threads = []
    for i in range(6):
        t = threading.Thread(target=worker, args=(i,))
        threads.append(t)
        t.start()
        time.sleep(0.03)  # deterministic arrival order
    for t in threads:
        t.join(timeout=30)

    assert max(peak) <= 2, f"cap 2 violated: peak={max(peak)}"
    assert ac.admission_order("etl") == [f"q{i}" for i in range(6)]
    st = ac.stats("etl")["etl"]
    assert st["admitted"] == 6
    assert st["queued_total"] >= 4  # the staggered tail had to queue
    assert st["running_now"] == 0 and st["waiting_now"] == 0


def test_queue_full_rejects():
    ac = AdmissionController()
    ac.configure_pool("p", max_requests=1, max_queued=1)
    ac.admit("p", label="holder")
    ok2 = threading.Thread(target=lambda: (ac.admit("p", label="queued"),
                                           ac.release("p")))
    ok2.start()
    time.sleep(0.1)  # let it enter the queue
    with pytest.raises(AdmissionRejected):
        ac.admit("p", label="overflow")
    ac.release("p")
    ok2.join(timeout=10)
    st = ac.stats("p")["p"]
    assert st["rejected"] == 1 and st["admitted"] == 2


def test_queue_timeout():
    ac = AdmissionController()
    ac.configure_pool("p", max_requests=1, queue_timeout_ms=120)
    ac.admit("p", label="holder")
    t0 = time.monotonic()
    with pytest.raises(AdmissionTimeout):
        ac.admit("p", label="waiter")
    assert time.monotonic() - t0 < 5
    ac.release("p")
    st = ac.stats("p")["p"]
    assert st["timed_out"] == 1
    # pool still healthy after the timeout
    ac.admit("p", label="after")
    ac.release("p")


def test_raising_cap_drains_queue():
    ac = AdmissionController()
    ac.configure_pool("p", max_requests=1)
    ac.admit("p", label="holder")
    admitted = threading.Event()

    def waiter():
        ac.admit("p", label="waiter")
        admitted.set()

    t = threading.Thread(target=waiter)
    t.start()
    time.sleep(0.1)
    assert not admitted.is_set()
    ac.configure_pool("p", max_requests=2)  # runtime pool reconfig
    assert admitted.wait(timeout=10)
    t.join(timeout=10)
    ac.release("p")
    ac.release("p")


def test_burst_release_admits_all_waiters_promptly():
    """Two slots freeing in a burst must wake BOTH queued waiters at once:
    a waiter that admits itself consumes the release's notify, so it has to
    re-notify the next head-of-queue (r03 advice: without it the second
    waiter slept until its full queue timeout despite a free slot)."""
    ac = AdmissionController()
    ac.configure_pool("p", max_requests=2, queue_timeout_ms=10000)
    ac.admit("p", label="h1")
    ac.admit("p", label="h2")
    done = []
    lock = threading.Lock()

    def waiter(i):
        ac.admit("p", label=f"w{i}")
        with lock:
            done.append(time.monotonic())

    threads = []
    for i in range(2):
        t = threading.Thread(target=waiter, args=(i,))
        threads.append(t)
        t.start()
        deadline = time.time() + 10
        while (ac.stats("p")["p"]["waiting_now"] < i + 1
               and time.time() < deadline):
            time.sleep(0.005)
    assert ac.stats("p")["p"]["waiting_now"] == 2
    t0 = time.monotonic()
    ac.release("p")
    ac.release("p")  # back-to-back: one notify round for two free slots
    for t in threads:
        t.join(timeout=10)
    assert len(done) == 2
    slowest = max(done) - t0
    assert slowest < 1.0, (
        f"second waiter stalled {slowest:.2f}s after burst release "
        "(should be immediate, not queue-timeout-bound)")
    ac.release("p")
    ac.release("p")


def test_mem_based_admission_queues_and_rejects():
    """Memory gate (admission-controller.cc mem_resources): queries admit
    while aggregate admitted memory fits under max_mem_resources, queue
    when it would overflow, and a query bigger than the whole pool is
    rejected outright."""
    ac = AdmissionController()
    ac.configure_pool("m", max_mem_resources=1000, queue_timeout_ms=10000)
    ac.admit("m", label="a", mem=400)
    ac.admit("m", label="b", mem=500)  # 900/1000: fits
    st = ac.stats("m")["m"]
    assert st["running_mem"] == 900 and st["running_now"] == 2

    # 900 + 300 > 1000: queues until a release frees memory
    admitted = threading.Event()

    def waiter():
        ac.admit("m", label="c", mem=300)
        admitted.set()

    t = threading.Thread(target=waiter)
    t.start()
    time.sleep(0.15)
    assert not admitted.is_set()
    ac.release("m", mem=400)
    assert admitted.wait(timeout=10)
    t.join(timeout=10)
    assert ac.stats("m")["m"]["running_mem"] == 800

    # larger than the pool itself: immediate reject, not a queue wait
    t0 = time.monotonic()
    with pytest.raises(AdmissionRejected, match="exceeds pool max mem"):
        ac.admit("m", label="huge", mem=2000)
    assert time.monotonic() - t0 < 1
    # zero-mem queries bypass the memory gate but not the request cap
    ac.admit("m", label="z", mem=0)
    ac.release("m", mem=0)
    ac.release("m", mem=500)
    ac.release("m", mem=300)
    assert ac.stats("m")["m"]["running_mem"] == 0
