"""Work-stealing scan scheduler: exactly-once claims, balanced completion
under a skewed workload (VERDICT r1 next-step #10; SURVEY §7 names per-scene
variable work as the inference scaling risk)."""
import threading
import time

from mvsformerplusplus_tpu.parallel.scheduler import WorkQueue


def test_claims_are_disjoint_and_complete(tmp_path):
    tasks = [f"scan{i}" for i in range(40)]
    results = {}

    def worker(wid):
        q = WorkQueue(tmp_path, tasks, worker=f"w{wid}")
        got = []
        for t in q:
            got.append(t)
            q.mark_done(t)
        results[wid] = got

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    all_claimed = [t for got in results.values() for t in got]
    assert sorted(all_claimed) == sorted(tasks)  # each task exactly once
    assert len(set(all_claimed)) == len(tasks)


def test_balanced_completion_under_skew(tmp_path):
    """One pathological task (10x the work) must not idle the other workers:
    dynamic claims keep every worker busy, unlike static striding where the
    unlucky worker's slice dominates the makespan."""
    # task 0 costs 50 units, the other 15 cost 1 -> total 65 over 4 workers.
    # static striding by rank gives worker 0: 50+1+1+1+1 = 54; queue bounds
    # the makespan near max(50, ceil(15/3)+...) = 50.
    costs = {"t0": 0.50} | {f"t{i}": 0.01 for i in range(1, 16)}
    tasks = list(costs)
    spans = {}

    def worker(wid):
        q = WorkQueue(tmp_path, tasks, worker=f"w{wid}")
        t_start = time.monotonic()
        for t in q:
            time.sleep(costs[t])
            q.mark_done(t)
        spans[wid] = time.monotonic() - t_start

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    makespan = time.monotonic() - t0

    q = WorkQueue(tmp_path, tasks)
    assert q.pending() == []
    # static rank-striding would put t0 + 3 small tasks on worker 0
    # (~0.53s while others idle after ~0.04s); the queue's makespan is
    # bounded by the big task alone plus scheduling noise
    assert makespan < 0.58, f"makespan {makespan:.3f}s — workers idled"


def test_restart_skips_done_and_reclaims_stale(tmp_path):
    tasks = ["a", "b", "c"]
    q1 = WorkQueue(tmp_path, tasks, worker="w1")
    it = iter(q1)
    first = next(it)        # claimed, never finished (simulated crash)
    second = next(it)
    q1.mark_done(second)

    # a fresh worker skips the done task and cannot take the live claim...
    q2 = WorkQueue(tmp_path, tasks, worker="w2")
    got = []
    for t in q2:
        got.append(t)
        q2.mark_done(t)
    assert second not in got and first not in got
    assert got == [t for t in tasks if t not in (first, second)]

    # ...but with stale-reclaim enabled the crashed worker's claim is stolen
    time.sleep(0.05)
    q3 = WorkQueue(tmp_path, tasks, worker="w3", reclaim_stale_s=0.01,
                   poll_s=0.01)
    got3 = []
    for t in q3:
        got3.append(t)
        q3.mark_done(t)
    assert got3 == [first]


def test_concurrent_stale_reclaim_exactly_once(tmp_path):
    """Two workers racing to steal the same stale claim: the rename-tombstone
    protocol must hand it to exactly one (ownership is always decided by the
    O_EXCL create, never by an unguarded overwrite)."""
    tasks = ["a"]
    q0 = WorkQueue(tmp_path, tasks, worker="dead")
    assert next(iter(q0)) == "a"  # claimed, then the worker "crashes"
    # the dead claim must age past reclaim_stale_s; the threshold itself
    # must be >> scheduler jitter so the WINNER's fresh claim cannot go
    # stale before it marks done on a loaded machine (a 0.01 s threshold
    # flaked under full-suite CPU contention — double steal)
    time.sleep(0.7)

    winners = []
    barrier = threading.Barrier(8)

    def stealer(wid):
        q = WorkQueue(tmp_path, tasks, worker=f"s{wid}",
                      reclaim_stale_s=0.6, poll_s=0.01)
        barrier.wait()
        for t in q:
            winners.append(t)
            q.mark_done(t)

    threads = [threading.Thread(target=stealer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert winners == ["a"], winners  # exactly one steal across 8 racers


def test_heartbeat_prevents_steal(tmp_path):
    """A long-running but HEALTHY task that heartbeats must not be stolen
    even when its total runtime exceeds reclaim_stale_s."""
    tasks = ["a"]
    q1 = WorkQueue(tmp_path, tasks, worker="owner")
    assert next(iter(q1)) == "a"

    stolen = []

    def thief():
        # reclaim mode polls until the task completes or its claim goes
        # stale; a heartbeated claim must never be stolen
        q = WorkQueue(tmp_path, tasks, worker="thief", reclaim_stale_s=0.08,
                      poll_s=0.01)
        stolen.extend(list(q))

    th = threading.Thread(target=thief)
    th.start()
    # owner works for 0.4s (5x the stale threshold), heartbeating
    for _ in range(20):
        time.sleep(0.02)
        q1.heartbeat("a")
    q1.mark_done("a")
    th.join()
    assert stolen == [], stolen


def test_late_stale_claim_is_reclaimed(tmp_path):
    """A claim that goes stale AFTER another worker already passed it must
    still be picked up: reclaim mode polls until every task is done (a
    single pass would silently drop the crashed worker's scan)."""
    tasks = ["a", "b", "c"]
    q_dead = WorkQueue(tmp_path, tasks, worker="dead")
    assert next(iter(q_dead)) == "a"  # claimed fresh, then the worker dies

    got = []
    q = WorkQueue(tmp_path, tasks, worker="w2", reclaim_stale_s=0.3,
                  poll_s=0.02)
    for t in q:  # first pass: 'a' is fresh -> b, c; poll -> steal 'a'
        got.append(t)
        time.sleep(0.12)
        q.mark_done(t)
    assert got == ["b", "c", "a"]
