"""Pin the paired-interleave weak-scaling protocol's pure logic
(VERDICT r04 item 1): the schedule alternates solo/quad attempts inside
one run window and the headline is the MEDIAN of adjacent-pair
t(solo)/t(quad) ratios. Pairing is what makes the number drift-robust —
a host slow period hits both members of the pair it lands on, so the
ratio it contributes stays near the true value, and the median discards
an asymmetric hit. These tests exercise exactly the function bench.py's
orchestrator feeds with measured makespans, so a refactor that breaks
the pairing or the drop-incomplete-pairs policy fails here without a
20-minute bench run."""

import sys
import os

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench import WEAK_PAIRS, _paired_schedule, paired_weak_efficiency


def test_schedule_alternates_solo_quad():
    sched = _paired_schedule(3)
    assert [s["attempt"] for s in sched] == [0, 1, 2, 3, 4, 5]
    assert [s["kind"] for s in sched] == ["solo", "quad"] * 3
    assert all(s["workers"] == [0] for s in sched if s["kind"] == "solo")
    assert all(s["workers"] == [0, 1, 2, 3] for s in sched if s["kind"] == "quad")


def test_schedule_matches_default_pairs():
    sched = _paired_schedule(WEAK_PAIRS)
    assert len(sched) == 2 * WEAK_PAIRS
    # worker 0 participates in everything; workers 1-3 only in quads
    w0 = [s["attempt"] for s in sched if 0 in s["workers"]]
    w1 = [s["attempt"] for s in sched if 1 in s["workers"]]
    assert w0 == list(range(2 * WEAK_PAIRS))
    assert w1 == [2 * p + 1 for p in range(WEAK_PAIRS)]


def test_median_of_pair_ratios_odd():
    # pairs: 10/10=1.0, 10/12.5=0.8, 10/20=0.5 -> median 0.8
    walls = {0: 10.0, 1: 10.0, 2: 10.0, 3: 12.5, 4: 10.0, 5: 20.0}
    out = paired_weak_efficiency(walls, 3)
    assert out["pair_ratios"] == [1.0, 0.8, 0.5]
    assert out["weak_scaling_efficiency_4x"] == 0.8
    assert out["n_pairs"] == 3


def test_drift_cancels_within_a_pair():
    """A 2x host slow period spanning ONE whole pair leaves that pair's
    ratio unchanged — the exact failure mode of the old protocol, where
    a slow window hitting one LEVEL's run skewed the whole-run ratio."""
    base = {0: 10.0, 1: 10.0, 2: 10.0, 3: 10.0, 4: 10.0, 5: 10.0}
    out = paired_weak_efficiency(base, 3)
    assert out["weak_scaling_efficiency_4x"] == 1.0
    slow_pair = {**base, 2: 20.0, 3: 20.0}  # both members 2x slower
    out = paired_weak_efficiency(slow_pair, 3)
    assert out["weak_scaling_efficiency_4x"] == 1.0
    assert out["pair_ratios"] == [1.0, 1.0, 1.0]


def test_asymmetric_hit_discarded_by_median():
    """A slow period clipping only one MEMBER of one pair distorts that
    single ratio; the median over the other pairs holds."""
    walls = {0: 10.0, 1: 10.0, 2: 10.0, 3: 25.0, 4: 10.0, 5: 10.0}
    out = paired_weak_efficiency(walls, 3)
    assert out["pair_ratios"] == [1.0, 0.4, 1.0]
    assert out["weak_scaling_efficiency_4x"] == 1.0


def test_incomplete_pairs_dropped():
    """A blown per-attempt deadline voids only its pair (the
    orchestrator omits the makespan); the median is over survivors."""
    walls = {0: 10.0, 1: 12.5, 4: 10.0, 5: 10.0}  # pair 1 missing both
    out = paired_weak_efficiency(walls, 3)
    assert out["pair_ratios"] == [0.8, 1.0]
    assert out["n_pairs"] == 2
    walls = {0: 10.0, 1: 12.5, 2: 10.0, 4: 10.0, 5: 10.0}  # 3 lost quad
    out = paired_weak_efficiency(walls, 3)
    assert out["pair_ratios"] == [0.8, 1.0]


def test_fewer_than_two_pairs_is_an_error():
    with pytest.raises(RuntimeError):
        paired_weak_efficiency({0: 10.0, 1: 10.0}, 3)
    with pytest.raises(RuntimeError):
        paired_weak_efficiency({}, 3)


def test_even_pair_count_uses_statistics_median():
    # 4 pairs: ratios 0.7, 0.8, 0.9, 1.0 -> median (0.8+0.9)/2 = 0.85
    walls = {0: 7.0, 1: 10.0, 2: 8.0, 3: 10.0, 4: 9.0, 5: 10.0, 6: 10.0, 7: 10.0}
    out = paired_weak_efficiency(walls, 4)
    assert out["weak_scaling_efficiency_4x"] == 0.85


def test_attempt_walls_from_worker_reports():
    """Round-5 full-bench finding: attempt walls come from the worker
    reports (best-of-2 per worker, max over a fleet), gated on the
    attempt having completed its barrier; blown attempts vanish so
    their pair is voided."""
    from bench import _attempt_walls

    makespans = {0: 99.0, 1: 99.0}  # barrier times span 2 replays — unused for ratios
    reports = [
        {"shard": 0, "attempt": 0, "wall_s": 4.1, "jvm_cpu_s": 30.0},
        {"shard": 0, "attempt": 1, "wall_s": 5.0, "jvm_cpu_s": 35.0},
        {"shard": 1, "attempt": 1, "wall_s": 6.2, "jvm_cpu_s": 34.0},
        {"shard": 2, "attempt": 1, "wall_s": 5.8, "jvm_cpu_s": 33.0},
        # attempt 2 reported but its barrier blew the deadline
        {"shard": 0, "attempt": 2, "wall_s": 4.0, "jvm_cpu_s": 30.0},
    ]
    walls = _attempt_walls(makespans, reports)
    assert walls == {0: 4.1, 1: 6.2}  # solo = its wall; fleet = max; 2 dropped


def test_retry_once_semantics():
    """Paired sections retry exactly once on RuntimeError; success on
    the retry returns its value, a second failure propagates, and
    non-RuntimeError exceptions are never swallowed."""
    from bench import _retry_once

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("worker died")
        return "ok"

    assert _retry_once(flaky, "x") == "ok" and calls["n"] == 2

    def always():
        raise RuntimeError("infra broken")

    with pytest.raises(RuntimeError, match="infra broken"):
        _retry_once(always, "x")

    def typeerr():
        raise TypeError("bug, not weather")

    with pytest.raises(TypeError):
        _retry_once(typeerr, "x")
