"""Driver-window rotation gate (r11, ADVICE r10 + VERDICT r10 ask #3).

The driver's correctness gate samples the FIRST 50 registry entries
each round; ``workload._WINDOW_PRIORITY`` decides which 50. Before
this gate, rotation was a comment's promise ("dropped names rotate
back next round") — nothing failed if a query silently stayed
unsampled for five rounds (by r10 the stalest tail was 26 queries
whose latest driver row was r6). Now it is a checked property: every
registered query must either sit in the upcoming window or have a
driver row within the last ``MAX_STALE_ROUNDS`` rounds.
"""

from __future__ import annotations

import glob
import itertools
import json
import os
import re

from project_graphdb_spark import workload

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Max rounds a registered query may go without a driver row, counting
#: the upcoming window as round max+1. 4 keeps the whole 178-query
#: registry cycling through the 50-slot window in ~4 rounds. NOTE for
#: future rounds: r10 sampled 50 queries at once, so at r14 all of
#: them age out together — top up earlier windows with the
#: oldest-sampled rows (even when not yet forced) to spread that bulge,
#: or this gate will (correctly) refuse a window that can't fit it.
MAX_STALE_ROUNDS = 4

#: Driver sample size — the first N registry entries get sampled.
WINDOW_SLOTS = 50


def _latest_rows() -> tuple[dict[str, int], int]:
    latest: dict[str, int] = {}
    rounds = []
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        rounds.append(r)
        with open(p) as f:
            for name in json.load(f):
                latest[name] = max(latest.get(name, 0), r)
    return latest, max(rounds)


def test_window_priority_names_are_registered():
    workload._ensure_loaded()
    unknown = [
        n for n in workload._WINDOW_PRIORITY if n not in workload.REGISTRY
    ]
    assert not unknown, unknown
    assert len(workload._WINDOW_PRIORITY) == WINDOW_SLOTS, len(
        workload._WINDOW_PRIORITY
    )
    assert len(set(workload._WINDOW_PRIORITY)) == WINDOW_SLOTS


def test_every_query_sampled_within_staleness_bound():
    """No registered query's latest driver row may predate the
    upcoming round by more than MAX_STALE_ROUNDS — and a query with NO
    driver row yet (registered this round) must be in the window."""
    latest, max_round = _latest_rows()
    next_round = max_round + 1
    window = set(
        itertools.islice(workload.queries().keys(), WINDOW_SLOTS)
    )
    stale = {}
    for name in workload.REGISTRY:
        if name in window:
            continue  # about to be sampled
        last = latest.get(name)
        if last is None or next_round - last > MAX_STALE_ROUNDS:
            stale[name] = last
    assert not stale, (
        f"queries not in the upcoming {WINDOW_SLOTS}-slot window and "
        f"stale past {MAX_STALE_ROUNDS} rounds (name: latest row): "
        f"{stale}"
    )


#: Slots per future round the simulation reserves for queries that do
#: not exist yet (new registrations / changed implementations). The
#: bulge is only "defused" if rotation stays feasible while every
#: future round still has room to sample genuinely new work.
SIM_HEADROOM_SLOTS = 5

#: How many future rounds the simulation rolls forward. 6 covers the
#: r14/r15 cohort bulge the r11 verdict flagged (49 r10-sampled + 50
#: r11-sampled rows aging out in single cohorts) with margin.
SIM_HORIZON_ROUNDS = 6


def test_future_rotation_feasible_through_bulge():
    """VERDICT r11 ask #2: simulate the rotation forward and prove the
    r14/r15 window bulge is absorbable.

    Starting from the real artifact history plus the planned upcoming
    window, roll forward SIM_HORIZON_ROUNDS rounds where each round's
    window is chosen greedily oldest-sampled-first but only
    ``WINDOW_SLOTS - SIM_HEADROOM_SLOTS`` slots are available (the
    rest reserved for future new/changed queries). Feasible means: at
    every simulated round, the FORCED set (queries that would breach
    MAX_STALE_ROUNDS if left out) fits in the available slots. Greedy
    oldest-first is the policy the staleness gate already forces, so
    this is a property of the artifact history + the planned window,
    not of hypothetical future builder choices."""
    latest, max_round = _latest_rows()
    latest = dict(latest)
    workload._ensure_loaded()
    upcoming = set(
        itertools.islice(workload.queries().keys(), WINDOW_SLOTS)
    )
    for name in workload.REGISTRY:
        if name in upcoming or name not in latest:
            latest[name] = max_round + 1  # sampled (or new) this round
    avail = WINDOW_SLOTS - SIM_HEADROOM_SLOTS
    for rnd in range(max_round + 2, max_round + 2 + SIM_HORIZON_ROUNDS):
        forced = sorted(
            n for n, last in latest.items() if rnd - last > MAX_STALE_ROUNDS
        )
        assert len(forced) <= avail, (
            f"round r{rnd}: {len(forced)} forced-stale queries exceed "
            f"the {avail} available window slots ({WINDOW_SLOTS} minus "
            f"{SIM_HEADROOM_SLOTS} headroom) — the cohort bulge is not "
            f"defused: {forced[:12]}…"
        )
        for n in sorted(latest, key=lambda n: (latest[n], n))[:avail]:
            latest[n] = rnd


def test_window_leads_with_the_priority_list():
    """The registry's insertion order (what the driver samples) must
    start with exactly _WINDOW_PRIORITY, in order."""
    head = list(
        itertools.islice(workload.queries().keys(), WINDOW_SLOTS)
    )
    assert head == list(workload._WINDOW_PRIORITY), head
