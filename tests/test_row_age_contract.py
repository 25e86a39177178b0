"""The row-age contract as a RED TEST, not prose (VERDICT r10 ask #2).

Standing contract: every registered query's newest green CORRECTNESS
row must be at most 3 rounds old at the close of the current round —
or the query must sit inside the driver's 50-entry verification window
so THIS round refreshes it. The rotation comment in
cassandrastack_spark/queries/__init__.py has carried this commitment
since r8; until now nothing failed when a round tried to defer a
cohort past the limit (the way r8/r9 deferred the r6-era rows). This
test makes over-aging mechanical: if a future round's _FRONT leaves an
over-age cohort outside the window, pytest goes red before the round
ships.

"Current closing round" is inferred as (newest CORRECTNESS file's
round + 1): during round N the repo holds files through r(N-1), and
the window being tested is the one the round-N driver will execute.
"""

from __future__ import annotations

import os

from cassandrastack_spark.queries import load_all
from tools.row_age import newest_green_rounds

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAX_AGE_AT_CLOSE = 3
WINDOW = 50


def test_no_query_over_ages_outside_the_window():
    newest, rounds = newest_green_rounds(REPO)
    assert rounds, "no CORRECTNESS_r*.json files — driver artifacts missing"
    close_round = max(rounds) + 1
    registry = list(load_all())
    window = set(registry[:WINDOW])
    over_aged = sorted(
        n
        for n in registry
        if n in newest
        and close_round - newest[n] > MAX_AGE_AT_CLOSE
        and n not in window
    )
    assert not over_aged, (
        f"{len(over_aged)} queries' newest green row is over "
        f"{MAX_AGE_AT_CLOSE} rounds old at r{close_round} close and they "
        f"are NOT in the 50-entry verification window — rotate them into "
        f"_FRONT (queries/__init__.py): {over_aged}"
    )


def test_never_verified_queries_are_in_the_window():
    newest, rounds = newest_green_rounds(REPO)
    assert rounds
    registry = list(load_all())
    window = set(registry[:WINDOW])
    unscheduled = sorted(
        n for n in registry if n not in newest and n not in window
    )
    assert not unscheduled, (
        "registered queries with NO green CORRECTNESS row are outside "
        f"the verification window: {unscheduled}"
    )
