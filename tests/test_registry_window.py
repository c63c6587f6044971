"""Automated slip-catcher for the registry window math (r12, the r11
verdict's task 7).

The driver scores only the first 50 registry entries per round, under
REGISTRY.md's staleness policy: a row's green CORRECTNESS entry
certifies HEAD for at most 2 rounds (tier A), or 3 rounds when the
row is explicitly deferred with its file frozen (tier B, named in
``operators._DEFERRED_DUE``). The window lists in
``operators/__init__.py`` were hand-maintained through r11 — correct
every round, but nothing but care prevented a row from silently
sliding past its ceiling. These tests parse the committed
CORRECTNESS_r*.json history and assert the policy mechanically, so a
future window that forgets a due row fails pytest instead of shipping.
"""

from __future__ import annotations

import json
import re
import subprocess
from pathlib import Path

import pytest

from indexr_spark import operators

_REPO = Path(__file__).resolve().parent.parent

# Rows the driver checks rows-only by documented contract (no oracle
# SQL); their CORRECTNESS entries carry hash_match null/absent.
_GREEN_OK_HASH = (True, None)


def _history() -> dict[int, dict]:
    out = {}
    for p in _REPO.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m:
            out[int(m.group(1))] = json.loads(p.read_text())
    return out


def _last_green() -> dict[str, int]:
    last: dict[str, int] = {}
    for rnd, doc in sorted(_history().items()):
        rows = doc.get("queries", doc)
        for name, r in rows.items():
            green = (
                r.get("err") is None
                and r.get("rows_match") is True
                and r.get("schema_match") is True
                and r.get("hash_match") in _GREEN_OK_HASH
            )
            # rows-only rows (d34: no SQL oracle by documented
            # contract, REGISTRY.md) record err='no_oracle' with the
            # match fields null — their green is "ran and produced
            # rows"; the real correctness pin lives in pytest
            # (tests/test_bpe.py's merge-for-merge reference).
            rows_only_green = (
                r.get("err") == "no_oracle"
                and (r.get("spark_rows") or 0) > 0
            )
            if green or rows_only_green:
                last[name] = rnd
    return last


def _committed_rounds() -> set[int]:
    """Round numbers of the CORRECTNESS files git actually tracks.

    The round-lifecycle distinction that broke r12 (the r12 verdict's
    task 1): the driver drops CORRECTNESS_r{_ROUND}.json UNTRACKED at
    the end of the round the window was built for, and commits it at
    the top of the NEXT round — so an assertion pinned to the on-disk
    max goes red at exactly the moment the judge runs pytest."""
    out = subprocess.run(
        ["git", "ls-files", "CORRECTNESS_r*.json"],
        cwd=_REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    rounds = set()
    for line in out.splitlines():
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", line.strip())
        if m:
            rounds.add(int(m.group(1)))
    return rounds


def _round_lifecycle_problems(
    round_: int, committed: set[int], on_disk: set[int]
) -> list[str]:
    """The window-vs-history invariants, pure so the lifecycle states
    can be tested directly (including the untracked in-flight file the
    r12 slip-catcher mistook for a slip). Legitimate states for
    _ROUND = N:

    - mid-round:   committed max = N-1, no r{N} file yet
    - judge time:  committed max = N-1, r{N} on disk UNTRACKED
    - next-round:  committed max = N (driver committed r{N}; the
                   builder's first window commit then bumps _ROUND)

    A real slip — the window never bumped while rounds kept scoring —
    shows up as committed max > N, or any on-disk round > N."""
    problems = []
    if not on_disk:
        problems.append("no CORRECTNESS_r*.json found")
        return problems
    if committed and max(committed) not in (round_ - 1, round_):
        problems.append(
            f"_ROUND={round_} but newest COMMITTED round is "
            f"r{max(committed)} — bump _ROUND when building the new window"
        )
    if max(on_disk) > round_:
        problems.append(
            f"_ROUND={round_} but CORRECTNESS_r{max(on_disk)}.json exists "
            f"on disk — the window is at least one round behind"
        )
    return problems


def test_correctness_history_present_and_round_current():
    problems = _round_lifecycle_problems(
        operators._ROUND, _committed_rounds(), set(_history())
    )
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize(
    "round_, committed, on_disk, ok",
    [
        # mid-round: window built, this round not scored yet
        (13, {11, 12}, {11, 12}, True),
        # judge time: driver dropped r13 untracked (the r12 red)
        (13, {11, 12}, {11, 12, 13}, True),
        # next-round boundary: driver committed r13, window not yet bumped
        (13, {11, 12, 13}, {11, 12, 13}, True),
        # slip: r14 scored (committed) but the window still says 13
        (13, {12, 13, 14}, {12, 13, 14}, False),
        # slip: r14 landed on disk untracked while the window says 13
        (13, {11, 12}, {12, 13, 14}, False),
        # slip: window bumped two rounds ahead of history
        (15, {12, 13}, {12, 13}, False),
    ],
)
def test_round_lifecycle_states(round_, committed, on_disk, ok):
    problems = _round_lifecycle_problems(round_, committed, on_disk)
    assert bool(problems) != ok, problems


def test_every_registry_row_within_its_staleness_ceiling():
    last = _last_green()
    window = set(operators._PRIORITY)
    problems = []
    for name in operators.QUERIES:
        if name not in last:
            # never green in any committed round: only acceptable for
            # a this-round registration, which must be in the window
            if name not in window:
                problems.append(f"{name}: never scored green and not in window")
            continue
        staleness = operators._ROUND - last[name]
        if name in window:
            # being scored this round — must not already have slipped
            # past even the deferred ceiling
            if staleness > 3:
                problems.append(
                    f"{name}: staleness {staleness} > 3 even though windowed"
                )
        elif name in operators._DEFERRED_DUE:
            due = operators._DEFERRED_DUE[name]
            if due > last[name] + 3:
                problems.append(
                    f"{name}: deferred due r{due} exceeds its 3-round "
                    f"ceiling (last green r{last[name]})"
                )
            if due <= operators._ROUND:
                problems.append(
                    f"{name}: due r{due} has arrived but the row is "
                    f"not in this round's window"
                )
        elif staleness >= 2:
            problems.append(
                f"{name}: staleness {staleness} outside the window and "
                f"not in _DEFERRED_DUE — it misses its 2-round ceiling"
            )
    assert not problems, "\n".join(problems)


def test_deferred_ledger_consistent_with_window():
    window = set(operators._PRIORITY)
    for name, due in operators._DEFERRED_DUE.items():
        assert name in operators.QUERIES, f"unknown deferred row {name}"
        assert name not in window, (
            f"{name} is both deferred (due r{due}) and in this round's "
            f"window — remove it from one ledger"
        )
        assert due > operators._ROUND - 1, (
            f"{name}: due round r{due} already past"
        )
