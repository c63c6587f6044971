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
from pathlib import Path

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
            if green:
                last[name] = rnd
    return last


def test_correctness_history_present_and_round_current():
    hist = _history()
    assert hist, "no CORRECTNESS_r*.json committed"
    # _ROUND must be exactly one past the newest scored round —
    # updating the window without bumping _ROUND (or vice versa)
    # breaks every staleness computation below.
    assert operators._ROUND == max(hist) + 1, (
        f"_ROUND={operators._ROUND} but newest CORRECTNESS round is "
        f"r{max(hist)} — bump _ROUND when building the new window"
    )


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
