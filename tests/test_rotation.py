"""Driver-check rotation policy invariants (inventory._verification_order).

The verification driver checks the FIRST ~50 registered queries each
round; the rotation derives ordering from committed CORRECTNESS_r*.json
so the stalest proof refreshes automatically.  These tests pin the
invariants the window depends on."""

import json
import os

from kstream_spark.inventory import _TOUCHED_THIS_ROUND, INVENTORY

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _evidence():
    strong = {}
    import glob
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[13:-5])
        for name, row in json.load(open(path)).items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                strong[name] = max(strong.get(name, 0), rnd)
    return strong


def test_touched_queries_lead_the_window():
    names = list(INVENTORY)
    front = names[:len(_TOUCHED_THIS_ROUND)]
    assert [n for n in _TOUCHED_THIS_ROUND if n in INVENTORY] == front


def test_no_strong_row_implies_first_50():
    """Every query without a hash-green driver row in any committed round
    must sit inside the driver's ~50-query window (minus queries that can
    never earn one — none currently: all registered queries have oracles)."""
    strong = _evidence()
    names = list(INVENTORY)
    missing = [n for n in names if n not in strong]
    outside = [n for n in missing if names.index(n) >= 50]
    assert outside == [], f"never-proven queries past the window: {outside}"


def test_backfill_is_stalest_first():
    """Past the touched+unproven prefix, latest-green rounds must be
    non-decreasing — the least-recently-verified proof refreshes first."""
    strong = _evidence()
    names = list(INVENTORY)
    tail = [strong[n] for n in names
            if n in strong and n not in _TOUCHED_THIS_ROUND]
    assert tail == sorted(tail)
