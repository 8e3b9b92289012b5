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


def test_no_duplicate_keys_across_inventory_files():
    """A name registered in two inventory files silently shadows one
    implementation (dict.update order decides which) — keys must be
    globally unique so every registered query is the one that runs."""
    from kstream_spark.inventory_behavior import BEHAVIOR_INVENTORY
    from kstream_spark.inventory_corpus import CORPUS_INVENTORY
    from kstream_spark.inventory_extra import EXTRA_INVENTORY
    from kstream_spark.inventory_olap import OLAP_INVENTORY
    from kstream_spark.inventory_pipeline import PIPELINE_INVENTORY
    from kstream_spark.inventory_quality import QUALITY_INVENTORY
    from kstream_spark.inventory_sql import SQL_INVENTORY
    from kstream_spark.inventory_tpch import TPCH_INVENTORY
    from kstream_spark.inventory_tpch_full import TPCH_FULL_INVENTORY
    invs = dict(pipeline=PIPELINE_INVENTORY, extra=EXTRA_INVENTORY,
                olap=OLAP_INVENTORY, sql=SQL_INVENTORY, tpch=TPCH_INVENTORY,
                tpch_full=TPCH_FULL_INVENTORY, corpus=CORPUS_INVENTORY,
                behavior=BEHAVIOR_INVENTORY, quality=QUALITY_INVENTORY)
    seen = {}
    dupes = []
    for src, inv in invs.items():
        for k in inv:
            if k in seen:
                dupes.append((k, seen[k], src))
            seen[k] = src
    assert not dupes, f"duplicate inventory keys: {dupes}"
