"""Round-14 A/B harness: time variants of one operator in ONE warm
session, interleaving a control query so machine drift is attributable
(the bench's instrument, applied to micro-A/Bs).

Usage: python tools/ab_r14.py <case> [sf_dir]

Each case warms both variants once untimed, then alternates timed runs
A,B,A,B,... (min-of-N each) with the control query before/after.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kstream_spark import get_spark  # noqa: E402


def t(fn, iters=5):
    best = None
    for _ in range(iters):
        t0 = time.time()
        df = fn()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main():
    case = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name=f"ab_r14_{case}")
    from kstream_spark.inventory import INVENTORY
    ctrl = INVENTORY["dedup_exact"][0]

    variants: dict[str, object] = {}
    if case == "sq8":
        from kstream_spark.operators import similarity as S
        from kstream_spark.builder import StreamBuilder
        from kstream_spark.inventory_pipeline import _embs

        def mk(local):
            def run():
                emb = _embs(StreamBuilder(spark), sf_dir)
                return S.sq8_topk(emb, "vec_id", "embedding",
                                  query_ids=list(range(5)), k=10,
                                  local=local)
            return run
        variants = {"local(r13)": mk(True), "distributed(r12)": mk(False)}
    elif case == "ivfsq":
        from kstream_spark.operators import similarity as S
        from kstream_spark.builder import StreamBuilder
        from kstream_spark.inventory_pipeline import _embs

        def mk(local):
            def run():
                emb = _embs(StreamBuilder(spark), sf_dir)
                return S.ivfsq_topk(emb, "vec_id", "embedding",
                                    query_ids=list(range(5)), k=10,
                                    local=local)
            return run
        variants = {"local(r13)": mk(True), "distributed(r12)": mk(False)}
    elif case == "lpa":
        variants = {"lpa": lambda: INVENTORY["graph_lpa"][0](spark, sf_dir)}
    elif case in INVENTORY:
        variants = {case: lambda: INVENTORY[case][0](spark, sf_dir)}
    else:
        raise SystemExit(f"unknown case {case}")

    # warm-up: control + each variant once
    ctrl(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for fn in variants.values():
        fn().write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    rounds = int(os.environ.get("AB_ROUNDS", "2"))
    print("control:", t(lambda: ctrl(spark, sf_dir), 3))
    for rnd in range(rounds):
        for name, fn in variants.items():
            sec = t(fn, 3)
            spark.catalog.clearCache()
            print(f"round{rnd} {name}: {sec}")
    print("control:", t(lambda: ctrl(spark, sf_dir), 3))


if __name__ == "__main__":
    main()
