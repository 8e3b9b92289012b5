"""Dump `explain("formatted")` for named inventory queries to files.

Usage:  python tools/explain_dump.py REPO_ROOT OUT_DIR SUFFIX query [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query.  REPO_ROOT is
prepended to sys.path so the same script can dump plans from a git
worktree of an older commit (the `_before` side of an optimization
round's plan evidence).  KSTREAM_SPARK_KEEP_LAZY=1 keeps queries with
internal materialization lazy so the distributed plan is visible.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main():
    repo_root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.environ["KSTREAM_SPARK_KEEP_LAZY"] = "1"
    sys.path.insert(0, repo_root)
    os.makedirs(out_dir, exist_ok=True)

    from kstream_spark import get_spark
    from kstream_spark.inventory import INVENTORY

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark()
    for name in names:
        if name not in INVENTORY:
            print(f"SKIP {name}: not in inventory", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"explain: {name}")
        df = INVENTORY[name][0](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') @ {sf}\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
