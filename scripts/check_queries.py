#!/usr/bin/env python
"""Oracle-check a subset of registered queries at one or more SFs.

Usage: python scripts/check_queries.py sf0.01,sf0.1 name [name ...]
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    sfs = sys.argv[1].split(",")
    names = sys.argv[2:] or None

    from rolaguard_data_collectors_spark.oracle import check_all
    from rolaguard_data_collectors_spark.session import get_spark

    spark = get_spark(app_name="check_queries")
    bad = 0
    for sf in sfs:
        for r in check_all(spark, f"/root/testdata/{sf}", names=names):
            ok = r.ok and r.exact_match
            bad += not ok
            print(sf, r.name, "ok:", r.ok, "exact:", r.exact_match,
                  "" if ok else (r.detail or "")[:300], flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
