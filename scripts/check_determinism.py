"""Partitioning-determinism gate for the driver-certified window.

The driver certifies queries on ITS OWN Spark session (core count and
shuffle-partition count unknown to us). A query whose output depends on
partition order — float aggregation order flipping a last ulp under
full-precision repr() hashing, ties in a top-k broken by arrival order,
LIMIT without a total order — can be green in the local mirror and red
on the driver. This script runs every window query under two deliberately
different configurations (local[4]/sp=4 vs local[32]/sp=64) and compares
canonical (order-insensitive, full-precision) outputs between the two
Spark runs. Any diff is a determinism bug regardless of what the oracle
says.

Usage: python scripts/check_determinism.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecokg_spark.contract import QUERIES, _CERT_WINDOW
from ecokg_spark.session import get_spark


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def run_all(master, shuffle_partitions, sf, names):
    spark = get_spark(master=master, shuffle_partitions=shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        try:
            sdf = QUERIES[name](spark, sf)
            out[name] = (tuple(sorted(sdf.columns)),
                         rows_to_set(sdf.columns, [tuple(r) for r in sdf.collect()]))
        except Exception as e:  # noqa: BLE001
            out[name] = ("ERROR", str(e))
    spark.stop()
    return out


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(_CERT_WINDOW)
    a = run_all("local[4]", 4, sf, names)
    b = run_all("local[32]", 64, sf, names)
    failures = []
    for name in names:
        if a[name] != b[name]:
            detail = ""
            if a[name][0] == b[name][0] and a[name][0] != "ERROR":
                ra, rb = set(a[name][1]), set(b[name][1])
                only_a = list(ra - rb)[:2]
                only_b = list(rb - ra)[:2]
                detail = f" only@4={only_a} only@32={only_b}"
            failures.append((name, detail))
            print(f"NONDETERMINISTIC {name}{detail}")
        else:
            print(f"ok {name} ({len(a[name][1]) if a[name][0] != 'ERROR' else a[name][1]} rows)")
    print(f"\n{len(failures)} nondeterministic / {len(names)}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
