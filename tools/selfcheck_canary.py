#!/usr/bin/env python3
"""Canary for selfcheck.py's dtype-strict comparator.

Round-7 lesson: the driver hashes stringified values, so DuckDB's
HUGEINT SUM (-> pandas float64 '15.0') vs Spark's BIGINT ('15') fails
in the driver. selfcheck.values_equal used to accept
float(a)==float(b) and shipped three oracle bugs. This canary fails
loudly if that tolerance ever comes back.

Run: python3 tools/selfcheck_canary.py   (exits 1 on regression)
"""
import importlib.util
import os
import sys

import duckdb
import numpy as np

spec = importlib.util.spec_from_file_location(
    "sc", os.path.join(os.path.dirname(__file__), "selfcheck.py"))
sc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sc)

CASES = [
    # (a, b, expected)
    (np.int64(15), np.float64(15.0), False),  # the HUGEINT trap
    (15, 15.0, False),
    (np.int64(15), 15, True),
    (np.float64(1.5), 1.5, True),
    (float("nan"), np.float64("nan"), True),
    (None, None, True),
    (None, 0, False),
    ("a", "a", True),
    (True, 1.0, False),
    (True, 1, False),
    (True, np.bool_(True), True),
]

fails = 0
for a, b, want in CASES:
    got = sc.values_equal(a, b)
    if got != want:
        print(f"CANARY FAIL: values_equal({a!r}, {b!r}) = {got}, want {want}")
        fails += 1

# end-to-end: a deliberately-unwrapped DuckDB SUM must mismatch int
df = duckdb.connect().execute(
    "SELECT SUM(x) AS s FROM (VALUES (15),(0)) t(x)").fetchdf()
v = sc.canon(df).at[0, "s"]
if sc.values_equal(15, v):
    print(f"CANARY FAIL: unwrapped HUGEINT SUM ({v!r}) passed vs int 15")
    fails += 1

print(f"== selfcheck canary: {'FAIL' if fails else 'PASS'} ({len(CASES) + 1} checks) ==")
sys.exit(1 if fails else 0)
