#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views
over <sfDir>/*.parquet, loads the Spark result parquet from
<verifyOutDir>/<name>/, sorts columns by name and rows by all columns,
and compares values (floats to 1e-9 rel tolerance, then hash-style exact
string compare report)."""
import sys, json, glob, os, math
import numpy, pandas  # noqa: F401 -- pre-import BEFORE duckdb fills
# the address space: .df()'s lazy numpy import can fail mprotect at
# result time after a near-limit query (seen at gen10, r18)
import duckdb
import pyarrow.parquet as pq
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from canoncmp import canon, vals_eq, compare_rows

sf, out = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
con = duckdb.connect()
for f in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(f)[:-len(".parquet")]
    # driver testdata ships single files; GenData dirs are directory-shaped
    src = os.path.join(f, "*.parquet") if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

# canon / vals_eq / compare_rows live in canoncmp.py (shared with
# check_one.py): floats are excluded from the sort key and non-float
# tie groups are tolerance-paired, so sub-tolerance float jitter can
# never reorder the two sides into a spurious FAIL (r17 ADVICE).

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    spark_dir = os.path.join(out, name)
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error {e}"); fails += 1; continue
    files = glob.glob(os.path.join(spark_dir, "*.parquet"))
    sdf = pq.ParquetDataset(files).read().to_pandas()
    oc, orows = canon(odf)
    sc, srows = canon(sdf)
    if oc != [c.lower() for c in sc] and oc != sc:
        print(f"FAIL {name}: schema mismatch spark={sc} oracle={oc}"); fails += 1; continue
    if len(orows) != len(srows):
        print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}"); fails += 1; continue
    bad = compare_rows(sc, srows, orows)
    if bad:
        print(f"FAIL {name}: row {bad[0]} col {bad[1]} spark={bad[2]!r} oracle={bad[3]!r}"); fails += 1
    else:
        print(f"OK   {name} ({len(srows)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
