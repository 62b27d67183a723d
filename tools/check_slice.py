#!/usr/bin/env python3
"""Restricted-slice oracle compare for the fold keys (d14/d15/st11/st12)
at corpus sizes where the FULL fold SQL exceeds DuckDB's capacity
(bench/SCALING_r17.md §5). The oracle computes verdicts only for a
deterministic md5 1/16 slice of the arrival side (the slice rule is in
the SQL itself); the Spark dump — which is the FULL verdict set — is
filtered to the same slice before the compare, so a hash-match here
checks real Spark-side values, not a sampled recomputation.

Usage: tools/check_slice.py <sfDir> <verifyOutDir> <queryName>
       [memory_limit] [threads]
"""
import sys, json, glob, os
import numpy, pandas  # noqa: F401 -- pre-import BEFORE duckdb fills
# the address space: .df()'s lazy numpy import can fail mprotect at
# result time after a near-limit query (seen at gen10, r18)
import duckdb
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from canoncmp import canon, compare_rows

sf, out, name = sys.argv[1], sys.argv[2], sys.argv[3]
mem = sys.argv[4] if len(sys.argv) > 4 else "60GB"
thr = int(sys.argv[5]) if len(sys.argv) > 5 else 8
spec = json.load(open(os.path.join(out, "sliced_oracle_sql.json")))[name]
con = duckdb.connect()
con.execute(f"PRAGMA memory_limit='{mem}'")
con.execute(f"PRAGMA threads={thr}")
tmpdir = os.path.join(out, "_duck_tmp")
os.makedirs(tmpdir, exist_ok=True)
con.execute(f"PRAGMA temp_directory='{tmpdir}'")
for f in glob.glob(os.path.join(sf, "*.parquet")):
    t = os.path.basename(f)[: -len(".parquet")]
    src = os.path.join(f, "*.parquet") if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

want = con.execute(spec["oracle"]).df()
got_files = glob.glob(os.path.join(out, name, "*.parquet"))
got = con.execute(
    f"SELECT * FROM read_parquet({got_files!r}) WHERE {spec['filter']}").df()
wc, wr = canon(want)
gc, gr = canon(got)
if [c.lower() for c in wc] != [c.lower() for c in gc]:
    print(f"FAIL {name}: schema {gc} vs oracle {wc}")
    sys.exit(1)
if len(wr) != len(gr):
    print(f"FAIL {name}: rows {len(gr)} vs oracle {len(wr)}")
    sys.exit(1)
bad = compare_rows(gc, gr, wr)
if bad:
    print(f"FAIL {name}: row {bad[0]} col {bad[1]} value {bad[2]!r} vs oracle {bad[3]!r}")
    sys.exit(1)
print(f"OK   {name} [slice] ({len(gr)} rows)")
