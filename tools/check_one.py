#!/usr/bin/env python3
"""check.py for ONE query in a fresh process with explicit DuckDB
resource pragmas — the big-corpus (gen10) oracle replays exhaust the
default config when run back-to-back in one process (temp spill
accumulates across queries and hash joins multiply per-thread memory).

Usage: tools/check_one.py <sfDir> <verifyOutDir> <queryName>
       [memory_limit] [threads]
"""
import sys, json, glob, os, math
import numpy, pandas  # noqa: F401 -- pre-import BEFORE duckdb fills
# the address space: .df()'s lazy numpy import can fail mprotect at
# result time after a near-limit query (seen at gen10, r18)
import duckdb
import pyarrow.parquet as pq
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from canoncmp import canon, vals_eq, compare_rows

sf, out, name = sys.argv[1], sys.argv[2], sys.argv[3]
mem = sys.argv[4] if len(sys.argv) > 4 else "60GB"
thr = int(sys.argv[5]) if len(sys.argv) > 5 else 8
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
con = duckdb.connect()
con.execute(f"PRAGMA memory_limit='{mem}'")
con.execute(f"PRAGMA threads={thr}")
tmpdir = os.path.join(out, "_duck_tmp")
os.makedirs(tmpdir, exist_ok=True)
con.execute(f"PRAGMA temp_directory='{tmpdir}'")
for f in glob.glob(os.path.join(sf, "*.parquet")):
    t = os.path.basename(f)[:-len(".parquet")]
    src = os.path.join(f, "*.parquet") if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")


# canon / vals_eq / compare_rows live in canoncmp.py (shared with
# check.py): floats are excluded from the sort key and non-float tie
# groups are tolerance-paired (r17 ADVICE fix).

want = con.execute(oracle[name]).df()
got_files = glob.glob(os.path.join(out, name, "*.parquet"))
got = con.execute(
    f"SELECT * FROM read_parquet({got_files!r})").df()
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
print(f"OK   {name} ({len(gr)} rows)")
