"""Shared canonicalize-and-compare for check.py / check_one.py.

The r17 ADVICE bug this fixes: the old canon() sorted each side by a
key that formatted floats at 6 significant digits while vals_eq later
tolerated 1e-9 relative differences — when all non-float columns tied,
two rows whose floats differed only past 6 digits (or across a %.6g
rounding boundary) could sort into DIFFERENT orders on the two sides,
producing a spurious row-value FAIL for results the tolerance accepts.

Fix: floats are excluded from the sort key entirely; rows that tie on
every non-float cell are then TOLERANCE-PAIRED (greedy multiset match
within the tie group) instead of compared positionally. Tie groups are
key-group-local, so the pairing is quadratic only in the group size; a
group larger than PAIR_CAP falls back to a coarse (3-sig-digit) float
secondary sort, which is still strictly safer than the old 6-digit key.

Known limitation (r18 ADVICE, fails SAFE): the greedy pairing inside a
tie group is order-dependent — floats chained within tolerance (a~b,
b~c, a!~c) can pair suboptimally and report a FAIL that an optimal
bipartite matching would accept, and the PAIR_CAP coarse fallback keeps
a rounding-boundary misorder risk. Both modes can only produce a false
FAIL, never a false PASS; a greedy FAIL on chained-tolerance data is
the signal to inspect the tie group by hand, not to trust the verdict.
"""
import math

PAIR_CAP = 2000


def row_key(row):
    out = []
    for v in row:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            out.append("")
        elif isinstance(v, float):
            out.append("")  # floats never order rows — see module doc
        else:
            out.append(str(v))
    return out


def _coarse_key(row):
    out = []
    for v in row:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            out.append("")
        elif isinstance(v, float):
            out.append(f"{v:.3g}")
        else:
            out.append(str(v))
    return out


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    return cols, sorted(df.values.tolist(), key=row_key)


def vals_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)


def rows_eq(r1, r2):
    return len(r1) == len(r2) and all(vals_eq(x, y) for x, y in zip(r1, r2))


def compare_rows(cols, srows, orows):
    """Compare two equally-sized canon()-sorted row lists.

    Returns None on match, else (row_index, col_name, got, want) for the
    first mismatch (col_name may be a pseudo-column for pairing errors).
    """
    i, n = 0, len(srows)
    while i < n:
        k = row_key(srows[i])
        j = i
        while j < n and row_key(srows[j]) == k:
            j += 1
        if any(row_key(r) != k for r in orows[i:j]):
            return (i, "<sort-key>", srows[i], orows[i])
        gs, go = srows[i:j], orows[i:j]
        if j - i > PAIR_CAP:
            gs = sorted(gs, key=_coarse_key)
            go = sorted(go, key=_coarse_key)
            for gi, (r1, r2) in enumerate(zip(gs, go)):
                if not rows_eq(r1, r2):
                    bad = next((c for c, (x, y) in zip(cols, zip(r1, r2))
                                if not vals_eq(x, y)), cols[0])
                    return (i + gi, bad, r1, r2)
        else:
            remaining = list(go)
            for gi, r1 in enumerate(gs):
                m = next((x for x, r2 in enumerate(remaining)
                          if rows_eq(r1, r2)), None)
                if m is None:
                    return (i + gi, "<unpaired>", r1,
                            remaining[0] if remaining else None)
                remaining.pop(m)
        i = j
    return None
