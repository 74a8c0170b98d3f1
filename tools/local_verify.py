#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate (dev tool only; the
engine itself is pure Scala/Spark).

Usage: python3 tools/local_verify.py SFDIR OUTDIR [query ...]

Reads OUTDIR/<name>/ parquet written by graft.Verify, runs
OUTDIR/oracle_sql.json in DuckDB over SFDIR tables, and compares:
columns sorted by name, exact value equality, row order respected.
"""
import duckdb, json, math, sys, glob

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — mimics hash-exactness
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return str(v)


def canon_type(t):
    """Canonical column type, modeling the driver's hash sensitivity:
    integer widths up to 64-bit coerce together (pandas int64 — the driver
    passed q_window_rank with Spark INTEGER vs DuckDB BIGINT in round 1),
    but HUGEINT (int128) does NOT fit int64 and hashes differently (the
    round-1 6-query failure). Timestamp unit variants are collapsed: the
    driver treats micros/nanos timestamps with equal instants as equal."""
    s = str(t).upper()
    if s.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "INT64"
    return s


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = con.sql(sql)
            wcols = sorted(want.columns)
            wtypes = [canon_type(want.types[want.columns.index(c)]) for c in wcols]
            wrows = [tuple(canon(r[want.columns.index(c)]) for c in wcols)
                     for r in want.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})")
        gcols = sorted(got.columns)
        gtypes = [canon_type(got.types[got.columns.index(c)]) for c in gcols]
        grows = [tuple(canon(r[got.columns.index(c)]) for c in gcols)
                 for r in got.fetchall()]
        if gcols != wcols:
            print(f"FAIL {name}: columns spark={gcols} oracle={wcols}")
            n_fail += 1
        elif gtypes != wtypes:
            bad = [(c, g, w) for c, g, w in zip(gcols, gtypes, wtypes) if g != w]
            print(f"FAIL {name}: types differ (spark vs oracle): {bad}")
            n_fail += 1
        elif len(grows) != len(wrows):
            print(f"FAIL {name}: rows spark={len(grows)} oracle={len(wrows)}")
            n_fail += 1
        elif grows != wrows:
            diffs = [(i, g, w) for i, (g, w) in enumerate(zip(grows, wrows)) if g != w]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: "
                  f"row {diffs[0][0]} spark={diffs[0][1]} oracle={diffs[0][2]} "
                  f"(cols {gcols})")
            n_fail += 1
        else:
            n_pass += 1
            print(f"PASS {name} ({len(grows)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
