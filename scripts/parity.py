#!/usr/bin/env python3
"""Local oracle-parity check mirroring the driver's t2 gate.

Usage: python3 scripts/parity.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB VERBATIM (Verify.scala substitutes {sfDir} when
writing the file, exactly like the driver sees it — this mirror must never
substitute anything itself, or it can pass while the driver fails), reads
the Spark parquet dump for the same key, sorts columns by name (the
driver's compare does this), and diffs row lists exactly.
"""
import duckdb, json, sys, glob

def norm(v):
    # exact compare; floats compared by repr (bit-level-ish)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(norm(r[i]) for i in order) for r in cur.fetchall()]
    return [cols[i] for i in order], data

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        if "{sfDir}" in sql:
            print(f"FAIL {name}: unsubstituted {{sfDir}} in oracle_sql.json")
            n_fail += 1
            continue
        try:
            want_cols, want = rows_of(con.execute(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got_cols, got = rows_of(
                con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_fail += 1
            continue
        if want_cols != got_cols:
            print(f"FAIL {name}: cols want={want_cols} got={got_cols}")
            n_fail += 1
            continue
        if want == got:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            shown = 0
            for i, (w, g) in enumerate(zip(want, got)):
                if w != g:
                    print(f"  row {i}: want={w}")
                    print(f"  row {i}:  got={g}")
                    shown += 1
                    if shown >= 3:
                        break
            if len(want) != len(got) and not shown:
                print(f"  first extra: want[{len(got)}]={want[len(got)] if len(want)>len(got) else ''}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
