#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and compare row/schema/hash. Dev tool only —
NOT part of the Scala library. Usage:
    python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
"""
import json
import sys
from pathlib import Path

import duckdb


def canon(rows, cols):
    """Sort columns by name, then rows; stringify values for hashing."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in idx], out


def array_typed_cols(con, rp):
    """Driver fidelity: the driver's pandas comparator sorts raw values and
    crashes on array-typed cells (TypeError: unhashable type). Flag any
    list/struct/map column in a dumped result so the failure shows locally."""
    desc = con.sql(f"DESCRIBE SELECT * FROM '{rp}/*.parquet'").fetchall()
    return [c for c, typ, *_ in desc
            if "[]" in typ or typ.startswith(("STRUCT", "MAP"))]


def intdiv_probe(con):
    """DuckDB's integer `//` rounding direction is environment-dependent
    (1.0.0 truncates toward zero: -7//2 = -3; other builds floor-divide:
    -7//2 = -4). Oracle SQL is written division-direction-proof, but the
    environment fact must be visible so drift fails loudly, not as a
    mysterious hash mismatch."""
    val = con.sql("SELECT -7 // 2").fetchone()[0]
    return {"duckdb_version": duckdb.__version__,
            "intdiv_toward_zero": val == -3,
            "probe_minus7_div_2": val}


def main():
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    env = intdiv_probe(con)
    print(f"ENV duckdb={env['duckdb_version']} -7//2={env['probe_minus7_div_2']} "
          f"(toward_zero={env['intdiv_toward_zero']})")
    for table in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
        p = sf_dir / f"{table}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {table} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    # Every dumped output (oracled or rows-only) goes through the driver's
    # pandas comparator; array/struct-typed columns crash it there.
    for rp in sorted(p for p in out_dir.iterdir()
                     if p.is_dir() and p.name.startswith("q_")):
        bad = array_typed_cols(con, rp)
        if bad:
            print(f"FAIL {rp.name}: array-typed columns {bad} would crash "
                  f"the driver's comparator")
            n_fail += 1
    for name, sql in sorted(oracle.items()):
        rp = out_dir / name
        if not rp.exists():
            print(f"FAIL {name}: no Spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{rp}/*.parquet'")
            got_cols, got_rows = canon(got.fetchall(), got.columns)
            want = con.sql(sql)
            want_cols, want_rows = canon(want.fetchall(), want.columns)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            n_fail += 1
        elif got_rows != want_rows:
            diff = [(a, b) for a, b in zip(got_rows, want_rows) if a != b]
            print(f"FAIL {name}: {len(got_rows)} vs {len(want_rows)} rows; "
                  f"first diffs: {diff[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
