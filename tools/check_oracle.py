#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare — dtype-strict.

Reads <outdir>/<name>/ parquet dirs (written by graft.Verify) and
<outdir>/oracle_sql.json, runs each oracle against DuckDB views over the
same sf dir, sorts columns by name, and compares values WITH their types:
an int64 1 and a float64 1.0 do NOT match (the driver hashes formatted
values, so int128/HUGEINT vs int64 or int vs float is a driver FAIL even
when numerically equal — see VERDICT r8, t23/dag_show_total_tvl).

Two hard gates beyond the value compare:
  1. TYPE AUDIT: `DESCRIBE` every oracle SQL; any output column typed
     HUGEINT/UHUGEINT/DECIMAL fails the run (DuckDB's SUM(BIGINT) returns
     HUGEINT — oracles must CAST back to BIGINT).
  2. TYPE-CLASS SCHEMA: the DuckDB-declared type of each Spark output
     column and oracle column must fall in the same coarse class
     (int/float/str/bool/date/ts/list/...).

Exit 1 on any mismatch. Usage: check_oracle.py [sfdir] [outdir]
"""
import sys, os, json, math, re
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

BANNED_TYPES = re.compile(r"HUGEINT|UHUGEINT|DECIMAL", re.I)

def type_class(duck_type):
    t = duck_type.upper()
    if t.startswith(("STRUCT", "MAP")): return "struct"
    if t.endswith("[]") or t.startswith("LIST"): return "list"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL") or t.startswith("DECIMAL"):
        return "float"
    if t == "BOOLEAN": return "bool"
    if t == "DATE": return "date"
    if t.startswith(("TIMESTAMP", "TIME")): return "ts"
    if t in ("BLOB", "BYTEA"): return "bytes"
    return "str"

def norm(v):
    """Typed normalization: value compares carry a type tag so cross-type
    numeric equality (1 == 1.0) can never report a match."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", round(v, 9) + 0.0)  # collapse -0.0 and ULP noise
    if isinstance(v, (list, tuple)):
        return ("l", tuple(norm(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, norm(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    return ("s", str(v))

def fetch(con, sql):
    """Rows as python objects (duckdb fetchall keeps int vs float exact,
    unlike pandas which floats nullable ints) + declared column types."""
    rel = con.execute(f"DESCRIBE {sql}")
    types = {r[0]: r[1] for r in rel.fetchall()}
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    scols = [cols[i] for i in order]
    srows = [tuple(norm(r[i]) for i in order) for r in rows]
    return scols, [types[c] for c in scols], srows

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written tier (e.g. ScaleGen output)
            src = f"'{p}/*.parquet'"
        elif os.path.exists(p):
            src = f"'{p}'"
        else:
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        if t == "events":
            # ScaleGen tiers carry ts as raw INT64 micros; normalize the
            # view to the TIMESTAMP the driver testdata presents
            (ts_type,) = [r[1] for r in con.execute("DESCRIBE events").fetchall()
                          if r[0] == "ts"]
            if ts_type == "BIGINT":
                con.execute(
                    "CREATE OR REPLACE VIEW events AS SELECT event_id, "
                    "make_timestamp(ts // 1000) AS ts, user_id, event_type, "
                    f"value, props FROM {src}")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0

    # ---- gate 1: oracle output-type audit over ALL oracles ----
    banned = []
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            banned.append((name, "*", f"DESCRIBE failed: {e}"))
            continue
        for col, typ, *_ in desc:
            if BANNED_TYPES.search(typ):
                banned.append((name, col, typ))
    if banned:
        print("TYPE AUDIT FAIL — oracle columns with driver-hostile types:")
        for name, col, typ in banned:
            print(f"  {name}.{col}: {typ}")
        failures += len(banned)
    else:
        print(f"type audit OK ({len(oracle)} oracles, no HUGEINT/DECIMAL output)")

    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for name in names:
        gc, gt, gr = fetch(con, f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        if name not in oracle:
            print(f"  {name:28s} rows-only: {len(gr)} rows "
                  f"{'OK' if len(gr) > 0 else 'EMPTY!'}")
            if len(gr) == 0:
                failures += 1
            continue
        ec, et, er = fetch(con, oracle[name])
        if gc != ec:
            print(f"  {name:28s} SCHEMA MISMATCH spark={gc} duck={ec}")
            failures += 1
            continue
        tmis = [(c, a, b) for c, a, b in zip(gc, gt, et)
                if type_class(a) != type_class(b)]
        if tmis:
            print(f"  {name:28s} TYPE MISMATCH " +
                  ", ".join(f"{c}: spark={a} duck={b}" for c, a, b in tmis))
            failures += 1
            continue
        if gr == er:
            print(f"  {name:28s} OK ({len(gr)} rows)")
            continue
        failures += 1
        if len(gr) != len(er):
            print(f"  {name:28s} ROWCOUNT spark={len(gr)} duck={len(er)}")
        else:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(gr, er)) if a != b]
            print(f"  {name:28s} VALUES differ in {len(diffs)}/{len(gr)} rows; first:")
            for i, a, b in diffs[:3]:
                print(f"      row {i} cols={gc}\n       spark={a}\n       duck ={b}")
    print(f"{'PASS' if failures == 0 else 'FAIL'} ({len(names)} queries, {failures} failures)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
