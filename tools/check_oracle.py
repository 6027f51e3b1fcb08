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
    unlike pandas which floats nullable ints) + declared column types.
    Types are carried POSITIONALLY through the same sort order as the
    columns (DESCRIBE rows come back in output-column order), so a
    duplicate output name can never collapse two types into one — and a
    duplicate name is itself a hard failure: the driver's sorted-column
    hash would pair values with the wrong column."""
    types = [r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()]
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    if len(set(cols)) != len(cols):
        dupes = sorted({c for c in cols if cols.count(c) > 1})
        raise RuntimeError(f"duplicate output column name(s) {dupes} — "
                           "the sorted-column compare cannot pair types/values")
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    scols = [cols[i] for i in order]
    srows = [tuple(norm(r[i]) for i in order) for r in rows]
    return scols, [types[i] for i in order], srows

TYPES_SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "oracle_types.json")

def audit_type_snapshot(oracle_types, update):
    """Regression guard: every oracle's declared output TYPE CLASSES are
    pinned in a committed snapshot (tools/oracle_types.json). Any class
    drift (e.g. the HUGEINT class sneaking back via an edited CAST, or an
    int column turning float) fails the run until the snapshot is
    deliberately regenerated with --update-types — so a type regression
    is always a reviewed diff, never a silent change."""
    current = {name: {c: type_class(t) for c, t in cols}
               for name, cols in oracle_types.items()}
    if update:
        json.dump(current, open(TYPES_SNAPSHOT, "w"), indent=1, sort_keys=True)
        print(f"type snapshot updated: {TYPES_SNAPSHOT} ({len(current)} oracles)")
        return 0
    if not os.path.exists(TYPES_SNAPSHOT):
        print(f"TYPE SNAPSHOT MISSING: {TYPES_SNAPSHOT} — run with --update-types")
        return 1
    pinned = json.load(open(TYPES_SNAPSHOT))
    bad = 0
    for name in sorted(set(pinned) | set(current)):
        if name not in current:
            print(f"TYPE SNAPSHOT: oracle '{name}' pinned but gone — "
                  "regenerate with --update-types")
            bad += 1
        elif name not in pinned:
            print(f"TYPE SNAPSHOT: new oracle '{name}' not pinned — "
                  "regenerate with --update-types")
            bad += 1
        else:
            for c in sorted(set(pinned[name]) | set(current[name])):
                a, b = pinned[name].get(c), current[name].get(c)
                if a != b:
                    print(f"TYPE SNAPSHOT DRIFT: {name}.{c}: "
                          f"pinned={a} now={b}")
                    bad += 1
    if bad == 0:
        print(f"type snapshot OK ({len(current)} oracles match {TYPES_SNAPSHOT})")
    return bad

def main():
    update_types = "--update-types" in sys.argv
    argv = [a for a in sys.argv if a != "--update-types"]
    sfdir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
    outdir = argv[2] if len(argv) > 2 else "/tmp/verify_out"
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
            # ScaleGen tiers carry ts as raw INT64 NANOS; make_timestamp
            # takes MICROS, so `ts // 1000` is the nanos->micros
            # conversion that normalizes the view to the TIMESTAMP the
            # driver testdata presents (confirmed by the engine shim:
            # Sources.readEvents does timestamp_micros(ts div 1000))
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
    oracle_types = {}
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            banned.append((name, "*", f"DESCRIBE failed: {e}"))
            continue
        oracle_types[name] = [(col, typ) for col, typ, *_ in desc]
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

    # ---- gate 1b: declared types must match the committed snapshot ----
    failures += audit_type_snapshot(oracle_types, update_types)

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
