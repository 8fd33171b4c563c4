#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query result parquet under <verifyOutDir>/<name>/, runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sfDir
tables, sorts columns by name, sorts rows, and value-compares.
Driver-side tooling only — not part of the shipped library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def described_types(con, sql):
    """name → duckdb type string, via DESCRIBE (no row fetch)."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


# Families the driver's type-aware hash provably normalizes (evidence:
# 355 faces green in CORRECTNESS_r16 with exactly these two drifts —
# INTEGER-vs-BIGINT in 17 faces, JSON-vs-VARCHAR in 22). HUGEINT is
# deliberately NOT in the int family: HUGEINT-vs-BIGINT is the drift
# that failed q_chat_pack at the driver while passing the local value
# compare. Same for DECIMAL, FLOAT-vs-DOUBLE, and anything else: strict.
_INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
               "UTINYINT", "USMALLINT", "UINTEGER"}
_STR_FAMILY = {"VARCHAR", "JSON"}


def _type_class(t):
    if t in _INT_FAMILY:
        return "int64"
    if t in _STR_FAMILY:
        return "str"
    return t


def type_drift(spark_types, oracle_types):
    """The driver's hash is type-aware: a DuckDB oracle emitting
    HUGEINT/DECIMAL where the Spark parquet holds BIGINT/DOUBLE
    hash-mismatches even on identical values (the q_chat_pack bug).
    Flag any column whose duckdb-rendered type lands in a different
    type class between the Spark result parquet and the oracle SQL."""
    drift = []
    for c in sorted(set(spark_types) & set(oracle_types)):
        s, o = spark_types[c], oracle_types[c]
        if _type_class(s) != _type_class(o):
            drift.append(f"{c}: spark={s} oracle={o}")
    return drift


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            g_cols = [d[0] for d in got.description]
            g_rows = got.fetchall()
            exp = con.execute(sql)
            e_cols = [d[0] for d in exp.description]
            e_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            n_fail += 1
            continue
        try:
            drift = type_drift(
                described_types(
                    con,
                    f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"),
                described_types(con, f"({sql})"))
        except Exception as e:
            print(f"FAIL {name}: describe error {e}")
            n_fail += 1
            continue
        gc, gr = rows_canon(g_cols, g_rows)
        ec, er = rows_canon(e_cols, e_rows)
        if drift:
            print(f"FAIL {name}: oracle type drift [{'; '.join(drift)}]")
            n_fail += 1
        elif gc != ec:
            print(f"FAIL {name}: columns {gc} vs {ec}")
            n_fail += 1
        elif len(gr) != len(er):
            print(f"FAIL {name}: rowcount {len(gr)} vs {len(er)}")
            n_fail += 1
        elif gr != er:
            diff = next(i for i in range(len(gr)) if gr[i] != er[i])
            print(f"FAIL {name}: first diff row {diff}:\n  spark={gr[diff]}\n  duck ={er[diff]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


def selftest():
    """Prove the guard catches the q_chat_pack class: a deliberately
    HUGEINT-drifted oracle must red-flag against a BIGINT parquet,
    while the two driver-normalized families stay green."""
    import tempfile
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as d:
        con.execute(
            f"COPY (SELECT 3::BIGINT AS a, 'x' AS b) TO '{d}/r.parquet'")
        spark_t = described_types(
            con, f"SELECT * FROM read_parquet('{d}/r.parquet')")
    assert type_drift(spark_t, described_types(
        con, "(SELECT 3::HUGEINT AS a, 'x' AS b)")) == \
        ["a: spark=BIGINT oracle=HUGEINT"], "HUGEINT drift missed"
    assert type_drift(spark_t, described_types(
        con, "(SELECT 3::DECIMAL(20,1) AS a, 'x' AS b)")), \
        "DECIMAL drift missed"
    assert type_drift(spark_t, described_types(
        con, "(SELECT 3::INTEGER AS a, to_json('x') AS b)")) == [], \
        "driver-normalized families must not flag"
    print("selftest ok: HUGEINT/DECIMAL drift flagged, "
          "int-width/JSON normalized")


if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        sys.exit(0)
    sys.exit(main(sys.argv[1], sys.argv[2]))
