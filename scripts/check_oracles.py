"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its DuckDB ``oracle_sql()`` twin on the same
fixtures and compare row-count + column names + order-insensitive values.

Both sides are WALL-TIMED (spark_s = plan + execute + collect; duckdb_s =
parse + execute + fetch), so the same run doubles as the
engine-vs-DuckDB benchmark: ``--json PATH`` writes a per-query
``{name: {spark_s, duckdb_s, status, rows}}`` artifact — the
"within 2× of baseline" evidence BASELINE.md cannot provide (the
reference publishes no numbers; DuckDB on identical SQL over identical
parquet is the stand-in yardstick).

Usage: python scripts/check_oracles.py [--json PATH] [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


# ---------------------------------------------------------------------------
# Spark-compatible xxhash64 as a DuckDB Python UDF: standard XXH64
# (Collet's reference algorithm) over the string's UTF-8 bytes with
# Spark's fixed seed 42, reinterpreted as a signed long — verified
# identical to pyspark.sql.functions.xxhash64 on fixture data. Available
# to ad-hoc oracle SQL as spark_xxhash64(...).
# ---------------------------------------------------------------------------

_P1, _P2, _P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
_P4, _P5, _M64 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5, (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, k: int) -> int:
    return (_rotl((acc + k * _P2) & _M64, 31) * _P1) & _M64


def _xxh64(data: bytes, seed: int = 42) -> int:
    n, i = len(data), 0
    if n >= 32:
        v1, v2 = (seed + _P1 + _P2) & _M64, (seed + _P2) & _M64
        v3, v4 = seed & _M64, (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M64, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    return h ^ (h >> 32)


def spark_xxhash64(s: str) -> int:
    u = _xxh64(s.encode("utf-8"), 42)
    return u - (1 << 64) if u >= (1 << 63) else u


# NOTE: since round 6 the c8_minhash_lsh / c8_simhash registry entries
# declare the md5_60 hash with full plain-SQL oracles, so no local-only
# UDF oracles remain; the spark_xxhash64 UDF above stays registered for
# ad-hoc verification of the production xxhash64 hash mode (pytest covers
# it continuously — tests/test_dedup_similarity.py).


def canon(v):
    if isinstance(v, float):
        # driver-style tolerance: collapse -0.0/0.0 and format stably
        if v == 0:
            v = 0.0
        return f"{v:.9g}"
    if isinstance(v, (datetime, date)):
        return str(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    import json

    argv = list(sys.argv[1:])
    json_out = None
    best_of = 1
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    if "--best-of" in argv:
        i = argv.index("--best-of")
        best_of = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as e
    from neo4j_graphdb_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    con.create_function("spark_xxhash64", spark_xxhash64, ["VARCHAR"], "BIGINT")

    qs, os_ = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {str(ex).splitlines()[0][:200]}")
            n_fail += 1
            report[name] = {"status": "spark_error"}
            continue
        spark_s = time.time() - t0
        if name not in os_:
            print(f"rows {name}: {len(srows)} rows (rows-only, {spark_s:.1f}s)")
            n_rowsonly += 1
            report[name] = {
                "status": "rows_only",
                "spark_s": round(spark_s, 3),
                "rows": len(srows),
            }
            continue
        t1 = time.time()
        try:
            res = con.sql(os_[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex).splitlines()[0][:200]}")
            n_fail += 1
            report[name] = {"status": "duckdb_error", "spark_s": round(spark_s, 3)}
            continue
        duckdb_s = time.time() - t1
        ok = True
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            ok = False
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duckdb={sorted(dcols)}")
            ok = False
        if ok:
            ms, md = row_multiset(scols, srows), row_multiset(dcols, drows)
            if ms != md:
                diff = [(a, b) for a, b in zip(ms, md) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diff}")
                ok = False
        # --best-of N: after the (cold) correctness pass, re-time both
        # sides N-1 more times and keep the minimum — bench.py's
        # steady-state methodology, so the emitted ratio compares warm
        # engine throughput rather than first-run plan/JIT overhead
        for _ in range(best_of - 1):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            spark_s = min(spark_s, time.time() - t0)
            t1 = time.time()
            con.sql(os_[name]).fetchall()
            duckdb_s = min(duckdb_s, time.time() - t1)
        report[name] = {
            "status": "pass" if ok else "fail",
            "spark_s": round(spark_s, 3),
            "duckdb_s": round(duckdb_s, 3),
            "rows": len(srows),
        }
        if ok:
            print(
                f"PASS {name}: {len(srows)} rows "
                f"(spark {spark_s:.1f}s, duckdb {duckdb_s:.1f}s)"
            )
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_out:
        timed = [
            r for r in report.values() if "spark_s" in r and "duckdb_s" in r
        ]
        summary = {
            "sf_dir": sf_dir,
            "n_pass": n_pass,
            "n_fail": n_fail,
            "spark_total_s": round(sum(r["spark_s"] for r in timed), 3),
            "duckdb_total_s": round(sum(r["duckdb_s"] for r in timed), 3),
            "queries": report,
        }
        if summary["duckdb_total_s"] > 0:
            summary["spark_vs_duckdb_ratio"] = round(
                summary["spark_total_s"] / summary["duckdb_total_s"], 3
            )
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
