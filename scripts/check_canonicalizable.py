#!/usr/bin/env python
"""Full-registry guard: no entry may return a top-level ArrayType/MapType
column.

The driver's correctness harness canonicalizes every result with pandas
``sort_values`` over all output columns before hashing; raw list/map cells
are unhashable there (``TypeError: unhashable type: 'list'`` — the exact
failure that made a103 the only red of round 13 and a81 a red of r11).
The convention is to serialize list outputs with ``array_join`` (Spark) /
``array_to_string`` (DuckDB oracle) before returning.

This script constructs EVERY registry entry's DataFrame at the given
sf dir (~6 min at sf0.001 — write entries execute their writes during
construction) and fails on any offending column. The fast per-round
pytest guard (tests/test_golden_reference.py::test_driver_window_no_list_outputs)
covers the active driver window only; run this sweep at round start or
after touching many entries.

Usage: python scripts/check_canonicalizable.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql.types import ArrayType, MapType

from neo4j_graphdb_spark.registry import QUERIES
from neo4j_graphdb_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("canon-guard", cpus=8)
    bad = []
    t0 = time.time()
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
        except Exception as exc:  # construction itself failed — also a bug
            bad.append((name, "<construction error>", repr(exc)[:200]))
            continue
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType)):
                bad.append((name, field.name, field.dataType.simpleString()))
    print(f"swept {len(QUERIES)} entries in {time.time() - t0:.1f}s")
    if bad:
        for name, col, what in bad:
            print(f"FAIL {name}: column {col!r} is {what}")
        return 1
    print("OK: no top-level array/map output columns")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
