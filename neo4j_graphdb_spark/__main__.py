"""Command-line entry point: run Cypher statement text against a store.

    python -m neo4j_graphdb_spark --store /path/to/store \
        [--param name=value ...] "MATCH (a:Article) RETURN a.title AS title LIMIT 5"

The interaction shape mirrors the reference's driver script
(/root/reference/main.py:17-25): execute the statement, print each
returned record, and say so when the result is empty — re-expressed over
the engine's GraphStore + Cypher string front-end instead of a Bolt
session. ``;``-separated scripts run statement by statement
(run_cypher_script); write statements report their Neo4j-style counters.

Params parse as int → float → string, in that order, matching the loose
typing of ``session.run(query, **params)`` call sites in the reference
(src/ingest.py:10).
"""

from __future__ import annotations

import argparse
import sys


def _parse_param(kv: str) -> tuple[str, object]:
    if "=" not in kv:
        raise SystemExit(f"--param needs name=value, got {kv!r}")
    k, v = kv.split("=", 1)
    for cast in (int, float):
        try:
            return k, cast(v)
        except ValueError:
            continue
    return k, v


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m neo4j_graphdb_spark")
    ap.add_argument("statement", help="Cypher statement text (or a ;-script)")
    ap.add_argument("--store", required=True, help="GraphStore root directory")
    ap.add_argument(
        "--param",
        action="append",
        default=[],
        metavar="NAME=VALUE",
        help="statement parameter (repeatable)",
    )
    ap.add_argument(
        "--limit-print",
        type=int,
        default=50,
        help="max rows printed per statement (the frame itself is not truncated)",
    )
    args = ap.parse_args(argv)

    from neo4j_graphdb_spark.operators.cypher_text import run_cypher_script
    from neo4j_graphdb_spark.session import get_spark
    from neo4j_graphdb_spark.writer import GraphStore

    spark = get_spark("cypher-cli")
    spark.sparkContext.setLogLevel("ERROR")
    store = GraphStore(spark, args.store)
    params = dict(_parse_param(p) for p in args.param)

    results = run_cypher_script(spark, args.statement, params or None, store=store)
    for res in results:
        if res.summary is not None:
            c = res.summary
            print(
                f"write: nodes_created={c.nodes_created} "
                f"properties_set={c.properties_set} "
                f"relationships_created={c.relationships_created}"
            )
        if res.df is None:
            continue
        rows = res.df.limit(args.limit_print + 1).collect()
        if not rows:
            # the reference prints a "no data yet" hint here (main.py:20)
            print("(no rows)")
            continue
        print("\t".join(res.df.columns))
        for r in rows[: args.limit_print]:
            print("\t".join(str(v) for v in r))
        if len(rows) > args.limit_print:
            print(f"... (printing capped at {args.limit_print} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
