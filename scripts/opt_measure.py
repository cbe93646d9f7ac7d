"""Optimization-round measurement harness (guide §1).

For each named bench headliner (default: all of bench.HEADLINE):

* one warmup execution, then N timed runs through the **noop sink**
  (`df.write.format("noop")` — computes every column of every row,
  guide §1.4) so we time the computation, not the sink, AND N timed
  runs through the bench's own `.count()` action (the driver-comparable
  number);
* `.explain("formatted")` captured to ``plans/<tag>/<query>_<suffix>.txt``.

Usage:
    python scripts/opt_measure.py [--sf SF_DIR] [--runs N]
        [--plandir plans/r16] [--suffix before] [--json OUT] [name ...]

Jobs are labelled (`setJobDescription`) so a UI/event-log trace maps
back to queries.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    def _positive_int(v: str) -> int:
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("--runs must be >= 1")
        return n

    ap.add_argument("--runs", type=_positive_int, default=2)
    ap.add_argument("--plandir", default=None, help="dir for explain dumps (skip if unset)")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from bench import HEADLINE
    from neo4j_graphdb_spark.registry import QUERIES
    from neo4j_graphdb_spark.session import get_spark, load_table

    names = args.names or list(HEADLINE)
    spark = get_spark("opt_measure")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, args.sf, "lineitem").count()  # JVM warmup

    def release_blocks():
        # deterministic inter-measurement cleanup (same as bench.py):
        # clearCache misses localCheckpoint blocks; unpersist them all
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(True)  # blocking — drop blocks NOW, not mid-next-run
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.25)  # let post-GC async cleanup land outside timed regions

    if args.plandir:
        os.makedirs(args.plandir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        sc = spark.sparkContext
        df = QUERIES[name](spark, args.sf)
        if args.plandir:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plandir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        # warmup (mirrors bench.py)
        sc.setJobDescription(f"{name}: warmup")
        QUERIES[name](spark, args.sf).count()
        release_blocks()
        noop_best = cnt_best = None
        rows = 0
        for i in range(args.runs):
            sc.setJobDescription(f"{name}: noop run {i}")
            t0 = time.time()
            QUERIES[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            noop_best = dt if noop_best is None else min(noop_best, dt)
            release_blocks()
            sc.setJobDescription(f"{name}: count run {i}")
            t0 = time.time()
            rows = QUERIES[name](spark, args.sf).count()
            dt = time.time() - t0
            cnt_best = dt if cnt_best is None else min(cnt_best, dt)
            release_blocks()
        sc.setJobDescription(None)
        out[name] = {"noop_s": round(noop_best, 3), "count_s": round(cnt_best, 3), "rows": rows}
        print(f"{name}: noop={noop_best:.3f}s count={cnt_best:.3f}s rows={rows}", file=sys.stderr)

    print(json.dumps(out, indent=1))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
