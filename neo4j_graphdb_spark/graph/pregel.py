"""Pregel-on-DataFrames: the iterative superstep substrate (SURVEY.md §4).

Catalyst has no fixpoint operator, so iteration lives in a Python driver
loop (the one place SURVEY.md licenses imperative control flow). Each
superstep is pure DataFrame algebra:

    messages  = vertices ⋈ edges  → groupBy(dst).agg(merge)
    vertices' = vertices ⟕ messages → vprog columns

Scale mechanics (the 100 TB story):

* ``localCheckpoint()`` every superstep truncates lineage — without it the
  plan doubles per iteration and the optimizer chokes by step ~15.
* The vertex table is hash-partitioned on ``id`` once and every join
  reuses that partitioning, so a superstep costs ONE shuffle (messages),
  not three.
* AQE handles power-law skew (celebrity vertices) via skew-join splitting.

This is the GraphFrames/Pregelix dataflow formulation (PAPERS.md), not
GraphX: no RDDs, everything stays in Tungsten rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pregel(
    vertices: DataFrame,
    edges: DataFrame,
    initial_state: dict[str, Column],
    send_msg: Callable[[], Column],
    agg_msg: Callable[[Column], Column],
    update_state: dict[str, Callable[[], Column]],
    max_iter: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    checkpoint_every: int = 1,
    until_converged: str | None = None,
) -> DataFrame:
    """Generic superstep loop.

    * ``initial_state``: new state columns added to ``vertices``.
    * ``send_msg()``: expression over the joined (src-vertex ⋈ edge) row;
      source vertex state columns are visible as ``F.col("<name>")``.
    * ``agg_msg(msg)``: aggregate over incoming messages per destination.
    * ``update_state``: per state column, expression over
      (old state columns, ``F.col("_msg")``).
    * ``until_converged``: name of a boolean column computed by
      ``update_state``; loop stops early when no vertex has it true.
    """
    v = vertices.select(F.col(id_col), *[e.alias(n) for n, e in initial_state.items()])
    state_cols = list(initial_state.keys())
    v = v.repartition(id_col).localCheckpoint()

    e = edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))

    for it in range(max_iter):
        msgs = (
            v.join(e, v[id_col] == e["_src"])
            .select(F.col("_dst").alias(id_col), send_msg().alias("_m"))
            .groupBy(id_col)
            .agg(agg_msg(F.col("_m")).alias("_msg"))
        )
        new_v = v.join(msgs, on=id_col, how="left").select(
            F.col(id_col),
            *[update_state[c]().alias(c) for c in state_cols],
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            new_v = new_v.localCheckpoint()
        v = new_v
        if until_converged is not None:
            if v.filter(F.col(until_converged)).limit(1).count() == 0:
                break
    return v
