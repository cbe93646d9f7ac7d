"""Batch MERGE-upsert write path (SURVEY.md §2 A7-A9, A13).

The reference's write path is one Cypher ``MERGE … SET …`` per record over
Bolt (``/root/reference/src/crwling.py:47-60``) with write counters read
from the result summary (``:61-64``). Our semantic contract, preserved:

* **MERGE node** (A7): upsert by (label, merge-key) — create iff absent.
* **SET** (A8): overwrite properties on match *and* on create; an incoming
  NULL keeps the old value (column-wise last-writer-wins). **Intentional
  divergence from Neo4j**: Cypher ``SET a.p = null`` *removes* the
  property, while this writer's coalesce keeps the old value — batch
  pipelines use NULL for "no new value", and property removal is a
  separate tombstone concern out of scope here (the reference never sets
  a null parameter: ``src/crwling.py:49-51`` always binds crawled
  strings).
* **MERGE edge** (A9): create (src,dst,rel_type) iff absent; idempotent.
* **Counters** (A13): ``nodes_created`` / ``properties_set`` /
  ``relationships_created`` mirroring ``summary.counters``.

The architectural change (SURVEY.md §3): the per-record Bolt round-trip
loop becomes ONE batched upsert per call — a left-anti/coalesce join over
deterministic ids (model.py), i.e. a pure shuffle-join the optimizer can
plan, broadcast, and skew-split.

Storage is versioned Parquet (``v0, v1, …`` + a ``_CURRENT`` pointer):
writers never mutate in place, readers pin a version — the same
write-new-then-swap-pointer discipline object-store table formats use.
At 100 TB the drop-in upgrade is a transactional table format (Delta /
Iceberg ``MERGE INTO``) so unaffected files are not rewritten; the join
logic below is exactly what those formats execute under the hood.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from neo4j_graphdb_spark.model import NODE_ID, as_edges, as_nodes


@dataclass
class WriteSummary:
    """Mirror of the Bolt result-summary counters the reference inspects
    (``/root/reference/src/crwling.py:61-64``)."""

    nodes_created: int = 0
    properties_set: int = 0
    relationships_created: int = 0
    nodes_deleted: int = 0
    relationships_deleted: int = 0

    def __add__(self, other: "WriteSummary") -> "WriteSummary":
        return WriteSummary(
            self.nodes_created + other.nodes_created,
            self.properties_set + other.properties_set,
            self.relationships_created + other.relationships_created,
            self.nodes_deleted + other.nodes_deleted,
            self.relationships_deleted + other.relationships_deleted,
        )


class _VersionedTable:
    """Write-new + pointer-swap Parquet table (no in-place mutation)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        # schema of the current version, tracked across writes in this
        # process: a known schema lets reads skip the mergeSchema footer
        # scan entirely (a distributed job over every file) — the same
        # role a table-format catalog plays at 100 TB. None = unknown
        # (store created by an earlier process) → mergeSchema fallback.
        self._schema = None
        self._schema_version = -2

    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_CURRENT")

    def current_version(self) -> int:
        try:
            with open(self._pointer) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def current_path(self) -> str | None:
        v = self.current_version()
        return None if v < 0 else os.path.join(self.root, f"v{v}")

    def read(self, spark: SparkSession) -> DataFrame | None:
        path = self.current_path()
        if path is None:
            return None
        # a version can legitimately hold ZERO data files (a delete that
        # emptied the only partition): treat it as "no table", the same
        # sentinel a never-written store returns — a fresh process would
        # otherwise die in schema inference on the fileless directory
        if not any(
            f.endswith(".parquet")
            for _, _, files in os.walk(path)
            for f in files
        ):
            return None
        v = self.current_version()
        if self._schema is not None and self._schema_version == v:
            # known schema: no footer-merging job; files missing newer
            # property columns surface them as NULL, same as mergeSchema
            return spark.read.schema(self._schema).parquet(path)
        # partitions written in different batches may carry different
        # property columns; schema merging pads the gaps with NULLs
        df = spark.read.option("mergeSchema", "true").parquet(path)
        self._schema, self._schema_version = df.schema, v
        return df

    def read_version(self, spark: SparkSession, version: int) -> DataFrame | None:
        """Time-travel read of one retained version (mergeSchema — the
        schema cache only tracks the current version)."""
        path = os.path.join(self.root, f"v{version}")
        if not os.path.isdir(path):
            raise ValueError(
                f"version {version} not present under {self.root} "
                "(never written, or reclaimed by vacuum)"
            )
        return spark.read.option("mergeSchema", "true").parquet(path)

    def list_versions(self) -> list[int]:
        return sorted(
            int(e[1:])
            for e in os.listdir(self.root)
            if e.startswith("v") and e[1:].isdigit()
        )

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Reclaim all but the newest ``keep_last`` versions (the current
        pointer is always kept). Safe with hardlink carry-over: links are
        per-file references, so deleting an old version's tree never
        touches bytes a retained version still links. Returns the
        reclaimed version numbers."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        versions = self.list_versions()
        cur = self.current_version()
        keep = set(versions[-keep_last:]) | {cur}
        gone = []
        for v in versions:
            if v in keep:
                continue
            shutil.rmtree(os.path.join(self.root, f"v{v}"), ignore_errors=True)
            gone.append(v)
        return gone

    def write_next(self, df: DataFrame, partition_by: str | None = None) -> str:
        v = self.current_version() + 1
        path = os.path.join(self.root, f"v{v}")
        w = df.write.mode("overwrite")
        if partition_by is not None:
            # label/rel_type partitioning: label scans (A1) become partition
            # pruning — at 100 TB a MATCH (:Article) touches only that
            # label's files, and a MERGE batch rewrite is bounded by the
            # labels present in the batch (not the whole table).
            w = w.partitionBy(partition_by)
        w.parquet(path)
        with open(self._pointer, "w") as f:
            f.write(str(v))
        self._schema, self._schema_version = df.schema, v
        return path

    def is_partitioned_by(self, partition_by: str) -> bool:
        """True iff the current version's directory layout is hive-partitioned
        on ``partition_by`` (or the table is empty, so the next write
        establishes the layout). A version written without ``partitionBy``
        holds plain ``part-*.parquet`` files — a partial rewrite over such a
        layout would silently drop every row outside the touched values, so
        callers must check this before choosing the partial path."""
        path = self.current_path()
        if path is None:
            return True
        prefix = f"{partition_by}="
        return all(
            e.startswith(prefix) or e.startswith(".") or e.startswith("_")
            for e in os.listdir(path)
        )

    def write_next_partial(
        self, df: DataFrame, partition_by: str, touched_values: list[str]
    ) -> str:
        """Write ``df`` (rows of the *touched* partitions only) as the next
        version and carry every untouched partition over from the current
        version as hardlinks.

        This bounds MERGE write amplification to O(touched partition), not
        O(table) — the same file-reuse discipline Delta/Iceberg implement
        with manifests; on a shared filesystem the hardlink becomes a
        manifest entry referencing the old file.

        Raises ``ValueError`` if the current version is not partitioned on
        ``partition_by``: carrying over "untouched partitions" from an
        unpartitioned layout would carry over nothing, silently losing every
        other partition's data on upgrade of a legacy store.
        """
        prev = self.current_path()
        if prev is not None and not self.is_partitioned_by(partition_by):
            raise ValueError(
                f"current version at {prev} is not partitioned by "
                f"{partition_by!r}; a partial rewrite would drop its data — "
                "use write_next() with the full table to upgrade the layout"
            )
        prev_v = self.current_version()
        v = prev_v + 1
        path = os.path.join(self.root, f"v{v}")
        df.write.mode("overwrite").partitionBy(partition_by).parquet(path)
        if prev is not None:
            touched_dirs = {f"{partition_by}={tv}" for tv in touched_values}
            for entry in os.listdir(prev):
                if not entry.startswith(f"{partition_by}="):
                    continue
                if entry in touched_dirs:
                    continue
                _hardlink_tree(os.path.join(prev, entry), os.path.join(path, entry))
        with open(self._pointer, "w") as f:
            f.write(str(v))
        # new version's schema = this write's columns plus any carried
        # partition's extra property columns (known iff the previous
        # version's schema was)
        if prev is None:
            self._schema, self._schema_version = df.schema, v
        elif self._schema is not None and self._schema_version == prev_v:
            from pyspark.sql import types as _T

            known = {f.name for f in df.schema.fields}
            self._schema = _T.StructType(
                list(df.schema.fields)
                + [f for f in self._schema.fields if f.name not in known]
            )
            self._schema_version = v
        else:
            self._schema, self._schema_version = None, -2
        return path


class GraphStore:
    """A property-graph stored as canonical nodes/edges Parquet tables.

    Plays the role of the reference's ``Neo4jManager``
    (``/root/reference/src/database.py:4-16``): the long-lived handle that
    the ingest pipeline writes through and queries read from.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._nodes = _VersionedTable(os.path.join(root, "nodes"))
        self._edges = _VersionedTable(os.path.join(root, "edges"))

    # ---------------------------------------------------------------- reads

    def nodes(self, version: int | None = None) -> DataFrame | None:
        """Current nodes table, or a pinned earlier ``version`` (time
        travel — every write is a new version, so any historical state
        remains readable until :meth:`vacuum` reclaims it)."""
        if version is None:
            return self._nodes.read(self.spark)
        return self._nodes.read_version(self.spark, version)

    def edges(self, version: int | None = None) -> DataFrame | None:
        if version is None:
            return self._edges.read(self.spark)
        return self._edges.read_version(self.spark, version)

    # --------------------------------------------------------------- writes

    def merge_nodes(
        self,
        updates: DataFrame,
        label: str,
        key_col: str,
        prop_cols: list[str] | None = None,
        order_col: str | None = None,
    ) -> WriteSummary:
        """Batch ``MERGE (n:label {key}) SET n.p1=…, n.p2=…``.

        ``order_col`` resolves duplicate keys *within* the batch (last
        writer wins, as the reference's sequential per-record loop would);
        without it the key column itself orders the tie-break
        deterministically.
        """
        prop_cols = prop_cols or []
        carry = prop_cols + ([order_col] if order_col and order_col not in prop_cols else [])
        incoming = as_nodes(updates, label, key_col, carry)

        # within-batch last-writer-wins (B8 in-batch dedup). Rows sharing a
        # node_id also share `key`, so ordering must tie-break on content
        # (a hash of the property values) to stay deterministic when no
        # order_col is given.
        content_tiebreak = F.xxhash64(
            *[F.col(c).cast("string") for c in prop_cols]
        ) if prop_cols else F.lit(0)
        order = (
            [F.col(order_col).desc()] if order_col else []
        ) + [content_tiebreak.desc()]
        w = Window.partitionBy(NODE_ID).orderBy(*order)
        incoming = (
            incoming.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if order_col and order_col not in prop_cols:
            incoming = incoming.drop(order_col)

        existing = self.nodes()
        if existing is None:
            merged = incoming.persist()
            # one action for both counters (created + non-null prop cells)
            row = merged.agg(
                F.count(F.lit(1)).alias("_created"),
                *[F.count(F.col(c)).alias(c) for c in prop_cols],
            ).collect()[0]
            created = int(row["_created"])
            props_set = int(sum(row[c] for c in prop_cols))
            self._nodes.write_next(merged, partition_by="label")
            merged.unpersist()
            return WriteSummary(nodes_created=created, properties_set=props_set)

        # A merge batch touches exactly one label, and node_id embeds the
        # label, so the join only needs the touched partition: the read is
        # partition-pruned and the write rewrites ONLY this label's files
        # (untouched labels carry over as hardlinks) — O(partition) MERGE
        # cost instead of O(table).
        touched = existing.filter(F.col("label") == label)
        all_props = sorted(
            (set(touched.columns) | set(incoming.columns)) - {NODE_ID, "label", "key"}
        )
        old = _with_missing(touched, incoming, all_props).alias("old")
        new = _with_missing(incoming, touched, all_props).alias("new")

        # MERGE = full outer on deterministic id; SET = column-wise coalesce.
        # Persisted so the counter pass and the write pass execute the join
        # once — at 100 TB re-running the merge join doubles write cost.
        joined = old.join(new, on=NODE_ID, how="full_outer").persist()
        merged = joined.select(
            F.col(NODE_ID),
            F.coalesce(F.col("new.label"), F.col("old.label")).alias("label"),
            F.coalesce(F.col("new.key"), F.col("old.key")).alias("key"),
            *[
                F.coalesce(F.col(f"new.{c}"), F.col(f"old.{c}")).alias(c)
                for c in all_props
            ],
        )

        # one action computes both counters from the persisted join; the
        # non-null new.* cells equal the deduped incoming cells, so this
        # avoids re-executing the incoming plan just to count it
        row = joined.agg(
            F.count(F.when(F.col("old.label").isNull(), F.lit(1))).alias("_created"),
            *[F.count(F.col(f"new.{c}")).alias(c) for c in prop_cols],
        ).collect()[0]
        created = int(row["_created"])
        props_set = int(sum(row[c] for c in prop_cols))
        if self._nodes.is_partitioned_by("label"):
            self._nodes.write_next_partial(merged, "label", [label])
        else:
            # legacy/unpartitioned store: a partial rewrite would silently
            # drop every other label (ADVICE r2) — do one full rewrite that
            # also upgrades the layout to label-partitioned
            untouched = existing.filter(F.col("label") != label)
            self._nodes.write_next(
                untouched.unionByName(merged, allowMissingColumns=True),
                partition_by="label",
            )
        joined.unpersist()
        return WriteSummary(nodes_created=created, properties_set=props_set)

    def merge_edges(
        self,
        updates: DataFrame,
        rel_type: str,
        src_label: str,
        src_key_col: str,
        dst_label: str,
        dst_key_col: str,
    ) -> WriteSummary:
        """Batch ``MERGE (a)-[:REL]->(b)`` — create-if-absent, idempotent
        (``/root/reference/src/crwling.py:54``, ``src/ingest.py:7``)."""
        incoming = as_edges(
            updates, rel_type, src_label, src_key_col, dst_label, dst_key_col
        ).dropDuplicates(["src", "dst", "rel_type"])

        existing = self.edges()
        if existing is None:
            incoming = incoming.persist()
            created = incoming.count()
            self._edges.write_next(incoming, partition_by="rel_type")
            incoming.unpersist()
            return WriteSummary(relationships_created=created)

        # same partial-rewrite discipline as merge_nodes: the anti-join
        # and the union only touch this rel_type's partition
        touched = existing.filter(F.col("rel_type") == rel_type)
        fresh = incoming.join(
            touched, on=["src", "dst", "rel_type"], how="left_anti"
        ).persist()
        created = fresh.count()
        if self._edges.is_partitioned_by("rel_type"):
            self._edges.write_next_partial(
                touched.unionByName(fresh), "rel_type", [rel_type]
            )
        else:
            # same legacy-layout guard as merge_nodes: full rewrite that
            # upgrades the store to rel_type-partitioned
            untouched = existing.filter(F.col("rel_type") != rel_type)
            self._edges.write_next(
                untouched.unionByName(
                    touched.unionByName(fresh), allowMissingColumns=True
                ),
                partition_by="rel_type",
            )
        fresh.unpersist()
        return WriteSummary(relationships_created=created)


    def delete_nodes(
        self,
        keys: DataFrame,
        label: str,
        key_col: str,
        detach: bool = False,
    ) -> WriteSummary:
        """Batch ``MATCH (n:label {key}) [DETACH] DELETE n``.

        Neo4j semantics preserved: plain ``DELETE`` raises if any doomed
        node still has incident edges (either direction, any rel_type);
        ``detach=True`` removes those edges too. Counters report
        ``nodes_deleted`` / ``relationships_deleted`` like the Bolt
        summary's deletion counters.

        Write amplification stays partial on both tables: the node
        rewrite touches only this label's partition, and the edge
        rewrite touches only the rel_type partitions that actually held
        incident edges (the touched list is a tiny distinct-collect of
        rel_type values, driver-side metadata — not data).
        """
        doomed = (
            as_nodes(keys, label, key_col)
            .select(NODE_ID)
            .distinct()
            .persist()
        )
        existing = self.nodes()
        if existing is None:
            doomed.unpersist()
            return WriteSummary()
        edges = self.edges()
        n_rel = 0
        if edges is not None:
            incident = edges.join(
                doomed.select(F.col(NODE_ID).alias("src")), on="src", how="left_semi"
            ).unionByName(
                edges.join(
                    doomed.select(F.col(NODE_ID).alias("dst")), on="dst", how="left_semi"
                )
            ).dropDuplicates(["src", "dst", "rel_type"]).persist()
            n_rel = incident.count()
            if n_rel > 0 and not detach:
                incident.unpersist()
                doomed.unpersist()
                raise ValueError(
                    f"{n_rel} relationships still reference nodes being "
                    "deleted — use detach=True (DETACH DELETE) to remove them"
                )
            if n_rel > 0:
                touched_types = [
                    r["rel_type"]
                    for r in incident.select("rel_type").distinct().collect()
                ]
                survivors = (
                    edges.filter(F.col("rel_type").isin(touched_types))
                    .join(doomed.select(F.col(NODE_ID).alias("src")), on="src", how="left_anti")
                    .join(doomed.select(F.col(NODE_ID).alias("dst")), on="dst", how="left_anti")
                )
                if self._edges.is_partitioned_by("rel_type"):
                    self._edges.write_next_partial(survivors, "rel_type", touched_types)
                else:
                    keep_other = edges.filter(~F.col("rel_type").isin(touched_types))
                    self._edges.write_next(
                        keep_other.unionByName(survivors), partition_by="rel_type"
                    )
            incident.unpersist()

        touched = existing.filter(F.col("label") == label)
        kept = touched.join(doomed, on=NODE_ID, how="left_anti").persist()
        n_deleted = touched.count() - kept.count()
        if n_deleted > 0:
            if self._nodes.is_partitioned_by("label"):
                self._nodes.write_next_partial(kept, "label", [label])
            else:
                others = existing.filter(F.col("label") != label)
                self._nodes.write_next(
                    others.unionByName(kept, allowMissingColumns=True),
                    partition_by="label",
                )
        kept.unpersist()
        doomed.unpersist()
        return WriteSummary(nodes_deleted=n_deleted, relationships_deleted=n_rel)

    # ------------------------------------------------------------ maintenance

    def vacuum(self, keep_last: int = 1) -> dict[str, list[int]]:
        """Reclaim old versions of both tables, keeping the newest
        ``keep_last`` (current pointer always retained) — the retention
        half of the compact/vacuum/time-travel lifecycle."""
        return {
            "nodes": self._nodes.vacuum(keep_last),
            "edges": self._edges.vacuum(keep_last),
        }

    def compact(self, table: str = "nodes", files_per_value: int = 1) -> str | None:
        """Small-file compaction — the OPTIMIZE of this store.

        Every MERGE batch rewrites its touched partition into fresh files,
        so a store that ingests many small batches accumulates many small
        parquet files per label/rel_type dir; at 100 TB that means
        footer-bound scans and task-launch overhead. Compaction rewrites
        the current version with at most ``files_per_value`` files per
        partition value (clustered by a deterministic id hash), as a new
        version — readers pinned to the old version are untouched, the
        pointer swap is atomic, and untouched semantics are guaranteed by
        construction (same rows, new layout).
        """
        if table == "nodes":
            vt, pcol, id_col = self._nodes, "label", NODE_ID
        elif table == "edges":
            vt, pcol, id_col = self._edges, "rel_type", "src"
        else:
            raise ValueError(f"unknown table: {table!r}")
        df = vt.read(self.spark)
        if df is None:
            return None
        keys = [F.col(pcol)]
        if files_per_value > 1:
            keys.append(F.pmod(F.xxhash64(F.col(id_col)), F.lit(files_per_value)))
        # repartition on the partition column (+ optional intra-value
        # salt): every partition value lands in at most files_per_value
        # tasks, so each hive dir gets at most that many files
        return vt.write_next(df.repartition(*keys), partition_by=pcol)


def _hardlink_tree(src: str, dst: str) -> None:
    """Mirror a partition directory into the new version via hardlinks —
    zero data copied, the files are shared between versions (read-only by
    the write-new-then-swap discipline)."""
    for dirpath, _dirnames, filenames in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        target_dir = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(target_dir, exist_ok=True)
        for fn in filenames:
            if fn.startswith("."):
                continue
            os.link(os.path.join(dirpath, fn), os.path.join(target_dir, fn))


def _with_missing(df: DataFrame, other: DataFrame, all_props: list[str]) -> DataFrame:
    """Add NULL columns for properties the other side has, in canonical order."""
    cols = [F.col(NODE_ID), F.col("label"), F.col("key")]
    for c in all_props:
        if c in df.columns:
            cols.append(F.col(c))
        else:
            dtype = dict(other.dtypes).get(c, "string")
            cols.append(F.lit(None).cast(dtype).alias(c))
    return df.select(*cols)


