"""Cypher-subset builder API (SURVEY.md §2 tier A).

The reference's entire read surface is five Cypher statements; this module
is the thin Python builder that translates that subset to DataFrame plans
(no string parser needed — SURVEY.md §4). Mapping:

* ``MATCH (n:Label)``            → :meth:`Graph.match`       (A1/A2)
* ``MATCH (a)-[r:T]->(b)``       → :meth:`Graph.expand`      (A3)
* ``RETURN x.p AS alias``        → plain ``df.select(...alias())``  (A4)
* ``RETURN n`` (whole entity)    → :meth:`Graph.entity`      (A5)
* ``LIMIT n``                    → ``df.limit(n)``           (A6)
* ``WITH``                       → DataFrame chaining        (A10)
* ``$param`` binding             → :func:`bind_params`       (A11)
* ``datetime()``                 → ``F.current_timestamp()`` (A12)

Physical notes: label scans hit Parquet with the label predicate pushed
into the scan; ``expand`` is two equi hash-joins where the node side is
broadcast when small (Catalyst decides; AQE can convert at runtime) — on a
1000-executor cluster the big fact side never moves for a broadcast join.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neo4j_graphdb_spark.model import EXTRA_LABELS, NODE_ID


class Graph:
    """A queryable property graph over canonical nodes/edges DataFrames.

    ``key_names`` (optional): the store's ``{label: key_col}`` sidecar
    (``GraphStore.key_names()``). When given, a SINGLE-label
    :meth:`match` scan materializes the label's user-facing merge-key
    name as a real column (``coalesce(existing prop cells, key)``), so
    ``p.publisher`` on a Publisher keyed by ``publisher`` reads the key
    Neo4j-exactly even when ANOTHER label claims a prop column of that
    name (the README key-name-collision divergence). Store-built reads
    pass it by DEFAULT since r14 (``cypher_text._store_graph``); a bare
    ``Graph(nodes, edges)`` over ad-hoc frames keeps the historical
    resolution (unknown names fall back to key; colliding names read
    the raw — NULL for this label — prop column)."""

    def __init__(
        self,
        nodes: DataFrame,
        edges: DataFrame | None = None,
        key_names: dict[str, str] | None = None,
        strict_props: bool | None = None,
    ):
        self.nodes_df = nodes
        if edges is None and nodes is not None:
            # Zero relationships is a legal graph state (a store read
            # before its first edge write, or after `MATCH ()-[r]->()
            # DELETE r` emptied the table). Neo4j answers every
            # relationship pattern over it with ZERO ROWS, never an
            # error — synthesize the canonical empty edge frame so each
            # expand compiles to an (instantly-empty) join plan instead
            # of raising.
            edges = nodes.sparkSession.createDataFrame(
                [], "src long, dst long, rel_type string"
            )
        self.edges_df = edges
        self.key_names = key_names or {}
        # strict (NULL-for-unknown) property resolution: ON whenever a
        # key_names sidecar rides along, UNLESS the builder knows the
        # sidecar is PARTIAL (a store holding labels written before
        # key-name recording) — a partial sidecar must keep the
        # historical unknown-name → key fallback, or reading an
        # unrecorded label's merge key by its user-facing name silently
        # returns NULL (a silent upgrade-path regression).
        self.strict_props = (
            bool(self.key_names) if strict_props is None else strict_props
        )

    # --- A1 / A2: node scans -------------------------------------------------

    def match(self, label: str | list[str] | None = None) -> DataFrame:
        """``MATCH (n[:label]) RETURN n…`` — label predicate pushes down to
        the Parquet scan (``main.py:17``, ``cypher.txt:8``). A list is
        Cypher 5's label alternation ``(n:A|B)``: one ``isin``, still a
        partition-prunable predicate on the label partition column.

        A ``':'``-joined string is the label CONJUNCTION ``(n:A:B)``:
        the node's effective set {primary} ∪ split(``_labels``) must
        contain every listed label — compiled UNION-free as one AND of
        contains-predicates over the scan (secondary labels can live on
        any primary, so the scan is label-unpruned; Neo4j likewise picks
        one label index and filters the rest)."""
        if label is None:
            return self._materialize_key_names(self.nodes_df)
        if isinstance(label, (list, tuple)):
            ls = list(label)
            if len(ls) == 1:
                return self._with_key_name(
                    self.nodes_df.filter(F.col("label") == ls[0]), ls[0]
                )
            return self._materialize_key_names(
                self.nodes_df.filter(F.col("label").isin(ls)), ls
            )
        if ":" in label:
            df = self.nodes_df
            for lb in (t.strip() for t in label.split(":") if t.strip()):
                df = df.filter(self._label_pred(lb))
            return self._materialize_key_names(df)
        # the effective-set predicate can match rows whose PRIMARY label
        # differs (secondary labels) — materialize every recorded
        # label's key name, not only the scanned one, so `n.link` reads
        # on a `MATCH (n:Featured)` row whose primary label is Article
        return self._materialize_key_names(
            self.nodes_df.filter(self._label_pred(label))
        )

    def _materialize_key_names(
        self, scan: DataFrame, labels: list[str] | None = None
    ) -> DataFrame:
        """Multi-label twin of :meth:`_with_key_name`: on an all-nodes /
        alternation / conjunction scan, surface EVERY (listed) label's
        merge key under its user-facing property name — each label's own
        rows read ``coalesce(explicit cell, key)``, other labels' rows
        keep their cell (NULL when absent). With the keys readable by
        name in every scan shape, the strict (key_names) property
        resolution can return honest NULLs for truly-unknown names —
        Neo4j's missing-property semantics."""
        if not self.key_names or "key" not in scan.columns:
            return scan
        wanted = {
            lb: k
            for lb, k in self.key_names.items()
            if (labels is None or lb in labels) and k and k != "key"
        }
        # one projection per distinct key-prop name; labels sharing a
        # name fold into one when-chain
        by_name: dict[str, list[str]] = {}
        for lb, k in wanted.items():
            by_name.setdefault(k, []).append(lb)
        for k, lbs in by_name.items():
            own = F.col("label").isin(lbs)
            if k in scan.columns:
                prop = F.col(k)
                if scan.schema[k].dataType != scan.schema["key"].dataType:
                    prop = prop.cast(scan.schema["key"].dataType)
                scan = scan.withColumn(
                    k, F.when(own, F.coalesce(prop, F.col("key"))).otherwise(
                        F.col(k)
                    )
                )
            else:
                scan = scan.withColumn(
                    k, F.when(own, F.col("key"))
                )
        return scan

    def _with_key_name(self, scan: DataFrame, label: str) -> DataFrame:
        """Key-name materialization (see class docstring): after a
        single-label filter, surface the label's merge key under its
        user-facing name. No-op without ``key_names`` or when the name
        is already the storage ``key``."""
        k = self.key_names.get(label)
        if not k or k == "key" or "key" not in scan.columns:
            return scan
        if k in scan.columns:
            # another label claims the column: this label's own rows
            # keep any explicitly-SET cell, else read the key (Neo4j:
            # the property the MERGE map wrote). Keys are stored as
            # strings; if the colliding prop column is non-string, the
            # coalesce would fail ANSI coercion — cast the cell.
            prop = F.col(k)
            if scan.schema[k].dataType != scan.schema["key"].dataType:
                prop = prop.cast(scan.schema["key"].dataType)
            return scan.withColumn(k, F.coalesce(prop, F.col("key")))
        return scan.withColumn(k, F.col("key"))

    def _label_pred(self, label: str):
        """One label's effective-set membership: ``label == L`` alone on
        stores that never used secondary labels (the predicate stays a
        partition-prunable equality), widened to ``… OR L ∈
        split(_labels)`` once the ``_labels`` prop exists — Neo4j's
        any-of-my-labels MATCH semantics. The OR costs the pruning on
        secondary-labeled stores; that is the honest price of a
        secondary label without a per-label index (Neo4j pays it with
        one), and stores that never SET an extra label keep the pruned
        scan."""
        pred = F.col("label") == label
        if EXTRA_LABELS in self.nodes_df.columns:
            pred = pred | F.array_contains(
                F.split(F.coalesce(F.col(EXTRA_LABELS), F.lit("")), ","),
                label,
            )
        return pred

    # --- A3: 1-hop typed expand ----------------------------------------------

    def expand(
        self,
        rel_type: str | None = None,
        src_label: str | None = None,
        dst_label: str | None = None,
        src_alias: str = "a",
        dst_alias: str = "b",
        direction: str = "out",
    ) -> DataFrame:
        """``MATCH (a[:L1])-[r[:T]]->(b[:L2])`` binding the full triple
        (``cypher.txt:4-5``).

        Output columns are prefixed ``{src_alias}_…``, ``{dst_alias}_…``
        plus ``rel_type``. Two equi-joins on the deterministic node ids;
        the dimension-sized node side broadcasts.

        ``direction`` follows openCypher arrows: ``"out"`` is
        ``-[…]->``, ``"in"`` is ``<-[…]-`` (the stored edge runs from
        the ``dst_alias`` node to the ``src_alias`` node), ``"both"`` is
        the undirected ``-[…]-`` — each stored edge matches in BOTH
        orientations (two output rows per edge, Cypher's semantics; a
        self-loop matches once). The orientation is a column swap /
        union on the edge side BEFORE the joins, so the plan shape —
        and the broadcast of the dimension node sides — is unchanged.
        """
        e = _orient_edges(_rel_filter(self.edges_df, rel_type), direction)
        src = _prefix(self.match(src_label), src_alias)
        dst = _prefix(self.match(dst_label), dst_alias)
        return (
            e.join(src, e["src"] == src[f"{src_alias}_{NODE_ID}"])
            .join(dst, e["dst"] == dst[f"{dst_alias}_{NODE_ID}"])
            .drop("src", "dst")
        )

    def expand_path(
        self,
        hops: list[tuple[str | None, str | None]],
        start_label: str | None = None,
        aliases: list[str] | None = None,
    ) -> DataFrame:
        """Fixed-length path pattern — the multi-hop generalization of
        :meth:`expand`: ``MATCH (n0:L0)-[:T1]->(n1:L1)-[:T2]->(n2:L2)…``.

        ``hops`` is a list of ``(rel_type, dst_label)`` per hop. Each hop
        is one equi-join pair (edge ⋈ node) on the deterministic ids —
        Catalyst broadcast-plans dimension-sized node sides, so an
        k-hop chain over a 100 TB edge table is k hash joins with the
        fact side never moving for broadcastable hops. Output columns
        are prefixed ``n0_…, n1_…`` (or the given ``aliases``).
        """
        aliases = aliases or [f"n{i}" for i in range(len(hops) + 1)]
        cur = _prefix(self.match(start_label), aliases[0])
        prev_alias = aliases[0]
        for i, (rel_type, dst_label) in enumerate(hops):
            e = self.edges_df
            if rel_type is not None:
                e = e.filter(F.col("rel_type") == rel_type)
            e = e.select(
                F.col("src").alias(f"_s{i}"), F.col("dst").alias(f"_d{i}")
            )
            nxt = _prefix(self.match(dst_label), aliases[i + 1])
            cur = (
                cur.join(e, cur[f"{prev_alias}_{NODE_ID}"] == e[f"_s{i}"])
                .join(nxt, e[f"_d{i}"] == nxt[f"{aliases[i + 1]}_{NODE_ID}"])
                .drop(f"_s{i}", f"_d{i}")
            )
            prev_alias = aliases[i + 1]
        return cur

    def expand_optional(
        self,
        rel_type: str | None = None,
        src_label: str | None = None,
        dst_label: str | None = None,
        src_alias: str = "a",
        dst_alias: str = "b",
        direction: str = "out",
        on_extra=None,
    ) -> DataFrame:
        """``MATCH (a[:L1]) OPTIONAL MATCH (a)-[r[:T]]->(b[:L2])`` —
        every source node appears; nodes with no matching edge carry
        NULLs in the ``{dst_alias}_…`` and ``rel_type`` columns. Same
        equi-joins as :meth:`expand` with the source side LEFT OUTER —
        broadcast still applies to the dimension sides, so the
        optionality costs nothing extra. ``direction`` as in
        :meth:`expand` (edge-side column swap/union, applied before the
        outer join so the optionality semantics are orientation-blind).

        ``on_extra`` — optional ``(src_df, matched_df) -> Column``
        folded into the outer join's ON condition: this is Cypher's
        ``OPTIONAL MATCH … WHERE`` semantics, where a failing predicate
        NULLs the optional side instead of dropping the row (a
        post-join filter — the thing it must NOT compile to — would
        drop it)."""
        e = _orient_edges(_rel_filter(self.edges_df, rel_type), direction)
        dst = _prefix(self.match(dst_label), dst_alias)
        matched = e.join(
            dst, e["dst"] == dst[f"{dst_alias}_{NODE_ID}"], "inner"
        ).drop("dst")
        src = _prefix(self.match(src_label), src_alias)
        cond = src[f"{src_alias}_{NODE_ID}"] == matched["src"]
        if on_extra is not None:
            cond = cond & on_extra(src, matched)
        return src.join(matched, cond, "left").drop("src")

    def expand_optional_from(
        self,
        left: DataFrame,
        rel_type: str | None = None,
        dst_label: str | None = None,
        src_alias: str = "a",
        dst_alias: str = "b",
        direction: str = "out",
        on_extra=None,
    ) -> DataFrame:
        """A CHAINED ``OPTIONAL MATCH (x)-[:T]->(y)`` leg: left-outer
        join the matched (edge ⋈ dst) side onto an existing frame
        ``left`` that already binds ``src_alias`` under its
        ``{src_alias}_…`` column prefix — instead of re-deriving the
        left side from the label scan the way :meth:`expand_optional`
        does. This is what makes multi-leg exploration compose
        (``MATCH (a) OPTIONAL MATCH (a)-[:T]->(p) OPTIONAL MATCH
        (a)-[:T2]->(q)``, openCypher-standard), including anchoring on
        an alias the PREVIOUS optional leg bound: a NULL anchor id
        never equi-joins, so its row survives with a NULL optional side
        — exactly openCypher's NULL-anchor rule, for free.

        Unprefixed edge columns in ``left`` that the incoming leg also
        produces (``rel_type``, edge props — the previous leg's edge
        payload) are dropped first: the unprefixed edge namespace
        belongs to the MOST RECENT relationship leg."""
        e = _orient_edges(_rel_filter(self.edges_df, rel_type), direction)
        dst = _prefix(self.match(dst_label), dst_alias)
        matched = e.join(
            dst, e["dst"] == dst[f"{dst_alias}_{NODE_ID}"], "inner"
        ).drop("dst")
        stale = [
            c for c in matched.columns
            if not c.startswith(f"{dst_alias}_") and c in left.columns
        ]
        if stale:
            left = left.drop(*stale)
        cond = left[f"{src_alias}_{NODE_ID}"] == matched["src"]
        if on_extra is not None:
            cond = cond & on_extra(left, matched)
        return left.join(matched, cond, "left").drop("src")

    def expand_var(
        self,
        rel_type: str | None = None,
        min_hops: int = 1,
        max_hops: int = 2,
        src_label: str | None = None,
        dst_label: str | None = None,
        src_alias: str = "a",
        dst_alias: str = "b",
        collect_paths: bool = False,
        direction: str = "out",
    ) -> DataFrame:
        """``MATCH (a[:L1])-[:T*min..max]->(b[:L2])`` — variable-length
        path with Cypher's RELATIONSHIP-UNIQUENESS: one output row per
        path, and no path traverses the same relationship twice (a
        self-loop or 2-cycle therefore cannot inflate the hop counts —
        each chain filters pairwise-distinct edge identities, O(h²)
        comparisons on h ≤ a small bound). ``hops`` column reports the
        length. Bounded-depth only — the union of
        ``max_hops - min_hops + 1`` fixed-length broadcast-join ladders;
        unbounded ``[*]`` is deliberately not offered (at 100 TB you
        want the iterative BFS substrate,
        ``graph.algorithms.shortest_paths``, not a join explosion).

        ``direction="both"`` is the undirected ``-[:T*1..k]-`` pattern:
        every stored edge is walkable in either orientation (the ladder
        joins a symmetrized walk frame), while the uniqueness filter
        keeps comparing the edge's STORED identity — one relationship
        is still usable at most once per path whichever way it is
        crossed, exactly Neo4j's traversal rule. ``"in"`` is served by
        the caller swapping the endpoint roles (the ladder itself
        always walks left→right).

        ``collect_paths=True`` additionally materializes the path
        itself: ``path_keys`` (the node merge-keys along the path, in
        order — the oracle-able projection of Cypher's ``nodes(p)``) and
        ``path_types`` (the relationship types in order —
        ``relationships(p)``). One extra hash join enriches each edge
        with its WALK-destination's key BEFORE the ladder, so the
        arrays assemble from columns already riding the joins — no
        extra shuffle per hop and no post-hoc path reconstruction.
        """
        if not 0 <= min_hops <= max_hops:
            raise ValueError("need 0 <= min_hops <= max_hops")
        if direction not in ("out", "both"):
            raise ValueError(
                "expand_var walks out or both; incoming patterns swap "
                "the endpoint roles at the call site"
            )
        e_base = _rel_filter(self.edges_df, rel_type)
        # walk frame: (_wsrc → _wdst) join endpoints + the stored-edge
        # identity struct (orientation-independent, for uniqueness and
        # path_types)
        ident = F.struct("src", "dst", "rel_type").alias("_eid")
        walk = e_base.select(
            F.col("src").alias("_wsrc"), F.col("dst").alias("_wdst"), ident
        )
        if direction == "both":
            walk = walk.unionByName(
                e_base.select(
                    F.col("dst").alias("_wsrc"),
                    F.col("src").alias("_wdst"),
                    ident,
                )
            )
        if collect_paths:
            key_map = self.nodes_df.select(
                F.col(NODE_ID).alias("_pkid"), F.col("key").alias("_pkkey")
            )
            walk = walk.join(key_map, walk["_wdst"] == F.col("_pkid")).drop(
                "_pkid"
            )
        parts = []
        if min_hops == 0:
            # `*0..k` — Cypher's zero-length path: the endpoint aliases
            # bind the SAME node (dst's label/prop constraints apply to
            # it), hops = 0, path arrays are [key] / []. A self-join on
            # the node id, not a scan copy — dst_label may differ.
            zsrc = _prefix(self.match(src_label), src_alias)
            zdst = _prefix(self.match(dst_label), dst_alias)
            zero = zsrc.join(
                zdst,
                zsrc[f"{src_alias}_{NODE_ID}"]
                == zdst[f"{dst_alias}_{NODE_ID}"],
            )
            zextra = []
            if collect_paths:
                zextra = [
                    F.array(F.col(f"{src_alias}_key")).alias("path_keys"),
                    F.array().cast("array<string>").alias("path_types"),
                ]
            parts.append(
                zero.select(
                    *[
                        c
                        for c in zero.columns
                        if c.startswith(f"{src_alias}_")
                        or c.startswith(f"{dst_alias}_")
                    ],
                    *zextra,
                ).withColumn("hops", F.lit(0).cast("int"))
            )
        for h in range(max(min_hops, 1), max_hops + 1):
            cur = _prefix(self.match(src_label), src_alias)
            prev_end = f"{src_alias}_{NODE_ID}"
            for i in range(h):
                sel = [
                    F.col("_wsrc").alias(f"_s{i}"),
                    F.col("_wdst").alias(f"_d{i}"),
                    F.col("_eid").alias(f"_e{i}"),
                ]
                if collect_paths:
                    sel.append(F.col("_pkkey").alias(f"_k{i}"))
                e = walk.select(*sel)
                cur = cur.join(e, cur[prev_end] == e[f"_s{i}"]).drop(f"_s{i}")
                prev_end = f"_d{i}"
            dst = _prefix(self.match(dst_label), dst_alias)
            cur = cur.join(
                dst, cur[f"_d{h - 1}"] == dst[f"{dst_alias}_{NODE_ID}"]
            ).drop(*[f"_d{i}" for i in range(h)])
            for i in range(h):
                for j in range(i + 1, h):
                    cur = cur.filter(F.col(f"_e{i}") != F.col(f"_e{j}"))
            keep = [
                c
                for c in cur.columns
                if c.startswith(f"{src_alias}_") or c.startswith(f"{dst_alias}_")
            ]
            extra = []
            if collect_paths:
                extra = [
                    F.concat(
                        F.array(F.col(f"{src_alias}_key")),
                        F.array(*[F.col(f"_k{i}") for i in range(h)]),
                    ).alias("path_keys"),
                    F.array(*[
                        F.col(f"_e{i}").getField("rel_type") for i in range(h)
                    ]).alias("path_types"),
                ]
            parts.append(
                cur.select(*keep, *extra).withColumn(
                    "hops", F.lit(h).cast("int")
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    # --- A5: whole-entity value -----------------------------------------------

    def entity(self, df: DataFrame, alias: str, cols: list[str] | None = None) -> Column:
        """``RETURN n`` — materialize a row as a single struct value."""
        cols = cols or df.columns
        return F.struct(*[F.col(c) for c in cols]).alias(alias)


def _rel_filter(e: DataFrame, rel_type) -> DataFrame:
    """Filter the edge frame by relationship type. ``rel_type`` is a
    single type name, a list of alternatives (Cypher's ``[:A|B]``
    type-alternation pattern — compiled to one ``isin``, still a
    pushable scan predicate), or None (untyped: every edge matches)."""
    if rel_type is None:
        return e
    if isinstance(rel_type, (list, tuple)):
        ts = list(rel_type)
        if len(ts) == 1:
            return e.filter(F.col("rel_type") == ts[0])
        return e.filter(F.col("rel_type").isin(ts))
    return e.filter(F.col("rel_type") == rel_type)


def _prefix(df: DataFrame, alias: str) -> DataFrame:
    return df.select([F.col(c).alias(f"{alias}_{c}") for c in df.columns])


def _orient_edges(e: DataFrame, direction: str) -> DataFrame:
    """Re-orient an edge frame for a Cypher arrow direction: ``"out"``
    passes through, ``"in"`` swaps src/dst, ``"both"`` unions the two
    orientations (self-loops kept once — the undirected pattern binds a
    self-loop relationship a single time in Cypher). Every non-endpoint
    column (rel_type, properties) rides along unchanged."""
    if direction == "out":
        return e
    others = [c for c in e.columns if c not in ("src", "dst")]
    swapped = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), *others
    )
    if direction == "in":
        return swapped
    if direction == "both":
        return e.select("src", "dst", *others).unionByName(
            swapped.filter(F.col("src") != F.col("dst"))
        )
    raise ValueError(f"unknown direction: {direction!r}")


def bind_params(params: dict[str, Any]) -> dict[str, Column]:
    """A11 — ``session.run(query, **params)`` analogue: parameters become
    literals, which Catalyst constant-folds into pushed-down predicates."""
    return {k: F.lit(v) for k, v in params.items()}

