"""Cypher *string* front-end for the reference's statement subset.

The engine's primary query surface is the builder API
(:mod:`neo4j_graphdb_spark.operators.cypher` — a documented SURVEY §4
decision), but the reference executes literal Cypher text
(``/root/reference/main.py:17``, ``src/crwling.py:47-56``,
``src/ingest.py:4-8``, ``cypher.txt:4-8``). This module parses exactly
that subset and compiles it onto the builder + writer, so the
reference's statements run verbatim:

* ``MATCH (a:Label)`` / ``MATCH (n)`` — node scan (A1/A2)
* ``MATCH (a:L1)-[r:T]->(b:L2)`` — typed expand (A3)
* ``MERGE (a:Label {prop: $param})`` — node upsert (A7)
* ``CREATE (a:Label {key: $p, …}), (b:M {…})`` / ``CREATE (a)-[:T]->(b)``
  — Neo4j's duplicate-ALLOWED insert, distinct from MERGE: replaying the
  same CREATE mints a new node copy per key (instance-ordinal identity,
  ``writer.create_nodes``) and a new parallel relationship
  (``writer.create_edges``); comma-separated pattern lists supported
* ``SET a.p = $param | datetime()`` — property set (A8/A12)
* ``MERGE (a)-[:T]->(b)`` — relationship upsert (A9)
* ``WITH a`` — pipeline boundary (A10)
* ``RETURN item [AS alias] [, …]`` with ``alias`` / ``alias.prop`` (A4/A5)
* ``LIMIT n`` (A6) and ``SKIP n`` — offset pagination, the statement
  form of the reference's page loop (src/crwling.py:110)
* ``UNWIND $rows AS row`` leading a write — Neo4j's batched-ingest
  idiom; ``row.col`` references resolve against the batch DataFrame
  (or a list-of-dicts param), so the reference's per-record session
  loop (src/crwling.py:58-60) becomes one merge plan
* ``UNWIND $ids AS x`` leading a read — batch point-lookup:
  ``WHERE a.prop = x`` compiles to a broadcast equi-join against the
  id list (one distributed job, not N round trips), and ``x`` is
  RETURN-able
* ``MERGE … ON CREATE SET … ON MATCH SET …`` — conditional property
  application (first-seen stamps vs update-only mutations), routed to
  the writer's create/match prop groups
* ``$param`` binding (A11)
* ``WHERE alias.prop <op> ($param | number | 'literal') [AND …]`` and
  ``MATCH (n:Label {prop: $param})`` — read-side filters (extension
  beyond the reference's statements; its users write these constantly)
* ``ORDER BY item [ASC|DESC] [, …]`` over the RETURN columns (same
  extension rationale; compiles to a plain sort before LIMIT)
* ``RETURN key, count(*) | count([DISTINCT] x.p) | sum/avg/min/max(x.p)
  | collect(x.p)`` — openCypher implicit grouping: the non-aggregate
  items ARE the grouping keys (there is no GROUP BY in Cypher);
  compiles to one partial-aggregated groupBy. ``collect`` lists are
  canonically sorted (Neo4j guarantees no order)
* ``RETURN DISTINCT …`` — projected-row dedup (one shuffle)
* ``MATCH (a:L) OPTIONAL MATCH (a)-[r:T]->(b:L2)`` — left-outer expand
  from the scanned label; unmatched rows carry NULL relationship/target
  (compiles to ``Graph.expand_optional``)
* statement-LEADING ``OPTIONAL MATCH …`` (r15) — the pattern matches as
  a plain MATCH; a no-match (or filtered-to-empty) segment yields
  exactly ONE all-NULL row, padded distributedly (1-row NULL frame
  anti-joined against a broadcast 1-row probe of the match)

Batch-native by construction: the reference binds one record per
``session.run`` round trip; here ``params`` may be either a scalar dict
(reference semantics — compiled to a 1-row DataFrame) or an arbitrary
DataFrame whose columns are the parameters, in which case ONE call
upserts the whole batch through the same statement text — the
per-record Bolt loop becomes a single batched merge plan.

``WHERE`` accepts boolean combinations — ``OR`` / ``NOT`` /
parentheses with Cypher precedence (NOT > AND > OR) — compiled to one
filter Column with three-valued NULL semantics.

``MATCH (a:L1)-[r:T*min..max]->(b:L2)`` parses to the bounded
variable-length expand (``Graph.expand_var``); ``r`` binds the path and
``r.hops`` reads its length.

``MATCH (n:Label …) [WHERE …] [DETACH] DELETE n`` compiles onto the
batch delete (``GraphStore.delete_nodes``) with Neo4j's
refuse-connected semantics for plain DELETE and deletion counters;
``… REMOVE n.p1[, n.p2]`` compiles onto the property erase
(``GraphStore.remove_props`` — the explicit counterpart of SET's
NULL-keeps-old coalesce).

Round-7 additions (all oracle-checked through registry entries a54-a62):

* ``CREATE`` — duplicate-allowed inserts (instance-ordinal identity),
  comma-separated pattern lists, parallel relationships, literal props
* scalar expressions — RETURN / WHERE conjuncts / ORDER BY / aggregate
  arguments / expression grouping keys / non-aggregating WITH
  projections (``WITH a, a.x + 1 AS y``): arithmetic with Cypher
  integer-division truncation, string ``+`` concat, coalesce, CASE
  WHEN (comparisons and IS [NOT] NULL), and a whitelisted function set
  — every expression compiles to ONE Catalyst Column, no UDFs
* ``MATCH p = shortestPath((a)-[:T*1..k]->(b))`` + ``length(p)`` —
  depth-capped pairwise BFS as one lazy join plan; the unbounded
  ``shortestPath((a)-[:T*]->(b))`` runs the iterative pairwise-BFS
  substrate instead (early exit at the first empty frontier); the
  UNDIRECTED form ``shortestPath((a)-[:T*1..k]-(b))`` (r15) walks the
  symmetrized edge set (same-node endpoints excluded — not a trail)
* ``CALL graft.{pagerank,cc,scc,louvain,label_propagation,degrees,bfs,
  node_similarity,adamic_adar,k_core,k_truss,closeness,betweenness,
  eccentricity,hits,triangle_count,clustering,assortativity,
  weighted_sssp,random_walks,biased_walks,modularity}``
  procedure routing with YIELD / RETURN / ORDER BY / SKIP / LIMIT
* ``MATCH … SET n.p = <expr>`` update statement (read-modify-write)
* ``MATCH (a)-[r:T]->(b) DELETE r`` relationship deletion
* ``UNWIND [literals] AS x`` (bare, read-lookup, and write-batch
  positions), ``IN [literal list]``, ``collect(DISTINCT x)``, literal
  property values in every write position
* ``EXPLAIN <read>`` / ``PROFILE <read>`` — the formatted Spark
  physical plan without/with execution (``CypherResult.plan``,
  ``.rows``); writes are refused by name (they execute eagerly)
* relationship-type alternation ``[r:A|B]`` and label alternation
  ``(x:A|B)`` — each one ``isin`` scan predicate (the label form stays
  partition-prunable); both ride plain/var-length expand, EXISTS and
  COUNT patterns (writes, DELETE and REMOVE keep the one-name rule)
* whole-entity aggregation — ``count(a)`` / ``count(DISTINCT a)``
  (non-null bindings via the node-id column) and whole-entity grouping
  keys ``WITH p, count(a) AS n WHERE … RETURN p.key, n`` (the entity
  groups as one struct column; the tail opens it with field access)
* list literals ``[1, 2, 3]`` and comprehensions ``[x IN xs WHERE p |
  e]`` — ``array``/``filter``/``transform`` higher-order Catalyst
  expressions; ``size()`` dispatches characters-vs-elements; ``split``/
  ``head``/``last``/``reverse``/``range`` list functions;
  ``UNWIND <any frame-independent list expression> AS x`` (range,
  split, comprehensions — compiled and exploded to the unwind frame);
  ``keys(r)``/``properties(r)`` relationship introspection

* simple-form ``CASE x WHEN v THEN r … END`` (operand compiled once,
  equality-tested per WHEN) alongside the searched form; the math
  function library (sqrt/exp/log/log10/trig/atan2/pi/e — one JVM-side
  function each), ``toBoolean``, ``timestamp()``
* ``FOREACH (x IN <list> | <update clause>)`` — rewritten to the UNWIND
  write batch (identical write effects and counters); list sources:
  literals, $params, frame-independent expressions (range(), …).
  ``MATCH … FOREACH (x IN <literal list|range()> | <update>)`` (r15)
  replays the body SEQUENTIALLY instead — one bucketed write per
  element, so a repeatedly-SET property ends at the LAST element's
  value (Neo4j's loop order; batch dedup cannot promise it)
* ``MATCH p = allShortestPaths((a)-[:T*1..k]->(b))`` — EVERY
  minimal-length path per pair: the path-collecting var-length ladder
  + one window keeping rows at the pair's min hop count
* pattern comprehensions ``[(a)-[:T]->(x) | x.prop]`` in RETURN (plain
  or size()-wrapped, AS-aliased) — ONE edge-side aggregation joined
  back, never a fan-out of the main frame
* anonymous node patterns in CREATE/MERGE (``CREATE (:L {k: 1})``) —
  an internal alias is minted

Round-15 additions (VERDICT r14 dialect gaps; a117-a121 oracle rows):

* ``duration('P…').months/.days/.seconds`` (+years/weeks/hours/minutes/
  quarters/milliseconds) — Neo4j's three-group decomposition on
  duration VALUES: months = 12·Y + M, days excludes months, seconds
  excludes days; literals fold to constants at compile time
* ``RETURN u.name ORDER BY count(*)`` — an aggregate the RETURN list
  does not project lifts into a HIDDEN column of the same implicit
  groupBy and drops after the sort (one shuffle)
* ``WHERE u = v`` / ``u <> v`` whole-node equality — identity equality
  = one node-id column comparison (Catalyst turns the declared cross
  product into an equi-join)
* ``RETURN *`` / bare ``RETURN p`` with a bound path — the path
  projects as a struct (node key sequence, relationship type sequence,
  hop count)
* ``MATCH (u) SET u.p = <expr>`` without a label — the computed batch
  fans out per label (bounded by the store's label count); same
  fan-out powers ``MATCH (n) [DETACH] DELETE n`` (plain DELETE keeps
  Neo4j's whole-statement refusal, checked up front) and the untyped
  relationship delete ``MATCH (a:L)-[r]->(b:M) DELETE r`` (per matched
  type)
* ``SET n = {map}`` / ``SET n = $map`` — Neo4j's REPLACE semantics:
  unlisted properties are removed (one bucketed erase pass), listed
  ones set (the normal merge); the merge key survives (identity)
* repeated anchor MATCH — ``MATCH (a:X) MATCH (b:Y)`` folds into the
  comma multi-anchor form, hopping interleaved WHERE clauses (same
  cartesian — conjunctive filters commute; WHERE equality between the
  anchors becomes an equi-join inside Catalyst)
* temporal expressions as GENERAL WHERE operands — ``datetime() -
  duration('P1D') < datetime()``: sentinels that land in an
  expression-form conjunct unstash to source text for the scalar
  compiler (the stash serves only the simple prop-op-value grammar)
* fresh node anchors onto an existing frame — ``… WITH u LIMIT 1 MATCH
  (v:Tech) …`` and MATCH directly after a statement-leading OPTIONAL
  MATCH (the pad flushes first; a padded NULL anchor equi-joins to
  nothing through a chained rel MATCH, openCypher's rule)
* unlabeled-endpoint relationship delete — ``MATCH ()-[r:T]->()
  DELETE r`` (and the fully-anonymous wipe ``()-[r]->()``): the doom
  keys are endpoint NODE IDS (``delete_edges_by_ids``) instead of
  per-label keys; an edgeless store deletes zero, never errors

Out of scope (raises ``CypherUnsupported``): unbounded ``[*]`` outside
``shortestPath(…)`` — enumerating EVERY path is a join explosion by
construction; the shortest-path form compiles to the iterative BFS
substrate and is supported.

RECORDED DIVERGENCES from Neo4j (deliberate, each documented at its
implementation site):

* ``CREATE (n:L {key: NULL})`` RAISES (``raise_error`` inside the
  plan) where Neo4j creates the node without the property. This
  content-keyed store derives node identity from (label, key) — a
  keyless node is unaddressable by every later MERGE/MATCH, so a
  silent skip (the pre-r15 behavior) hid data loss; failing loud is
  the Spark-native analogue of a NOT NULL key constraint. Batch
  pipelines with occasional NULL keys must filter them first.
* ``SET n.p = NULL`` keeps the old cell (the a8 upsert contract —
  coalesce semantics) where Neo4j removes the property; REMOVE is the
  erase verb here.
* edge identity is (src, dst, rel_type) — a second MERGE of the same
  triple is the same edge (no parallel edges; the multigraph
  divergence documented at the edge-DELETE counter).
"""

from __future__ import annotations

import contextvars
import math
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, MapType, StructType

from neo4j_graphdb_spark.model import EXTRA_LABELS, NODE_ID
from neo4j_graphdb_spark.operators.cypher import Graph
from neo4j_graphdb_spark.operators.cypher import _rel_filter as _cy_rel_filter
from neo4j_graphdb_spark.writer import BUCKET_COL, GraphStore, WriteSummary


class CypherUnsupported(ValueError):
    """Statement uses syntax outside the reference subset."""


def _store_graph(store: GraphStore, nodes: DataFrame) -> Graph:
    """Store-backed read graph — key-name resolution ON by default.

    Every store-built :class:`Graph` carries the store's
    ``{label: merge-key property}`` sidecar so single-label scans
    materialize each label's key under its user-facing name
    (``Article.link`` — the reference's merge key,
    ``/root/reference/src/crwling.py:48``; ``RETURN u, r, t`` at
    ``/root/reference/cypher.txt:4-5`` exposes the struct shape).
    Readers that want the raw storage ``key`` column still get it —
    materialization adds the property column, it never removes ``key``.

    Strict (NULL-for-unknown) resolution turns on only when the sidecar
    covers EVERY label in the store: a partially-recorded store (labels
    written before key-name recording) keeps the historical
    unknown-name → key fallback, so an unrecorded label's merge key
    stays readable by its user-facing name (upgrade-path safety)."""
    kn = store.key_names()
    store_labels = store.labels()
    strict = bool(kn) and all(lb in kn for lb in store_labels)
    return Graph(nodes, store.edges(), key_names=kn, strict_props=strict)


# --------------------------------------------------------------------------
# parsing
# --------------------------------------------------------------------------

_CLAUSE_KEYWORDS = (
    "MATCH", "MERGE", "CREATE", "SET", "WITH", "WHERE", "RETURN", "ORDER", "SKIP",
    "LIMIT", "UNWIND",
)

# The (?<![.$\w]) lookbehind keeps clause keywords embedded in property
# accesses (`RETURN n.with`) or parameters (`$set`) from splitting into
# bogus clauses: `\b` alone treats the `.`/`$` boundary as a word break.
_CLAUSE_RE = re.compile(
    r"(?<![.$\w])(" + "|".join(_CLAUSE_KEYWORDS) + r")\b", re.IGNORECASE
)

# (alias:Label {prop: $param, ...}) — every piece optional but the parens
_NODE_RE = re.compile(
    r"^\(\s*(?P<alias>\w+)?\s*(?::\s*(?P<label>\w+(?:\s*[|:]\s*\w+)*))?"
    r"\s*(?P<props>\{[^}]*\})?\s*\)$"
)

# (a)-[r:T]->(b) with optional labels/alias on each piece; the :type is
# optional too — `[r]` / `[]` match any relationship (reads only; MERGE
# validates a type is present, Cypher requires one to create). All three
# openCypher orientations parse: `-[…]->` outgoing, `<-[…]-` incoming,
# `-[…]-` undirected — the arrow heads are the optional larrow/rarrow
# groups, resolved by _rel_direction.
_REL_RE = re.compile(
    r"^\(\s*(?P<src_alias>\w+)?\s*(?::\s*(?P<src_label>\w+(?:\s*[|:]\s*\w+)*))?\s*\)"
    r"\s*(?P<larrow><)?\s*-\s*\[\s*(?P<rel_alias>\w+)?"
    r"(?:\s*:\s*(?P<rel_type>\w+(?:\s*\|\s*\w+)*))?"
    r"(?:\s*(?P<star>\*)\s*(?:(?P<min_h>\d+)\s*\.\.\s*(?P<max_h>\d+)?)?)?"
    r"(?:\s*(?P<rel_props>\{[^}]*\}))?\s*\]\s*-\s*(?P<rarrow>>)?\s*"
    r"\(\s*(?P<dst_alias>\w+)?\s*(?::\s*(?P<dst_label>\w+(?:\s*[|:]\s*\w+)*))?\s*\)$"
)


def _rel_direction(m: re.Match) -> str:
    """Arrow heads → expand direction: ``-[…]->`` = "out", ``<-[…]-`` =
    "in", ``-[…]-`` = "both"; ``<-[…]->`` is not a pattern Cypher has."""
    if m.group("larrow") and m.group("rarrow"):
        raise CypherUnsupported("<-[…]-> is not a valid relationship pattern")
    if m.group("larrow"):
        return "in"
    if m.group("rarrow"):
        return "out"
    return "both"

def _rel_types(raw: str | None):
    """The rel-type pattern text as expand's ``rel_type`` argument:
    ``'A'`` stays a plain string, ``'A|B'`` (Cypher type alternation)
    splits to the list form ``_rel_filter`` compiles to one ``isin``."""
    if raw is not None and ":" in raw:
        raise CypherUnsupported(
            "label conjunction (:A:B) is supported in single-node MATCH "
            "scans only"
        )
    if raw is None or "|" not in raw:
        return raw
    return [t.strip() for t in raw.split("|")]


def _node_labels(raw: str | None):
    """Node-label pattern text for a scan/expand endpoint: ``'A'`` plain,
    ``'A|B'`` alternation → list (one ``isin``), ``'A:B'`` CONJUNCTION →
    the normalized ``':'``-joined string :meth:`Graph.match` compiles to
    a UNION-free AND of effective-label contains-predicates. Mixing the
    two is refused (Cypher has no such pattern either)."""
    if raw is None:
        return None
    if ":" in raw and "|" in raw:
        raise CypherUnsupported(
            "label pattern mixes ':' conjunction with '|' alternation — "
            "use one"
        )
    if ":" in raw:
        return ":".join(t.strip() for t in raw.split(":") if t.strip())
    if "|" in raw:
        return [t.strip() for t in raw.split("|")]
    return raw


def _single_rel_type(raw: str | None, what: str) -> str | None:
    """Refuse ``|`` alternation AND ``:`` conjunction where the statement
    needs exactly one stored name — writes create one edge/node, DELETE
    dooms one type's (or label's) buckets. The ``:`` check matters:
    ``_NODE_RE`` accepts ``(n:A:B)`` for the conjunction MATCH scan, and
    without this guard a CREATE/MERGE head would silently store the
    literal label ``'A:B'`` — unreachable by ``MATCH (n:A)``,
    ``MATCH (n:B)``, or the conjunction scan itself."""
    if raw is not None and ("|" in raw or ":" in raw):
        raise CypherUnsupported(
            f"{what} needs a single name (no '|' alternation or ':' "
            f"conjunction), got {raw!r}"
        )
    return raw


_PROP_PAIR_RE = re.compile(r"(\w+)\s*:\s*\$(\w+)")

# read-side inline props additionally accept literals (masked strings or
# numbers): MATCH (a:Article {lang: 'de'}) — the value keeps its raw
# token here and resolves through _where_value like any WHERE operand
_PROP_VALUE_PAIR_RE = re.compile(r"(\w+)\s*:\s*(\$\w+|\x00\d+\x00|-?\d+(?:\.\d+)?)")

_SET_ITEM_RE = re.compile(
    r"^(?P<alias>\w+)\.(?P<prop>\w+)\s*=\s*(?:\$(?P<param>\w+)"
    r"|(?P<dt>datetime\(\s*\))"
    r"|datetime\(\s*\{\s*epochMillis\s*:\s*\$(?P<epoch>\w+)\s*\}\s*\)"
    r"|(?P<litval>\x00\d+\x00|-?\d+(?:\.\d+)?))$"
)

# `SET n += $map` — Neo4j's property-map merge (mutating += keeps
# untouched props; our SET coalesce semantics already do)
_SET_MAP_RE = re.compile(r"^(?P<alias>\w+)\s*\+=\s*\$(?P<param>\w+)$")

# `ON MATCH SET n.p = n.p + <numeric>` — the MERGE counter idiom: the
# addend (numeric literal or param) rides the batch as its own column
# and the writer applies old + addend to matched rows only
_SET_INCR_RE = re.compile(
    r"^(?P<alias>\w+)\.(?P<prop>\w+)\s*=\s*(?P<alias2>\w+)\.(?P<prop2>\w+)"
    r"\s*\+\s*(?:\$(?P<param>\w+)|(?P<litval>-?\d+(?:\.\d+)?))$"
)

_RETURN_ITEM_RE = re.compile(
    r"^(?P<alias>\w+)(?:\.(?P<prop>\w+))?(?:\s+AS\s+(?P<out>\w+))?$", re.IGNORECASE
)

# COUNT { (a)-[:T]->(:L) } — Cypher 5 pattern-count expression in RETURN
_COUNT_ITEM_RE = re.compile(
    r"^COUNT\s*\{(?P<pat>(?:[^{}]|\{[^{}]*\})+)\}(?:\s+AS\s+(?P<out>\w+))?$",
    re.IGNORECASE,
)

# `[NOT] EXISTS { (a)-[:T]->(:L) } AS flag` as a RETURN *value* — the
# boolean itself, not the WHERE semi/anti join form
_EXISTS_RET_RE = re.compile(
    r"^(?P<neg>NOT\s+)?EXISTS\s*\{(?P<pat>(?:[^{}]|\{[^{}]*\})+)\}"
    r"\s+AS\s+(?P<out>\w+)$",
    re.IGNORECASE,
)

# labels(n) / type(r) / id(n) / keys(n) / properties(n) — Cypher's
# entity-introspection functions; length(p) — path length for a
# shortestPath/var-length binding
_FN_ITEM_RE = re.compile(
    r"^(?P<fn>labels|type|id|elementId|length|keys|properties|nodes|relationships)"
    r"\s*\(\s*(?P<alias>\w+)\s*\)"
    r"(?:\s+AS\s+(?P<out>\w+))?$",
    re.IGNORECASE,
)

# `count(*) | count([DISTINCT] alias) [AS out]` as a WRITE-RETURN item:
# Neo4j books one result row per processed input row, so a batched
# write's count(alias) aggregates the batch frame itself
_WRITE_COUNT_RE = re.compile(
    r"^count\s*\(\s*(?:(?P<star>\*)|(?P<dist>DISTINCT\s+)?(?P<alias>\w+))\s*\)"
    r"(?:\s+AS\s+(?P<out>\w+))?$",
    re.IGNORECASE,
)

# p = shortestPath((a:L)-[:T*1..k]->(b:M)) — depth-capped shortest path
_SHORTEST_RE = re.compile(
    r"^(?P<palias>\w+)\s*=\s*shortestPath\s*\((?P<pat>.+)\)$", re.IGNORECASE
)

# p = allShortestPaths((a:L)-[:T*1..k]->(b:M)) — EVERY minimal-length
# path per (a, b) pair, one row each
_ALL_SHORTEST_RE = re.compile(
    r"^(?P<palias>\w+)\s*=\s*allShortestPaths\s*\((?P<pat>.+)\)$",
    re.IGNORECASE,
)

# p = (a:L)-[:T*1..k]->(b:M) — plain path-variable binding (a69)
_PATH_BIND_RE = re.compile(r"^(?P<palias>\w+)\s*=\s*(?P<pat>\(.+)$")

# [(a)-[:T]->(x) | x.prop] — pattern comprehension RETURN item,
# optionally wrapped in size(); single-hop, bound source alias
_PAT_COMP_RE = re.compile(
    r"^(?P<size>size\s*\(\s*)?\[\s*(?P<pat>\(.+?)\s*\|\s*(?P<proj>[^\]]+?)\s*\]"
    r"(?(size)\s*\))(?:\s+AS\s+(?P<out>\w+))?$",
    re.IGNORECASE,
)

# n {.title, .link} — map projection RETURN item (a72)
_MAP_PROJ_RE = re.compile(
    r"^(?P<alias>\w+)\s*\{(?P<fields>[^{}]*)\}(?:\s+AS\s+(?P<out>\w+))?$",
    re.IGNORECASE,
)

_AGG_ITEM_RE = re.compile(
    r"^(?P<fn>count|sum|avg|min|max|collect|stDev|stDevP)\s*\(\s*"
    r"(?:(?P<star>\*)|(?P<dist>DISTINCT\s+)?(?P<alias>\w+)(?:\.(?P<prop>\w+))?)"
    r"\s*\)(?:\s+AS\s+(?P<out>\w+))?$",
    re.IGNORECASE,
)

# aggregate over a scalar EXPRESSION: sum(a.price * a.qty), avg(…), … —
# the inner text is handed to the scalar-expression compiler
_AGG_EXPR_RE = re.compile(
    r"^(?P<fn>count|sum|avg|min|max|collect|stDev|stDevP)\s*\("
    r"(?P<dist>\s*DISTINCT\s+)?(?P<inner>.+)\)"
    r"(?:\s+AS\s+(?P<out>\w+))?$",
    re.IGNORECASE | re.DOTALL,
)


_PERCENTILE_RE = re.compile(
    r"^(?P<fn>percentileCont|percentileDisc)\s*\(\s*(?P<inner>.+?)\s*,"
    r"\s*(?P<p>(?:0?\.\d+|0|1)(?:\.0+)?)\s*\)(?:\s+AS\s+(?P<out>\w+))?$",
    re.IGNORECASE,
)

# the start of ANY aggregate call, for lifting aggregates out of larger
# RETURN expressions (`sum(n.v) / count(n)`, `size(collect(x))`). The
# lookbehind keeps property accesses (`a.count(…)` is not Cypher anyway)
# and embedded substrings (`discount(`) from firing.
_AGG_CALL_START_RE = re.compile(
    r"(?<![.\w$])(?:count|sum|avg|min|max|collect|stDev|stDevP"
    r"|percentileCont|percentileDisc)\s*\(",
    re.IGNORECASE,
)


def _lift_aggregates(item: str):
    """Detect a RETURN/WITH item that is an EXPRESSION OVER aggregates —
    ``sum(n.v) / count(n)``, ``size(collect(x))`` — and split it into a
    placeholder skeleton plus the extracted aggregate calls:
    ``('_agg0 / _agg1', ['sum(n.v)', 'count(n)'], out_name)``.

    Returns ``None`` when the item contains no aggregate call, or when
    the whole item IS a single aggregate call (the plain paths own
    those). The caller compiles each extracted call with the normal
    aggregate machinery under its placeholder alias and re-assembles the
    skeleton over the aggregated frame — openCypher's
    ratio-of-aggregates idiom as ONE groupBy, no second pass over the
    data (VERDICT r12 missing #2)."""
    m_as = re.search(r"\s+AS\s+(\w+)\s*$", item, re.IGNORECASE)
    body = item[: m_as.start()] if m_as else item
    out = m_as.group(1) if m_as else None
    pieces: list[str] = []
    calls: list[str] = []
    pos = 0
    while True:
        m = _AGG_CALL_START_RE.search(body, pos)
        if not m:
            break
        depth, i = 0, m.end() - 1
        while i < len(body):
            if body[i] == "(":
                depth += 1
            elif body[i] == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        if depth != 0:
            return None  # unbalanced parens: not liftable
        pieces.append(body[pos : m.start()])
        pieces.append(f"_agg{len(calls)}")
        calls.append(body[m.start() : i + 1])
        pos = i + 1
    if not calls:
        return None
    pieces.append(body[pos:])
    skeleton = "".join(pieces).strip()
    if skeleton == "_agg0" and len(calls) == 1:
        return None  # the item IS one aggregate — existing paths own it
    return skeleton, calls, out


def _is_agg_item(item: str) -> bool:
    return bool(
        _AGG_ITEM_RE.match(item)
        or _AGG_EXPR_RE.match(item)
        or _PERCENTILE_RE.match(item)
        or _lift_aggregates(item)
    )


@dataclass
class _Clause:
    kind: str
    body: str


@dataclass
class _NodePattern:
    alias: str
    label: str | None
    key_prop: str | None = None  # prop name in the {…} map
    key_param: str | None = None  # $param bound to it
    set_props: dict[str, str | None] = field(default_factory=dict)
    # prop name -> param name, or None for datetime()
    create_props: dict[str, str | None] = field(default_factory=dict)  # ON CREATE SET
    match_props: dict[str, str | None] = field(default_factory=dict)  # ON MATCH SET
    # ON MATCH SET p = p + <v> (counter idiom): prop -> addend encoding
    match_add_props: dict[str, object] = field(default_factory=dict)
    create: bool = False  # CREATE (duplicate-allowed insert) vs MERGE upsert
    match_only: bool = False  # MATCH anchor in a write: read-only, never created


@dataclass
class _EdgePattern:
    """One relationship pattern in a write statement —
    ``MERGE (a)-[r:T {w: $w}]->(b) [ON CREATE SET r.x…]``. Inline
    ``props`` are unconditional; the three SET groups mirror
    _NodePattern's and land in merge_edges' prop_cols /
    create_prop_cols / match_prop_cols."""

    src_alias: str
    rel_type: str
    dst_alias: str
    props: list  # inline [(prop, encoding)] pairs from the {…} map
    create: bool  # CREATE (duplicate-allowed) vs MERGE upsert
    alias: str | None = None  # `r` in [r:T] — SET/ON CREATE target
    set_props: dict[str, object] = field(default_factory=dict)
    create_props: dict[str, object] = field(default_factory=dict)  # ON CREATE SET
    match_props: dict[str, object] = field(default_factory=dict)  # ON MATCH SET
    # ON MATCH SET r.p = r.p + <v> (counter idiom): prop -> addend
    match_add_props: dict[str, object] = field(default_factory=dict)
    undirected: bool = False  # MERGE (u)-[r:T]-(t): either-orientation match


# Same lookbehind rationale as _CLAUSE_RE: `RETURN n.skip` or `$delete`
# must not be rejected as unsupported syntax.
_UNSUPPORTED_KEYWORDS = re.compile(
    r"(?<![.$\w])(DELETE|REMOVE|FOREACH|CALL|DETACH|UNION)\b",
    re.IGNORECASE,
)

# one WHERE conjunct: alias.prop <op> ($param | signed number | 'masked
# string literal' — by parse time literals are \x00<i>\x00 sentinels |
# \x01<i>\x01 — a temporal expression pre-resolved to a Column)
_WHERE_ITEM_RE = re.compile(
    r"^(?P<alias>\w+)\.(?P<prop>\w+)\s*"
    r"(?P<op>=~|<=|>=|<>|=|<|>|[Ii][Nn]\b"
    r"|(?i:STARTS_WITH)|(?i:ENDS_WITH)|(?i:CONTAINS))\s*"
    r"(?P<val>\[[^\]]*\]|\$\w+|-?\d+(?:\.\d+)?|\x00\d+\x00|\x01\d+\x01|\w+)$"
)

# Cypher temporal subset: `datetime()` optionally shifted by a duration
# literal — `datetime() - duration('P30D')` is the idiomatic "last 30
# days" WHERE bound. Durations accept the full ISO-8601 subset: the
# exact-length part (weeks/days/time) folds to one seconds interval,
# and calendar units (Y/M) compile to a true INTERVAL n MONTH (Neo4j
# keeps months separate because their length depends on the anchor —
# month interval arithmetic preserves exactly that semantics).
_TEMPORAL_EXPR_RE = re.compile(
    r"datetime\(\s*(?P<arg>\x00\d+\x00)?\s*\)"
    r"(?:\s*(?P<sign>[+-])\s*duration\(\s*(?P<dur>\x00\d+\x00)\s*\))?"
    # a trailing `.year`-style component accessor means the scalar
    # compiler owns the expression (tfield on the constructor value) —
    # the WHERE-branch stash must not swallow the constructor first
    r"(?!\s*\.)",
)

_DURATION_ISO_RE = re.compile(
    r"^P(?!$)(?:(?P<y>\d+)Y)?(?:(?P<mo>\d+)M)?(?:(?P<w>\d+)W)?(?:(?P<d>\d+)D)?"
    r"(?:T(?!$)(?:(?P<h>\d+)H)?(?:(?P<m>\d+)M)?(?:(?P<s>\d+(?:\.\d+)?)S)?)?$"
)


def duration_parts(iso: str) -> tuple[int, float]:
    """Parse an ISO-8601 duration to ``(months, seconds)`` — the two
    components Neo4j's own ``duration`` type keeps separate, because a
    month has no fixed length: calendar units (Y/M before the T) stay
    months (12·Y + M), everything exact-length (W/D and the time part)
    folds into seconds."""
    m = _DURATION_ISO_RE.match(iso.strip())
    if not m:
        raise CypherUnsupported(f"unsupported duration literal: {iso!r}")
    y, mo, w, d, h, mi, s = (
        m.group(g) for g in ("y", "mo", "w", "d", "h", "m", "s")
    )
    months = int(y or 0) * 12 + int(mo or 0)
    seconds = (
        int(w or 0) * 604800
        + int(d or 0) * 86400
        + int(h or 0) * 3600
        + int(mi or 0) * 60
        + float(s or 0)
    )
    return months, seconds


def duration_parts3(iso: str) -> tuple[int, int, float]:
    """Parse an ISO-8601 duration to Neo4j's full three-group
    decomposition ``(months, days, seconds)`` — unlike
    :func:`duration_parts` (which folds days into seconds for interval
    arithmetic, where every day is exact-length), the component
    ACCESSORS need days kept separate: ``duration('P1D').seconds`` is
    0 in Neo4j, not 86400."""
    m = _DURATION_ISO_RE.match(iso.strip())
    if not m:
        raise CypherUnsupported(f"unsupported duration literal: {iso!r}")
    y, mo, w, d, h, mi, s = (
        m.group(g) for g in ("y", "mo", "w", "d", "h", "m", "s")
    )
    months = int(y or 0) * 12 + int(mo or 0)
    days = int(w or 0) * 7 + int(d or 0)
    seconds = int(h or 0) * 3600 + int(mi or 0) * 60 + float(s or 0)
    return months, days, seconds


def duration_seconds(iso: str) -> float:
    """Parse the exact-length ISO-8601 duration subset (PnW nD TnH nM
    nS) to seconds. Calendar units (years/months) raise HERE — callers
    that can do true month arithmetic (``_temporal_column`` →
    ``INTERVAL n MONTH``) use :func:`duration_parts` instead."""
    months, seconds = duration_parts(iso)
    if months:
        raise CypherUnsupported(
            f"calendar units (Y/M) in duration are unsupported here "
            f"(no fixed length): {iso!r}"
        )
    return seconds


def _temporal_column(m: re.Match, lits: list[str]):
    """Compile one matched temporal expression to a Column:
    ``current_timestamp() ± INTERVAL n SECOND`` (or a fixed
    ``datetime('<iso>')`` literal bound) — constant-folded by Catalyst
    into a pushdown-able literal."""
    if m.group("arg") is not None:
        # datetime('<iso literal>') — a fixed instant; to_timestamp of a
        # literal constant-folds, so the bound still pushes down
        col = F.to_timestamp(F.lit(lits[int(m.group("arg").strip("\x00"))]))
    else:
        col = F.current_timestamp()
    if m.group("dur") is None:
        return col
    months, secs = duration_parts(lits[int(m.group("dur").strip("\x00"))])
    sign = 1 if m.group("sign") == "+" else -1
    # componentwise like Neo4j's duration arithmetic: months first
    # (calendar-aware, end-of-month clamped), then the exact seconds —
    # both interval literals, so Catalyst constant-folds the whole bound
    if months:
        col = col + F.expr(f"INTERVAL '{sign * months}' MONTH")
    if secs or not months:
        col = col + F.expr(f"INTERVAL '{sign * secs}' SECOND")
    return col

_STRING_LIT_RE = re.compile(r"'([^']*)'")

# boolean WHERE grammar beyond the conjunct list: OR / NOT / parentheses
# with Cypher precedence NOT > AND > OR. Tokenization runs over the
# MASKED text (string literals are already sentinels), and the same
# lookbehind as the clause splitter keeps keywords embedded in
# identifiers (`n.nothing`, `$order`) out of the token stream.
_BOOL_DELIM_RE = re.compile(
    r"\(|\)|(?<![.$\w])(?:OR|XOR|AND|NOT)\b", re.IGNORECASE
)


def _parse_bool_expr(body: str):
    """Parse a WHERE body holding OR / NOT / parentheses into an AST of
    ``('or'|'and', l, r)`` / ``('not', n)`` / ``('pred', alias, prop,
    op, raw)`` nodes. The leaves reuse the conjunct grammar
    (``_WHERE_ITEM_RE``), so everything a simple WHERE can say composes
    under the connectives; anything else raises ``CypherUnsupported``."""
    tokens: list[str] = []
    pos = 0
    for m in _BOOL_DELIM_RE.finditer(body):
        chunk = body[pos : m.start()].strip()
        if chunk:
            tokens.append(chunk)
        tokens.append(m.group(0).upper())
        pos = m.end()
    tail = body[pos:].strip()
    if tail:
        tokens.append(tail)

    idx = 0

    def peek():
        return tokens[idx] if idx < len(tokens) else None

    def take():
        nonlocal idx
        t = tokens[idx]
        idx += 1
        return t

    def factor():
        t = peek()
        if t == "NOT":
            take()
            return ("not", factor())
        if t == "(":
            take()
            e = expr()
            if peek() != ")":
                raise CypherUnsupported(f"unbalanced parens in WHERE: {body!r}")
            take()
            return e
        if t is None or t in (")", "AND", "OR", "XOR"):
            raise CypherUnsupported(f"unsupported WHERE expression: {body!r}")
        if (
            re.fullmatch(r"(?i)all|any|none|single", t.strip())
            and idx + 1 < len(tokens)
            and tokens[idx + 1] == "("
        ):
            # list-predicate leaf — all/any/none/single(x IN xs WHERE p).
            # The paren tokenizer shredded the call; reassemble it through
            # its balanced parens into one text leaf the scalar compiler
            # owns (the inner WHERE/cmp grammar is its, not this one's)
            parts = [take()]
            depth = 0
            while idx < len(tokens):
                tok = take()
                parts.append(tok)
                if tok == "(":
                    depth += 1
                elif tok == ")":
                    depth -= 1
                    if depth == 0:
                        break
            if depth != 0:
                raise CypherUnsupported(f"unbalanced parens in WHERE: {body!r}")
            return ("exprpred", " ".join(parts))
        if re.match(r"(?i)^CASE\b", t.strip()):
            # CASE leaf — the paren tokenizer shredded any function call
            # inside it; reassemble through balanced parens until the
            # chunk carrying END (and its trailing comparator, which
            # shares that chunk) has been consumed
            parts = [take()]
            depth = 0
            while idx < len(tokens) and (
                depth > 0
                or not any(
                    re.search(r"(?i)\bEND\b", x) for x in parts
                )
            ):
                tok = take()
                parts.append(tok)
                if tok == "(":
                    depth += 1
                elif tok == ")":
                    depth -= 1
            if depth != 0:
                raise CypherUnsupported(
                    f"unbalanced parens in WHERE: {body!r}"
                )
            return ("exprpred", " ".join(parts))
        # a scalar leaf: the tokenizer shredded any function-call or
        # arithmetic parens inside it (`toLower(a.title) CONTAINS 'x'
        # OR …`) — reassemble through balanced parens until the next
        # top-level connective / grouping close. A "(" continues the
        # leaf only when the text so far ends mid-expression (an
        # identifier = a call, or an operator = an arithmetic group);
        # a "(" after a complete comparison is NOT consumed (no such
        # shape exists in the bool grammar anyway).
        parts = [take().strip()]
        while True:
            t = peek()
            if t is None or t in ("AND", "OR", "XOR", ")", "NOT"):
                break
            if t == "(":
                depth = 0
                while idx < len(tokens):
                    tok = take()
                    parts.append(tok)
                    if tok == "(":
                        depth += 1
                    elif tok == ")":
                        depth -= 1
                        if depth == 0:
                            break
                if depth != 0:
                    raise CypherUnsupported(
                        f"unbalanced parens in WHERE: {body!r}"
                    )
            else:
                parts.append(take().strip())
        leaf = " ".join(parts).strip()
        m = _WHERE_ITEM_RE.match(leaf)
        if not m:
            # not the simple alias.prop-vs-value shape: hand the leaf to
            # the scalar-expression predicate compiler (CASE / arithmetic
            # / functions over bound props) — the same compiler the
            # plain-AND path uses, so `x OR CASE … END = 1` works
            # wherever `CASE … END = 1` alone does
            return ("exprpred", leaf)
        return (
            "pred",
            m.group("alias"),
            m.group("prop"),
            m.group("op"),
            m.group("val"),
        )

    def term():
        n = factor()
        while peek() == "AND":
            take()
            n = ("and", n, factor())
        return n

    def xor_term():
        # Cypher precedence: NOT > AND > XOR > OR
        n = term()
        while peek() == "XOR":
            take()
            n = ("xor", n, term())
        return n

    def expr():
        n = xor_term()
        while peek() == "OR":
            take()
            n = ("or", n, xor_term())
        return n

    node = expr()
    if idx != len(tokens):
        raise CypherUnsupported(f"trailing tokens in WHERE: {body!r}")
    return node


def _mask_strings(text: str) -> tuple[str, list[str]]:
    """Replace single-quoted literals with ``\\x00<i>\\x00`` sentinels so
    clause splitting and keyword screening never look inside them —
    ``WHERE n.title = 'RETURN of the King'`` must not split on RETURN."""
    table: list[str] = []

    def repl(m: re.Match) -> str:
        table.append(m.group(1))
        return f"\x00{len(table) - 1}\x00"

    return _STRING_LIT_RE.sub(repl, text), table


def _clause_split_outside_brackets(masked: str) -> list[str]:
    """``_CLAUSE_RE.split`` that ignores keyword hits inside ``[…]`` or
    ``(…)`` — list comprehensions carry WHERE (and ``|``) inside their
    brackets, and list PREDICATES (``all(x IN xs WHERE …)``) carry it
    inside their parens; neither must open a new clause. Relationship
    and node patterns also use brackets/parens but never contain clause
    keywords at depth, so depth tracking is safe for all. Braces count
    too: existential subqueries (``EXISTS { MATCH … }``) legally carry
    clause keywords inside ``{…}`` and must stay one clause body.
    Returns the same [pre, kw, body, kw, body, …] shape as ``re.split``
    with one capture group."""
    depth = 0
    depths = []
    for ch in masked:
        if ch in "[({":
            depth += 1
        depths.append(depth)
        if ch in "])}":
            depth -= 1
    parts: list[str] = []
    last = 0
    for m in _CLAUSE_RE.finditer(masked):
        if depths[m.start()] > 0:
            continue
        parts.append(masked[last:m.start()])
        parts.append(m.group(1))
        last = m.end()
    parts.append(masked[last:])
    return parts


def split_clauses_masked(query: str) -> tuple[list[_Clause], list[str]]:
    """Split a statement into top-level clauses plus the string-literal
    table. String literals are masked first, so quoted clause keywords
    cannot confuse the split; parameters stay the preferred value
    channel. Clause bodies carry ``\\x00<i>\\x00`` sentinels that index
    into the returned table."""
    masked, lits = _mask_strings(" ".join(query.split()))
    # `STARTS WITH` / `ENDS WITH` carry the WITH clause keyword inside a
    # two-word operator — fold them to one \w token BEFORE the clause
    # split so the pipeline boundary regex cannot fire mid-predicate
    # (the op grammar accepts both spellings)
    masked = re.sub(r"(?i)(?<![.$\w])STARTS\s+WITH\b", "STARTS_WITH", masked)
    masked = re.sub(r"(?i)(?<![.$\w])ENDS\s+WITH\b", "ENDS_WITH", masked)
    bad = _UNSUPPORTED_KEYWORDS.search(masked)
    if bad:
        raise CypherUnsupported(f"{bad.group(0).upper()} is outside the subset")
    parts = _clause_split_outside_brackets(masked)
    lead_optional = False
    if parts[0].strip():
        # statement-LEADING `OPTIONAL MATCH` is legal openCypher (the
        # existence-check idiom: `OPTIONAL MATCH (…) WITH count(*) …`);
        # OPTIONAL is not a clause keyword, so it lands as dangling
        # head text before the first MATCH — fold it in
        if (
            parts[0].strip().upper() == "OPTIONAL"
            and len(parts) > 1
            and parts[1].upper() == "MATCH"
        ):
            lead_optional = True
        else:
            raise CypherUnsupported(
                f"statement must start with a clause: {parts[0]!r}"
            )
    clauses = []
    for i in range(1, len(parts), 2):
        clauses.append(_Clause(parts[i].upper(), parts[i + 1].strip().rstrip(",")))
    if lead_optional:
        clauses[0].kind = "OPTIONAL_MATCH"
    # OPTIONAL is not a clause keyword, so "… OPTIONAL MATCH (…)" leaves
    # a dangling OPTIONAL at the END of the previous clause body — fold
    # it into the following MATCH as its own clause kind
    for j in range(1, len(clauses)):
        prev = clauses[j - 1]
        if clauses[j].kind == "MATCH" and re.search(
            r"(?<![.$\w])OPTIONAL$", prev.body, re.IGNORECASE
        ):
            prev.body = prev.body[: -len("OPTIONAL")].rstrip()
            clauses[j].kind = "OPTIONAL_MATCH"
    bad_opt = next(
        (
            c
            for c in clauses
            if c.kind != "OPTIONAL_MATCH"
            and re.search(r"(?<![.$\w])OPTIONAL(?![\w$])", c.body, re.IGNORECASE)
        ),
        None,
    )
    if bad_opt:
        raise CypherUnsupported("OPTIONAL outside OPTIONAL MATCH is outside the subset")
    if not clauses:
        raise CypherUnsupported("empty statement")
    # bare-arrow shorthand — `(a)-->(b)`, `(a)<--(b)`, `(a)--(b)` are
    # openCypher sugar for the empty-bracket forms; normalize in the
    # pattern-bearing clauses only (WHERE/RETURN keep their text — a
    # parenthesized double negative `(x)--(1)` is subtraction there)
    for c in clauses:
        if c.kind in ("MATCH", "OPTIONAL_MATCH", "MERGE", "CREATE"):
            c.body = re.sub(r"\)\s*-->\s*\(", ")-[]->(", c.body)
            c.body = re.sub(r"\)\s*<--\s*\(", ")<-[]-(", c.body)
            c.body = re.sub(r"\)\s*--\s*\(", ")-[]-(", c.body)
    return clauses, lits


def split_clauses(query: str) -> list[_Clause]:
    """Clause split without the literal table (bodies keep sentinels for
    any quoted literal — use :func:`split_clauses_masked` to resolve)."""
    return split_clauses_masked(query)[0]


def _parse_props(props: str | None) -> list[tuple[str, str]]:
    if not props:
        return []
    pairs = _PROP_PAIR_RE.findall(props)
    inner = props.strip()[1:-1].strip()
    if inner and len(pairs) != len([p for p in inner.split(",") if p.strip()]):
        raise CypherUnsupported(f"only {{prop: $param}} maps supported: {props!r}")
    return pairs


def _parse_write_props(
    props: str | None, lits: list[str]
) -> list[tuple[str, object]]:
    """Write-side prop map: values may be $params (encoded as the param
    name), literals — quoted strings / numbers, the tutorial shape
    ``CREATE (a:Person {name: 'Alice', age: 30})`` — encoded as
    ``("lit", value)``, or FRAME-INDEPENDENT expressions —
    ``MERGE (m:M {k: toString($i)})`` — encoded as ``("expr", raw)``
    and compiled at flush time against the batch params frame
    (VERDICT r12 missing #3: the a55 expression compiler already owned
    the machinery; row-dependent values — ``a.title`` — still refuse
    there because no node alias is bound in a write map)."""
    if not props:
        return []
    inner = props.strip()[1:-1].strip()
    if not inner:
        return []
    out: list[tuple[str, object]] = []
    for part in _split_top_commas(inner):
        m = re.match(r"^(\w+)\s*:\s*(.+)$", part.strip(), re.DOTALL)
        if not m:
            raise CypherUnsupported(
                f"unsupported prop map entry: {part!r}"
            )
        prop, raw = m.group(1), m.group(2).strip()
        if re.fullmatch(r"\$\w+", raw):
            out.append((prop, raw[1:]))
        elif re.fullmatch(r"\x00\d+\x00|-?\d+(?:\.\d+)?", raw):
            out.append((prop, ("lit", _where_value(raw, lits, None))))
        else:
            out.append((prop, ("expr", raw)))
    return out


def _parse_value_props(props: str | None) -> list[tuple[str, str]]:
    """Read-side variant of :func:`_parse_props`: values may be params
    OR literals; returns (prop, raw value token) pairs — `$p` for
    params, the masked/number token otherwise."""
    if not props:
        return []
    pairs = _PROP_VALUE_PAIR_RE.findall(props)
    inner = props.strip()[1:-1].strip()
    if inner and len(pairs) != len([p for p in inner.split(",") if p.strip()]):
        raise CypherUnsupported(
            f"only {{prop: $param | literal}} maps supported: {props!r}"
        )
    return pairs


def _strip_endpoint_props(pat: str) -> tuple[str, str | None, str | None]:
    """Pop inline property maps off a path pattern's endpoint nodes —
    ``(a:Article {link: $l})-[:T*1..4]-(b {link: $m})`` becomes
    ``(a:Article)-[:T*1..4]-(b)`` plus the two raw ``{…}`` texts (left
    endpoint first) — so the shortestPath / allShortestPaths regexes
    (whose endpoints admit only alias+label) can match. The caller
    folds the maps into pushed equality predicates: Neo4j treats the
    inline-map form as sugar for the equivalent WHERE, and Catalyst
    plants the equalities into the endpoint node scans exactly like
    the WHERE form, so the two-specific-nodes idiom never ladders the
    whole label. A relationship's own ``{…}`` sits inside ``[…]``
    brackets and is untouched."""
    left = right = None
    lm = re.match(
        r"^\(\s*(?P<alias>\w+)?\s*(?P<label>:\s*\w+(?:\s*[|:]\s*\w+)*)?\s*"
        r"(?P<props>\{[^{}]*\})\s*\)",
        pat,
    )
    if lm:
        left = lm.group("props")
        pat = (
            f"({lm.group('alias') or ''}{lm.group('label') or ''})"
            + pat[lm.end():]
        )
    rm = re.search(
        r"\(\s*(?P<alias>\w+)?\s*(?P<label>:\s*\w+(?:\s*[|:]\s*\w+)*)?\s*"
        r"(?P<props>\{[^{}]*\})\s*\)$",
        pat,
    )
    if rm:
        right = rm.group("props")
        pat = (
            pat[: rm.start()]
            + f"({rm.group('alias') or ''}{rm.group('label') or ''})"
        )
    return pat, left, right


def _split_top_commas(s: str) -> list[str]:
    """Split on commas not nested inside (), [] or {}."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [x for x in out if x]


# --------------------------------------------------------------------------
# execution
# --------------------------------------------------------------------------


@dataclass
class CypherResult:
    """What ``session.run`` hands back, split into the two things the
    reference consumes: rows (``result``) and ``summary.counters``.
    ``plan`` carries the formatted Spark physical plan for
    ``EXPLAIN``/``PROFILE`` statements (``rows`` additionally holds the
    executed row count under ``PROFILE``)."""

    df: DataFrame | None
    summary: WriteSummary | None
    plan: str | None = None
    rows: int | None = None


_DELETE_RE = re.compile(
    r"^(?P<head>.+?)\s+(?P<detach>DETACH\s+)?DELETE\s+"
    r"(?P<alias>\w+(?:\s*,\s*\w+)*)\s*$",
    re.IGNORECASE | re.DOTALL,
)

_REMOVE_RE = re.compile(
    r"^(?P<head>.+?)\s+REMOVE\s+"
    r"(?P<items>\w+\s*[.:]\s*\w+(?:\s*,\s*\w+\s*[.:]\s*\w+)*)\s*$",
    re.IGNORECASE | re.DOTALL,
)

# `n:Extra` — a secondary-label SET/REMOVE item (vs `n.prop` for props)
_LABEL_ITEM_RE = re.compile(r"^(?P<alias>\w+)\s*:\s*(?P<label>\w+)$")


def _run_text_set_labels(
    spark, um, pairs, unmask, params, store, remove: bool = False
) -> CypherResult:
    """``MATCH (n:L …) SET n:Extra[, …]`` / ``… REMOVE n:Extra`` — edit
    the node's secondary-label set (the ``_labels`` prop: sorted,
    ','-joined, duplicate-free, primary excluded) through the same
    bucketed ``merge_nodes`` upsert as property SET. ``labels(n)`` and
    the ``(n:A:B)`` conjunction scan read {primary} ∪ ``_labels``; the
    PRIMARY (storage) label cannot be REMOVEd — it is the partition
    key. Counters book one ``properties_set`` cell per touched node."""
    aliases_seen = {a for a, _ in pairs}
    if len(aliases_seen) != 1:
        raise CypherUnsupported("label items must all target one alias")
    alias = aliases_seen.pop()
    labels = [lb for _, lb in pairs]
    if len(set(labels)) != len(labels):
        raise CypherUnsupported("duplicate label in SET/REMOVE label items")
    head_clauses, head_lits = split_clauses_masked(unmask(um.group("head")))
    primary = _head_match(head_clauses, alias)
    if remove and primary in labels:
        raise CypherUnsupported(
            f"cannot REMOVE the primary label {primary!r} (the storage/"
            "partition label); DELETE the node instead"
        )
    nodes = store.nodes()
    if nodes is None:
        return CypherResult(None, WriteSummary())
    g = _store_graph(store, nodes)
    df = _run_read(
        head_clauses + [_Clause("RETURN", alias)], g, head_lits, params
    )
    keys = df.select(F.col(alias)["key"].alias("_k")).distinct()
    cur_labels = (
        F.coalesce(F.col(EXTRA_LABELS), F.lit(""))
        if EXTRA_LABELS in nodes.columns
        else F.lit("")
    )
    cur = nodes.filter(F.col("label") == primary).select(
        F.col("key").alias("_k"), cur_labels.alias("_cur")
    )
    matched = keys.join(cur, on="_k")
    arr = F.filter(F.split(F.col("_cur"), ","), lambda x: x != "")
    if remove:
        new_arr = F.array_except(arr, F.array(*[F.lit(lb) for lb in labels]))
    else:
        new_arr = F.filter(
            F.array_distinct(
                F.concat(arr, F.array(*[F.lit(lb) for lb in labels]))
            ),
            lambda x: x != primary,
        )
    updates = matched.select(
        "_k", F.array_join(F.array_sort(new_arr), ",").alias(EXTRA_LABELS)
    )
    summary = store.merge_nodes(
        updates, label=primary, key_col="_k", prop_cols=[EXTRA_LABELS]
    )
    return CypherResult(None, summary)


def _head_match(head_clauses, alias, allow_unlabeled: bool = False):
    """Shared by DELETE/REMOVE/SET: the head must be one node MATCH
    binding ``alias``; returns its label. With ``allow_unlabeled``, an
    all-nodes MATCH (``MATCH (u) SET …``) returns None and the caller
    fans the write out per label."""
    label = None
    matched = False
    for c in head_clauses:
        if c.kind == "MATCH":
            n = _NODE_RE.match(c.body)
            if not n or (n.group("alias") or "n") != alias:
                raise CypherUnsupported(
                    "statement requires a single node MATCH binding the target alias"
                )
            matched = True
            label = _single_rel_type(n.group("label"), "this statement's label")
    if label is None and not (allow_unlabeled and matched):
        raise CypherUnsupported("statement requires MATCH (alias:Label ...)")
    return label


_WRITE_HOP_RE = re.compile(
    r"^\s*(?:(?P<lt><-)|-)\s*\[(?P<rel>[^\]]*)\]\s*(?:(?P<rt>->)|-)\s*"
    r"(?P<node>\([^()]*\))"
)


def _split_write_path(part: str, mint_base: int) -> list[str] | None:
    """Decompose an N-hop CREATE/MERGE path pattern —
    ``(a:L {…})-[:R1]->(b:M {…})<-[:R2]-(c:N {…})`` — into its node
    patterns plus one bare-alias relationship pattern per hop (the
    repo's canonical write shape): each element upserts independently,
    exactly what separate MERGE clauses do here (Neo4j's whole-path
    MERGE matches the path atomically first; the per-element upsert is
    this engine's documented MERGE semantics). Returns None when the
    part is not a splittable path: a lone node pattern, or a single
    bare-alias hop (those keep the existing bound-endpoints rel path).
    Anonymous labeled nodes get minted internal aliases; bare-alias
    nodes (``(y)``) emit no node part — they must be bound elsewhere."""
    pt = part.strip()
    m0 = re.match(r"^(?P<node>\([^()]*\))", pt)
    if not m0:
        return None
    node_txts = [m0.group("node")]
    hops: list[tuple[str | None, str, str | None]] = []
    rest = pt[m0.end():]
    if not rest:
        return None  # lone node pattern — not a path
    while rest:
        hm = _WRITE_HOP_RE.match(rest)
        if not hm:
            return None
        hops.append((hm.group("lt"), hm.group("rel"), hm.group("rt")))
        node_txts.append(hm.group("node"))
        rest = rest[hm.end():]
    if len(hops) == 1 and not any(
        ch in (node_txts[0] + node_txts[1]) for ch in (":", "{")
    ):
        # single bare-alias hop `(a)-[r:T]->(b)` — the bound-endpoints
        # rel path serves it directly
        return None
    out: list[str] = []
    aliases: list[str] = []
    for i, txt in enumerate(node_txts):
        am = re.match(r"^\(\s*(\w+)?", txt)
        a = am.group(1)
        if not a:
            a = f"_path{mint_base}n{i}"
            txt = "(" + a + txt[1:]
        aliases.append(a)
        if ":" in txt or "{" in txt:
            out.append(txt)
    for i, (lt, rel, rt) in enumerate(hops):
        a1, a2 = aliases[i], aliases[i + 1]
        if lt and rt:
            raise CypherUnsupported(
                f"relationship pattern cannot point both ways: {part!r}"
            )
        if lt:
            out.append(f"({a1})<-[{rel}]-({a2})")
        elif rt:
            out.append(f"({a1})-[{rel}]->({a2})")
        else:
            out.append(f"({a1})-[{rel}]-({a2})")
    return out


def _node_endpoint_label(head_clauses, alias):
    """If the head's MATCH is a relationship pattern binding ``alias``
    as a LABELED node endpoint (``MATCH (a:Article)-[r:T]->(p:Pub)``
    with alias 'a' or 'p'), return that endpoint's label — the target
    of Neo4j's select-via-pattern node update ``MATCH (a)-[:T]->(p)
    SET a.seen = 1``. None when the head is not that shape (single-node
    statements keep the _head_match resolution)."""
    for c in head_clauses:
        if c.kind != "MATCH":
            continue
        body, _lp, _rp = _strip_endpoint_props(c.body)
        rm2 = _REL_RE.match(body)
        if not rm2 or rm2.group("star"):
            continue
        if rm2.group("src_alias") == alias and rm2.group("src_label"):
            return _single_rel_type(
                rm2.group("src_label"), "pattern-endpoint SET"
            )
        if rm2.group("dst_alias") == alias and rm2.group("dst_label"):
            return _single_rel_type(
                rm2.group("dst_label"), "pattern-endpoint SET"
            )
    return None


def _rel_head(head_clauses, alias):
    """If the head's MATCH is a relationship pattern binding ``alias`` as
    its REL alias (``MATCH (a:L1)-[r:T]->(b:L2)`` with alias == 'r'),
    validate + orient it and return ``(rel_type, sa, da, s_label,
    d_label)``; return None when ``alias`` is not a rel alias (node
    statement). Shared by SET r.p / REMOVE r.p (and mirrors the DELETE r
    resolution): writes address one stored (src, dst, rel_type) key, so
    the pattern must be directed, single-typed, with labeled endpoints."""
    for c in head_clauses:
        if c.kind != "MATCH":
            continue
        # inline endpoint property maps are legal on the head (they
        # compile to pushed predicates in the read pass) — the SHAPE
        # detection runs on the props-stripped text
        body2, _rl, _rr = _strip_endpoint_props(c.body)
        rm2 = _REL_RE.match(body2)
        if rm2 and rm2.group("rel_alias") == alias:
            if rm2.group("star"):
                raise CypherUnsupported(
                    "variable-length patterns are unsupported in relationship writes"
                )
            if not rm2.group("rel_type"):
                raise CypherUnsupported(
                    "relationship writes need a typed relationship pattern"
                )
            _single_rel_type(rm2.group("rel_type"), "relationship write")
            direction = _rel_direction(rm2)
            if direction == "both":
                raise CypherUnsupported(
                    "relationship writes need a directed relationship pattern"
                )
            sa = rm2.group("src_alias") or "a"
            da = rm2.group("dst_alias") or "b"
            s_label = _single_rel_type(
                rm2.group("src_label"), "relationship write endpoint"
            )
            d_label = _single_rel_type(
                rm2.group("dst_label"), "relationship write endpoint"
            )
            if direction == "in":
                sa, da = da, sa
                s_label, d_label = d_label, s_label
            if not s_label or not d_label:
                raise CypherUnsupported(
                    "relationship writes need labeled endpoints "
                    "(keys resolve per label)"
                )
            return rm2.group("rel_type"), sa, da, s_label, d_label
    return None


def _run_text_remove(spark, rm, lits, params, store) -> CypherResult:
    """``MATCH (n:Label …) [WHERE …] REMOVE n.p1[, n.p2 …]`` — the
    property-erase statement, compiled onto
    ``GraphStore.remove_props`` (SET NULL keeps the stored value per
    Cypher's coalesce semantics; REMOVE is the explicit erase — Neo4j's
    SET/REMOVE split)."""

    def unmask(text: str) -> str:
        return re.sub(
            r"\x00(\d+)\x00", lambda m: "'" + lits[int(m.group(1))] + "'", text
        )

    items = [i.strip() for i in rm.group("items").split(",")]
    label_items = [_LABEL_ITEM_RE.match(i) for i in items]
    if any(label_items):
        # `MATCH (n:L …) REMOVE n:Extra[, …]` — secondary-label erase
        if not all(label_items):
            raise CypherUnsupported(
                "REMOVE mixes label items (n:Extra) with property items — "
                "use separate statements"
            )
        return _run_text_set_labels(
            spark,
            rm,
            [m.groups() for m in label_items],
            unmask,
            params,
            store,
            remove=True,
        )
    aliases_seen = {i.split(".")[0] for i in items}
    head_clauses, head_lits = split_clauses_masked(unmask(rm.group("head")))
    nodes = store.nodes()
    if nodes is None:
        return CypherResult(None, WriteSummary())
    g = _store_graph(store, nodes)
    if len(aliases_seen) != 1:
        # multi-target REMOVE (`REMOVE a.seen, r.w, p.flag`) — the
        # erase twin of multi-target SET: one head read carrying every
        # group's merge keys (persisted), then one bucketed erase per
        # alias group (remove_props / remove_edge_props)
        return _run_text_remove_multi(
            spark, rm, items, params, store, unmask, head_clauses, g
        )
    alias = aliases_seen.pop()
    props = [i.split(".")[1] for i in items]
    # `MATCH (a:L1)-[r:T]->(b:L2) [WHERE …] REMOVE r.p` — relationship
    # property erase: endpoint keys feed remove_edge_props (a79)
    rel = _rel_head(head_clauses, alias)
    if rel is not None:
        rel_type, sa, da, s_label, d_label = rel
        ret = _Clause("RETURN", f"{sa}.key AS _sk, {da}.key AS _dk")
        df = _run_read(head_clauses + [ret], g, head_lits, params)
        return CypherResult(
            None,
            store.remove_edge_props(
                df, rel_type, s_label, "_sk", d_label, "_dk", props
            ),
        )
    # node endpoint selected via a relationship pattern — `MATCH
    # (a:Article)-[r:T]->(p:Pub) REMOVE a.seen`: the endpoint's label
    # keys the erase, same as the SET twin
    label = _node_endpoint_label(head_clauses, alias)
    if label is None:
        label = _head_match(head_clauses, alias)
    df = _run_read(head_clauses + [_Clause("RETURN", alias)], g, head_lits, params)
    keys = df.select(F.col(alias)["key"].alias("_k"))
    return CypherResult(None, store.remove_props(keys, label, "_k", props))


def _run_text_remove_multi(
    spark, rm, items, params, store, unmask, head_clauses, g
) -> CypherResult:
    """Multi-target REMOVE — ``MATCH (a:L1)-[r:T]->(p:L2) REMOVE
    a.seen, r.w, p.flag``. One read-path pass over the head collects
    every alias group's merge keys into a persisted frame, then each
    group erases through its bucketed writer path (remove_props for
    node aliases — single-node heads or relationship-pattern
    endpoints — remove_edge_props for the rel alias). Absent props
    stay Neo4j's silent no-op inside each writer call."""
    groups: dict[str, list[str]] = {}
    for i in items:
        a, p = i.split(".", 1)
        groups.setdefault(a, []).append(p)
    plans = []  # ('rel', rel_type, s_label, d_label, gi, props) | ('node', label, gi, props)
    sel: list[str] = []
    for gi, (a, props) in enumerate(groups.items()):
        rel = _rel_head(head_clauses, a)
        if rel is not None:
            rel_type, sa, da, s_label, d_label = rel
            sel += [f"{sa}.key AS __k{gi}s", f"{da}.key AS __k{gi}d"]
            plans.append(("rel", rel_type, s_label, d_label, gi, props))
        else:
            label = _node_endpoint_label(head_clauses, a)
            if label is None:
                label = _head_match(head_clauses, a)
            sel.append(f"{a}.key AS __k{gi}")
            plans.append(("node", label, gi, props))
    upd_clauses, upd_lits = split_clauses_masked(
        unmask(rm.group("head")) + " RETURN " + ", ".join(sel)
    )
    keys = _run_read(upd_clauses, g, upd_lits, params).persist()
    try:
        summary = WriteSummary()
        for plan in plans:
            if plan[0] == "rel":
                _, rel_type, s_label, d_label, gi, props = plan
                frame = keys.select(
                    F.col(f"__k{gi}s").alias("_sk"),
                    F.col(f"__k{gi}d").alias("_dk"),
                )
                summary = summary + store.remove_edge_props(
                    frame, rel_type, s_label, "_sk", d_label, "_dk", props
                )
            else:
                _, label, gi, props = plan
                frame = keys.select(F.col(f"__k{gi}").alias("_k"))
                summary = summary + store.remove_props(
                    frame, label, "_k", props
                )
    finally:
        keys.unpersist()
    return CypherResult(None, summary)


def _run_text_delete(spark, dm, lits, params, store) -> CypherResult:
    """``MATCH (n:Label …) [WHERE …] [DETACH] DELETE n`` — the batch
    delete statement, compiled onto ``GraphStore.delete_nodes`` (which
    keeps Neo4j semantics: plain DELETE refuses nodes with incident
    edges; DETACH removes them too, and counters report both). The head
    resolves through the normal read path — inline props, WHERE
    (boolean combinations included), params — so anything MATCHable is
    deletable."""

    def unmask(text: str) -> str:
        return re.sub(
            r"\x00(\d+)\x00", lambda m: "'" + lits[int(m.group(1))] + "'", text
        )

    head_clauses, head_lits = split_clauses_masked(unmask(dm.group("head")))
    alias = dm.group("alias")
    nodes = store.nodes()
    if nodes is None:
        return CypherResult(None, WriteSummary())
    g = _store_graph(store, nodes)
    if "," in alias:
        # `[DETACH] DELETE r, b` / `DELETE a, b` — multi-target delete:
        # every target's doom keys pin from ONE pre-delete head read
        # (Neo4j binds once, then deletes atomically — sequential
        # re-matching would lose later targets once earlier deletions
        # shrink the match), then deletes apply relationship targets
        # FIRST (so a plain-DELETE node whose edges die in the same
        # statement passes the incident-edge check, exactly Neo4j).
        targets = [a.strip() for a in alias.split(",")]
        detach = dm.group("detach") is not None
        rel_heads = {}
        for t in targets:
            rh = _rel_head(head_clauses, t)
            if rh is not None:
                if detach:
                    raise CypherUnsupported(
                        "DETACH applies to nodes, not relationships"
                    )
                rel_heads[t] = rh
        plans = []
        sel: list[str] = []
        for gi, t in enumerate(targets):
            if t in rel_heads:
                rel_type, sa2, da2, s_label, d_label = rel_heads[t]
                if not s_label or not d_label:
                    raise CypherUnsupported(
                        "multi-target DELETE needs labeled rel endpoints"
                    )
                sel += [f"{sa2}.key AS __d{gi}s", f"{da2}.key AS __d{gi}d"]
                plans.append(("rel", rel_type, s_label, d_label, gi))
            else:
                lb = _node_endpoint_label(head_clauses, t)
                if lb is None:
                    lb = _head_match(head_clauses, t)
                sel.append(f"{t}.key AS __d{gi}")
                plans.append(("node", lb, gi))
        upd_clauses, upd_lits = split_clauses_masked(
            unmask(dm.group("head")) + " RETURN " + ", ".join(sel)
        )
        doomed = _run_read(upd_clauses, g, upd_lits, params).persist()
        try:
            summary = WriteSummary()
            # relationships first, then nodes
            for plan in [p for p in plans if p[0] == "rel"] + [
                p for p in plans if p[0] == "node"
            ]:
                if plan[0] == "rel":
                    _, rel_type, s_label, d_label, gi = plan
                    summary = summary + store.delete_edges(
                        doomed.select(
                            F.col(f"__d{gi}s").alias("_sk"),
                            F.col(f"__d{gi}d").alias("_dk"),
                        ),
                        rel_type, s_label, "_sk", d_label, "_dk",
                    )
                else:
                    _, lb, gi = plan
                    summary = summary + store.delete_nodes(
                        doomed.select(F.col(f"__d{gi}").alias("_k")),
                        label=lb, key_col="_k", detach=detach,
                    )
        finally:
            doomed.unpersist()
        return CypherResult(None, summary)
    # `MATCH (a:L1)-[r:T]->(b:L2) [WHERE …] DELETE r` — relationship
    # deletion: the head resolves through the read path, endpoint keys
    # feed the batch edge delete (nodes untouched)
    for c in head_clauses:
        if c.kind != "MATCH":
            continue
        # shape detection on the props-stripped text (inline endpoint
        # maps push as read predicates; see _rel_head)
        body2, _dl, _dr = _strip_endpoint_props(c.body)
        rm2 = _REL_RE.match(body2)
        if rm2 and rm2.group("rel_alias") == alias:
            if dm.group("detach"):
                raise CypherUnsupported(
                    "DETACH applies to nodes, not relationships"
                )
            if rm2.group("star"):
                raise CypherUnsupported(
                    "variable-length patterns are unsupported in DELETE"
                )
            # untyped `[r]` (r15): fan out per MATCHED relationship type
            # (bounded by the store's type count) — each type's doomed
            # edges go through the same bucketed delete
            del_rel_type = rm2.group("rel_type")
            if del_rel_type:
                _single_rel_type(del_rel_type, "DELETE r")
            direction = _rel_direction(rm2)
            if direction == "both":
                raise CypherUnsupported(
                    "DELETE r needs a directed relationship pattern"
                )
            sa = rm2.group("src_alias") or "a"
            da = rm2.group("dst_alias") or "b"
            s_label = _single_rel_type(rm2.group("src_label"), "DELETE r endpoint")
            d_label = _single_rel_type(rm2.group("dst_label"), "DELETE r endpoint")
            if direction == "in":
                sa, da = da, sa
                s_label, d_label = d_label, s_label
            # unlabeled endpoints (r15): `MATCH ()-[r:T]->() DELETE r`,
            # the wipe-edges-of-a-type idiom — keys resolve per label,
            # so the labeled path can't serve it; instead the matched
            # frame projects the endpoint NODE IDS and the doom keys go
            # through delete_edges_by_ids (same null-safe prop-extended
            # doom key, same partial bucket rewrite)
            id_based = not s_label or not d_label
            # Project the matched relationships' property values alongside
            # the endpoint keys: a WHERE on r's props binds only SOME of
            # the parallel (src, dst, rel_type) copies, so the doom key
            # must extend to the property values or the delete would take
            # unmatched siblings down too (writer.delete_edges null-safe
            # prop matching).
            edf = store.edges()
            if edf is None:
                # an edgeless store matches zero relationships — Neo4j
                # deletes nothing rather than erroring
                return CypherResult(None, WriteSummary())
            rel_props = [
                c
                for c in edf.columns
                if c not in ("src", "dst", "rel_type", BUCKET_COL)
            ]
            if id_based:
                ret_items = [f"id({sa}) AS _sid", f"id({da}) AS _did"]
            else:
                ret_items = [f"{sa}.key AS _sk", f"{da}.key AS _dk"]
            ret_items += [
                f"{rm2.group('rel_alias')}.{p} AS _rp_{p}" for p in rel_props
            ]
            if not del_rel_type:
                ret_items.append(f"type({rm2.group('rel_alias')}) AS _rt")
            ret = _Clause("RETURN", ", ".join(ret_items))
            df = _run_read(head_clauses + [ret], g, head_lits, params)
            prop_map = {p: f"_rp_{p}" for p in rel_props}

            def _del_one(frame: DataFrame, rt: str) -> WriteSummary:
                if id_based:
                    return store.delete_edges_by_ids(
                        frame, rt, "_sid", "_did", rel_prop_cols=prop_map
                    )
                return store.delete_edges(
                    frame, rt, s_label, "_sk", d_label, "_dk",
                    rel_prop_cols=prop_map,
                )

            if del_rel_type:
                return CypherResult(None, _del_one(df, del_rel_type))
            df = df.persist()
            try:
                types = sorted(
                    r["_rt"] for r in df.select("_rt").distinct().collect()
                )
                summary = WriteSummary()
                for rt in types:
                    summary = summary + _del_one(
                        df.filter(F.col("_rt") == rt).drop("_rt"), rt
                    )
            finally:
                df.unpersist()
            return CypherResult(None, summary)
    # node endpoint selected via a relationship pattern — `MATCH
    # (a:Article)-[r:T]->(p:Pub) DETACH DELETE a`: the endpoint's label
    # keys the delete; plain DELETE still refuses (the matched node has
    # an incident edge by construction — Neo4j refuses the statement)
    label = _node_endpoint_label(head_clauses, alias)
    if label is None:
        label = _head_match(head_clauses, alias, allow_unlabeled=True)
    df = _run_read(head_clauses + [_Clause("RETURN", alias)], g, head_lits, params)
    detach = dm.group("detach") is not None
    if label is not None:
        keys = df.select(F.col(alias)["key"].alias("_k"))
        summary = store.delete_nodes(
            keys, label=label, key_col="_k", detach=detach
        )
        return CypherResult(None, summary)
    # `MATCH (n) [DETACH] DELETE n` — the wipe-the-graph idiom (r15):
    # deletes key on ONE label's bucketed partition at a time, so the
    # matched batch fans out per label — a bounded driver loop (label
    # count ≤ partition-dir count), the projected (key, label) frame
    # persisted so each label's delete re-reads data, not the plan
    sel = df.select(
        F.col(alias)["key"].alias("_k"), F.col(alias)["label"].alias("_lbl")
    ).persist()
    try:
        if not detach:
            # Neo4j refuses the WHOLE statement when any matched node
            # still has relationships — check up front so the per-label
            # loop never applies partially (one semi-join + limit-1)
            edf = store.edges()
            if edf is not None:
                doomed_ids = nodes.join(
                    sel,
                    (nodes["label"] == sel["_lbl"])
                    & (nodes["key"] == sel["_k"]),
                    "left_semi",
                ).select(NODE_ID)
                endpoint_ids = (
                    edf.select(F.col("src").alias(NODE_ID))
                    .unionByName(edf.select(F.col("dst").alias(NODE_ID)))
                )
                connected = doomed_ids.join(
                    endpoint_ids, on=NODE_ID, how="left_semi"
                )
                if connected.limit(1).count() > 0:
                    raise ValueError(
                        "cannot DELETE nodes that still have relationships"
                        " — use DETACH DELETE (Neo4j refuses the whole"
                        " statement; nothing was deleted)"
                    )
        lbs = sorted(
            r["_lbl"] for r in sel.select("_lbl").distinct().collect()
        )
        summary = WriteSummary()
        for lb in lbs:
            summary = summary + store.delete_nodes(
                sel.filter(F.col("_lbl") == lb).select("_k"),
                label=lb,
                key_col="_k",
                detach=detach,
            )
    finally:
        sel.unpersist()
    return CypherResult(None, summary)


# CALL graft.<proc>({cfg}) YIELD cols [RETURN …] [ORDER BY …] [SKIP] [LIMIT]
_CALL_RE = re.compile(
    r"^CALL\s+(?P<ns>graft|db)\.(?P<proc>\w+)\s*\(\s*(?P<cfg>\{[^{}]*\})?\s*\)\s*"
    r"(?:YIELD\s+(?P<yields>\w+(?:\s*,\s*\w+)*))?\s*(?P<tail>.*)$",
    re.IGNORECASE | re.DOTALL,
)

_CALL_CFG_RE = re.compile(r"(\w+)\s*:\s*(\$\w+|\x00\d+\x00|-?\d+(?:\.\d+)?)")


def _run_text_call(
    spark: SparkSession,
    cm: re.Match,
    lits: list[str],
    params: dict | None,
    *,
    store: GraphStore | None,
    graph: Graph | None,
) -> CypherResult:
    """``CALL graft.<proc>({config}) YIELD cols …`` — the procedure
    router that makes the Python algorithm library reachable from
    statement text (the shape a Neo4j GDS user writes as
    ``CALL gds.pageRank.stream(...) YIELD nodeId, score``). Procedures:
    ``pagerank`` (maxIter, damping), ``cc``, ``scc`` (maxRounds),
    ``louvain`` (maxSweeps), ``label_propagation`` (maxIter),
    ``degrees``, ``bfs`` (start, label, maxHops), ``node_similarity`` /
    ``adamic_adar`` (topK, degreeCap[, metric]), ``k_core`` (k,
    maxRounds), ``k_truss`` (k), the landmark centralities
    ``closeness`` / ``betweenness`` / ``eccentricity`` (landmarks,
    maxHops), ``hits`` (maxIter), the whole-graph profiles
    ``triangle_count`` / ``clustering`` / ``assortativity``, plus
    ``weighted_sssp`` (start, label, maxRounds, weightProperty),
    ``random_walks`` / ``biased_walks`` (label, steps[, replica
    weights]), and ``modularity`` (maxIter, method:
    'label_propagation'|'cc') — the FULL Python algorithm library, one
    YIELD-validated route each. Node ids
    never leak into results — every
    yielded column is a natural key or a metric; unknown procedures,
    config keys, and YIELD names are refused by name."""
    from neo4j_graphdb_spark.graph import algorithms as alg

    if graph is None:
        if store is None:
            raise ValueError("CALL statement needs a Graph or GraphStore")
        nodes = store.nodes()
        if nodes is None:
            raise ValueError("store is empty")
        graph = _store_graph(store, nodes)
    nodes_df, edges_df = graph.nodes_df, graph.edges_df
    ns = cm.group("ns").lower()

    cfg_body = cm.group("cfg") or ""
    cfg_pairs = _CALL_CFG_RE.findall(cfg_body)
    inner = cfg_body.strip()[1:-1].strip() if cfg_body else ""
    if inner and len(cfg_pairs) != len([p for p in inner.split(",") if p.strip()]):
        raise CypherUnsupported(
            f"only {{key: $param | literal}} config maps supported: {cfg_body!r}"
        )
    cfg = {k: _where_value(v, lits, params) for k, v in cfg_pairs}
    # GDS-dialect config aliases: every Neo4j GDS doc/snippet spells
    # these the long way — accept both, normalize to the short form
    _cfg_alias = {
        "maxIterations": "maxIter",
        "iterations": "maxIter",
        "dampingFactor": "damping",
        "relationshipWeightProperty": "weightProperty",
        "tolerance": "tol",
    }
    cfg = {_cfg_alias.get(k, k): v for k, v in cfg.items()}

    # Validate the procedure name, config keys, and YIELD names BEFORE
    # dispatch: pagerank/scc/louvain run eagerly (per-superstep driver
    # actions) inside the call, so a typo must be refused upfront, not
    # after minutes of cluster work.
    known = {
        "pagerank": (
            {"maxIter", "damping", "weightProperty", "tol"}, ["key", "rank"]
        ),
        "cc": ({"maxIter"}, ["key", "comp"]),
        "connected_components": ({"maxIter"}, ["key", "comp"]),
        "degrees": (set(), ["key", "out_degree", "in_degree", "degree"]),
        "bfs": ({"start", "label", "maxHops"}, ["key", "dist"]),
        "louvain": ({"maxSweeps", "levels"}, ["key", "community"]),
        "scc": ({"maxRounds"}, ["key", "scc"]),
        "node_similarity": (
            {"topK", "degreeCap", "metric"},
            ["key1", "key2", "score", "rank"],
        ),
        "label_propagation": ({"maxIter"}, ["key", "community"]),
        "k_core": ({"k", "maxRounds"}, ["key", "degree"]),
        "k_truss": ({"k"}, ["key1", "key2"]),
        "closeness": (
            {"landmarks", "maxHops"},
            ["key", "n_reached", "harmonic_x12"],
        ),
        "betweenness": ({"landmarks", "maxHops"}, ["key", "betweenness"]),
        "eccentricity": (
            {"landmarks", "maxHops"},
            ["key", "n_reached", "ecc_lb"],
        ),
        "hits": ({"maxIter"}, ["key", "hub", "auth"]),
        "adamic_adar": (
            {"topK", "degreeCap"},
            ["key1", "key2", "score", "rank"],
        ),
        "triangle_count": (set(), ["triangles"]),
        "clustering": (set(), ["key", "degree", "triangles", "lcc"]),
        "assortativity": (set(), ["m_directed_pairs", "assortativity"]),
        "weighted_sssp": (
            {"start", "label", "maxRounds", "weightProperty"},
            ["key", "dist"],
        ),
        "random_walks": ({"label", "steps"}, ["walk", "step", "key"]),
        "biased_walks": (
            {"label", "steps", "wReturn", "wShared", "wFar"},
            ["walk", "step", "key"],
        ),
        "modularity": (
            {"maxIter", "method"},
            ["m", "n_communities", "intra_edges", "modularity"],
        ),
        "near_dup": (
            {"label", "prop", "threshold", "numHashes", "bands", "shingle",
             "hashMode"},
            ["key_a", "key_b", "jaccard"],
        ),
        "mis": ({"rounds", "hashMode"}, ["key", "state"]),
    }
    # Neo4j's schema-introspection namespace: db.labels() /
    # db.relationshipTypes() / db.propertyKeys() — the three procedures
    # every client/browser calls first. Config-free, tiny outputs.
    db_known = {
        "labels": (set(), ["label"]),
        "relationshiptypes": (set(), ["relationshipType"]),
        "propertykeys": (set(), ["propertyKey"]),
    }
    proc = cm.group("proc").lower()
    known_ns = db_known if ns == "db" else known
    if proc not in known_ns:
        raise CypherUnsupported(
            f"unknown procedure {ns}.{cm.group('proc')} (available: "
            + ", ".join(sorted(known_ns)) + ")"
        )
    known = known_ns
    allowed_cfg, yield_cols = known[proc]
    unknown_cfg = set(cfg) - allowed_cfg
    if unknown_cfg:
        raise CypherUnsupported(
            f"unknown config key(s) {sorted(unknown_cfg)} for graft.{proc}"
        )
    if cm.group("yields") is None:
        # bare `CALL proc()` — Neo4j returns every output column, in
        # the procedure's declared order
        yields = list(yield_cols)
        if cm.group("tail").strip():
            raise CypherUnsupported(
                "a CALL tail (RETURN/WHERE/ORDER BY/…) needs an "
                "explicit YIELD"
            )
    else:
        yields = [y.strip() for y in cm.group("yields").split(",")]
    for y in yields:
        if y not in yield_cols:
            raise CypherUnsupported(
                f"YIELD {y!r} is not a column of graft.{proc} "
                f"(yields: {yield_cols})"
            )

    key_of = nodes_df.select(F.col(NODE_ID).alias("_cid"), F.col("key").alias("_ckey"))

    def with_key(df: DataFrame, id_column: str, out_name: str) -> DataFrame:
        return (
            df.join(key_of, df[id_column] == F.col("_cid"))
            .drop("_cid", id_column)
            .withColumnRenamed("_ckey", out_name)
        )

    if ns == "db":
        if proc == "labels":
            # effective label universe: primaries ∪ the _labels sets
            eff = nodes_df.select(F.col("label"))
            if EXTRA_LABELS in nodes_df.columns:
                eff = eff.unionByName(
                    nodes_df.select(
                        F.explode(
                            F.split(
                                F.coalesce(F.col(EXTRA_LABELS), F.lit("")),
                                ",",
                            )
                        ).alias("label")
                    )
                )
            out = (
                eff.filter(F.col("label") != "").distinct().orderBy("label")
            )
        elif proc == "relationshiptypes":
            if edges_df is None:
                out = spark.createDataFrame([], "relationshipType string")
            else:
                out = (
                    edges_df.select(
                        F.col("rel_type").alias("relationshipType")
                    )
                    .distinct()
                    .orderBy("relationshipType")
                )
        else:  # propertykeys — schema-level: column names, not data
            reserved_n = {NODE_ID, "label", EXTRA_LABELS}
            reserved_e = {"src", "dst", "rel_type", BUCKET_COL}
            keys = {c for c in nodes_df.columns if c not in reserved_n} | {
                c
                for c in (edges_df.columns if edges_df is not None else [])
                if c not in reserved_e
            }
            out = spark.createDataFrame(
                [(k,) for k in sorted(keys)], "propertyKey string"
            )
    elif proc == "pagerank":
        wprop = cfg.pop("weightProperty", None)
        if wprop is not None and str(wprop) not in edges_df.columns:
            raise CypherUnsupported(
                f"graft.pagerank: edges have no {str(wprop)!r} property"
            )
        tol = cfg.pop("tol", None)
        res = alg.pagerank(
            nodes_df,
            edges_df,
            max_iter=int(cfg.pop("maxIter", 10)),
            damping=float(cfg.pop("damping", 0.85)),
            tol=None if tol is None else float(tol),
            weight_col=None if wprop is None else str(wprop),
        )
        out = with_key(res, "node_id", "key").select("key", "rank")
    elif proc in ("cc", "connected_components"):
        res = alg.connected_components(
            nodes_df, edges_df, max_iter=int(cfg.pop("maxIter", 20))
        )
        out = (
            with_key(res, "id", "key")
            .join(key_of, F.col("comp") == F.col("_cid"))
            .drop("_cid", "comp")
            .withColumnRenamed("_ckey", "comp")
            .select("key", "comp")
        )
    elif proc == "degrees":
        res = alg.degrees(edges_df)
        out = with_key(res, "id", "key").select(
            "key",
            F.col("out_degree").cast("bigint").alias("out_degree"),
            F.col("in_degree").cast("bigint").alias("in_degree"),
            F.col("degree").cast("bigint").alias("degree"),
        )
    elif proc == "bfs":
        start = cfg.pop("start", None)
        if start is None:
            raise CypherUnsupported("graft.bfs needs {start: <node key>}")
        label = cfg.pop("label", None)
        srcs = nodes_df
        if label is not None:
            srcs = srcs.filter(F.col("label") == str(label))
        srcs = srcs.filter(F.col("key") == str(start)).select(
            F.col(NODE_ID).alias("id")
        )
        res = alg.shortest_paths(
            edges_df, srcs, max_hops=int(cfg.pop("maxHops", 10))
        )
        out = with_key(res, "id", "key").select(
            "key", F.col("dist").cast("bigint").alias("dist")
        )
    elif proc == "louvain":
        levels = int(cfg.pop("levels", 1))
        if levels > 1:
            res = alg.louvain_multilevel(
                nodes_df,
                edges_df,
                max_sweeps=int(cfg.pop("maxSweeps", 20)),
                max_levels=levels,
            )
        else:
            res = alg.louvain_communities(
                nodes_df, edges_df, max_sweeps=int(cfg.pop("maxSweeps", 20))
            )
        out = (
            with_key(res, "node_id", "key")
            .join(key_of, F.col("community") == F.col("_cid"))
            .drop("_cid", "community")
            .withColumnRenamed("_ckey", "community")
            .select("key", "community")
        )
    elif proc == "scc":
        res = alg.strongly_connected_components(
            nodes_df.select(F.col(NODE_ID).alias("node_id")),
            edges_df,
            max_rounds=int(cfg.pop("maxRounds", 10)),
        )
        out = (
            with_key(res, "node_id", "key")
            .join(key_of, F.col("scc") == F.col("_cid"))
            .drop("_cid", "scc")
            .withColumnRenamed("_ckey", "scc")
            .select("key", "scc")
        )
    elif proc == "node_similarity":
        degree_cap = cfg.pop("degreeCap", None)
        res = alg.node_similarity(
            edges_df.select("src", "dst"),
            top_k=int(cfg.pop("topK", 5)),
            degree_cap=None if degree_cap is None else int(degree_cap),
            metric=str(cfg.pop("metric", "jaccard")),
        )
        out = res
        out = (
            out.join(key_of, out["a"] == F.col("_cid"))
            .drop("_cid", "a")
            .withColumnRenamed("_ckey", "key1")
        )
        out = (
            out.join(key_of, out["b"] == F.col("_cid"))
            .drop("_cid", "b")
            .withColumnRenamed("_ckey", "key2")
        )
        out = out.select(
            "key1",
            "key2",
            F.col("jaccard").alias("score"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    elif proc == "label_propagation":
        res = alg.label_propagation(
            nodes_df, edges_df, max_iter=int(cfg.pop("maxIter", 5))
        )
        out = (
            with_key(res, "id", "key")
            .join(key_of, F.col("lbl") == F.col("_cid"))
            .drop("_cid", "lbl")
            .withColumnRenamed("_ckey", "community")
            .select("key", "community")
        )
    elif proc == "k_core":
        res = alg.k_core(
            edges_df,
            k=int(cfg.pop("k", 2)),
            max_rounds=int(cfg.pop("maxRounds", 8)),
        )
        out = with_key(res, "id", "key").select(
            "key", F.col("degree").cast("bigint").alias("degree")
        )
    elif proc == "mis":
        # deterministic Luby maximal independent set (c112's substrate)
        res = alg.luby_mis(
            edges_df,
            rounds=int(cfg.pop("rounds", 8)),
            hash_mode=str(cfg.pop("hashMode", "xxhash64")),
        )
        out = with_key(res, "node", "key").select("key", "state")
    elif proc == "k_truss":
        res = alg.k_truss(edges_df, k=int(cfg.pop("k", 4)))
        out = with_key(res, "u", "key1")
        out = with_key(out, "v", "key2").select("key1", "key2")
    elif proc in ("closeness", "betweenness", "eccentricity"):
        kw = dict(
            n_landmarks=int(cfg.pop("landmarks", 8)),
            max_hops=int(cfg.pop("maxHops", 4)),
        )
        if proc == "closeness":
            res = alg.landmark_closeness(edges_df, **kw)
            keep = [
                F.col("n_reached").cast("bigint").alias("n_reached"),
                F.col("harmonic_x12").cast("bigint").alias("harmonic_x12"),
            ]
        elif proc == "betweenness":
            res = alg.landmark_betweenness(edges_df, **kw)
            keep = [F.col("betweenness").cast("bigint").alias("betweenness")]
        else:
            res = alg.landmark_eccentricity(edges_df, **kw)
            keep = [
                F.col("n_reached").cast("bigint").alias("n_reached"),
                F.col("ecc_lb").cast("bigint").alias("ecc_lb"),
            ]
        out = with_key(res, "id", "key").select("key", *keep)
    elif proc == "hits":
        res = alg.hits(nodes_df, edges_df, max_iter=int(cfg.pop("maxIter", 6)))
        out = with_key(res, "node_id", "key").select("key", "hub", "auth")
    elif proc == "adamic_adar":
        degree_cap = cfg.pop("degreeCap", None)
        res = alg.adamic_adar(
            edges_df.select("src", "dst"),
            top_k=int(cfg.pop("topK", 5)),
            degree_cap=None if degree_cap is None else int(degree_cap),
        )
        out = with_key(res, "a", "key1")
        out = with_key(out, "b", "key2").select(
            "key1",
            "key2",
            F.col("aa_score").alias("score"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    elif proc == "weighted_sssp":
        start = cfg.pop("start", None)
        if start is None:
            raise CypherUnsupported("graft.weighted_sssp needs {start: <node key>}")
        label = cfg.pop("label", None)
        wprop = str(cfg.pop("weightProperty", "weight"))
        if wprop not in edges_df.columns:
            raise CypherUnsupported(
                f"graft.weighted_sssp: edges have no {wprop!r} property "
                f"(weightProperty names a stored edge prop)"
            )
        srcs = nodes_df
        if label is not None:
            srcs = srcs.filter(F.col("label") == str(label))
        srcs = srcs.filter(F.col("key") == str(start)).select(
            F.col(NODE_ID).alias("id")
        )
        res = alg.weighted_sssp(
            edges_df.select(
                "src", "dst", F.col(wprop).cast("double").alias("weight")
            ),
            srcs,
            max_rounds=int(cfg.pop("maxRounds", 10)),
        )
        out = with_key(res.drop("source"), "id", "key").select("key", "dist")
    elif proc in ("random_walks", "biased_walks"):
        label = cfg.pop("label", None)
        starts = nodes_df
        if label is not None:
            starts = starts.filter(F.col("label") == str(label))
        starts = starts.select(F.col(NODE_ID).alias("node_id"))
        steps = int(cfg.pop("steps", 3))
        if proc == "random_walks":
            res = alg.random_walks(
                edges_df.select("src", "dst"), starts, n_steps=steps
            )
        else:
            res = alg.biased_walks(
                edges_df.select("src", "dst"),
                starts,
                n_steps=steps,
                w_return=int(cfg.pop("wReturn", 1)),
                w_shared=int(cfg.pop("wShared", 2)),
                w_far=int(cfg.pop("wFar", 4)),
            )
        # walk ids/nodes ride as stringified node ids inside the walk
        # ladder; rebind both to natural keys on the way out
        res = res.select(
            F.col("walk_id").cast("long").alias("walk_id"),
            "step",
            F.col("node").cast("long").alias("node"),
        )
        out = with_key(res, "node", "key")
        out = with_key(out, "walk_id", "walk").select(
            "walk", F.col("step").cast("bigint").alias("step"), "key"
        )
    elif proc == "modularity":
        # method 'label_propagation' (default) scores the LPA assignment;
        # 'cc' scores the connected-component partition — id-tiebreak-free
        # (the PARTITION is unique whatever the internal node ids), so its
        # result is replayable by any engine from the key graph alone
        method = str(cfg.pop("method", "label_propagation"))
        max_iter = int(cfg.pop("maxIter", 5))
        if method == "cc":
            assign = alg.connected_components(
                nodes_df, edges_df, max_iter=max_iter
            ).select("id", F.col("comp").alias("lbl"))
        elif method == "label_propagation":
            assign = alg.label_propagation(nodes_df, edges_df, max_iter=max_iter)
        else:
            raise CypherUnsupported(
                "graft.modularity method must be 'label_propagation' or 'cc'"
            )
        res = alg.modularity(
            edges_df.select("src", "dst"), assign, id_col="id", label_col="lbl"
        )
        out = res.select(
            F.col("m").cast("bigint").alias("m"),
            F.col("n_communities").cast("bigint").alias("n_communities"),
            F.col("intra_edges").cast("bigint").alias("intra_edges"),
            F.col("modularity"),
        )
    elif proc == "near_dup":
        # the dedup library through the statement gateway: MinHash-LSH
        # near-dup pairs over ONE node label's text property — the
        # "find duplicate articles already in the graph" ask. Banded LSH
        # + exact-Jaccard verify (operators/dedup.py minhash_lsh_pairs),
        # node ids rebound to natural keys on the way out.
        from neo4j_graphdb_spark.operators.dedup import minhash_lsh_pairs

        label = cfg.pop("label", None)
        prop = str(cfg.pop("prop", "content"))
        src_nodes = nodes_df
        if label is not None:
            src_nodes = src_nodes.filter(F.col("label") == str(label))
        if prop not in src_nodes.columns:
            raise CypherUnsupported(
                f"graft.near_dup: nodes have no {prop!r} property"
            )
        pairs = minhash_lsh_pairs(
            src_nodes.select(F.col(NODE_ID), F.col(prop)),
            prop,
            NODE_ID,
            num_hashes=int(cfg.pop("numHashes", 64)),
            bands=int(cfg.pop("bands", 16)),
            shingle_n=int(cfg.pop("shingle", 3)),
            jaccard_threshold=float(cfg.pop("threshold", 0.7)),
            hash_mode=str(cfg.pop("hashMode", "xxhash64")),
        )
        out = with_key(pairs, "id_a", "key_a")
        # id_a < id_b orders by the internal hash; canonicalize to
        # lexicographic key order so results are engine-replayable
        out = with_key(out, "id_b", "key_b").select(
            F.least("key_a", "key_b").alias("key_a"),
            F.greatest("key_a", "key_b").alias("key_b"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    elif proc == "triangle_count":
        out = alg.triangle_count(edges_df).select(
            F.col("triangles").cast("bigint").alias("triangles")
        )
    elif proc == "clustering":
        res = alg.clustering_coefficient(edges_df)
        out = with_key(res, "v", "key").select(
            "key",
            F.col("degree").cast("bigint").alias("degree"),
            F.col("triangles").cast("bigint").alias("triangles"),
            F.col("lcc"),
        )
    elif proc == "assortativity":
        out = alg.degree_assortativity(edges_df)
    else:  # pragma: no cover - proc membership validated upfront
        raise CypherUnsupported(f"unhandled procedure graft.{proc}")
    out = out.select(*yields)

    tail = cm.group("tail").strip()
    if tail:
        parts = _CLAUSE_RE.split(tail)
        if parts[0].strip():
            raise CypherUnsupported(f"unsupported CALL tail: {tail!r}")
        skip: int | None = None
        limit: int | None = None
        order_by: list[tuple[str, bool]] = []
        sel = None
        agg_returns: list[str] | None = None
        aliased_names: set[str] = set()
        for i in range(1, len(parts), 2):
            kind = parts[i].upper()
            body = parts[i + 1].strip().rstrip(",")
            if kind == "WHERE":
                # Neo4j allows WHERE directly after YIELD — simple
                # AND-chained comparisons over YIELD columns (the same
                # restricted shape the CALL{} subquery tail takes); must
                # precede RETURN so the filter sees YIELD names (the
                # aggregate path too: a WHERE after `RETURN sum(d)`
                # would otherwise silently filter the PRE-aggregation
                # frame instead of the result, a HAVING it isn't)
                if sel is not None or agg_returns is not None:
                    raise CypherUnsupported(
                        "WHERE after YIELD must precede RETURN"
                    )
                for item in re.split(r"\s+AND\s+", body, flags=re.IGNORECASE):
                    m2 = _POST_WHERE_RE.match(item.strip())
                    if not m2 or m2.group("name") not in out.columns:
                        raise CypherUnsupported(
                            f"unsupported WHERE after YIELD: {item!r}"
                        )
                    out = out.filter(
                        _OPS[m2.group("op")](
                            F.col(m2.group("name")),
                            F.lit(
                                _where_value(m2.group("val"), lits, params)
                            ),
                        )
                    )
            elif kind == "RETURN":
                items0 = _split_top_commas(body)
                if any(_is_agg_item(i) for i in items0):
                    # aggregate RETURN over the YIELD frame
                    # (`… YIELD degree RETURN sum(degree) AS s`) — the
                    # implicit-grouping compiler, YIELD names as plain
                    # columns
                    agg_returns = items0
                    continue
                sel = []
                aliased_names = set()
                for item in _split_top_commas(body):
                    m2 = _POST_RETURN_RE.match(item)
                    if not m2 or m2.group("name") not in out.columns:
                        raise CypherUnsupported(
                            f"RETURN after YIELD must use YIELD names: {item!r}"
                        )
                    aliased_names.add(m2.group("out") or m2.group("name"))
                    sel.append(
                        F.col(m2.group("name")).alias(
                            m2.group("out") or m2.group("name")
                        )
                    )
            elif kind == "ORDER":
                # ORDER BY follows RETURN in Cypher's clause order, so a
                # RETURN alias is a valid sort key alongside YIELD names
                if agg_returns is not None:
                    # aggregate tail: keys resolve against the
                    # aggregated frame inside _aggregate_return
                    body2a = re.sub(r"^BY\s+", "", body, flags=re.IGNORECASE)
                    for item in _split_top_commas(body2a):
                        m2 = re.match(
                            r"^(?P<key>\w+)(?:\s+(?P<dir>ASC|DESC))?$",
                            item, re.IGNORECASE,
                        )
                        if not m2:
                            raise CypherUnsupported(
                                f"unsupported ORDER BY item: {item!r}"
                            )
                        order_by.append((
                            m2.group("key"),
                            (m2.group("dir") or "ASC").upper() == "DESC",
                        ))
                    continue
                aliased = aliased_names if sel is not None else set()
                body2 = re.sub(r"^BY\s+", "", body, flags=re.IGNORECASE)
                for item in _split_top_commas(body2):
                    m2 = re.match(
                        r"^(?P<key>\w+)(?:\s+(?P<dir>ASC|DESC))?$",
                        item,
                        re.IGNORECASE,
                    )
                    if not m2 or (
                        m2.group("key") not in out.columns
                        and m2.group("key") not in aliased
                    ):
                        raise CypherUnsupported(
                            f"ORDER BY key must be a YIELD name or RETURN "
                            f"alias: {item!r}"
                        )
                    order_by.append(
                        (m2.group("key"), (m2.group("dir") or "ASC").upper() == "DESC")
                    )
            elif kind == "SKIP":
                skip = _page_count(body, params, "SKIP")
            elif kind == "LIMIT":
                limit = _page_count(body, params, "LIMIT")
            else:
                raise CypherUnsupported(f"{kind} unsupported after CALL YIELD")
        if agg_returns is not None:
            return CypherResult(
                _aggregate_return(
                    out, agg_returns, {}, None, order_by, skip, limit,
                    lits, params,
                ),
                None,
            )
        # Cypher clause order: RETURN projects, then ORDER BY — so sort
        # keys may name RETURN aliases. A sort key that names a YIELD
        # column the projection DROPPED still works: the sort runs
        # before the projection in that case (same result set — sorting
        # commutes with a narrowing projection).
        sort_cols = [
            F.col(k).desc_nulls_first() if d else F.col(k).asc_nulls_last()
            for k, d in order_by
        ]
        keys_projected = sel is None or all(
            k in aliased_names for k, _ in order_by
        ) if order_by else True
        if order_by and not keys_projected:
            out = out.orderBy(*sort_cols)
        if sel is not None:
            out = out.select(*sel)
        if order_by and keys_projected:
            out = out.orderBy(*sort_cols)
        out = _page(out, skip, limit)
    return CypherResult(out, None)


# MATCH … [WHERE …] SET alias.prop = <expr>[, …] — the update statement
_UPDATE_RE = re.compile(
    r"^(?P<head>MATCH\s.+?)\s+SET\s+(?P<items>.+)$", re.IGNORECASE | re.DOTALL
)

_UPDATE_ITEM_RE = re.compile(
    r"^(?P<alias>\w+)\.(?P<prop>\w+)\s*=\s*(?P<expr>.+)$", re.DOTALL
)


def _run_text_update(spark, um, lits, params, store) -> CypherResult:
    """``MATCH (n:Label …) [WHERE …] SET n.p = <expr>[, …]`` — Neo4j's
    read-modify-write update statement: the head resolves through the
    normal read path (inline props, WHERE — boolean grammar, expression
    conjuncts), each SET value is a full scalar expression over the
    MATCHED row's properties (``SET c.pop = c.pop + 1``), and the
    computed batch flows through the same ``merge_nodes`` upsert as
    MERGE…SET — one distributed read + one bucketed merge write, with
    Neo4j counters (nodes_created stays 0; properties_set counts
    applied cells)."""

    def unmask(text: str) -> str:
        return re.sub(
            r"\x00(\d+)\x00", lambda m: "'" + lits[int(m.group(1))] + "'", text
        )

    raw_items = [r.strip() for r in _split_top_commas(um.group("items"))]
    # `SET n += {k: v, …}` — Neo4j's map-merge sugar: expand to one
    # per-prop item each (`n.k = v`), which is exactly what += does to
    # the listed keys while leaving the rest untouched. NB this engine's
    # SET-null convention applies (a null value keeps the stored cell —
    # the a8 contract), where Neo4j's += would remove the key.
    expanded: list[str] = []
    replace_alias: str | None = None  # `SET n = {map}` — erase-then-set
    for raw in raw_items:
        # `SET n = {k: v, …}` / `SET n = $map` — Neo4j's REPLACE-all
        # semantics: every property not in the map is REMOVED, listed
        # ones are set. Expands to per-prop items (same machinery as
        # +=) plus an erase pass over the label's other prop columns
        # after the merge. The merge KEY survives (it is the node's
        # identity in this store — Neo4j has no such required prop).
        rpm = re.match(
            r"^(?P<alias>\w+)\s*=\s*(?:\{(?P<body>.*)\}|\$(?P<p>\w+))$",
            raw,
            re.DOTALL,
        )
        if rpm:
            if replace_alias is not None or len(raw_items) > 1:
                raise CypherUnsupported(
                    "SET n = {map} must be the statement's only SET item"
                )
            replace_alias = rpm.group("alias")
            if rpm.group("p") is not None:
                pv = (params or {}).get(rpm.group("p")) if isinstance(
                    params, dict
                ) else None
                if not isinstance(pv, dict) or not pv:
                    raise CypherUnsupported(
                        f"SET = ${rpm.group('p')} needs a non-empty map param"
                    )
                params = {
                    **(params or {}),
                    **{f"__set_{k0}": v0 for k0, v0 in pv.items()},
                }
                for k0 in pv:
                    expanded.append(f"{replace_alias}.{k0} = $__set_{k0}")
            else:
                for pair in _split_top_commas(rpm.group("body")):
                    km = re.match(r"^\s*(\w+)\s*:\s*(.+)$", pair, re.DOTALL)
                    if not km:
                        raise CypherUnsupported(
                            f"unsupported map entry in SET =: {unmask(pair)!r}"
                        )
                    expanded.append(
                        f"{replace_alias}.{km.group(1)} = {km.group(2).strip()}"
                    )
            continue
        ppm = re.match(r"^(?P<alias>\w+)\s*\+=\s*\$(?P<p>\w+)$", raw)
        if ppm:
            # `SET n += $map` — a scalar dict param expands to the same
            # per-key items as the literal-map form (NULL values keep
            # the old cell, Neo4j's += contract, via the coalesce merge)
            pv = (params or {}).get(ppm.group("p")) if isinstance(
                params, dict
            ) else None
            if not isinstance(pv, dict) or not pv:
                raise CypherUnsupported(
                    f"SET += ${ppm.group('p')} needs a non-empty map param"
                )
            params = {
                **(params or {}),
                **{f"__set_{k0}": v0 for k0, v0 in pv.items()},
            }
            for k0 in pv:
                expanded.append(f"{ppm.group('alias')}.{k0} = $__set_{k0}")
            continue
        pm = re.match(
            r"^(?P<alias>\w+)\s*\+=\s*\{(?P<body>.*)\}$", raw, re.DOTALL
        )
        if pm:
            for pair in _split_top_commas(pm.group("body")):
                km = re.match(
                    r"^\s*(\w+)\s*:\s*(.+)$", pair, re.DOTALL
                )
                if not km:
                    raise CypherUnsupported(
                        f"unsupported map entry in SET +=: {unmask(pair)!r}"
                    )
                expanded.append(
                    f"{pm.group('alias')}.{km.group(1)} = {km.group(2).strip()}"
                )
        else:
            expanded.append(raw)
    raw_items = expanded
    label_items = [_LABEL_ITEM_RE.match(r) for r in raw_items]
    if any(label_items):
        # `MATCH (n:L …) SET n:Extra[, n:More …]` — secondary-label add:
        # edits the node's _labels set prop (sorted, ','-joined,
        # duplicate-free, primary excluded) through the same bucketed
        # merge_nodes upsert; labels(n) and the (n:A:B) conjunction scan
        # read {primary} ∪ _labels. Counters book one properties_set
        # cell per touched node (the _labels cell).
        if not all(label_items):
            raise CypherUnsupported(
                "SET mixes label items (n:Extra) with property items — "
                "use separate SET statements"
            )
        return _run_text_set_labels(
            spark, um, [m.groups() for m in label_items], unmask, params, store
        )
    items = []
    for raw in raw_items:
        im = _UPDATE_ITEM_RE.match(raw)
        if not im:
            raise CypherUnsupported(
                f"unsupported update SET item: {unmask(raw)!r}"
            )
        items.append(
            (im.group("alias"), im.group("prop"), unmask(im.group("expr").strip()))
        )
    aliases_seen = {a for a, _, _ in items}
    if len(aliases_seen) != 1:
        # multi-target SET (`SET a.x = 1, r.y = 2, p.z = 3`) — Neo4j
        # matches the head ONCE, then applies every item; here the
        # matched frame is computed once (persisted), and each alias's
        # item group becomes one bucketed write against that pinned
        # frame (nodes via merge_nodes, the rel alias via merge_edges)
        return _run_text_update_multi(spark, um, items, params, store, unmask)
    alias = aliases_seen.pop()
    props = [p for _, p, _ in items]
    if len(set(props)) != len(props):
        raise CypherUnsupported("duplicate property in update SET items")
    head_clauses, head_lits = split_clauses_masked(unmask(um.group("head")))
    nodes = store.nodes()
    if nodes is None:
        return CypherResult(None, WriteSummary())
    g = _store_graph(store, nodes)
    # `MATCH (a:L1)-[r:T]->(b:L2) [WHERE …] SET r.p = <expr>` —
    # relationship-property update (a79): the head resolves through the
    # read path (rel props are readable columns there), endpoint keys +
    # computed values flow through merge_edges' coalesce upsert — the
    # matched edges already exist, so relationships_created stays 0 and
    # properties_set books the applied cells.
    rel = _rel_head(head_clauses, alias)
    if rel is not None:
        rel_type, sa, da, s_label, d_label = rel
        ret_body = ", ".join(
            [f"{sa}.key AS _sk", f"{da}.key AS _dk"]
            + [f"{expr} AS {prop}" for _, prop, expr in items]
        )
        upd_clauses, upd_lits = split_clauses_masked(
            unmask(um.group("head")) + " RETURN " + ret_body
        )
        updates = _run_read(upd_clauses, g, upd_lits, params)
        if replace_alias is not None:
            # `SET r = {map}` — REPLACE semantics, the edge twin of the
            # node path below: every stored relationship-prop cell NOT
            # listed in the map is erased on the matched edges
            # (remove_edge_props — partial bucket rewrite), then the
            # listed values apply through the normal coalesce upsert.
            # Two writes, matched endpoint keys persisted between them;
            # counters sum both passes.
            edf = store.edges()
            canon_e = {"src", "dst", "rel_type", BUCKET_COL}
            others = sorted(
                c
                for c in (edf.columns if edf is not None else [])
                if c not in canon_e and c not in props
            )
            updates = updates.persist()
            try:
                summary = WriteSummary()
                if others:
                    summary = summary + store.remove_edge_props(
                        updates.select("_sk", "_dk"),
                        rel_type, s_label, "_sk", d_label, "_dk", others,
                    )
                summary = summary + store.merge_edges(
                    updates, rel_type, s_label, "_sk", d_label, "_dk",
                    prop_cols=props,
                )
            finally:
                updates.unpersist()
            return CypherResult(None, summary)
        summary = store.merge_edges(
            updates, rel_type, s_label, "_sk", d_label, "_dk", prop_cols=props
        )
        return CypherResult(None, summary)
    # node endpoint selected via a relationship pattern — `MATCH
    # (a:Article)-[r:T]->(p:Pub) SET a.seen = 1`: the endpoint's label
    # keys the merge; the head compiles through the read path exactly
    # like the single-node form below
    label = _node_endpoint_label(head_clauses, alias)
    if label is None:
        label = _head_match(head_clauses, alias, allow_unlabeled=True)
    ret_body = ", ".join(
        [f"{alias}.key AS _k"]
        + ([f"{alias}.label AS _lbl"] if label is None else [])
        + [f"{expr} AS {prop}" for _, prop, expr in items]
    )
    # the RETURN expression machinery compiles each SET value against the
    # matched frame; literals re-mask through one whole-statement split
    upd_clauses, upd_lits = split_clauses_masked(
        unmask(um.group("head")) + " RETURN " + ret_body
    )
    updates = _run_read(upd_clauses, g, upd_lits, params)
    if replace_alias is not None and label is None:
        raise CypherUnsupported(
            "SET n = {map} needs a labeled MATCH (props erase per label)"
        )
    if label is not None:
        if replace_alias is not None:
            # REPLACE semantics: every stored prop cell of the label NOT
            # listed in the map is erased (the merge key and the
            # secondary-label set survive — identity and labels are not
            # properties here), then the listed values apply through the
            # normal bucketed merge. Two writes, matched keys persisted
            # between them; counters sum both passes.
            canon = {NODE_ID, "label", "key", EXTRA_LABELS}
            others = sorted(
                c for c in nodes.columns if c not in canon and c not in props
            )
            updates = updates.persist()
            try:
                summary = WriteSummary()
                if others:
                    summary = summary + store.remove_props(
                        updates.select("_k"), label, "_k", others
                    )
                summary = summary + store.merge_nodes(
                    updates, label=label, key_col="_k", prop_cols=props
                )
            finally:
                updates.unpersist()
            return CypherResult(None, summary)
        summary = store.merge_nodes(
            updates, label=label, key_col="_k", prop_cols=props
        )
        return CypherResult(None, summary)
    # all-nodes update (`MATCH (u) SET …`): the store keys every write
    # on ONE label's bucketed partition, so the batch fans out per
    # label — a bounded driver loop (one distinct over the label
    # column, label count ≤ partition-dir count), the batch persisted
    # so each label's merge re-reads the computed frame, not the plan
    updates = updates.persist()
    try:
        lbs = sorted(
            r["_lbl"] for r in updates.select("_lbl").distinct().collect()
        )
        summary = WriteSummary()
        for lb in lbs:
            summary = summary + store.merge_nodes(
                updates.filter(F.col("_lbl") == lb).drop("_lbl"),
                label=lb,
                key_col="_k",
                prop_cols=props,
            )
    finally:
        updates.unpersist()
    return CypherResult(None, summary)


def _run_text_update_multi(
    spark, um, items, params, store, unmask
) -> CypherResult:
    """Multi-target SET — ``MATCH (a:L1)-[r:T]->(p:L2) SET a.x = 1,
    r.y = 2, p.z = 3``. Neo4j matches the head once, then applies all
    items; here the head compiles through the read path ONCE into a
    frame carrying every group's merge keys + computed values
    (alias-mangled column names, so same-named props on different
    aliases can't collide), that frame is persisted, and each alias's
    item group becomes one bucketed write against it — merge_nodes for
    node aliases (single-node heads or relationship-pattern endpoints),
    merge_edges for the rel alias. Write order follows item order;
    counters sum the passes."""
    groups: dict[str, list[tuple[str, str]]] = {}
    for a, p, e in items:
        groups.setdefault(a, []).append((p, e))
    for a, pe in groups.items():
        ps = [p for p, _ in pe]
        if len(set(ps)) != len(ps):
            raise CypherUnsupported("duplicate property in update SET items")
    head_clauses, _hl = split_clauses_masked(unmask(um.group("head")))
    nodes = store.nodes()
    if nodes is None:
        return CypherResult(None, WriteSummary())
    g = _store_graph(store, nodes)
    plans = []  # ('rel', rel_type, s_label, d_label, gi, pe) | ('node', label, gi, pe)
    sel: list[str] = []
    for gi, (a, pe) in enumerate(groups.items()):
        rel = _rel_head(head_clauses, a)
        if rel is not None:
            rel_type, sa, da, s_label, d_label = rel
            sel += [f"{sa}.key AS __k{gi}s", f"{da}.key AS __k{gi}d"]
            plans.append(("rel", rel_type, s_label, d_label, gi, pe))
        else:
            label = _node_endpoint_label(head_clauses, a)
            if label is None:
                label = _head_match(head_clauses, a)
            sel.append(f"{a}.key AS __k{gi}")
            plans.append(("node", label, gi, pe))
        sel += [f"{expr} AS __v{gi}_{j}" for j, (_, expr) in enumerate(pe)]
    upd_clauses, upd_lits = split_clauses_masked(
        unmask(um.group("head")) + " RETURN " + ", ".join(sel)
    )
    updates = _run_read(upd_clauses, g, upd_lits, params).persist()
    try:
        summary = WriteSummary()
        for plan in plans:
            if plan[0] == "rel":
                _, rel_type, s_label, d_label, gi, pe = plan
                cols = [
                    F.col(f"__k{gi}s").alias("_sk"),
                    F.col(f"__k{gi}d").alias("_dk"),
                ] + [
                    F.col(f"__v{gi}_{j}").alias(p)
                    for j, (p, _) in enumerate(pe)
                ]
                summary = summary + store.merge_edges(
                    updates.select(*cols), rel_type,
                    s_label, "_sk", d_label, "_dk",
                    prop_cols=[p for p, _ in pe],
                )
            else:
                _, label, gi, pe = plan
                cols = [F.col(f"__k{gi}").alias("_k")] + [
                    F.col(f"__v{gi}_{j}").alias(p)
                    for j, (p, _) in enumerate(pe)
                ]
                summary = summary + store.merge_nodes(
                    updates.select(*cols), label=label, key_col="_k",
                    prop_cols=[p for p, _ in pe],
                )
    finally:
        updates.unpersist()
    return CypherResult(None, summary)


_EXPLAIN_RE = re.compile(
    r"^\s*(?P<kind>EXPLAIN|PROFILE)\b\s*(?P<rest>.+)$",
    re.IGNORECASE | re.DOTALL,
)


def _run_explain(
    spark: SparkSession,
    kind: str,
    inner: str,
    params: dict | DataFrame | None,
    *,
    store: GraphStore | None,
    graph: Graph | None,
) -> CypherResult:
    """``EXPLAIN <read statement>`` / ``PROFILE <read statement>`` — the
    introspection pair every Neo4j tutorial reaches for. EXPLAIN
    compiles the statement and returns the formatted Spark physical plan
    WITHOUT executing (Spark's lazy DataFrame makes this exact: the plan
    is the real one, not an estimate); PROFILE executes and reports the
    row count alongside the plan. Both land in ``CypherResult.plan`` /
    ``.rows``, with EXPLAIN also projecting the plan as a 1-row frame so
    scripts can consume it. Write statements are refused by name: the
    write path executes eagerly, so a no-execute EXPLAIN would lie."""
    import io
    from contextlib import redirect_stdout

    masked, _ = _mask_strings(inner)
    if re.search(
        r"(?<![.$\w])(MERGE|CREATE|SET|DELETE|REMOVE)\b", masked, re.IGNORECASE
    ):
        raise CypherUnsupported(
            f"{kind} supports read statements only (write statements "
            "execute eagerly in the batched upsert path)"
        )
    if re.match(r"\s*CALL\b", masked, re.IGNORECASE):
        # graph procedures (CALL graft.*) drive eager per-superstep loops
        # while building their result frame — a no-execute EXPLAIN would
        # lie exactly the way it would for writes
        raise CypherUnsupported(
            f"{kind} supports plain read statements only (CALL procedures "
            "execute their supersteps eagerly while planning)"
        )
    res = run_cypher(spark, inner.strip(), params, store=store, graph=graph)
    buf = io.StringIO()
    with redirect_stdout(buf):
        res.df.explain("formatted")
    plan = buf.getvalue().strip()
    if kind == "EXPLAIN":
        pdf = spark.createDataFrame([(plan,)], "plan string")
        return CypherResult(pdf, WriteSummary(), plan=plan)
    return CypherResult(res.df, WriteSummary(), plan=plan, rows=res.df.count())


def _split_update_return(clauses: list[_Clause]) -> tuple[int, int] | None:
    """Detect the update-then-return statement shape — ``MATCH …
    [WHERE …] SET … RETURN … [ORDER BY/SKIP/LIMIT]`` — and return
    (SET index, RETURN index), or None for every other shape."""
    kinds = [c.kind for c in clauses]
    if "RETURN" not in kinds or "SET" not in kinds:
        return None
    si, ri = kinds.index("SET"), kinds.index("RETURN")
    if ri != si + 1 or clauses[0].kind != "MATCH":
        return None
    if any(c.kind not in ("MATCH", "WHERE") for c in clauses[:si]):
        return None
    if any(
        c.kind not in ("ORDER", "SKIP", "LIMIT") for c in clauses[ri + 1 :]
    ):
        return None
    return si, ri


def _run_update_then_read(
    spark: SparkSession,
    query: str,
    ur: tuple[int, int],
    params: dict | DataFrame | None,
    store: GraphStore,
) -> CypherResult:
    """``MATCH … SET … RETURN …`` — Neo4j's update-then-return idiom:
    run the update through the existing read-modify-write path, then
    re-run the MATCH/WHERE prefix with the RETURN tail against the
    post-write store. The re-match returns POST-update values, which is
    Neo4j's semantics EXCEPT when a SET property also participates in
    the match predicates (Neo4j binds first, then updates; a re-match
    would re-evaluate) — that overlap refuses up front."""
    clauses, lits = split_clauses_masked(query)
    si, ri = ur
    prefix_text = " ".join(f"{c.kind} {c.body}" for c in clauses[:si])
    set_props: list[str] = []
    for it in _split_top_commas(clauses[si].body):
        m2 = _UPDATE_ITEM_RE.match(it.strip())
        if m2:
            set_props.append(m2.group("prop"))
            continue
        pm = re.match(r"^\w+\s*\+=\s*\{(?P<body>.*)\}$", it.strip(), re.DOTALL)
        if pm:
            for pair in _split_top_commas(pm.group("body")):
                km = re.match(r"^\s*(\w+)\s*:", pair)
                if km:
                    set_props.append(km.group(1))
    for prop in set_props:
        # both predicate spellings: `n.prop = …` (WHERE) and the inline
        # match map `{prop: …}` — either would make the post-write
        # re-match diverge from Neo4j's bind-then-update
        if re.search(rf"\.\s*{prop}(?![\w$])", prefix_text) or re.search(
            rf"(?<![\w$.]){prop}\s*:", prefix_text
        ):
            raise CypherUnsupported(
                f"SET…RETURN where the SET property {prop!r} also appears "
                "in the match predicates is unsupported (the post-write "
                "re-match would diverge from Neo4j's bind-then-update)"
            )
    update_text = " ".join(f"{c.kind} {c.body}" for c in clauses[:ri])
    summary = run_cypher(
        spark, _unmask(update_text, lits), params, store=store
    ).summary
    read_text = " ".join(
        f"{c.kind} {c.body}" for c in clauses[:si] + clauses[ri:]
    )
    res = run_cypher(spark, _unmask(read_text, lits), params, store=store)
    return CypherResult(res.df, summary)


def _find_write_read_continuation(clauses: list[_Clause]) -> int | None:
    """Detect the write→WITH→read statement shape —
    ``MERGE (t:Tag {name:'x'}) WITH t MATCH (n:N) RETURN count(n)`` —
    and return the index of the pipe WITH, or None.

    Shape: the statement LEADS with MERGE/CREATE, every clause before
    the WITH is a write clause (MERGE/CREATE/SET, plus the empty-body
    CREATE/MATCH fragments the clause splitter mints for ``ON CREATE
    SET`` / ``ON MATCH SET`` markers), and the suffix after the WITH
    contains a real MATCH — i.e. the user pipes the write into a read.
    Plain ``MERGE … WITH t RETURN t.k`` (no MATCH) keeps the existing
    write-RETURN projection path."""
    if not clauses or clauses[0].kind not in ("MERGE", "CREATE"):
        return None
    for w, c in enumerate(clauses):
        if c.kind == "WITH":
            break
    else:
        return None
    if w == 0:
        return None
    for c in clauses[:w]:
        if c.kind in ("MERGE", "CREATE", "SET"):
            continue
        if c.kind in ("CREATE", "MATCH") and not c.body.strip():
            continue  # ON CREATE / ON MATCH marker fragment
        if c.kind == "MATCH" and not c.body.strip():
            continue
        return None
    if not any(
        c.kind == "MATCH" and c.body.strip() for c in clauses[w + 1 :]
    ):
        return None
    return w


def _find_write_agg_return(clauses: list[_Clause]) -> bool:
    """Detect ``MERGE/CREATE … RETURN <aggregates>`` — a write statement
    whose RETURN aggregates over the written alias (``MERGE (t:Tag
    {k:$v}) RETURN count(t)``). The plain write-RETURN path only serves
    entity/property projections; this shape re-routes through the
    write→read continuation with a synthesized ``WITH *`` pipe, so the
    aggregate compiles through the ordinary read machinery against the
    post-write store."""
    if not clauses or clauses[0].kind not in ("MERGE", "CREATE"):
        return False
    if clauses[-1].kind != "RETURN" or not clauses[-1].body.strip():
        return False
    for c in clauses[:-1]:
        if c.kind in ("MERGE", "CREATE", "SET"):
            continue
        if c.kind == "MATCH" and not c.body.strip():
            continue  # ON MATCH marker fragment
        return False
    items = _split_top_commas(clauses[-1].body)
    return any(_is_agg_item(i) for i in items)


def _run_write_then_read(
    spark: SparkSession,
    clauses: list[_Clause],
    w: int,
    params: dict | DataFrame | None,
    store: GraphStore,
    lits: list[str],
) -> CypherResult:
    """Write→WITH→read continuation (VERDICT r12 missing #1): run the
    write prefix EAGERLY through the existing batched write path, then
    compile the read suffix against the post-write store with every
    written alias the suffix references re-bound as a key-lookup anchor
    — the a85 anchored-write machinery in reverse. The result carries
    the read frame AND the write counters.

    Scalar batches only: a DataFrame param batch would multiply the
    read's cardinality per written row — that shape belongs to the
    derived-write path (a96)."""
    if isinstance(params, DataFrame):
        raise CypherUnsupported(
            "write→WITH→read continuation needs scalar params (dict); "
            "batch writes pipe through the derived-write path instead"
        )
    write_clauses = clauses[:w]
    summary = _run_write(spark, write_clauses, params, store, lits).summary

    # written node aliases → (label, key_prop, key encoding), re-parsed
    # from the write prefix (same regexes _run_write compiled)
    written: dict[str, tuple[str, str, object]] = {}
    for c in write_clauses:
        if c.kind not in ("MERGE", "CREATE") or not c.body.strip():
            continue
        parts = (
            _split_top_commas(c.body) if c.kind == "CREATE" else [c.body]
        )
        for part in parts:
            part = part.strip()
            pm2 = re.match(
                r"^(?P<n1>\([^()]*\))\s*(?:<-)?-?\[[^\]]*\]-?(?:->)?"
                r"\s*(?P<n2>\([^()]*\))$",
                part,
            )
            node_texts = (
                [pm2.group("n1"), pm2.group("n2")] if pm2 else [part]
            )
            for nt in node_texts:
                n = _NODE_RE.match(nt.strip())
                if not n or not n.group("alias") or not n.group("label"):
                    continue
                pairs = _parse_write_props(n.group("props"), lits or [])
                if not pairs:
                    continue
                written[n.group("alias")] = (
                    n.group("label").split(":")[0].strip(),
                    pairs[0][0],
                    pairs[0][1],
                )

    with_items = [i.strip() for i in _split_top_commas(clauses[w].body)]
    if with_items == ["*"]:
        carried = list(written)
    else:
        carried = []
        for item in with_items:
            if not re.fullmatch(r"\w+", item):
                raise CypherUnsupported(
                    "write→WITH→read continuation carries bare written "
                    f"aliases only: {item!r}"
                )
            if item not in written:
                raise CypherUnsupported(
                    f"WITH on unwritten alias: {item!r} (relationship "
                    "aliases and unbound names cannot pipe into the read)"
                )
            carried.append(item)

    suffix = clauses[w + 1 :]

    def _clause_text(c: _Clause) -> str:
        kw = "OPTIONAL MATCH" if c.kind == "OPTIONAL_MATCH" else c.kind
        return f"{kw} {c.body}".strip()

    suffix_text = " ".join(_clause_text(c) for c in suffix)
    new_params = dict(params or {})
    anchors: list[str] = []
    for alias in carried:
        label, key_prop, enc = written[alias]
        if not re.search(rf"(?<![\w$]){alias}(?![\w$])", suffix_text):
            continue  # carried but never referenced downstream
        if isinstance(enc, tuple):
            if enc[0] != "lit":
                raise CypherUnsupported(
                    "continuation anchors need a literal or $param key "
                    "(expression keys don't re-bind)"
                )
            val = enc[1]
        else:
            if not params or enc not in params:
                raise CypherUnsupported(
                    f"unbound parameter ${enc} in continuation anchor"
                )
            val = params[enc]
        pname = f"_cont_{alias}"
        new_params[pname] = val
        anchors.append(f"({alias}:{label} {{{key_prop}: ${pname}}})")

    if anchors:
        first_match = next(
            (c for c in suffix if c.kind == "MATCH" and c.body.strip()),
            None,
        )
        anchor_txt = ", ".join(anchors)
        if first_match is not None and all(
            _NODE_RE.match(p.strip())
            for p in _split_top_commas(first_match.body)
        ):
            # node-anchor MATCH: the written aliases join it as comma
            # anchors (the a90 multi-anchor shape — a WHERE equality
            # collapses the declared cross product inside Catalyst)
            pieces = []
            for c in suffix:
                if c is first_match:
                    pieces.append(f"MATCH {anchor_txt}, {c.body}")
                else:
                    pieces.append(_clause_text(c))
            read_text = " ".join(pieces)
        else:
            # relationship-pattern MATCH: bind the anchors first, the
            # suffix's own MATCH chains off them (the a33 shape)
            read_text = f"MATCH {anchor_txt} {suffix_text}"
    else:
        read_text = suffix_text

    res = run_cypher(
        spark, _unmask(read_text, lits), params=new_params, store=store
    )
    return CypherResult(res.df, summary)


def run_cypher(
    spark: SparkSession,
    query: str,
    params: dict | DataFrame | None = None,
    *,
    store: GraphStore | None = None,
    graph: Graph | None = None,
) -> CypherResult:
    """Execute one statement of the reference's Cypher subset.

    Write statements (any ``MERGE``/``SET``) require ``store`` and run the
    batched upsert path; ``[DETACH] DELETE`` statements run the batch
    delete; read statements run against ``graph`` (or the store's
    current nodes/edges). ``params`` is a scalar dict (one logical
    record, the reference's shape) or a DataFrame of parameter columns
    (batch-native).
    """
    _sm0, _ = _mask_strings(query)
    if ";" in _sm0:
        if len([s0 for s0 in _sm0.split(";") if s0.strip()]) > 1:
            # a `;`-separated SCRIPT passed to the single-statement
            # entry — delegate to run_cypher_script (sequential, later
            # reads see earlier writes) and hand back the LAST
            # statement's result, the REPL convention; quoted
            # semicolons never split (masked)
            return run_cypher_script(
                spark, query, params, graph=graph, store=store
            )[-1]
        if _sm0.rstrip().endswith(";"):
            # a single statement with a trailing terminator
            query = query.rstrip().rstrip(";")
    em = _EXPLAIN_RE.match(query)
    if em:
        return _run_explain(
            spark,
            em.group("kind").upper(),
            em.group("rest"),
            params,
            store=store,
            graph=graph,
        )
    sm = re.match(
        r"^\s*SHOW\s+(?P<what>INDEXES|INDEX|CONSTRAINTS|CONSTRAINT)\s*;?\s*$",
        query,
        re.IGNORECASE,
    )
    if sm:
        # SHOW INDEXES / SHOW CONSTRAINTS — the store has no secondary
        # indexes or constraints (scans are label+bucket-pruned Parquet;
        # merge keys are enforced structurally by the upsert), so the
        # honest Neo4j-shaped answer is an EMPTY frame with the
        # introspection columns a Neo4j result pane shows
        what = sm.group("what").upper()
        if what.startswith("INDEX"):
            schema = ("id long, name string, state string, type string, "
                      "labelsOrTypes string, properties string")
        else:
            schema = ("id long, name string, type string, "
                      "labelsOrTypes string, properties string")
        return CypherResult(spark.createDataFrame([], schema), None)
    im = re.match(
        r"^\s*(?:CREATE|DROP)\s+(?:INDEX|CONSTRAINT)\b.*$",
        query,
        re.IGNORECASE | re.DOTALL,
    )
    if im:
        # CREATE/DROP INDEX|CONSTRAINT — acknowledged NO-OPS: the store
        # has no secondary index machinery to build (label scans are
        # partition-pruned Parquet, merge keys are structural), so the
        # DDL succeeds with Neo4j's empty result instead of refusing —
        # schema-management scripts written for Neo4j run through.
        return CypherResult(None, WriteSummary())
    masked_q, q_lits = _mask_strings(query)
    fe = _split_foreach(masked_q)
    if fe is not None:
        head, var, src, body = fe
        if not head.strip():
            # whole-statement FOREACH (x IN list | <update>) — Neo4j
            # applies the body once per element IN ORDER, so a body
            # targeting a FIXED entity (`FOREACH (x IN [1,2] | MERGE
            # (n:T {k:'a'}) SET n.p = x)`) must end at the LAST
            # element's value. Literal/range lists (loop programs by
            # construction) run the same sequential replay as the
            # read-prefix form — one bucketed write per element,
            # last-wins guaranteed. A $param list keeps the batched
            # UNWIND rewrite (identical write effects; within-batch
            # ties on one entity resolve content-keyed, not by element
            # order — the documented batch-dedup contract).
            src_s = src.strip()
            if src_s.startswith("[") or re.match(
                r"^range\(", src_s, re.IGNORECASE
            ):
                return _run_foreach_seq(
                    spark, "", var, src, body, q_lits, params,
                    store=store, graph=graph,
                )
            return run_cypher(
                spark,
                _unmask(f"UNWIND {src} AS {var} {body}", q_lits),
                params,
                store=store,
                graph=graph,
            )
        # FOREACH after a read prefix (`MATCH (u) FOREACH (x IN [1,2] |
        # SET u.c = x)`, VERDICT r14 missing #3): sequential replay —
        # see _run_foreach_seq for the ordering contract
        return _run_foreach_seq(
            spark, head, var, src, body, q_lits, params,
            store=store, graph=graph,
        )
    callm = _CALL_RE.match(masked_q.strip())
    if callm:
        return _run_text_call(
            spark,
            callm,
            q_lits,
            params if isinstance(params, dict) else None,
            store=store,
            graph=graph,
        )
    subq = _split_call_subquery(masked_q)
    if subq is not None:
        txn = _rewrite_call_in_transactions(subq)
        if txn is not None:
            # `UNWIND $rows AS row CALL { WITH row <write> } IN
            # TRANSACTIONS [OF n ROWS]` — Neo4j's bulk-ingest idiom.
            # Spark-first semantics: the per-chunk commit protocol
            # collapses into ONE bucketed versioned write over the whole
            # imported frame (a single atomic version bump — strictly
            # stronger than Neo4j's chunked visibility, and the only
            # shape that scales: per-row or per-chunk commits would
            # serialize a 100 TB ingest). `OF n ROWS` is accepted and
            # recorded as advisory only.
            if store is None:
                raise CypherUnsupported(
                    "CALL { … } IN TRANSACTIONS needs a GraphStore"
                )
            txn_clauses, txn_lits = split_clauses_masked(_unmask(txn, q_lits))
            return _run_write(spark, txn_clauses, params, store, txn_lits)
        return _run_call_subquery(
            spark, subq, q_lits, params, store=store, graph=graph
        )
    if re.match(r"^\s*CALL\b", masked_q, re.IGNORECASE):
        raise CypherUnsupported(
            "unsupported CALL form (supported: CALL graft.<proc>({cfg}) "
            "YIELD col[, …] [RETURN …] [ORDER BY …] [SKIP n] [LIMIT n], "
            "or a CALL { … } subquery)"
        )
    union_parts = _UNION_SPLIT_RE.split(masked_q)
    if len(union_parts) > 1:
        return _run_union(
            spark, union_parts, q_lits, params, store=store, graph=graph
        )
    if re.search(
        r"(?<![.$\w])SET\b", masked_q, re.IGNORECASE
    ) and not re.search(r"(?<![.$\w])(MERGE|CREATE)\b", masked_q, re.IGNORECASE):
        um = _UPDATE_RE.match(masked_q.strip())
        if um:
            if store is None:
                raise ValueError("update statement needs a GraphStore")
            ur = _split_update_return(split_clauses_masked(query)[0])
            if ur is not None:
                return _run_update_then_read(
                    spark, query, ur, params, store
                )
            return _run_text_update(
                spark, um, q_lits, params if isinstance(params, dict) else None,
                store,
            )
    if not re.search(r"(?<![.$\w])(MERGE|CREATE|SET)\b", masked_q, re.IGNORECASE):
        stmt_s = masked_q.strip()
        drm = re.match(
            r"^(?P<body>.+?\bDELETE\s+\w+)\s+RETURN\s+(?P<ret>.+)$",
            stmt_s,
            re.IGNORECASE | re.DOTALL,
        )
        if drm and _DELETE_RE.match(drm.group("body")):
            # `… [DETACH] DELETE n RETURN count(*)` — the cleanup-report
            # idiom. Neo4j refuses value projections of a deleted
            # entity, so only count aggregates are admitted; the count
            # runs over the PRE-delete match (Neo4j's bind-then-delete),
            # materialized to one row before the store mutates.
            if store is None:
                raise ValueError("DELETE statement needs a GraphStore")
            ret_s = drm.group("ret").strip()
            if not re.match(
                r"^count\s*\(\s*(?:\*|\w+)\s*\)(?:\s+AS\s+\w+)?\s*$",
                ret_s,
                re.IGNORECASE,
            ):
                raise CypherUnsupported(
                    "DELETE … RETURN supports count(*) / count(alias) "
                    "only (the entity is deleted; Neo4j refuses value "
                    "projections of it too)"
                )
            dm2 = _DELETE_RE.match(drm.group("body"))
            pre = run_cypher(
                spark,
                _unmask(f"{dm2.group('head')} RETURN {ret_s}", q_lits),
                params,
                store=store,
            ).df
            row = pre.collect()[0]
            frozen = spark.createDataFrame([row], pre.schema)
            summary = _run_text_delete(
                spark, dm2, q_lits,
                params if isinstance(params, dict) else None, store,
            ).summary
            return CypherResult(frozen, summary)
        rrm = re.match(
            r"^(?P<head>.+?)\s+REMOVE\s+"
            r"(?P<items>\w+\s*[.:]\s*\w+(?:\s*,\s*\w+\s*[.:]\s*\w+)*)"
            r"\s+RETURN\s+(?P<ret>.+)$",
            stmt_s,
            re.IGNORECASE | re.DOTALL,
        )
        if rrm:
            # `MATCH … REMOVE n.p RETURN …` — erase-then-return: the
            # erase runs first, then the MATCH prefix re-runs with the
            # RETURN tail (post-remove values; removed props read NULL).
            # A removed prop inside the match predicates would make the
            # re-match diverge from Neo4j's bind-then-update — refused,
            # same guard as SET…RETURN.
            if store is None:
                raise ValueError("REMOVE statement needs a GraphStore")
            for it in _split_top_commas(rrm.group("items")):
                pm_i = re.match(r"^\s*\w+\s*\.\s*(\w+)\s*$", it)
                if pm_i and (
                    re.search(
                        rf"\.\s*{pm_i.group(1)}(?![\w$])", rrm.group("head")
                    )
                    or re.search(
                        rf"(?<![\w$.]){pm_i.group(1)}\s*:", rrm.group("head")
                    )
                ):
                    raise CypherUnsupported(
                        f"REMOVE…RETURN where the removed property "
                        f"{pm_i.group(1)!r} also appears in the match "
                        "predicates is unsupported (the post-write "
                        "re-match would diverge from bind-then-update)"
                    )
            rm2 = _REMOVE_RE.match(
                f"{rrm.group('head')} REMOVE {rrm.group('items')}"
            )
            summary = _run_text_remove(
                spark, rm2, q_lits,
                params if isinstance(params, dict) else None, store,
            ).summary
            res = run_cypher(
                spark,
                _unmask(
                    f"{rrm.group('head')} RETURN {rrm.group('ret')}", q_lits
                ),
                params,
                store=store,
            )
            return CypherResult(res.df, summary)
        dm = _DELETE_RE.match(masked_q.strip())
        if dm:
            if store is None:
                raise ValueError("DELETE statement needs a GraphStore")
            return _run_text_delete(
                spark, dm, q_lits, params if isinstance(params, dict) else None, store
            )
        rm = _REMOVE_RE.match(masked_q.strip())
        if rm:
            if store is None:
                raise ValueError("REMOVE statement needs a GraphStore")
            return _run_text_remove(
                spark, rm, q_lits, params if isinstance(params, dict) else None, store
            )
    clauses, lits = split_clauses_masked(query)
    is_write = any(c.kind in ("MERGE", "CREATE", "SET") for c in clauses)
    if is_write:
        if store is None:
            raise ValueError("write statement needs a GraphStore")
        cont = _find_write_read_continuation(clauses)
        if cont is not None:
            return _run_write_then_read(
                spark, clauses, cont, params, store, lits
            )
        if _find_write_agg_return(clauses):
            # `MERGE … RETURN count(t)` — synthesize the WITH pipe and
            # reuse the continuation machinery (anchor the written
            # aliases, aggregate through the read compiler)
            synth = clauses[:-1] + [_Clause("WITH", "*"), clauses[-1]]
            return _run_write_then_read(
                spark, synth, len(clauses) - 1, params, store, lits
            )
        return _run_write(spark, clauses, params, store, lits)
    if any(c.kind == "UNWIND" for c in clauses):
        # validate form up front, so the error is about the syntax, not
        # the store; placement is free — a leading UNWIND is the batch
        # point-lookup frame, a mid-pipeline one (after MATCH or WITH)
        # explodes a bound list column (the canonical collect→UNWIND
        # reshaping idiom)
        u0 = next(c for c in clauses if c.kind == "UNWIND")
        if not (
            _UNWIND_RE.match(u0.body)
            or _UNWIND_LIT_RE.match(u0.body)
            or re.match(
                r"^.+?\s+AS\s+\w+\s*$",
                u0.body,
                re.IGNORECASE | re.DOTALL,
            )
        ):
            raise CypherUnsupported(
                f"unsupported UNWIND form: {u0.body!r}"
            )
    if graph is None:
        # statements that touch no graph data (standalone RETURN <expr>,
        # pure UNWIND <literal list>) run against an empty graph — every
        # client smoke-tests with `RETURN 1`
        pure_clauses = bool(clauses) and all(
            c.kind in ("UNWIND", "WITH", "RETURN", "ORDER", "SKIP", "LIMIT")
            for c in clauses
        )
        if store is None:
            if pure_clauses:
                empty = spark.createDataFrame(
                    [], "node_id long, label string, key string"
                )
                graph = Graph(empty, None)
            else:
                raise ValueError("read statement needs a Graph or GraphStore")
        else:
            nodes = store.nodes()
            if nodes is None:
                # an EMPTY store is a legal graph state, not an error:
                # Neo4j answers every read over it — MATCH yields zero
                # rows, aggregates run over nothing, and a statement-
                # leading OPTIONAL MATCH pads its one all-NULL row. Run
                # against the canonical empty graph (Graph synthesizes
                # the empty edge frame itself).
                empty = spark.createDataFrame(
                    [], "node_id long, label string, key string"
                )
                graph = Graph(empty, None)
            else:
                graph = _store_graph(store, nodes)
    read_params = params if isinstance(params, dict) else None
    return CypherResult(_run_read(clauses, graph, lits, read_params), None)


# UNION between whole statements (masked text, so a quoted 'UNION' never
# splits). The capture group distinguishes UNION ALL from plain UNION.
_UNION_SPLIT_RE = re.compile(r"(?<![.$\w])UNION(\s+ALL)?(?![\w$])", re.IGNORECASE)


_FOREACH_ANY_RE = re.compile(
    r"(?<![.$\w])FOREACH\s*\(\s*(?P<var>\w+)\s+IN\s+", re.IGNORECASE
)


def _split_foreach(masked: str):
    """Locate a top-level ``FOREACH (x IN <list> | <update>)`` and split
    the statement into ``(head, var, src, body)`` — head is whatever
    precedes FOREACH ('' for the whole-statement form). Masked text, so
    quoted ``|`` or parens never miscount; the close paren must end the
    statement (Neo4j allows clauses after FOREACH, this subset doesn't).
    Returns None when the statement has no FOREACH (common case,
    zero-cost)."""
    m = _FOREACH_ANY_RE.search(masked)
    if m is None:
        return None
    # find the matching close paren of FOREACH( by depth count
    depth, start = 1, m.end()
    i, bar = start, None
    while i < len(masked):
        ch = masked[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                break
        elif ch == "|" and depth == 1 and bar is None:
            bar = i
        i += 1
    if depth != 0 or bar is None:
        raise CypherUnsupported(
            "FOREACH needs the form FOREACH (x IN <list> | <update clause>)"
        )
    if masked[i + 1 :].strip():
        raise CypherUnsupported(
            "FOREACH must end the statement (no trailing clauses)"
        )
    src = masked[start:bar].strip()
    body = masked[bar + 1 : i].strip()
    if not src or not body:
        raise CypherUnsupported(
            "FOREACH needs the form FOREACH (x IN <list> | <update clause>)"
        )
    return masked[: m.start()], m.group("var"), src, body


def _run_foreach_seq(
    spark: SparkSession,
    head: str,
    var: str,
    src: str,
    body: str,
    lits: list[str],
    params: dict | DataFrame | None,
    *,
    store: GraphStore | None,
    graph: Graph | None,
) -> CypherResult:
    """``MATCH … FOREACH (x IN <literal list> | <update>)`` — Neo4j
    applies the update once per element IN ORDER: later iterations see
    earlier writes, so a repeatedly-SET property ends at the LAST
    element's value. The batch-UNWIND rewrite cannot promise that order
    (within-batch dedup is content-keyed), so the read-prefix form
    replays the body SEQUENTIALLY — one bucketed batch write per
    element, exactly Neo4j's loop, counters summed. The element list
    must be a literal (or a literal-bounds ``range()``, Neo4j-inclusive
    on both ends): FOREACH lists are loop programs, small by
    construction — a data-sized per-row list wants UNWIND's one batched
    write instead, and refuses honestly here."""
    src = src.strip()
    rm = re.match(
        r"^range\(\s*(-?\d+)\s*,\s*(-?\d+)(?:\s*,\s*(-?\d+))?\s*\)$",
        src,
        re.IGNORECASE,
    )
    if rm:
        a, b, step = int(rm.group(1)), int(rm.group(2)), int(rm.group(3) or 1)
        if step == 0:
            raise CypherUnsupported("range() step must be non-zero")
        vals = list(range(a, b + (1 if step > 0 else -1), step))
    elif src.startswith("[") and src.endswith("]"):
        vals = _unwind_literal_values(
            src[1:-1], lits, params if isinstance(params, dict) else None
        )
    else:
        raise CypherUnsupported(
            "FOREACH after a read prefix needs a literal list or a "
            f"literal range(): {_unmask(src, lits)!r}"
        )
    # Neo4j matches ONCE, then iterates: body writes must not re-shape
    # the head's match set between elements (`MATCH (n:N) WHERE n.rank
    # IS NULL FOREACH (x IN [1,2,3] | SET n.rank = x)` must end at 3 —
    # re-running the head after iteration 1 would find nothing). Pin a
    # single-node labeled head by materializing its matched keys up
    # front and replaying every element against the pinned key set;
    # per-iteration VALUE reads stay current (`SET n.c = n.c + 1` still
    # accumulates), only the MEMBERSHIP is frozen — exactly Neo4j's
    # reference-row semantics. Heads this subset can't pin (relationship
    # patterns, inline props) keep the re-run replay.
    pin = re.match(
        r"^MATCH\s+\(\s*(?P<a>\w+)\s*:\s*(?P<l>\w+)\s*\)\s*"
        r"(?P<w>WHERE\s+.+)?$",
        head.strip(),
        re.IGNORECASE | re.DOTALL,
    )
    if pin is not None and store is not None:
        a0, l0 = pin.group("a"), pin.group("l")
        kres = run_cypher(
            spark,
            _unmask(f"{head.strip()} RETURN {a0}.key AS _pk", lits),
            params,
            store=store,
            graph=graph,
        )
        pinned = [r["_pk"] for r in kres.df.collect()]
        if not pinned:
            return CypherResult(None, WriteSummary())
        if len(pinned) > 100_000:
            raise CypherUnsupported(
                "FOREACH after a read prefix pins the matched set "
                f"({len(pinned)} rows is past the 100k loop-program "
                "bound) — batch-sized writes want UNWIND's one batched "
                "write instead"
            )
        esc = ", ".join(
            "'" + str(k).replace("\\", "\\\\").replace("'", "\\'") + "'"
            for k in pinned
        )
        head = f"MATCH ({a0}:{l0}) WHERE {a0}.key IN [{esc}]"
    ref = re.compile(rf"(?<![\w$.]){re.escape(var)}(?![\w$.(])")
    total = WriteSummary()
    for v in vals:
        new_lits = list(lits)
        if isinstance(v, str):
            new_lits.append(v)
            tok = f"\x00{len(new_lits) - 1}\x00"
        elif v is None:
            tok = "null"
        elif isinstance(v, bool):
            tok = "true" if v else "false"
        else:
            tok = repr(v)
        stmt = f"{head.strip()} {ref.sub(tok, body)}".strip()
        res = run_cypher(
            spark, _unmask(stmt, new_lits), params, store=store, graph=graph
        )
        if res.summary is not None:
            total = total + res.summary
    return CypherResult(None, total)


def _unmask(text: str, lits: list[str]) -> str:
    """Inverse of :func:`_mask_strings`: restore quoted literals so a
    statement fragment can re-enter :func:`run_cypher` whole."""
    return re.sub(r"\x00(\d+)\x00", lambda m: f"'{lits[int(m.group(1))]}'", text)


def _run_union(
    spark: SparkSession,
    parts: list[str],
    lits: list[str],
    params: dict | DataFrame | None,
    *,
    store: GraphStore | None,
    graph: Graph | None,
) -> CypherResult:
    """``MATCH … RETURN … UNION [ALL] MATCH … RETURN …`` — each branch
    compiles independently through the read path and the results combine
    with ``unionByName`` (+ ``dropDuplicates`` for distinct UNION, which
    is openCypher's default). Neo4j's rules are enforced: read-only
    branches, identical RETURN column names everywhere, and no mixing of
    UNION with UNION ALL in one statement. The union is a zero-shuffle
    concatenation for ALL; distinct adds the one hash exchange the
    semantics require."""
    stmts = [p.strip() for p in parts[0::2]]
    alls = {bool(f and f.strip()) for f in parts[1::2]}
    if len(alls) > 1:
        raise CypherUnsupported(
            "mixing UNION and UNION ALL in one statement is not allowed"
        )
    bad = next(
        (
            s
            for s in stmts
            if re.search(
                r"(?<![.$\w])(MERGE|CREATE|SET|DELETE|REMOVE|DETACH)\b",
                s,
                re.IGNORECASE,
            )
        ),
        None,
    )
    if bad is not None:
        raise CypherUnsupported("UNION supports read statements only")
    if any(not s for s in stmts):
        raise CypherUnsupported("empty statement in UNION")
    # a trailing ORDER BY [SKIP/LIMIT] on the LAST branch scopes to the
    # WHOLE union result (a per-branch sort cannot survive the union
    # concat anyway; Neo4j's own rule is final-result ordering). Only
    # simple output-column keys hoist — anything else stays put and the
    # branch compiles as written.
    union_tail = re.search(
        r"\s+ORDER\s+BY\s+"
        r"(?P<keys>\w+(?:\s+(?:ASC|DESC))?(?:\s*,\s*\w+(?:\s+(?:ASC|DESC))?)*)"
        r"(?:\s+SKIP\s+(?P<skip>\$?\w+))?(?:\s+LIMIT\s+(?P<limit>\$?\w+))?"
        r"\s*$",
        stmts[-1],
        re.IGNORECASE,
    )
    if union_tail is not None:
        stmts[-1] = stmts[-1][: union_tail.start()].strip()
    frames: list[DataFrame] = []
    for s in stmts:
        res = run_cypher(spark, _unmask(s, lits), params, store=store, graph=graph)
        if res.df is None:
            raise CypherUnsupported("UNION branch produced no rows frame")
        frames.append(res.df)
    cols0 = frames[0].columns
    for f in frames[1:]:
        if sorted(f.columns) != sorted(cols0):
            raise CypherUnsupported(
                f"UNION requires identical RETURN columns: {cols0} vs {f.columns}"
            )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    if not alls.pop():
        out = out.dropDuplicates()
    if union_tail is not None:
        sorts = []
        for k in _split_top_commas(union_tail.group("keys")):
            km = re.fullmatch(
                r"(\w+)(?:\s+(ASC|DESC))?", k.strip(), re.IGNORECASE
            )
            name0, dirn = km.group(1), (km.group(2) or "ASC").upper()
            if name0 not in out.columns:
                raise CypherUnsupported(
                    f"UNION ORDER BY key {name0!r} is not a RETURN column"
                )
            sorts.append(
                F.col(name0).desc_nulls_first()
                if dirn == "DESC"
                else F.col(name0).asc_nulls_last()
            )
        out = out.orderBy(*sorts)
        pd0 = params if isinstance(params, dict) else None
        u_skip = (
            _page_count(union_tail.group("skip"), pd0, "SKIP")
            if union_tail.group("skip")
            else None
        )
        u_limit = (
            _page_count(union_tail.group("limit"), pd0, "LIMIT")
            if union_tail.group("limit")
            else None
        )
        out = _page(out, u_skip, u_limit)
    return CypherResult(out, None)


_CALL_SUBQ_RE = re.compile(r"(?<![.$\w])CALL\s*\{", re.IGNORECASE)


_TXN_TAIL_RE = re.compile(
    r"^\s*IN\s+TRANSACTIONS(?:\s+OF\s+(?P<n>\d+)\s+ROWS?)?\s*$", re.IGNORECASE
)
_TXN_PRE_RE = re.compile(
    r"^\s*UNWIND\s+(?P<src>.+?)\s+AS\s+(?P<var>\w+)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_TXN_IMPORT_RE = re.compile(
    r"^\s*WITH\s+(?P<var>\w+)\s+(?P<body>.+)$", re.IGNORECASE | re.DOTALL
)


def _rewrite_call_in_transactions(subq: tuple[str, str, str]) -> str | None:
    """Neo4j's bulk-ingest idiom ``UNWIND <rows> AS row CALL { WITH row
    <write> } IN TRANSACTIONS [OF n ROWS]`` → the engine's batched write
    statement ``UNWIND <rows> AS row <write>`` (masked text in, masked
    text out). Returns None when the tail is not IN TRANSACTIONS; raises
    on any other shape — the chunked-commit protocol has exactly one
    Spark-first meaning (one bucketed versioned write over the whole
    frame), so only the canonical shape is accepted.
    """
    pre, inner, post = subq
    if _TXN_TAIL_RE.match(post) is None:
        if re.match(r"^\s*IN\s+TRANSACTIONS\b", post, re.IGNORECASE):
            raise CypherUnsupported(
                "IN TRANSACTIONS tail must be exactly "
                "'IN TRANSACTIONS [OF n ROWS]'"
            )
        return None
    um = _TXN_PRE_RE.match(pre)
    if um is None:
        raise CypherUnsupported(
            "CALL { … } IN TRANSACTIONS supports the bulk-ingest idiom "
            "only: UNWIND <rows> AS row CALL { WITH row <write> } "
            "IN TRANSACTIONS [OF n ROWS]"
        )
    im = _TXN_IMPORT_RE.match(inner.strip())
    if im is None or im.group("var") != um.group("var"):
        raise CypherUnsupported(
            "the IN TRANSACTIONS subquery must start by importing the "
            "UNWIND variable: CALL { WITH row … }"
        )
    body = im.group("body").strip()
    if not re.match(r"^\s*(MERGE|CREATE)\b", body, re.IGNORECASE):
        raise CypherUnsupported(
            "the IN TRANSACTIONS subquery must be a MERGE/CREATE write"
        )
    return f"UNWIND {um.group('src')} AS {um.group('var')} {body}"


def _split_call_subquery(masked: str) -> tuple[str, str, str] | None:
    """Find a top-level ``CALL { … }`` in masked statement text and split
    into (pre, inner, post) around it by brace balancing (string literals
    are already sentinels, so quoted braces cannot confuse the count).
    Returns None when the statement has no CALL-brace form."""
    m = _CALL_SUBQ_RE.search(masked)
    if m is None:
        return None
    depth = 0
    for i in range(m.end() - 1, len(masked)):
        if masked[i] == "{":
            depth += 1
        elif masked[i] == "}":
            depth -= 1
            if depth == 0:
                return masked[: m.start()], masked[m.end() : i], masked[i + 1 :]
    raise CypherUnsupported("unbalanced braces in CALL { … }")


# NOTE: _is_agg_item is defined ONCE near the aggregate regexes (top of
# file); a second copy here used to shadow it at import time and the two
# drifted — keep a single source of truth.


def _apply_flat_tail(
    df: DataFrame,
    tail: str,
    lits: list[str],
    params: dict | None,
) -> DataFrame:
    """Run a ``[WHERE …] RETURN … [ORDER BY …] [SKIP n] [LIMIT n]`` tail
    over a FLAT frame (subquery output names are plain columns). The
    aggregating form routes through :func:`_aggregate_return` with an
    empty alias map — Cypher's implicit-grouping rule applies to the
    subquery's columns exactly as it would to WITH names — and the plain
    form reuses the post-WITH projector."""
    clauses, tail_lits = split_clauses_masked(_unmask(tail, lits))
    if not any(c.kind == "RETURN" for c in clauses):
        raise CypherUnsupported("CALL { … } needs a RETURN tail")
    returns: list[str] = []
    order_by: list[tuple[str, bool]] = []
    skip: int | None = None
    limit: int | None = None
    for c in clauses:
        if c.kind == "WHERE":
            for item in re.split(r"\s+AND\s+", c.body, flags=re.IGNORECASE):
                m = _POST_WHERE_RE.match(item.strip())
                if not m or m.group("name") not in df.columns:
                    raise CypherUnsupported(
                        f"unsupported WHERE after CALL subquery: {item!r}"
                    )
                df = df.filter(
                    _OPS[m.group("op")](
                        F.col(m.group("name")),
                        F.lit(_where_value(m.group("val"), tail_lits, params)),
                    )
                )
        elif c.kind == "RETURN":
            returns = _split_top_commas(c.body)
        elif c.kind == "ORDER":
            body = re.sub(r"^BY\s+", "", c.body, flags=re.IGNORECASE)
            for item in _split_top_commas(body):
                m = re.match(
                    r"^(?P<key>\w+)(?:\s+(?P<dir>ASC|DESC))?$", item, re.IGNORECASE
                )
                if not m:
                    raise CypherUnsupported(f"unsupported ORDER BY item: {item!r}")
                order_by.append(
                    (m.group("key"), (m.group("dir") or "ASC").upper() == "DESC")
                )
        elif c.kind == "SKIP":
            skip = _page_count(c.body, params, "SKIP")
        elif c.kind == "LIMIT":
            limit = _page_count(c.body, params, "LIMIT")
        else:
            raise CypherUnsupported(f"{c.kind} unsupported after CALL {{ … }}")
    if any(_is_agg_item(i) for i in returns):
        return _aggregate_return(
            df, returns, {}, None, order_by, skip, limit, tail_lits, params
        )
    ret = _Clause("RETURN", " , ".join(returns))
    rest = [_Clause("ORDER", "BY " + ", ".join(
        f"{k} {'DESC' if d else 'ASC'}" for k, d in order_by
    ))] if order_by else []
    if skip is not None:
        rest.append(_Clause("SKIP", str(skip)))
    if limit is not None:
        rest.append(_Clause("LIMIT", str(limit)))
    return _run_post_with(df, [ret] + rest, tail_lits, params)


def _run_call_subquery(
    spark: SparkSession,
    parts: tuple[str, str, str],
    lits: list[str],
    params: dict | DataFrame | None,
    *,
    store: GraphStore | None,
    graph: Graph | None,
) -> CypherResult:
    """``CALL { … }`` subqueries (openCypher §15), two shapes:

    1. **Leading, uncorrelated** — ``CALL { <stmt> [UNION <stmt>] }
       RETURN …``: the inner statement compiles through the normal read
       path (UNION branches included), and the outer tail projects,
       filters, or AGGREGATES over its columns — the canonical
       post-UNION-aggregation idiom Neo4j added CALL subqueries for
       (plain UNION cannot be aggregated without one).
    2. **Correlated per-row aggregate** — ``MATCH (p:L) CALL { WITH p
       MATCH (p)-[:T]->(x) [WHERE …] RETURN count(x) AS c } RETURN …``:
       rewritten source-to-source into ``MATCH (p:L) OPTIONAL MATCH
       (p)-[:T]->(x) [WHERE …] WITH p, count(x) AS c RETURN …`` — both
       forms mean "for each outer row, aggregate over the subquery's
       matches, 0/empty when none" (OPTIONAL's unmatched side yields a
       NULL binding that count() skips; the importing WITH becomes the
       entity grouping key, which groups by node IDENTITY). The rewrite
       compiles to one extra hash join + one aggregation — no per-row
       re-execution, which is what makes the shape survive 100 TB.

    Everything else (unit/write subqueries, uncorrelated mid-pipeline
    CALL, non-aggregate correlated RETURN, subqueries IN TRANSACTIONS)
    is refused by name.
    """
    pre, inner, post = (p.strip() for p in parts)
    if not inner:
        raise CypherUnsupported("empty CALL { … } subquery")
    if re.search(
        r"(?<![.$\w])(MERGE|CREATE|SET|DELETE|REMOVE|DETACH)\b",
        inner,
        re.IGNORECASE,
    ):
        raise CypherUnsupported(
            "CALL { … } supports read subqueries only (write subqueries "
            "execute eagerly in the batched upsert path)"
        )
    if re.match(r"^\s*IN\s+TRANSACTIONS\b", post, re.IGNORECASE):
        raise CypherUnsupported("CALL { … } IN TRANSACTIONS is outside the subset")
    imp = re.match(r"^WITH\s+(?P<names>\w+(?:\s*,\s*\w+)*)\s+(?=MATCH|OPTIONAL)",
                   inner, re.IGNORECASE)
    if not pre:
        if imp:
            raise CypherUnsupported(
                "importing WITH in CALL { … } needs a preceding MATCH"
            )
        if not post.strip():
            raise CypherUnsupported("CALL { … } needs a RETURN tail")
        sub = run_cypher(
            spark, _unmask(inner, lits), params, store=store, graph=graph
        )
        if sub.df is None:
            raise CypherUnsupported("CALL { … } subquery produced no rows frame")
        read_params = params if isinstance(params, dict) else None
        return CypherResult(
            _apply_flat_tail(sub.df, post, lits, read_params), None
        )
    if not imp:
        # uncorrelated CALL { … } AFTER a MATCH — openCypher executes
        # the subquery once per incoming row; uncorrelated, every row
        # gets the same result set, so the semantics ARE a cross join
        # of the outer frame with the subquery frame (the idiomatic
        # shape is a 1-row aggregate — "attach the corpus total to
        # every row" — where the cross join is a broadcast of one row).
        # Compile the inner statement independently, then run the outer
        # clauses with the subquery frame as the broadcast seed.
        sub = run_cypher(
            spark, _unmask(inner, lits), params, store=store, graph=graph
        )
        if sub.df is None:
            raise CypherUnsupported(
                "CALL { … } subquery produced no rows frame"
            )
        outer_clauses, outer_lits = split_clauses_masked(
            _unmask(pre + " " + post, lits)
        )
        g = graph
        if g is None:
            if store is None:
                raise CypherUnsupported(
                    "CALL { … } needs a Graph or GraphStore"
                )
            nodes = store.nodes()
            if nodes is None:
                raise ValueError("store is empty")
            g = _store_graph(store, nodes)
        return CypherResult(
            _run_read(
                outer_clauses, g, outer_lits,
                params if isinstance(params, dict) else None,
                seed=sub.df,
            ),
            None,
        )
    body = inner[imp.end():].strip()
    bm = re.match(
        r"^(?:OPTIONAL\s+)?MATCH\s+(?P<rest>.+?)\s+RETURN\s+(?P<ret>.+)$",
        body,
        re.IGNORECASE | re.DOTALL,
    )
    if not bm:
        raise CypherUnsupported(
            f"correlated CALL {{ … }} supports WITH <aliases> MATCH … "
            f"RETURN <aggregates>: {body!r}"
        )
    ret_items = _split_top_commas(bm.group("ret"))
    not_agg = next((i for i in ret_items if not _is_agg_item(i)), None)
    if not_agg is not None:
        raise CypherUnsupported(
            "correlated CALL { … } must RETURN aggregates only (general "
            f"row-multiplying subqueries are outside the subset): {not_agg!r}"
        )
    no_name = next(
        (i for i in ret_items
         if not re.search(r"\s+AS\s+\w+\s*$", i, re.IGNORECASE)),
        None,
    )
    if no_name is not None:
        raise CypherUnsupported(
            f"correlated CALL {{ … }} aggregates need AS names: {no_name!r}"
        )
    imports = [n.strip() for n in imp.group("names").split(",")]
    rest = bm.group("rest").strip()
    # the OPTIONAL expand wants the BOUND alias as the pattern source;
    # `WITH p MATCH (a:Art)-[:BY]->(p)` writes it as the destination, so
    # flip the pattern (reversing the arrow preserves semantics exactly)
    wm = re.match(r"^(?P<pat>.+?)\s+WHERE\s+(?P<cond>.+)$", rest,
                  re.IGNORECASE | re.DOTALL)
    pat = (wm.group("pat") if wm else rest).strip()
    pm = _REL_RE.match(pat)
    if (
        pm
        and imports
        and pm.group("dst_alias") == imports[0]
        and pm.group("src_alias") != imports[0]
        and not pm.group("star")
    ):
        d = _rel_direction(pm)
        arrow_l, arrow_r = ("<", "") if d == "out" else ("", ">") if d == "in" else ("", "")
        rel_bits = pm.group("rel_alias") or ""
        if pm.group("rel_type"):
            rel_bits += f":{pm.group('rel_type')}"
        if pm.group("rel_props"):
            rel_bits += f" {pm.group('rel_props')}"
        def _node_txt(alias, label):
            return f"({alias or ''}{':' + label if label else ''})"
        pat = (
            _node_txt(pm.group("dst_alias"), pm.group("dst_label"))
            + f"{arrow_l}-[{rel_bits}]-{arrow_r}"
            + _node_txt(pm.group("src_alias"), pm.group("src_label"))
        )
    rest = pat + (f" WHERE {wm.group('cond')}" if wm else "")
    rewritten = (
        f"{pre} OPTIONAL MATCH {rest} "
        f"WITH {', '.join(imports + ret_items)} {post}"
    )
    return run_cypher(
        spark, _unmask(rewritten, lits), params, store=store, graph=graph
    )


def _params_frame(spark: SparkSession, params: dict | DataFrame | None) -> DataFrame:
    if isinstance(params, DataFrame):
        return params
    if not params:
        # an all-literal statement (CREATE (a:P {name: 'Alice'})) binds no
        # params — one logical record; a $param reference against this frame
        # surfaces as an unresolved-column error naming the parameter
        return spark.createDataFrame([(1,)], ["_one"])
    return spark.createDataFrame([tuple(params.values())], list(params.keys()))


_UNWIND_RE = re.compile(r"^\$(\w+)\s+AS\s+(\w+)$", re.IGNORECASE)

# UNWIND [1, 2, 'x'] AS v — literal-list form (the smoke-test idiom)
_UNWIND_LIT_RE = re.compile(
    r"^\[(?P<items>[^\]]*)\]\s+AS\s+(?P<alias>\w+)$", re.IGNORECASE
)


def _unwind_literal_values(
    items: str, lits: list[str], params: dict | None
) -> list:
    """Resolve the element tokens of a literal UNWIND list (numbers,
    masked string literals, $params) to Python values."""
    toks = _split_top_commas(items)
    if not toks:
        raise CypherUnsupported("UNWIND literal list is empty")
    out = []
    for t in toks:
        try:
            out.append(_where_value(t.strip(), lits, params))
        except ValueError:
            raise CypherUnsupported(
                f"unsupported UNWIND list element: {t.strip()!r}"
            ) from None
    return out


def _apply_unwind(
    spark: SparkSession,
    clauses: list[_Clause],
    params: dict | DataFrame | None,
    lits: list[str] | None = None,
) -> tuple[list[_Clause], DataFrame]:
    """``UNWIND $rows AS row`` — Neo4j's batched-ingest idiom (the fix
    every reference user applies to the per-record loop at
    /root/reference/src/crwling.py:58-60). The row alias is sugar over
    the batch DataFrame this engine is already native in: ``row.col``
    references rewrite to ``$col``, and the rows param (a DataFrame, or
    a list of dicts for the literal Neo4j call shape) IS the batch.
    ``UNWIND [v1, v2, …] AS x`` is the literal-list form: the scalar
    alias becomes a 1-column batch and bare ``x`` references rewrite to
    the ``$x`` parameter.
    """
    um = _UNWIND_RE.match(clauses[0].body)
    if not um:
        lm = _UNWIND_LIT_RE.match(clauses[0].body)
        if not lm:
            # UNWIND <frame-independent list expression> AS x leading a
            # write (the FOREACH rewrite lands here for range()/
            # comprehension sources) — same dummy-frame compile as the
            # read path
            xm = re.match(
                r"^(?P<expr>.+?)\s+AS\s+(?P<alias>\w+)\s*$",
                clauses[0].body,
                re.IGNORECASE | re.DOTALL,
            )
            if not xm:
                raise CypherUnsupported(
                    f"unsupported UNWIND form: {clauses[0].body!r}"
                )
            dummy = spark.range(1)
            col, tag = _compile_scalar(
                _parse_scalar_expr(xm.group("expr")),
                dummy,
                {},
                None,
                lits or [],
                params if isinstance(params, dict) else None,
            )
            if tag not in ("list", "other"):
                raise CypherUnsupported(
                    f"UNWIND needs a list expression, got {tag}"
                )
            alias = xm.group("alias")
            pdf = dummy.select(F.explode(col).alias(alias))
            ref = re.compile(rf"(?<![\w$.]){re.escape(alias)}(?![\w$.(])")
            return (
                [
                    _Clause(c.kind, ref.sub(f"${alias}", c.body))
                    for c in clauses[1:]
                ],
                pdf,
            )
        alias = lm.group("alias")
        toks0 = _split_top_commas(lm.group("items"))
        if toks0 and toks0[0].lstrip().startswith("{"):
            # `UNWIND [{link:'u1'}, {link:'u2'}] AS row MERGE (:L {k:
            # row.link})` — the literal map-list batch-insert idiom:
            # each map becomes one batch row (missing keys NULL-pad),
            # `row.col` references rewrite to the batch columns exactly
            # like the $rows list-of-dicts form
            dict_rows: list[dict] = []
            for t in toks0:
                mm = re.match(r"^\{(?P<body>.*)\}$", t.strip(), re.DOTALL)
                if not mm:
                    raise CypherUnsupported(
                        f"UNWIND list mixes maps with scalars: {t.strip()!r}"
                    )
                d = {}
                for pair in _split_top_commas(mm.group("body")):
                    km = re.match(r"^\s*(\w+)\s*:\s*(.+)$", pair, re.DOTALL)
                    if not km:
                        raise CypherUnsupported(
                            f"unsupported map entry in UNWIND: {pair!r}"
                        )
                    d[km.group(1)] = _where_value(
                        km.group(2).strip(),
                        lits or [],
                        params if isinstance(params, dict) else None,
                    )
                dict_rows.append(d)
            allkeys = sorted({k for d in dict_rows for k in d})
            pdf = spark.createDataFrame(
                [tuple(d.get(k) for k in allkeys) for d in dict_rows],
                allkeys,
            )
            mref = re.compile(rf"(?<![\w$.]){re.escape(alias)}\.(\w+)")
            return (
                [
                    _Clause(c.kind, mref.sub(r"$\1", c.body))
                    for c in clauses[1:]
                ],
                pdf,
            )
        vals = _unwind_literal_values(
            lm.group("items"),
            lits or [],
            params if isinstance(params, dict) else None,
        )
        pdf = spark.createDataFrame([(v,) for v in vals], [alias])
        ref = re.compile(rf"(?<![\w$.]){re.escape(alias)}(?![\w$.(])")
        return (
            [_Clause(c.kind, ref.sub(f"${alias}", c.body)) for c in clauses[1:]],
            pdf,
        )
    pname, alias = um.group(1), um.group(2)
    if isinstance(params, DataFrame):
        pdf = params
    elif isinstance(params, dict) and isinstance(params.get(pname), list):
        rows = params[pname]
        if not rows:
            raise ValueError(f"UNWIND ${pname} is empty")
        if not all(isinstance(r0, dict) for r0 in rows):
            # scalar list param — `UNWIND $xs AS x MERGE (:L {k: x})`:
            # the 1-column twin of the literal-list form; bare alias
            # references rewrite to the batch column
            pdf = spark.createDataFrame([(v,) for v in rows], [alias])
            sref = re.compile(rf"(?<![\w$.]){re.escape(alias)}(?![\w$.(])")
            return (
                [
                    _Clause(c.kind, sref.sub(f"${alias}", c.body))
                    for c in clauses[1:]
                ],
                pdf,
            )
        pdf = spark.createDataFrame(rows)
    else:
        raise CypherUnsupported(
            f"UNWIND ${pname} needs a DataFrame param or a list of dicts"
        )
    ref = re.compile(rf"(?<![\w$.]){re.escape(alias)}\.(\w+)")
    return [_Clause(c.kind, ref.sub(r"$\1", c.body)) for c in clauses[1:]], pdf


def _derive_write_batch(
    spark: SparkSession,
    clauses: list[_Clause],
    params: dict | DataFrame | None,
    store: GraphStore,
    lits: list[str] | None,
):
    """Derived writes: a READ prefix feeding MERGE/CREATE —
    ``MATCH (a:Doc) MERGE (b:Mirror {key: a.link})`` or ``MATCH … WITH
    a.grp AS g MERGE (x:Grp {key: g})`` — Neo4j's derive-then-upsert
    bulk idiom. The prefix compiles through the ordinary READ compiler
    (one distributed plan, WHERE pushdown and all), its result frame
    becomes the write BATCH (exactly the UNWIND-$rows shape), and the
    suffix's ``alias.prop`` / WITH-name references rewrite to batch
    params. Returns (suffix_clauses, batch_frame), or None when the
    statement is not this shape (anchored key-prop MATCH writes and
    plain pattern writes keep their existing paths)."""
    widx = next(
        (i for i, c in enumerate(clauses) if c.kind in ("MERGE", "CREATE")),
        None,
    )
    if not widx:  # no write clause, or nothing before it
        return None
    prefix, suffix = clauses[:widx], clauses[widx:]
    if prefix[0].kind != "MATCH" or any(
        c.kind not in ("MATCH", "OPTIONAL_MATCH", "WHERE", "WITH")
        for c in prefix
    ):
        return None
    anchored_shape = all(
        c.kind in ("MATCH", "OPTIONAL_MATCH") and "{" in c.body
        for c in prefix
    )
    # read-bound aliases: node aliases in the prefix patterns, plus the
    # last WITH's output names (flat columns)
    read_aliases: set[str] = set()
    for c in prefix:
        if c.kind in ("MATCH", "OPTIONAL_MATCH"):
            read_aliases.update(re.findall(r"\(\s*(\w+)", c.body))
    with_names: set[str] = set()
    last_with = next((c for c in reversed(prefix) if c.kind == "WITH"), None)
    if last_with is not None:
        wb = re.sub(r"^DISTINCT\s+", "", last_with.body, flags=re.IGNORECASE)
        for it in _split_top_commas(wb):
            am = _EXPR_AS_RE.match(it)
            with_names.add(am.group("out") if am else it.strip())
        read_aliases &= with_names  # aliases that survived the horizon
    # alias.prop references in the suffix that belong to the read scope
    refs: dict[tuple[str, str], str] = {}
    write_refs = 0  # prop refs inside WRITE clauses (RETURN items are
    # the write-RETURN machinery's to resolve — they must not force the
    # derive path, whose $-param rewrite that machinery can't parse)
    for c in suffix:
        for mm in re.finditer(r"(?<![\w$])(\w+)\.(\w+)(?![\w(])", c.body):
            if mm.group(1) in read_aliases:
                refs.setdefault(
                    (mm.group(1), mm.group(2)),
                    f"__w_{mm.group(1)}_{mm.group(2)}",
                )
                if c.kind != "RETURN":
                    write_refs += 1
    # the anchored-write path owns key-prop MATCH prefixes with no
    # WHERE/WITH — `MATCH (a:L {k: $p}) MERGE (a)-[:T]->(…)` — UNLESS
    # a WRITE clause reads a prefix alias's PROPERTY (`MERGE (y:Year
    # {y: a.year})`): that derive-then-upsert shape needs the read
    # compiler, so it stays here
    if anchored_shape and not write_refs:
        return None
    bare: set[str] = set()
    for c in suffix:
        for nm in re.findall(r"(?<![\w$.])(\w+)(?![\w$.(])", c.body):
            if nm in with_names and nm not in read_aliases:
                bare.add(nm)
    # bare read aliases as write-pattern ENDPOINTS — `MATCH (a:A), (b:B)
    # WHERE … MERGE (a)-[:T]->(b)`, Neo4j's create-edge-between-matched
    # idiom: each such `(alias)` re-anchors as a key-map node
    # (`(alias:Label {key: $__w_alias_key})`), which the existing
    # path-write MERGE decomposes to idempotent node re-upserts + the
    # relationship upsert. Labels come from the MATCH prefix (static,
    # single-label — alternation endpoints refuse honestly downstream
    # by never matching this rewrite).
    alias_labels: dict[str, str] = {}
    for c in prefix:
        if c.kind in ("MATCH", "OPTIONAL_MATCH"):
            for am, lm in re.findall(r"\(\s*(\w+)\s*:\s*(\w+)\s*[),{]", c.body):
                alias_labels.setdefault(am, lm)
    endpoint_rewrites: dict[str, str] = {}
    for c in suffix:
        if c.kind not in ("MERGE", "CREATE"):
            continue
        for nm in re.findall(r"\(\s*(\w+)\s*\)", c.body):
            if nm in read_aliases and nm in alias_labels:
                out = f"__w_{nm}_key"
                refs.setdefault((nm, "key"), out)
                endpoint_rewrites[nm] = (
                    f"({nm}:{alias_labels[nm]} {{key: ${out}}})"
                )
    if not refs and not bare:
        return None  # suffix doesn't consume the read — not this shape
    ret_items = [f"{a}.{pr} AS {out}" for (a, pr), out in refs.items()]
    ret_items += sorted(bare)
    read_clauses = prefix + [_Clause("RETURN", ", ".join(ret_items))]
    nodes_df = store.nodes()
    if nodes_df is None:
        raise ValueError("store is empty")
    frame = _run_read(
        read_clauses,
        _store_graph(store, nodes_df),
        lits,
        params if isinstance(params, dict) else None,
    )
    # rewrite the suffix onto the batch: a.link → $__w_a_link, g → $g,
    # bare endpoints (a) → (a:Label {key: $__w_a_key})
    new_suffix = []
    for c in suffix:
        body = c.body
        if c.kind in ("MERGE", "CREATE"):
            for nm, repl in endpoint_rewrites.items():
                body = re.sub(rf"\(\s*{re.escape(nm)}\s*\)", repl, body)
        for (a, pr), out in refs.items():
            body = re.sub(
                rf"(?<![\w$]){re.escape(a)}\.{re.escape(pr)}(?![\w(])",
                f"${out}",
                body,
            )
        for nm in bare:
            body = re.sub(
                rf"(?<![\w$.]){re.escape(nm)}(?![\w$.(])", f"${nm}", body
            )
        new_suffix.append(_Clause(c.kind, body))
    # scalar params ride along as broadcast 1-row columns
    if isinstance(params, dict) and params:
        scal = {k: v for k, v in params.items() if not isinstance(v, list)}
        if scal:
            frame = frame.crossJoin(F.broadcast(_params_frame(spark, scal)))
    return new_suffix, frame


def _run_write(
    spark: SparkSession,
    clauses: list[_Clause],
    params: dict | DataFrame | None,
    store: GraphStore,
    lits: list[str] | None = None,
) -> CypherResult:
    if clauses and clauses[0].kind == "UNWIND":
        clauses, pdf = _apply_unwind(spark, clauses, params, lits)
    else:
        derived = _derive_write_batch(spark, clauses, params, store, lits)
        if derived is not None:
            clauses, pdf = derived
        else:
            if any(c.kind == "UNWIND" for c in clauses):
                raise CypherUnsupported("UNWIND must lead the write statement")
            if any(c.kind == "WHERE" for c in clauses):
                # WHERE belongs to a derived-write read prefix; a plain
                # pattern write has no frame to filter
                raise CypherUnsupported(
                    "WHERE in a write statement needs a read prefix "
                    "feeding MERGE/CREATE (the derived-write shape)"
                )
            pdf = _params_frame(spark, params)
    nodes: dict[str, _NodePattern] = {}
    node_order: list[str] = []
    edges: list[_EdgePattern] = []
    edge_aliases: dict[str, _EdgePattern] = {}  # `r` in [r:T] → its pattern
    returns: list[str] = []

    # `ON CREATE SET …` / `ON MATCH SET …` markers get cut up by the
    # clause splitter: CREATE and MATCH are both clause keywords, so the
    # previous body ends with a bare `ON` followed by an EMPTY
    # CREATE/MATCH clause. Normalize both into a mode tag on the
    # following SET clause.
    set_modes: dict[int, str] = {}
    stripped: list[_Clause] = []
    i = 0
    while i < len(clauses):
        c = clauses[i]
        mm = re.search(r"\bON\s*$", c.body, re.IGNORECASE)
        if (
            mm
            and i + 1 < len(clauses)
            and clauses[i + 1].kind in ("CREATE", "MATCH")
            and not clauses[i + 1].body.strip()
        ):
            stripped.append(_Clause(c.kind, c.body[: mm.start()].rstrip()))
            set_modes[len(stripped)] = clauses[i + 1].kind
            i += 2  # the empty CREATE/MATCH clause was the marker's second half
        else:
            stripped.append(c)
            i += 1
    clauses = stripped
    for idx, mode in set_modes.items():
        if idx >= len(clauses) or clauses[idx].kind != "SET":
            raise CypherUnsupported(f"ON {mode} must be followed by SET")

    for ci, c in enumerate(clauses):
        if c.kind == "MATCH":
            # MATCH-anchored write: `MATCH (a:L {k: $p}) … MERGE (a)-[:T]->(…)`
            # — Neo4j's bind-existing-then-write idiom. Anchors are
            # READ-ONLY key lookups: they never create the node, and any
            # write touching them applies only where the node exists
            # (the edge batch semi-joins the store; a missing anchor
            # writes nothing, exactly a zero-row MATCH).
            for part in _split_top_commas(c.body):
                n = _NODE_RE.match(part.strip())
                if not n or _REL_RE.match(part.strip()):
                    raise CypherUnsupported(
                        "MATCH in a write statement must be a single-node "
                        f"anchor pattern: {part.strip()!r}"
                    )
                if not n.group("label"):
                    raise CypherUnsupported(
                        f"write-anchor MATCH needs a label: {part.strip()!r}"
                    )
                _single_rel_type(n.group("label"), "write-anchor MATCH label")
                node_alias = n.group("alias")
                if not node_alias:
                    raise CypherUnsupported(
                        "write-anchor MATCH needs an alias (nothing could "
                        "reference an anonymous anchor)"
                    )
                pairs = _parse_write_props(n.group("props"), lits or [])
                if len(pairs) != 1:
                    raise CypherUnsupported(
                        "write-anchor MATCH needs exactly one key prop "
                        f"(got {part.strip()!r})"
                    )
                np = _NodePattern(
                    node_alias, n.group("label"),
                    key_prop=pairs[0][0], key_param=pairs[0][1],
                    match_only=True,
                )
                if np.alias in nodes:
                    raise CypherUnsupported(f"alias {np.alias!r} bound twice")
                nodes[np.alias] = np
                node_order.append(np.alias)
        elif c.kind in ("MERGE", "CREATE"):
            is_create = c.kind == "CREATE"
            # CREATE takes a comma-separated pattern list (Cypher allows
            # `CREATE (a:L {…}), (b:M {…})`); MERGE is single-pattern
            parts = _split_top_commas(c.body) if is_create else [c.body]
            # single-clause PATH patterns — `(a:L {…})-[:T]->(b:M {…})`
            # — decompose into the two node patterns plus a bare-alias
            # relationship pattern (the repo's canonical write shape):
            # each element upserts independently, exactly what separate
            # MERGE clauses do here (Neo4j's whole-path MERGE matches
            # the path atomically first; the per-element upsert is this
            # engine's documented MERGE semantics)
            expanded_parts: list[str] = []
            for part in parts:
                chain = _split_write_path(part, len(expanded_parts))
                if chain is not None:
                    expanded_parts.extend(chain)
                else:
                    expanded_parts.append(part)
            parts = expanded_parts
            for part in parts:
                m = _REL_RE.match(part)
                if m:
                    if not m.group("rel_type"):
                        raise CypherUnsupported(
                            f"{c.kind} relationship needs a type "
                            "(Cypher cannot create an untyped edge)"
                        )
                    _single_rel_type(m.group("rel_type"), c.kind)
                    direction = _rel_direction(m)
                    if direction == "both" and is_create:
                        # Neo4j itself refuses CREATE of an undirected
                        # relationship; MERGE accepts it (matches either
                        # orientation, creates left→right when absent)
                        raise CypherUnsupported(
                            f"{c.kind} requires a directed relationship pattern"
                        )
                    sa, da = m.group("src_alias"), m.group("dst_alias")
                    if direction == "in":
                        # (a)<-[:T]-(b) — the stored edge runs b→a
                        sa, da = da, sa
                    for a in (sa, da):
                        if a not in nodes:
                            raise CypherUnsupported(
                                f"{c.kind} relationship on unbound alias {a!r}"
                            )
                    # `[:T {weight: $w | literal}]` — typed relationship
                    # properties ride the same merge (writer prop_cols)
                    ep = _EdgePattern(
                        sa,
                        m.group("rel_type"),
                        da,
                        _parse_write_props(m.group("rel_props"), lits or []),
                        is_create,
                        alias=m.group("rel_alias"),
                        undirected=direction == "both",
                    )
                    if ep.alias:
                        if ep.alias in nodes or ep.alias in edge_aliases:
                            raise CypherUnsupported(
                                f"alias {ep.alias!r} bound twice"
                            )
                        edge_aliases[ep.alias] = ep
                    edges.append(ep)
                    continue
                n = _NODE_RE.match(part)
                extra_labels = ""
                if n and n.group("label"):
                    raw_lbl = n.group("label")
                    if "|" in raw_lbl:
                        _single_rel_type(raw_lbl, f"{c.kind} node label")
                    if ":" in raw_lbl:
                        # CREATE/MERGE (n:A:B …) — Neo4j's multi-label
                        # write: the FIRST label is the storage/partition
                        # primary, the rest land in the sorted _labels
                        # set prop (the SET n:Extra machinery), so the
                        # node is reachable by every listed label via
                        # the conjunction scan and labels(n)
                        want = [t.strip() for t in raw_lbl.split(":") if t.strip()]
                        primary, rest = want[0], want[1:]
                        extra_labels = ",".join(
                            sorted(set(rest) - {primary})
                        )
                if not n or not n.group("label"):
                    raise CypherUnsupported(
                        f"unsupported {c.kind} pattern: {part!r}"
                    )
                # anonymous node `CREATE (:L {…})` — mint an internal
                # alias (nothing downstream can reference it, which is
                # exactly the anonymous contract)
                node_alias = n.group("alias") or f"_anon{len(nodes)}"
                pairs = _parse_write_props(n.group("props"), lits or [])
                if is_create:
                    # CREATE has no merge key; the FIRST prop in the map is
                    # the storage key (the content-keyed store's identity
                    # anchor), remaining pairs are plain created props
                    if not pairs:
                        raise CypherUnsupported(
                            f"CREATE needs at least one prop (the storage "
                            f"key): {part!r}"
                        )
                    np = _NodePattern(
                        node_alias, n.group("label").split(":")[0].strip(),
                        key_prop=pairs[0][0], key_param=pairs[0][1],
                        create=True,
                    )
                    for prop, param in pairs[1:]:
                        np.set_props[prop] = param
                else:
                    if len(pairs) != 1:
                        raise CypherUnsupported(
                            f"MERGE needs exactly one key prop (got {part!r})"
                        )
                    np = _NodePattern(
                        node_alias, n.group("label").split(":")[0].strip(),
                        key_prop=pairs[0][0], key_param=pairs[0][1],
                    )
                if extra_labels:
                    np.set_props[EXTRA_LABELS] = ("lit", extra_labels)
                if np.alias in nodes:
                    raise CypherUnsupported(f"alias {np.alias!r} bound twice")
                nodes[np.alias] = np
                node_order.append(np.alias)
        elif c.kind == "SET":
            mode = set_modes.get(ci)
            for item in _split_top_commas(c.body):
                mm2 = _SET_MAP_RE.match(item)
                if mm2:
                    # `SET a += $props`: the dict param's keys become
                    # per-prop literal SETs at compile time — identical
                    # writer path, identical counters; a DataFrame batch
                    # would need a map column, out of the subset
                    np = nodes.get(mm2.group("alias")) or edge_aliases.get(
                        mm2.group("alias")
                    )
                    if np is None:
                        raise CypherUnsupported(f"SET on unbound alias: {item!r}")
                    pv = (params or {}).get(mm2.group("param")) if isinstance(params, dict) else None
                    if not isinstance(pv, dict) or not pv:
                        raise CypherUnsupported(
                            f"SET += needs a non-empty dict param, got ${mm2.group('param')}"
                        )
                    target = {
                        None: np.set_props,
                        "CREATE": np.create_props,
                        "MATCH": np.match_props,
                    }[mode]
                    for pk, pval in pv.items():
                        target[pk] = ("lit", pval)
                    continue
                m = _SET_ITEM_RE.match(item)
                if not m:
                    inc = _SET_INCR_RE.match(item) if mode == "MATCH" else None
                    if (
                        inc
                        and inc.group("alias") == inc.group("alias2")
                        and inc.group("prop") == inc.group("prop2")
                    ):
                        # MERGE counter: ON MATCH SET n.p = n.p + <v>
                        npi = nodes.get(inc.group("alias")) or edge_aliases.get(
                            inc.group("alias")
                        )
                        if npi is None:
                            raise CypherUnsupported(
                                f"SET on unbound alias: {item!r}"
                            )
                        if inc.group("param"):
                            npi.match_add_props[inc.group("prop")] = inc.group(
                                "param"
                            )
                        else:
                            npi.match_add_props[inc.group("prop")] = (
                                "lit",
                                _where_value(
                                    inc.group("litval"), lits or [], None
                                ),
                            )
                        continue
                    raise CypherUnsupported(f"unsupported SET item: {item!r}")
                np = nodes.get(m.group("alias")) or edge_aliases.get(
                    m.group("alias")
                )
                if np is None:
                    raise CypherUnsupported(f"SET on unbound alias: {item!r}")
                target = {
                    None: np.set_props,
                    "CREATE": np.create_props,
                    "MATCH": np.match_props,
                }[mode]
                # value encoding: param name | None for datetime() |
                # ("epoch_ms", param) for datetime({epochMillis: $p}) |
                # ("lit", value) for quoted-string / number literals
                if m.group("epoch"):
                    target[m.group("prop")] = ("epoch_ms", m.group("epoch"))
                elif m.group("litval"):
                    target[m.group("prop")] = (
                        "lit",
                        _where_value(m.group("litval"), lits or [], None),
                    )
                else:
                    target[m.group("prop")] = m.group("param")
        elif c.kind == "WITH":
            for item in _split_top_commas(c.body):
                if item not in nodes:
                    raise CypherUnsupported(f"WITH on unbound alias: {item!r}")
        elif c.kind == "RETURN":
            returns = _split_top_commas(c.body)
        else:  # MATCH / ORDER / LIMIT / anything future
            raise CypherUnsupported(f"{c.kind} unsupported in write statements")

    # flush: nodes in clause order, then relationships (reference order)
    total = WriteSummary()

    def _write_map_expr(raw: str):
        """Compile a frame-independent write-map expression value —
        ``toString($i)``, ``toString(9)``, ``'a' + $s`` — against the
        batch params frame: $params rewrite to pdf COLUMNS (so the same
        expression works for a scalar dict and a DataFrame batch), and
        node-alias references refuse (no alias is bound in a write map
        — row-dependent values belong to the derived-write path)."""
        ast = _ast_params_to_names(_parse_scalar_expr(raw))
        col, _ = _compile_scalar(ast, pdf, {}, None, lits or [], None)
        return col

    def _prop_value(param):
        """Resolve one SET/CREATE prop encoding to a Column."""
        if param is None:
            return F.current_timestamp()
        if isinstance(param, tuple) and param[0] == "epoch_ms":
            return F.timestamp_millis(F.col(param[1]).cast("long"))
        if isinstance(param, tuple) and param[0] == "lit":
            return F.lit(param[1])
        if isinstance(param, tuple) and param[0] == "expr":
            return _write_map_expr(param[1])
        return F.col(param)

    def _key_expr(np: _NodePattern):
        """The merge/create key as a Column: a batch param column, a
        literal value, or a frame-independent expression."""
        if isinstance(np.key_param, tuple):
            if np.key_param[0] == "expr":
                return _write_map_expr(np.key_param[1])
            return F.lit(np.key_param[1])  # ("lit", value)
        return F.col(np.key_param)

    for alias in node_order:
        np = nodes[alias]
        if np.match_only:
            if (np.set_props or np.create_props or np.match_props
                    or np.match_add_props):
                raise CypherUnsupported(
                    "SET on a MATCH-anchored alias inside a write statement "
                    "is unsupported — use the MATCH … SET update statement"
                )
            continue  # read-only anchor: nothing to write
        if np.create:
            # CREATE: duplicate-allowed insert — every prop is a created
            # prop (there is no matched branch to condition on)
            if np.create_props or np.match_props or np.match_add_props:
                raise CypherUnsupported(
                    "ON CREATE / ON MATCH SET follow MERGE only (CREATE "
                    "always creates)"
                )
            # Neo4j's CREATE accepts a NULL key property (it creates the
            # node WITHOUT the property) — but a keyless node is
            # unrepresentable in this store, so a NULL-key CREATE row
            # fails LOUDLY inside the plan (raise_error on the key
            # expression: zero cost on the happy path, no extra
            # validation job) instead of the MERGE path's silent skip
            # (which is correct THERE: Neo4j refuses NULL merge keys,
            # and the bulk-batch analogue of a per-row refusal is the
            # row skip).
            key_c = _key_expr(np)
            guarded_key = F.when(key_c.isNotNull(), key_c).otherwise(
                F.raise_error(
                    F.lit(
                        f"CREATE (:{np.label}) with a NULL key property "
                        f"{np.key_prop!r}: a keyless node is "
                        "unrepresentable in this store (Neo4j would "
                        "create the node without the property)"
                    )
                )
            )
            cols = [guarded_key.alias(np.key_prop)]
            names = []
            for prop, param in np.set_props.items():
                cols.append(_prop_value(param).alias(prop))
                names.append(prop)
            total = total + store.create_nodes(
                pdf.select(*cols),
                label=np.label,
                key_col=np.key_prop,
                prop_cols=names or None,
            )
            continue
        # a prop set identically in BOTH branches is just an
        # unconditional SET (created rows have no old value to keep, so
        # the coalesce semantics coincide); different values per branch
        # would need two batch columns — out of the subset
        for prop in sorted(set(np.create_props) & set(np.match_props)):
            if np.create_props[prop] == np.match_props[prop]:
                np.set_props[prop] = np.create_props.pop(prop)
                np.match_props.pop(prop)
            else:
                raise CypherUnsupported(
                    f"{prop!r} takes different values in ON CREATE and ON MATCH"
                )
        cols = [_key_expr(np).alias(np.key_prop)]
        group_cols: dict[str, list[str]] = {}
        for group, props in (
            ("prop_cols", np.set_props),
            ("create_prop_cols", np.create_props),
            ("match_prop_cols", np.match_props),
        ):
            names = []
            for prop, param in props.items():
                cols.append(_prop_value(param).alias(prop))
                names.append(prop)
            group_cols[group] = names
        # MERGE counter idiom — each incremented prop's addend rides the
        # batch as its own column; the writer applies old + addend to
        # matched rows only (ON CREATE value, when given, to created)
        match_add: dict[str, str] = {}
        for prop, enc in np.match_add_props.items():
            if prop in np.set_props or prop in np.match_props:
                raise CypherUnsupported(
                    f"{prop!r} is both plainly SET and match-incremented"
                )
            addc = f"__madd_{prop}"
            cols.append(_prop_value(enc).alias(addc))
            match_add[prop] = addc
        # NULL-key rows SKIP the write (an OPTIONAL MATCH prefix feeds
        # NULL cells on unmatched rows; a merge keyed on one must not
        # materialize a null-key node — Neo4j refuses a null merge key,
        # and in a bulk batch the per-row analogue is to skip the row)
        total = total + store.merge_nodes(
            pdf.filter(_key_expr(np).isNotNull()).select(*cols),
            label=np.label, key_col=np.key_prop,
            match_add_cols=match_add or None, **group_cols,
        )
    for ep in edges:
        rel_type, ecreate = ep.rel_type, ep.create
        s, d = nodes[ep.src_alias], nodes[ep.dst_alias]
        if ecreate and (ep.create_props or ep.match_props or ep.match_add_props):
            raise CypherUnsupported(
                "ON CREATE / ON MATCH SET follow MERGE only (CREATE "
                "always creates)"
            )
        # inline {…} props are unconditional — same bucket as plain SET r.p
        rel_props = list(ep.props) + list(ep.set_props.items())
        # a prop set identically in BOTH ON branches is an unconditional
        # SET (same collapse rule as the node path); DISTINCT values per
        # branch ride as two batch columns — the create value under the
        # prop's own name, the match value under a mangled one
        # (merge_edges match_val_cols applies each to its branch)
        e_match_vals: dict[str, object] = {}
        for prop in sorted(set(ep.create_props) & set(ep.match_props)):
            if ep.create_props[prop] == ep.match_props[prop]:
                rel_props.append((prop, ep.create_props.pop(prop)))
                ep.match_props.pop(prop)
            else:
                e_match_vals[prop] = ep.match_props.pop(prop)
        seen_props = (
            [p for p, _ in rel_props]
            + list(ep.create_props)
            + list(ep.match_props)
            + [p for p in ep.match_add_props if p not in ep.create_props]
        )
        if len(seen_props) != len(set(seen_props)):
            raise CypherUnsupported(
                f"duplicate relationship property in {sorted(seen_props)!r}"
            )
        prop_sel = [_prop_value(enc).alias(prop) for prop, enc in rel_props]
        prop_sel += [
            _prop_value(enc).alias(prop) for prop, enc in ep.create_props.items()
        ]
        prop_sel += [
            _prop_value(enc).alias(prop) for prop, enc in ep.match_props.items()
        ]
        # counter idiom on relationships: addend rides as its own column
        e_match_add: dict[str, str] = {}
        for prop, enc in ep.match_add_props.items():
            if any(prop == p0 for p0, _ in rel_props) or prop in ep.match_props:
                raise CypherUnsupported(
                    f"{prop!r} is both plainly SET and match-incremented"
                )
            addc = f"__madd_{prop}"
            prop_sel.append(_prop_value(enc).alias(addc))
            e_match_add[prop] = addc
        e_mval_cols: dict[str, str] = {}
        for prop, enc in sorted(e_match_vals.items()):
            mc = f"__mval_{prop}"
            prop_sel.append(_prop_value(enc).alias(mc))
            e_mval_cols[prop] = mc
        write_fn = store.create_edges if ecreate else store.merge_edges
        batch = pdf.select(
            _key_expr(s).alias("_src_key"),
            _key_expr(d).alias("_dst_key"),
            *prop_sel,
        ).filter(
            # a NULL endpoint key contributes no edge (same skip rule as
            # the node path — OPTIONAL-prefix rows with no match)
            F.col("_src_key").isNotNull() & F.col("_dst_key").isNotNull()
        )
        # MATCH-anchored endpoints: the edge exists only where the
        # anchor node does — semi-join the batch against the store's
        # (label, key) set; a missing anchor contributes zero edges
        for np_, kc in ((s, "_src_key"), (d, "_dst_key")):
            if not np_.match_only:
                continue
            existing = store.nodes()
            if existing is None:
                batch = batch.limit(0)
                break
            anchor = existing.filter(F.col("label") == np_.label).select(
                F.col("key").alias("_anchor_key")
            )
            batch = batch.join(
                anchor,
                batch[kc].cast("string") == F.col("_anchor_key"),
                "left_semi",
            )
        kwargs = {"prop_cols": [prop for prop, _ in rel_props] or None}
        if not ecreate:
            kwargs["create_prop_cols"] = list(ep.create_props) or None
            kwargs["match_prop_cols"] = list(ep.match_props) or None
            if e_match_add:
                kwargs["match_add_cols"] = e_match_add
            if e_mval_cols:
                kwargs["match_val_cols"] = e_mval_cols
            if ep.undirected:
                kwargs["undirected"] = True
        total = total + write_fn(
            batch,
            rel_type, s.label, "_src_key", d.label, "_dst_key",
            **kwargs,
        )

    df = None
    if returns:
        # aggregate form: `UNWIND … MERGE (t:Tech {tech: n}) RETURN
        # count(t)` — Neo4j books one result row per processed input
        # row, so count(alias) over a batched write = the batch rows
        # that actually bound the alias (non-NULL key; both endpoint
        # keys for a relationship alias); DISTINCT counts distinct keys
        am_all = [_WRITE_COUNT_RE.match(it.strip()) for it in returns]
        if all(am_all):
            aggs = []
            for am in am_all:
                out = am.group("out") or re.sub(r"\s+", "", am.group(0))
                if am.group("star"):
                    aggs.append(F.count(F.lit(1)).alias(out))
                    continue
                tgt = am.group("alias")
                if tgt in nodes:
                    key0 = _key_expr(nodes[tgt])
                elif tgt in edge_aliases:
                    ep0 = edge_aliases[tgt]
                    key0 = F.concat_ws(
                        "\x00",
                        _key_expr(nodes[ep0.src_alias]).cast("string"),
                        _key_expr(nodes[ep0.dst_alias]).cast("string"),
                    )
                    key0 = F.when(
                        _key_expr(nodes[ep0.src_alias]).isNotNull()
                        & _key_expr(nodes[ep0.dst_alias]).isNotNull(),
                        key0,
                    )
                else:
                    raise CypherUnsupported(
                        f"write RETURN references unbound alias {tgt!r}"
                    )
                aggs.append(
                    F.count_distinct(key0).alias(out)
                    if am.group("dist")
                    else F.count(key0).alias(out)
                )
            return CypherResult(pdf.agg(*aggs), total)
        # written-relationship form: `MERGE (u)-[r:T]->(t) RETURN
        # type(r)` — the type is pattern-static; one row per batch row
        # that bound the relationship (both endpoint keys non-NULL)
        if len(returns) == 1:
            tm0 = re.match(
                r"^type\s*\(\s*(?P<a>\w+)\s*\)(?:\s+AS\s+(?P<out>\w+))?$",
                returns[0].strip(),
                re.IGNORECASE,
            )
            if tm0 and tm0.group("a") in edge_aliases:
                ep0 = edge_aliases[tm0.group("a")]
                out = tm0.group("out") or f"type({tm0.group('a')})"
                df = pdf.filter(
                    _key_expr(nodes[ep0.src_alias]).isNotNull()
                    & _key_expr(nodes[ep0.dst_alias]).isNotNull()
                ).select(F.lit(ep0.rel_type).alias(out))
                return CypherResult(df, total)
        # written-relationship state: `MERGE (u)-[r:T]->(t) [SET r.p=…]
        # RETURN r` / `RETURN r.p AS x` — the rel's POST-WRITE stored
        # row(s), fetched by the batch rows' (src, dst, type) identity
        # (the node whole-entity/projection forms' edge twin; ids mint
        # through the same node_id_expr every write path uses)
        rel_ret = None
        if len(returns) == 1 and returns[0].strip() in edge_aliases:
            rel_ret = (edge_aliases[returns[0].strip()], None)
        else:
            mproj = [_RETURN_ITEM_RE.match(it.strip()) for it in returns]
            if (
                all(mproj)
                and all(m2.group("prop") for m2 in mproj)
                and len({m2.group("alias") for m2 in mproj}) == 1
                and mproj[0].group("alias") in edge_aliases
            ):
                rel_ret = (
                    edge_aliases[mproj[0].group("alias")],
                    [
                        (m2.group("prop"), m2.group("out") or m2.group("prop"))
                        for m2 in mproj
                    ],
                )
        if rel_ret is not None:
            from neo4j_graphdb_spark.model import node_id_expr

            ep0, sel0 = rel_ret
            s0, d0 = nodes[ep0.src_alias], nodes[ep0.dst_alias]
            written = pdf.select(
                node_id_expr(s0.label, _key_expr(s0)).alias("src"),
                node_id_expr(d0.label, _key_expr(d0)).alias("dst"),
            ).distinct()
            edf0 = store.edges()
            if edf0 is None:
                raise CypherUnsupported(
                    "write RETURN of a relationship found no edges table"
                )
            stored = (
                edf0.filter(F.col("rel_type") == ep0.rel_type)
                .join(written, on=["src", "dst"], how="left_semi")
            )
            if BUCKET_COL in stored.columns:
                stored = stored.drop(BUCKET_COL)
            if sel0 is None:
                return CypherResult(stored, total)
            df = stored.select(
                *[
                    (
                        F.col(prop)
                        if prop in stored.columns
                        # a never-written property reads as NULL (Neo4j)
                        else F.lit(None).cast("string")
                    ).alias(out0)
                    for prop, out0 in sel0
                ]
            )
            return CypherResult(df, total)
        # whole-entity form: `… RETURN a` — the written node's stored row
        if len(returns) == 1 and "." not in returns[0]:
            alias0 = returns[0].strip()
            if alias0 not in nodes:
                raise CypherUnsupported(
                    f"write RETURN references unbound alias {alias0!r}"
                )
            np = nodes[alias0]
            keys = pdf.select(_key_expr(np).alias("key")).distinct()
            df = (
                store.nodes()
                .filter(F.col("label") == np.label)
                .join(keys, on="key", how="left_semi")
            )
            return CypherResult(df, total)
        # projection form: `… RETURN a.link AS link, a.title` — property
        # projections of ONE written node's post-write stored state
        # (Neo4j's MERGE…RETURN a.prop idiom; prop names resolve through
        # the same key-aliasing as the read path)
        sel = []
        proj_aliases: list[str] = []
        for item in returns:
            m2 = _RETURN_ITEM_RE.match(item.strip())
            if not m2 or m2.group("prop") is None:
                raise CypherUnsupported(
                    "write RETURN supports one entity alias or property "
                    f"projections of written aliases: {returns!r}"
                )
            if m2.group("alias") not in nodes:
                raise CypherUnsupported(
                    f"write RETURN references unbound alias "
                    f"{m2.group('alias')!r}"
                )
            if m2.group("alias") not in proj_aliases:
                proj_aliases.append(m2.group("alias"))
            sel.append(
                (
                    m2.group("alias"),
                    m2.group("prop"),
                    m2.group("out") or m2.group("prop"),
                )
            )
        if len(proj_aliases) == 1:
            np = nodes[proj_aliases[0]]
            keys = pdf.select(_key_expr(np).alias("key")).distinct()
            stored = (
                store.nodes()
                .filter(F.col("label") == np.label)
                .join(keys, on="key", how="left_semi")
            )
            df = stored.select(
                *[
                    _prop_col(stored, "", prop).alias(out)
                    for _, prop, out in sel
                ]
            )
            return CypherResult(df, total)
        # multi-alias projection — `MATCH (a:…) MERGE (t:…) MERGE
        # (a)-[:R]->(t) RETURN a.link, t.name`: each BATCH row pairs
        # its own aliases' post-write stored rows, so every referenced
        # alias LEFT-joins its label's store onto the batch frame by
        # the row's key expression (prefix-mangled columns; one
        # broadcast-sized join per alias — the batch is the small side)
        base = pdf
        for pa in proj_aliases:
            np = nodes[pa]
            stored = store.nodes().filter(F.col("label") == np.label)
            if BUCKET_COL in stored.columns:
                stored = stored.drop(BUCKET_COL)
            st = stored.select(
                *[F.col(c).alias(f"__wr_{pa}_{c}") for c in stored.columns]
            )
            base = base.join(
                st,
                _key_expr(np).cast("string")
                == F.col(f"__wr_{pa}_key"),
                "left",
            )
        df = base.select(
            *[
                _prop_col(base, f"__wr_{alias}_", prop).alias(out)
                for alias, prop, out in sel
            ]
        )
    return CypherResult(df, total)


# Property-resolution strictness, set per read statement by _run_read:
# a Graph carrying the store's key_names sidecar has every label's merge
# key MATERIALIZED under its user-facing name in every scan shape
# (Graph._with_key_name / _materialize_key_names), so a name that still
# resolves to no column is a truly-unknown property and reads as NULL —
# Neo4j's missing-property semantics. Graphs WITHOUT key_names (ad-hoc
# in-memory frames) keep the historical unknown-name → key fallback,
# the documented README divergence.
_STRICT_PROPS = contextvars.ContextVar("spark_graft_strict_props", default=False)


def _prop_col(df: DataFrame, prefix: str, prop: str):
    """Resolve ``alias.prop`` to a column. A name with no matching
    column resolves to the canonical ``key`` column: each label stores
    its single merge-key property under ``key`` whatever the statement
    called it (``MERGE (a:Article {link: $link})`` stores ``link`` AS
    the key), so ``a.link`` in WHERE/RETURN means the key — except
    under strict (key_names) resolution, where the key is already
    materialized by name and an unknown name is an honest NULL."""
    name = f"{prefix}{prop}"
    if name in df.columns:
        return F.col(name)
    key_name = f"{prefix}key"
    if key_name in df.columns:
        if _STRICT_PROPS.get():
            return F.lit(None).cast("string")
        return F.col(key_name)
    raise CypherUnsupported(f"unknown property {prop!r}")


def _entity_struct(df: DataFrame, prefix: str, out: str):
    cols = [c for c in df.columns if c.startswith(prefix) and not c.endswith(NODE_ID)]
    return F.struct(
        *[F.col(c).alias(c[len(prefix):]) for c in cols]
    ).alias(out)


def _where_value(val: str, lits: list[str], params: dict | None):
    """Resolve one WHERE comparand: $param → bound value, sentinel →
    string literal, else numeric literal."""
    if val.startswith("$"):
        if not params or val[1:] not in params:
            raise CypherUnsupported(f"unbound parameter {val!r} in WHERE")
        return params[val[1:]]
    if val.startswith("\x00"):
        return lits[int(val.strip("\x00"))]
    return float(val) if "." in val else int(val)


def _isin(col, vals: list):
    """``col IN vals`` with Cypher's empty-list semantics (always
    false; Column.isin() rejects zero arguments)."""
    return col.isin(*vals) if vals else F.lit(False)


def _in_list_values(raw: str, lits: list[str], params: dict | None) -> list:
    """Resolve the right side of an ``IN`` predicate: a non-empty $param
    list, or a literal list ``[v1, v2, …]`` (numbers / quoted strings /
    $params — the same element grammar as literal UNWIND)."""
    if raw.startswith("$"):
        vals = (params or {}).get(raw[1:])
        if not isinstance(vals, list):
            raise CypherUnsupported(
                f"IN needs a list param, got {raw!r}"
            )
        return vals
    if raw.startswith("["):
        if not raw[1:-1].strip():
            return []  # `x IN []` is legal Cypher: always false
        return _unwind_literal_values(raw[1:-1], lits, params)
    raise CypherUnsupported(
        f"IN needs a list param or a literal list, got {raw!r}"
    )


_OPS = {
    "=": lambda c, v: c == v,
    "<>": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    # Cypher string predicates — all compile to Catalyst predicates with
    # data-source pushdown forms (StringStartsWith/EndsWith/Contains);
    # `=~` is Cypher's full-match regex, which Java-side rlike is NOT
    # (it substring-matches), so the pattern is anchored
    "STARTS WITH": lambda c, v: c.startswith(v),
    "ENDS WITH": lambda c, v: c.endswith(v),
    "CONTAINS": lambda c, v: c.contains(v),
    "=~": lambda c, v: F.rlike(c, F.concat(F.lit("^(?:"), v, F.lit(")$"))),
}


# --------------------------------------------------------------------------
# scalar expressions in RETURN (a55): arithmetic, string concat, coalesce,
# CASE WHEN, and a whitelist of Cypher scalar functions over bound props.
# Parsed to a tiny AST, compiled to ONE Catalyst Column — expressions stay
# inside whole-stage codegen, no UDFs. Cypher coercions honored: `+`
# concatenates when either side is a string; `/` truncates toward zero when
# both sides are integers (the Java semantics Neo4j inherits).
# --------------------------------------------------------------------------

_EXPR_AS_RE = re.compile(r"^(?P<expr>.+?)\s+AS\s+(?P<out>\w+)$", re.IGNORECASE)

_EXPR_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.\d+|\d+)"
    r"|(?P<str>\x00\d+\x00)"
    r"|(?P<param>\$\w+)"
    r"|(?P<cmp><=|>=|<>|=~|=|<|>)"
    r"|(?P<name>\w+)"
    r"|(?P<op>\|\||\.\.|[+\-*/%^(),.\[\]|{}:]))"
)

_EXPR_KEYWORDS = {"CASE", "WHEN", "THEN", "ELSE", "END", "IS", "NOT", "NULL"}


def _tokenize_expr(text: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _EXPR_TOKEN_RE.match(text, pos)
        if not m:
            rest = text[pos:].strip()
            if not rest:
                break
            raise CypherUnsupported(f"unsupported token in expression: {rest!r}")
        pos = m.end()
        for kind in ("num", "str", "param", "cmp", "name", "op"):
            v = m.group(kind)
            if v is not None:
                toks.append((kind, v))
                break
    return toks


def _ast_params_to_names(n):
    """Rewrite every ``('param', name)`` AST node to ``('name', name)``
    so the expression compiles against a frame whose COLUMNS are the
    params (the write path's batch frame) instead of a scalar dict —
    one expression text, both batch shapes."""
    if isinstance(n, tuple):
        if n and n[0] == "param":
            return ("name", n[1])
        return tuple(
            _ast_params_to_names(x) if isinstance(x, (tuple, list)) else x
            for x in n
        )
    if isinstance(n, list):
        return [_ast_params_to_names(x) for x in n]
    return n


def _parse_scalar_expr(text: str):
    """Recursive-descent parse of one scalar expression to an AST of
    ``('num'|'str'|'param'|'prop'|'null'|'neg'|'bin'|'fn'|'case', …)``
    nodes with standard precedence (unary − > * / % > + −)."""
    toks = _tokenize_expr(text)
    if not toks:
        raise CypherUnsupported(f"empty expression: {text!r}")
    idx = 0

    def peek() -> tuple[str | None, str | None]:
        return toks[idx] if idx < len(toks) else (None, None)

    def take() -> tuple[str, str]:
        nonlocal idx
        t = toks[idx]
        idx += 1
        return t

    def expect_op(sym: str) -> None:
        k, v = peek()
        if k != "op" or v != sym:
            raise CypherUnsupported(f"expected {sym!r} in expression: {text!r}")
        take()

    def at_keyword(word: str) -> bool:
        k, v = peek()
        return k == "name" and v.upper() == word

    def expect_keyword(word: str) -> None:
        if not at_keyword(word):
            raise CypherUnsupported(f"expected {word} in expression: {text!r}")
        take()

    def parse_expr():
        # `||` (Cypher 5 string/list concatenation) parses at the same
        # additive level as `+` — Neo4j gives the two equal precedence
        n = parse_muldiv()
        while peek()[0] == "op" and peek()[1] in ("+", "-", "||"):
            _, op = take()
            n = ("bin", op, n, parse_muldiv())
        return n

    def parse_muldiv():
        n = parse_power()
        while peek()[0] == "op" and peek()[1] in ("*", "/", "%"):
            _, op = take()
            n = ("bin", op, n, parse_power())
        return n

    def parse_power():
        # ^ is RIGHT-associative in Cypher: 2 ^ 3 ^ 2 = 2 ^ (3 ^ 2)
        n = parse_unary()
        if peek() == ("op", "^"):
            take()
            return ("bin", "^", n, parse_power())
        return n

    def parse_unary():
        if peek() == ("op", "-"):
            take()
            # unary minus binds LOOSER than ^ in Cypher: -2 ^ 2 is
            # -(2 ^ 2) = -4.0, so the operand parses at the power level
            return ("neg", parse_power())
        n = parse_primary()
        # postfix subscript: list element access xs[i] (0-based,
        # negatives from the end, NULL out of range), dynamic property
        # access a[key], and list SLICES xs[lo..hi] (0-based,
        # end-exclusive, negatives from the end, either bound omittable
        # — openCypher §4.1 list operators) — left-associative chains.
        # A postfix `.field` on a computed value (`datetime().year`,
        # `duration.between(a, b).days`) is a temporal-component access
        # on the compiled base — same tfield node the chained
        # `a.ts.year` property form produces.
        while peek() in (("op", "["), ("op", ".")):
            if peek() == ("op", "."):
                take()
                fk, fv = peek()
                if fk != "name":
                    raise CypherUnsupported(
                        f"expected component after '.': {text!r}"
                    )
                take()
                n = ("tfield", n, fv)
                continue
            take()
            if peek() == ("op", ".."):  # xs[..hi]
                take()
                hi_n = None if peek() == ("op", "]") else parse_expr()
                expect_op("]")
                n = ("slice", n, None, hi_n)
                continue
            idx_n = parse_expr()
            if peek() == ("op", ".."):  # xs[lo..] / xs[lo..hi]
                take()
                hi_n = None if peek() == ("op", "]") else parse_expr()
                expect_op("]")
                n = ("slice", n, idx_n, hi_n)
                continue
            expect_op("]")
            n = ("index", n, idx_n)
        return n

    def parse_primary():
        k, v = peek()
        if k == "num":
            take()
            return ("num", float(v) if "." in v else int(v))
        if k == "str":
            take()
            return ("str", int(v.strip("\x00")))
        if k == "param":
            take()
            return ("param", v[1:])
        if k == "op" and v == "(":
            take()
            n = parse_expr()
            expect_op(")")
            return n
        if k == "op" and v == "[":
            take()
            # [x IN xs …] — list comprehension; anything else — literal list
            nk, nv = peek()
            nxt = toks[idx + 1] if idx + 1 < len(toks) else (None, None)
            if nk == "name" and nxt == ("name", "IN") or (
                nk == "name" and nxt[0] == "name" and (nxt[1] or "").upper() == "IN"
            ):
                _, var = take()
                take()  # IN
                src = parse_expr()
                pred = None
                body = None
                if at_keyword("WHERE"):
                    take()
                    pred = parse_predicate()
                if peek() == ("op", "|"):
                    take()
                    body = parse_expr()
                expect_op("]")
                if pred is None and body is None:
                    raise CypherUnsupported(
                        "list comprehension needs WHERE and/or | projection"
                    )
                return ("comp", var, src, pred, body)
            items = []
            if peek() != ("op", "]"):
                items.append(parse_expr())
                while peek() == ("op", ","):
                    take()
                    items.append(parse_expr())
            expect_op("]")
            return ("list", items)
        if k == "op" and v == "{":
            # map literal {k: <expr>, …} as a first-class expression —
            # compiles to a struct (the Row shape map projections
            # produce), so it nests inside collect()/CASE/comprehensions
            take()
            fields = []
            while peek() != ("op", "}"):
                fk, fv = take()
                if fk != "name":
                    raise CypherUnsupported(
                        f"map literal keys must be identifiers: {text!r}"
                    )
                expect_op(":")
                fields.append((fv, parse_expr()))
                if peek() == ("op", ","):
                    take()
                elif peek() != ("op", "}"):
                    raise CypherUnsupported(
                        f"expected ',' or '}}' in map literal: {text!r}"
                    )
            take()  # }
            if not fields:
                raise CypherUnsupported("empty map literal")
            return ("map", fields)
        if k == "name":
            up = v.upper()
            if up == "CASE":
                return parse_case()
            if up == "NULL":
                take()
                return ("null",)
            if up in ("TRUE", "FALSE"):
                take()
                return ("bool", up == "TRUE")
            if up in _EXPR_KEYWORDS:
                raise CypherUnsupported(
                    f"misplaced keyword {v} in expression: {text!r}"
                )
            take()
            nk, nv = peek()
            if (nk, nv) == ("op", "(") and up == "REDUCE":
                # reduce(acc = init, x IN list | expr) — Cypher's fold,
                # compiled to the `aggregate` higher-order function
                take()
                ak, av = take()
                if ak != "name":
                    raise CypherUnsupported(
                        "reduce() needs the form "
                        "reduce(acc = init, x IN list | expr)"
                    )
                if peek() != ("cmp", "="):
                    raise CypherUnsupported(
                        "reduce() needs `acc = <initial value>`"
                    )
                take()
                init = parse_expr()
                expect_op(",")
                vk, vv = take()
                ik, iv = take()
                if vk != "name" or ik != "name" or (iv or "").upper() != "IN":
                    raise CypherUnsupported(
                        "reduce() needs `x IN <list>` after the accumulator"
                    )
                src = parse_expr()
                expect_op("|")
                body = parse_expr()
                expect_op(")")
                return ("reduce", av, init, vv, src, body)
            if (nk, nv) == ("op", "(") and up in ("ALL", "ANY", "NONE", "SINGLE"):
                # list predicates (openCypher §4.2): all/any/none/single
                # (x IN list WHERE pred) — compiled to forall/exists
                # higher-order functions below, one Catalyst expression
                take()
                vk, vv = take()
                ik, iv = take()
                if vk != "name" or ik != "name" or (iv or "").upper() != "IN":
                    raise CypherUnsupported(
                        f"{v}() needs the form {v}(x IN list WHERE predicate)"
                    )
                src = parse_expr()
                if not at_keyword("WHERE"):
                    raise CypherUnsupported(f"{v}() needs a WHERE predicate")
                take()
                pred = parse_predicate()
                expect_op(")")
                return ("listpred", up.lower(), vv, src, pred)
            if (nk, nv) == ("op", "("):
                take()
                args = []
                if peek() != ("op", ")"):
                    args.append(parse_expr())
                    while peek() == ("op", ","):
                        take()
                        args.append(parse_expr())
                expect_op(")")
                return ("fn", v, args)
            if (nk, nv) == ("op", "."):
                take()
                pk, pv = peek()
                if pk != "name":
                    raise CypherUnsupported(
                        f"expected property after {v}. in expression: {text!r}"
                    )
                take()
                if v.lower() == "datetime" and pv.lower() == "truncate":
                    # datetime.truncate('unit', expr) — Neo4j's temporal
                    # truncation, compiled to date_trunc below
                    expect_op("(")
                    unit_ast = parse_expr()
                    expect_op(",")
                    inner = parse_expr()
                    expect_op(")")
                    return ("ttrunc", unit_ast, inner)
                if v.lower() == "duration" and pv.lower() == "between":
                    # duration.between(a, b) — Neo4j's instant
                    # difference, decomposed into calendar months +
                    # whole days + a seconds remainder (the three
                    # component groups Neo4j's duration type keeps)
                    expect_op("(")
                    d1 = parse_expr()
                    expect_op(",")
                    d2 = parse_expr()
                    expect_op(")")
                    return ("dur_between", d1, d2)
                if peek() == ("op", "."):
                    # chained access: a.ts.year — a temporal COMPONENT of
                    # the property (openCypher instant accessors)
                    take()
                    ck2, cv2 = peek()
                    if ck2 != "name":
                        raise CypherUnsupported(
                            f"expected component after {v}.{pv}.: {text!r}"
                        )
                    take()
                    return ("tfield", ("prop", v, pv), cv2)
                return ("prop", v, pv)
            # bare identifier — a flat column (WITH projection, UNWIND
            # variable); resolved against the frame at compile time
            return ("name", v)
        raise CypherUnsupported(f"unsupported expression: {text!r}")

    def parse_predicate():
        # CASE WHEN conditions share the full boolean grammar with
        # top-level expressions (comparisons, IS [NOT] NULL, string
        # predicates, IN, NOT/AND/XOR/OR) — `CASE WHEN a.x > 1 AND
        # a.y < 2 THEN …` composes exactly like a WHERE would
        return parse_b_or()

    def parse_case():
        expect_keyword("CASE")
        # simple form `CASE x WHEN v THEN r …` — an operand expression
        # before the first WHEN; each WHEN then carries a VALUE compared
        # by equality (openCypher §9.2, the form Neo4j tutorials use for
        # label-style recodes). Searched form when WHEN comes first.
        operand = None
        if not at_keyword("WHEN"):
            operand = parse_expr()
        branches = []
        while at_keyword("WHEN"):
            take()
            pred = parse_expr() if operand is not None else parse_predicate()
            expect_keyword("THEN")
            branches.append((pred, parse_expr()))
        if not branches:
            raise CypherUnsupported("CASE needs at least one WHEN branch")
        els = None
        if at_keyword("ELSE"):
            take()
            els = parse_expr()
        expect_keyword("END")
        if operand is not None:
            return ("case_simple", operand, branches, els)
        return ("case", branches, els)

    # boolean grammar over condition atoms — comparisons, IS [NOT]
    # NULL, string predicates, IN, all composable as VALUES under
    # NOT > AND > XOR > OR (Cypher's precedence): `RETURN a.x > 1 AND
    # a.y < 2 AS f`, `RETURN n.v IN [3, 4] AS f`, `RETURN NOT done`
    def parse_cond_atom():
        if at_keyword("NOT"):
            take()
            return ("notpred", parse_cond_atom())
        node = parse_expr()
        if at_keyword("IS"):
            take()
            negated = False
            if at_keyword("NOT"):
                take()
                negated = True
            expect_keyword("NULL")
            return ("isnull", node, negated)
        if peek()[0] == "cmp":
            _, cop = take()
            return ("cmppred", cop, node, parse_expr())
        if peek()[0] == "name" and (peek()[1] or "").upper() in (
            "CONTAINS", "STARTS_WITH", "ENDS_WITH",
        ):
            # STARTS WITH / ENDS WITH were folded to one token upstream
            _, sop = take()
            return (
                "cmppred",
                sop.upper().replace("_", " "),
                node,
                parse_expr(),
            )
        if at_keyword("IN"):
            take()
            return ("inpred", node, parse_expr())
        return node

    def parse_b_and():
        n = parse_cond_atom()
        while at_keyword("AND"):
            take()
            n = ("boolop", "and", n, parse_cond_atom())
        return n

    def parse_b_xor():
        n = parse_b_and()
        while at_keyword("XOR"):
            take()
            n = ("boolop", "xor", n, parse_b_and())
        return n

    def parse_b_or():
        n = parse_b_xor()
        while at_keyword("OR"):
            take()
            n = ("boolop", "or", n, parse_b_xor())
        return n

    node = parse_b_or()
    if idx != len(toks):
        raise CypherUnsupported(f"trailing tokens in expression: {text!r}")
    return node


_INT_DTYPES = {"tinyint", "smallint", "int", "integer", "bigint", "long"}
_FLOAT_DTYPES = {"float", "double"}


def _compile_scalar(ast, df, aliases, rel_alias, lits, params):
    """Compile an expression AST to ``(Column, type_tag)`` where the tag
    ∈ {'str','int','float','other'} drives Cypher's coercion rules."""
    dtypes = dict(df.dtypes)

    def ty_of(dt: str) -> str:
        if dt == "string":
            return "str"
        if dt in _INT_DTYPES:
            return "int"
        if dt in _FLOAT_DTYPES or dt.startswith("decimal"):
            return "float"
        if dt.startswith("array"):
            return "list"
        return "other"

    lam_env: dict = {}  # comprehension variables, bound around the HOF call
    lam_tags: dict = {}  # their type tags where known (reduce acc = init's)

    def rec(n):
        kind = n[0]
        if kind == "num":
            return F.lit(n[1]), ("int" if isinstance(n[1], int) else "float")
        if kind == "str":
            return F.lit(lits[n[1]]), "str"
        if kind == "null":
            return F.lit(None), "other"
        if kind == "bool":
            return F.lit(n[1]), "other"
        if kind == "param":
            if not params or n[1] not in params:
                raise CypherUnsupported(f"unbound parameter ${n[1]} in expression")
            v = params[n[1]]
            if isinstance(v, dict):
                # a map param — Spark has no map LITERAL for a Python
                # dict, so it compiles to a struct of literals (field
                # access via the tfield map/struct probe; heterogeneous
                # value types are exactly what struct allows)
                def _lit_value(x):
                    if isinstance(x, dict):
                        return F.struct(
                            *[_lit_value(x2).alias(k2) for k2, x2 in x.items()]
                        )
                    if isinstance(x, (list, tuple)):
                        return F.array(*[_lit_value(x2) for x2 in x])
                    return F.lit(x)

                return _lit_value(v), "other"
            if isinstance(v, str):
                tag = "str"
            elif isinstance(v, bool):
                tag = "other"
            elif isinstance(v, int):
                tag = "int"
            elif isinstance(v, float):
                tag = "float"
            else:
                tag = "other"
            return F.lit(v), tag
        if kind == "name":
            nm = n[1]
            if nm in lam_env:
                return lam_env[nm], lam_tags.get(nm, "other")
            if nm in df.columns:
                return F.col(nm), ty_of(dtypes.get(nm, ""))
            if nm in aliases:
                # a bound NODE alias as a value — openCypher's
                # whole-entity equality (`WHERE u = v`): node equality
                # is IDENTITY equality, and under the deterministic
                # content-derived id model identity IS the id column, so
                # the alias compiles to its node id (one column
                # comparison; an equality between two scan anchors turns
                # the declared cross product into an equi-join inside
                # Catalyst). Same id value the id(u) function exposes.
                id_name = f"{aliases[nm]}{NODE_ID}"
                if id_name in df.columns:
                    return F.col(id_name), "other"
            raise CypherUnsupported(
                f"unknown name {nm!r} in expression (not a frame column)"
            )
        if kind == "prop":
            alias, prop = n[1], n[2]
            if alias in aliases:
                col = _prop_col(df, aliases[alias], prop)
                name = f"{aliases[alias]}{prop}"
                dt = dtypes.get(name, dtypes.get(f"{aliases[alias]}key", ""))
            elif rel_alias is not None and alias == rel_alias:
                if prop not in df.columns:
                    raise CypherUnsupported(
                        f"unknown relationship property {prop!r}"
                    )
                col, dt = F.col(prop), dtypes[prop]
            elif alias in df.columns and dtypes.get(alias, "").startswith(
                "struct"
            ):
                # field access on a WITH-bound map/struct value
                # (`WITH {a: 1} AS m RETURN m.a`) — plain getField
                fields = {
                    f.name: f.dataType.simpleString()
                    for f in df.schema[alias].dataType.fields
                }
                if prop not in fields and "key" in fields:
                    # key-name fallback (the _prop_col convention) for
                    # whole-ENTITY structs: the merge key reads by its
                    # user-facing name
                    prop = "key"
                if prop not in fields:
                    raise CypherUnsupported(
                        f"unknown map key {prop!r} on {alias!r}"
                    )
                col, dt = F.col(alias).getField(prop), fields[prop]
            else:
                raise CypherUnsupported(f"expression on unbound alias: {alias!r}")
            return col, ty_of(dt)
        if kind == "isnull":
            # `x IS [NOT] NULL` as a boolean VALUE (top-level postfix)
            c, _ = rec(n[1])
            return (c.isNotNull() if n[2] else c.isNull()), "other"
        if kind == "cmppred":
            # top-level comparison as a boolean VALUE
            lc, _ = rec(n[2])
            rc, _ = rec(n[3])
            return _OPS[n[1]](lc, rc), "other"
        if kind in ("notpred", "boolop", "inpred"):
            # boolean connectives / IN as VALUES — `RETURN a AND b`,
            # `RETURN x IN [1, 2] AS f`: the predicate compiler owns
            # the three-valued logic, the result is a boolean Column
            return rec_pred(n), "other"
        if kind == "neg":
            c, t = rec(n[1])
            if t == "str":
                raise CypherUnsupported("unary minus on a string operand")
            return -c, t
        if kind == "bin":
            op, lc_ast, rc_ast = n[1], n[2], n[3]
            lc, lt = rec(lc_ast)
            rc, rt = rec(rc_ast)
            if op == "||":
                # Cypher 5 concatenation: list || list, else string
                # concat (numbers stringified, Neo4j's coercion)
                if lt == rt == "list":
                    return F.concat(lc, rc), "list"
                if "list" in (lt, rt):
                    raise CypherUnsupported(
                        "|| needs two lists or two stringifiable scalars"
                    )
                return F.concat(lc.cast("string"), rc.cast("string")), "str"
            if op == "+" and "list" in (lt, rt):
                # Cypher list addition: list+list concatenates,
                # list+elem appends, elem+list prepends
                if lt == rt == "list":
                    return F.concat(lc, rc), "list"
                if lt == "list":
                    return F.concat(lc, F.array(rc)), "list"
                return F.concat(F.array(lc), rc), "list"
            if op == "+" and "str" in (lt, rt):
                # Cypher: 'a' + 1 = 'a1' — concat, numbers stringified
                return F.concat(lc.cast("string"), rc.cast("string")), "str"
            if "str" in (lt, rt):
                raise CypherUnsupported(f"arithmetic {op!r} on a string operand")
            if "list" in (lt, rt):
                raise CypherUnsupported(f"arithmetic {op!r} on a list operand")
            if op in ("+", "-") and lt == "other":
                # date/datetime ± duration — Spark refuses DATE ±
                # interval-with-microseconds, so a DateType operand
                # round-trips through timestamp and lands back on DATE
                # (Neo4j: date + duration = date, truncating sub-day
                # spill). Probed only on untyped operands — numeric
                # tags never pay the analysis round-trip.
                try:
                    _ldt = df.select(lc.alias("_t")).schema[0].dataType
                except Exception:
                    _ldt = None
                if isinstance(_ldt, DateType):
                    shifted = (
                        lc.cast("timestamp") + rc
                        if op == "+"
                        else lc.cast("timestamp") - rc
                    )
                    return shifted.cast("date"), "other"
            if op == "+":
                res = lc + rc
            elif op == "-":
                res = lc - rc
            elif op == "*":
                res = lc * rc
            elif op == "%":
                res = lc % rc
            elif op == "^":
                # Cypher exponentiation — Neo4j returns a FLOAT even
                # for integer operands (2 ^ 3 = 8.0)
                return F.pow(lc, rc), "float"
            else:  # "/"
                if lt == rt == "int":
                    # Cypher integer division truncates toward zero (Java).
                    # Spark's IntegralDivide (`div`) stays exact on longs —
                    # a double round-trip would lose exactness above 2^53 —
                    # and raises DIVIDE_BY_ZERO under ANSI mode, matching
                    # Neo4j's "/ by zero" error instead of a silent NULL.
                    return F.call_function("div", lc, rc), "int"
                return lc / rc, "float"
            if lt == rt == "int":
                return res, "int"
            return res, ("float" if "float" in (lt, rt) else "other")
        if kind == "fn":
            return compile_fn(n[1], n[2])
        if kind == "case":
            branches, els = n[1], n[2]
            col, tag = None, "other"
            for pred, val in branches:
                pc = rec_pred(pred)
                vc, vt = rec(val)
                col = F.when(pc, vc) if col is None else col.when(pc, vc)
                if tag == "other":
                    tag = vt
            if els is not None:
                ec, et = rec(els)
                col = col.otherwise(ec)
                if tag == "other":
                    tag = et
            return col, tag
        if kind == "case_simple":
            # CASE x WHEN v THEN r … — operand compiled ONCE, each WHEN
            # value an equality test against it (one Catalyst CaseWhen)
            operand, branches, els = n[1], n[2], n[3]
            oc, _ = rec(operand)
            col, tag = None, "other"
            for val, res_ast in branches:
                vc, _ = rec(val)
                rc, rt = rec(res_ast)
                col = F.when(oc == vc, rc) if col is None else col.when(oc == vc, rc)
                if tag == "other":
                    tag = rt
            if els is not None:
                ec, et = rec(els)
                col = col.otherwise(ec)
                if tag == "other":
                    tag = et
            return col, tag
        if kind == "list":
            cols = [rec(i)[0] for i in n[1]]
            return F.array(*cols), "list"
        if kind == "comp":
            # [x IN xs WHERE p | e] — F.filter / F.transform higher-order
            # functions: the lambda binds x via lam_env for the nested
            # compile, everything stays one Catalyst expression (no UDF)
            var, src, pred, body = n[1], n[2], n[3], n[4]
            col, _ = rec(src)

            def _bound(node, is_pred):
                def _f(x):
                    if var in lam_env:
                        raise CypherUnsupported(
                            f"comprehension variable {var!r} shadows an outer one"
                        )
                    lam_env[var] = x
                    try:
                        return rec_pred(node) if is_pred else rec(node)[0]
                    finally:
                        del lam_env[var]

                return _f

            if pred is not None:
                col = F.filter(col, _bound(pred, True))
            if body is not None:
                col = F.transform(col, _bound(body, False))
            return col, "list"
        if kind == "index":
            # postfix subscript. Two shapes:
            # * a[<key>] on a BOUND alias with a compile-time string key
            #   (literal or parameter) — dynamic property access; the
            #   typed-column store resolves keys at plan time, so the key
            #   must be static (Neo4j resolves per-row against its prop
            #   map; a row-dependent key is refused here, honestly)
            # * xs[<i>] list element access — 0-based, negatives from
            #   the end, NULL out of range (try_element_at, ANSI-safe)
            base, idx_n = n[1], n[2]
            if base[0] == "name" and base[1] not in lam_env and (
                base[1] in aliases
                or (rel_alias is not None and base[1] == rel_alias)
            ):
                key = None
                if idx_n[0] == "str":
                    key = lits[idx_n[1]]
                elif idx_n[0] == "param":
                    if not params or idx_n[1] not in params:
                        raise CypherUnsupported(
                            f"unbound parameter ${idx_n[1]} in expression"
                        )
                    key = params[idx_n[1]]
                if not isinstance(key, str):
                    raise CypherUnsupported(
                        "dynamic property access needs a literal or "
                        f"string-parameter key: {base[1]!r}[…]"
                    )
                return rec(("prop", base[1], key))
            col, _ = rec(base)
            ic, it = rec(idx_n)
            if it == "str":
                raise CypherUnsupported(
                    "string subscripts apply to bound aliases only"
                )
            ic = ic.cast("int")
            return (
                F.when(
                    ic >= 0, F.try_element_at(col, ic + F.lit(1))
                ).otherwise(F.try_element_at(col, ic)),
                "other",
            )
        if kind == "slice":
            # xs[lo..hi] — openCypher list slice: 0-based, end-EXCLUSIVE,
            # negative bounds count from the end, out-of-range clamps to
            # the list (never NULL, never error). Bounds normalize
            # against size(xs) so one F.slice covers every case — stays
            # a single Catalyst expression (codegen), no UDF.
            base, lo_n, hi_n = n[1], n[2], n[3]
            col, _ = rec(base)
            sz = F.size(col).cast("long")
            if lo_n is None:
                lo = F.lit(0).cast("long")
            else:
                lc0, _ = rec(lo_n)
                lc0 = lc0.cast("long")
                lo = F.when(lc0 < 0, F.greatest(sz + lc0, F.lit(0))).otherwise(
                    F.least(lc0, sz)
                )
            if hi_n is None:
                hi = sz
            else:
                hc0, _ = rec(hi_n)
                hc0 = hc0.cast("long")
                hi = F.when(hc0 < 0, F.greatest(sz + hc0, F.lit(0))).otherwise(
                    F.least(hc0, sz)
                )
            ln = F.greatest(hi - lo, F.lit(0))
            # slice(col, 1, 0) is [] — the empty-window case is safe
            return F.slice(col, (lo + 1).cast("int"), ln.cast("int")), "list"
        if kind == "map":
            # {k: <expr>, …} — struct of per-key Columns (one Row-shaped
            # value; the shape map projections and collect({…}) need)
            return (
                F.struct(*[rec(ast0)[0].alias(k0) for k0, ast0 in n[1]]),
                "other",
            )
        if kind == "reduce":
            # reduce(acc = init, x IN xs | expr) — Cypher's list fold,
            # compiled to the `aggregate` higher-order function: init is
            # the zero, the merge lambda binds BOTH the accumulator and
            # the element via lam_env, one Catalyst expression, no UDF.
            acc, init, var, src, body = n[1], n[2], n[3], n[4], n[5]
            col, _ = rec(src)
            init_col, init_tag = rec(init)
            # Cypher integers are 64-bit: promote the zero so folds over
            # bigint-typed lists (size()/length() produce bigint) type-
            # check — `aggregate` requires merge type == init type
            if init_tag == "int":
                init_col = init_col.cast("long")
            elif init_tag == "float":
                init_col = init_col.cast("double")

            def _merge(a, x):
                if acc in lam_env or var in lam_env:
                    raise CypherUnsupported(
                        "reduce() variables shadow an outer binding: "
                        f"{acc!r}/{var!r}"
                    )
                lam_env[acc] = a
                lam_env[var] = x
                # the accumulator's value is always init-shaped — its
                # tag flows into the body so `acc + x` concatenates
                # when the fold is over strings
                lam_tags[acc] = init_tag
                try:
                    return rec(body)[0]
                finally:
                    del lam_env[acc]
                    del lam_env[var]
                    lam_tags.pop(acc, None)

            return F.aggregate(col, init_col, _merge), "other"
        if kind == "dur_between":
            # duration.between(a, b) — Neo4j's instant difference as a
            # (months, days, seconds) struct: whole calendar months
            # first (anchor-corrected, since a month has no fixed
            # length), then whole days, then the seconds remainder.
            # Negative when b < a — every component flips sign, Neo4j's
            # own decomposition. Pure Catalyst datetime arithmetic.
            ca, _ = rec(n[1])
            cb, _ = rec(n[2])
            ca, cb = ca.cast("timestamp"), cb.cast("timestamp")

            def _dur_parts(x, y):
                m_raw = (F.year(y) - F.year(x)) * 12 + (F.month(y) - F.month(x))
                m = m_raw - F.when(
                    F.timestamp_add("MONTH", m_raw, x) > y, F.lit(1)
                ).otherwise(F.lit(0))
                anchor = F.timestamp_add("MONTH", m, x)
                total = (F.unix_micros(y) - F.unix_micros(anchor)) / F.lit(1e6)
                days = F.floor(total / 86400)
                secs = total - days * 86400
                return m.cast("bigint"), days.cast("bigint"), secs.cast("double")

            pm, pd, ps = _dur_parts(ca, cb)
            nm, nd, ns = _dur_parts(cb, ca)
            return (
                F.when(
                    cb >= ca,
                    F.struct(
                        pm.alias("months"), pd.alias("days"), ps.alias("seconds")
                    ),
                ).otherwise(
                    F.struct(
                        (-nm).cast("bigint").alias("months"),
                        (-nd).cast("bigint").alias("days"),
                        (-ns).cast("double").alias("seconds"),
                    )
                ),
                "other",
            )
        if kind == "tfield":
            # a.ts.year / .month / … — openCypher instant component
            # accessors, each ONE Catalyst datetime function (pushdown-
            # friendly; year(ts) > 2020 even folds to a range filter)
            base, field = n[1], n[2]
            c, _ = rec(base)
            fl = field.lower()
            if base[0] == "dur_between":
                # duration components — fields of the struct above
                if fl in ("months", "days", "seconds"):
                    return c.getField(fl), ("float" if fl == "seconds" else "int")
                raise CypherUnsupported(
                    f"unsupported duration component {field!r} "
                    "(supported: months days seconds)"
                )
            if (
                base[0] == "fn"
                and base[1].lower() == "duration"
                and len(base[2]) == 1
                and base[2][0][0] == "str"
            ):
                # duration('P…').months/.days/… — component accessors on
                # a duration VALUE (VERDICT r14 missing #3). Neo4j's
                # duration keeps (months, days, seconds) as separate
                # groups — .months is the TOTAL months (12·Y + M = 14
                # for P1Y2M), .days excludes months, .seconds excludes
                # days; the whole-unit accessors truncate toward zero.
                # The literal decomposes in Python and compiles to a
                # constant — Catalyst sees a foldable lit.
                months, days, secs = duration_parts3(lits[base[2][0][1]])
                comp = {
                    "years": months // 12,
                    "quarters": months // 3,
                    "months": months,
                    "weeks": days // 7,
                    "days": days,
                    "hours": int(secs // 3600),
                    "minutes": int(secs // 60),
                    "seconds": int(secs),
                    "milliseconds": int(secs * 1000),
                }
                if fl in comp:
                    return F.lit(comp[fl]).cast("bigint"), "int"
                raise CypherUnsupported(
                    f"unsupported duration component {field!r} (supported: "
                    "years quarters months weeks days hours minutes "
                    "seconds milliseconds)"
                )
            # map/struct field access — `$m.k`, `{a: 1}.a`, `row.col`
            # on a map-typed column: Neo4j's dynamic map accessor, a
            # missing struct field is NULL (map getItem is NULL-safe
            # already). Schema-probe the compiled base; non-map bases
            # fall through to the temporal accessors below.
            try:
                _bdt = df.select(c.alias("_t")).schema[0].dataType
            except Exception:
                _bdt = None
            if isinstance(_bdt, MapType):
                return c.getItem(field), "other"
            if isinstance(_bdt, StructType):
                if field not in _bdt.names:
                    return F.lit(None), "other"
                _fdt = _bdt[field].dataType.simpleString()
                _ftag = (
                    "int" if _fdt in ("bigint", "int", "smallint", "tinyint")
                    else "float" if _fdt in ("double", "float")
                    else "str" if _fdt == "string"
                    else "other"
                )
                return c.getField(field), _ftag
            simple = {
                "year": F.year, "month": F.month, "day": F.dayofmonth,
                "hour": F.hour, "minute": F.minute, "second": F.second,
                "week": F.weekofyear, "quarter": F.quarter,
                "ordinalday": F.dayofyear,
            }
            if fl in simple:
                return simple[fl](c).cast("bigint"), "int"
            if fl == "dayofweek":
                # Neo4j is ISO (Mon=1..Sun=7); Spark's dayofweek is
                # Sun=1..Sat=7 — shift
                return ((F.dayofweek(c) + 5) % 7 + 1).cast("bigint"), "int"
            if fl == "epochseconds":
                return F.unix_timestamp(c).cast("bigint"), "int"
            if fl == "epochmillis":
                return (c.cast("double") * 1000).cast("bigint"), "int"
            raise CypherUnsupported(
                f"unsupported temporal component {field!r} (supported: "
                "year month day hour minute second week quarter "
                "dayOfWeek ordinalDay epochSeconds epochMillis)"
            )
        if kind == "ttrunc":
            # datetime.truncate('day', x) — date_trunc keeps the value a
            # timestamp (Neo4j semantics), so it groups/compares directly
            unit_ast, inner = n[1], n[2]
            if unit_ast[0] != "str":
                raise CypherUnsupported(
                    "datetime.truncate needs a literal unit string"
                )
            unit = lits[unit_ast[1]].lower()
            if unit not in (
                "year", "quarter", "month", "week", "day",
                "hour", "minute", "second",
            ):
                raise CypherUnsupported(
                    f"unsupported truncate unit {unit!r}"
                )
            c, _ = rec(inner)
            return F.date_trunc(unit, c), "other"
        if kind == "listpred":
            # all/any/none/single(x IN xs WHERE p): forall / exists /
            # NOT exists / size(filter)=1 — higher-order functions over
            # the array, no UDF. Three-valued like Cypher: a NULL list
            # yields NULL, which a WHERE context drops.
            fn, var, src, pred = n[1], n[2], n[3], n[4]
            col, _ = rec(src)

            def _bound_p(x):
                if var in lam_env:
                    raise CypherUnsupported(
                        f"list-predicate variable {var!r} shadows an outer one"
                    )
                lam_env[var] = x
                try:
                    return rec_pred(pred)
                finally:
                    del lam_env[var]

            if fn == "all":
                return F.forall(col, _bound_p), "bool"
            if fn == "any":
                return F.exists(col, _bound_p), "bool"
            if fn == "none":
                return ~F.exists(col, _bound_p), "bool"
            return (F.size(F.filter(col, _bound_p)) == 1), "bool"
        raise CypherUnsupported(f"unsupported expression node: {kind!r}")

    def rec_pred(p):
        if p[0] == "isnull":
            c, _ = rec(p[1])
            return c.isNotNull() if p[2] else c.isNull()
        if p[0] == "notpred":
            return ~rec_pred(p[1])
        if p[0] == "boolop":
            l, r = rec_pred(p[2]), rec_pred(p[3])
            if p[1] == "and":
                return l & r
            if p[1] == "or":
                return l | r
            return l != r  # xor — null-propagating boolean inequality
        if p[0] == "inpred":
            # Cypher IN: true when found; NULL when not found but the
            # list holds a NULL (or the needle is NULL) — exactly
            # Spark's array_contains three-valued contract. A literal
            # NULL needle is NULL outright (array_contains refuses the
            # untyped NullType literal).
            if p[1] == ("null",):
                return F.lit(None).cast("boolean")
            c, _ = rec(p[1])
            lc, _ = rec(p[2])
            return F.array_contains(lc, c)
        if p[0] in ("cmp", "cmppred"):
            _, op, l, r = p
            lc, _ = rec(l)
            rc, _ = rec(r)
            return _OPS[op](lc, rc)
        # a plain value node used as a boolean (`CASE WHEN n.flag
        # THEN`, `RETURN a AND b` over boolean columns) — legal only
        # when the column IS boolean; anything else keeps the refusal
        # (Neo4j type-errors a non-boolean predicate at runtime)
        c, _ = rec(p)
        try:
            is_bool = (
                df.select(c.alias("_p")).schema[0].dataType.simpleString()
                == "boolean"
            )
        except Exception:
            is_bool = False
        if not is_bool:
            raise CypherUnsupported(
                "predicate position needs a boolean expression "
                "(comparison, IS [NOT] NULL, IN, or a boolean value)"
            )
        return c

    def _int_literal(arg_ast, fn: str) -> int:
        if arg_ast[0] != "num" or not isinstance(arg_ast[1], int):
            raise CypherUnsupported(
                f"{fn} needs an integer literal argument in this position"
            )
        return arg_ast[1]

    def compile_fn(fname_raw: str, args):
        fname = fname_raw.lower()

        def need(*counts):
            if len(args) not in counts:
                raise CypherUnsupported(
                    f"{fname_raw} takes {' or '.join(map(str, counts))} "
                    f"argument(s), got {len(args)}"
                )

        if fname == "datetime":
            # datetime() — now; datetime('<iso>') — a fixed instant. Both
            # constant-fold, so comparisons against them push down.
            need(0, 1)
            if not args:
                return F.current_timestamp(), "other"
            if args[0][0] == "map":
                # datetime({epochMillis: <expr>}) — the millisecond
                # constructor (the write path's a103 twin): any scalar
                # expression supplies the millis
                mf = dict(args[0][1])
                if set(mf) == {"epochMillis"}:
                    mc, _ = rec(mf["epochMillis"])
                    return (
                        F.timestamp_millis(mc.cast("bigint")),
                        "other",
                    )
                raise CypherUnsupported(
                    "datetime(map) supports {epochMillis: <expr>}"
                )
            if args[0][0] != "str":
                raise CypherUnsupported(
                    "datetime() takes a literal ISO string"
                )
            return F.to_timestamp(F.lit(lits[args[0][1]])), "other"
        if fname == "duration":
            # duration('P…') — an INTERVAL value (months kept calendar,
            # the exact-length rest folded to seconds, Neo4j's own
            # duration decomposition); composes with timestamps via +/-
            need(1)
            if args[0][0] != "str":
                raise CypherUnsupported(
                    "duration() takes a literal ISO-8601 string"
                )
            months, secs = duration_parts(lits[args[0][1]])
            return (
                F.make_interval(
                    F.lit(0), F.lit(months), F.lit(0), F.lit(0),
                    F.lit(0), F.lit(0), F.lit(float(secs)),
                ),
                "other",
            )
        if fname == "id":
            # id(n) as a VALUE expression (`WHERE id(a) = $id` — the
            # Neo4j lookup-by-id idiom): the deterministic
            # content-derived node id, same value the RETURN-item path
            # projects
            need(1)
            if args[0][0] != "name":
                raise CypherUnsupported("id() takes a bound node alias")
            ia = args[0][1]
            if ia not in aliases:
                raise CypherUnsupported(f"id() on unbound alias: {ia!r}")
            return F.col(f"{aliases[ia]}{NODE_ID}"), "int"
        if fname == "type":
            # type(r) as a VALUE expression (aggregating RETURN, CASE,
            # concat — anywhere the scalar compiler runs): the matched
            # relationship's type column, same resolution as the
            # RETURN-item fast path
            need(1)
            if (
                args[0][0] != "name"
                or rel_alias is None
                or args[0][1] != rel_alias
            ):
                raise CypherUnsupported(
                    "type() needs the bound relationship alias"
                )
            if "rel_type" not in df.columns:
                raise CypherUnsupported(
                    "type() needs a relationship pattern in scope"
                )
            return F.col("rel_type"), "str"
        if fname == "length":
            # length(p) as a VALUE expression (aggregating RETURN etc.):
            # the hop count of a path binding, same resolution as the
            # RETURN-item fast path
            need(1)
            if (
                args[0][0] != "name"
                or rel_alias is None
                or args[0][1] != rel_alias
                or "hops" not in df.columns
            ):
                raise CypherUnsupported(
                    "length() needs a bound path alias"
                )
            return F.col("hops").cast("bigint"), "int"
        if fname in ("nodes", "relationships"):
            # nodes(p) / relationships(p) as VALUE expressions
            # (`size(nodes(p))`, comprehensions): the path-collecting
            # ladder's arrays — node merge-keys / relationship types in
            # path order, same columns the RETURN-item fast path reads
            need(1)
            pcol = "path_keys" if fname == "nodes" else "path_types"
            if (
                args[0][0] != "name"
                or rel_alias is None
                or args[0][1] != rel_alias
                or pcol not in df.columns
            ):
                raise CypherUnsupported(
                    f"{fname_raw}() needs a bound path alias"
                )
            return F.col(pcol), "list"
        if fname == "keys":
            # keys(<map>) as a VALUE expression — struct literals ($m
            # params, {k: v} literals) yield their field names, map
            # columns their runtime keys. keys(n) on a node alias stays
            # a RETURN-item fast path (the full prop-column set lives
            # there, not in the scalar frame).
            need(1)
            kc, _ = rec(args[0])
            try:
                _kdt = df.select(kc.alias("_t")).schema[0].dataType
            except Exception:
                _kdt = None
            if isinstance(_kdt, StructType):
                return F.array(*[F.lit(nm) for nm in _kdt.names]), "list"
            if isinstance(_kdt, MapType):
                return F.map_keys(kc), "list"
            raise CypherUnsupported(
                "keys() in expressions takes a map value — keys(n) on "
                "an entity is a top-level RETURN item"
            )
        if fname == "labels":
            # labels(n) as a VALUE expression (membership tests, size):
            # [primary] ++ sorted extras — identical construction to the
            # RETURN-item path, so `'X' IN labels(n)` sees the same set
            need(1)
            if args[0][0] != "name":
                raise CypherUnsupported("labels() takes a bound node alias")
            la = args[0][1]
            if la not in aliases:
                raise CypherUnsupported(f"labels() on unbound alias: {la!r}")
            prim = _prop_col(df, aliases[la], "label")
            extra_name = aliases[la] + EXTRA_LABELS
            if extra_name in df.columns:
                extras = F.filter(
                    F.split(
                        F.coalesce(F.col(extra_name), F.lit("")), ","
                    ),
                    lambda x: (x != "") & (x != prim),
                )
                return F.concat(F.array(prim), F.array_sort(extras)), "list"
            return F.array(prim), "list"
        if fname == "coalesce":
            if not args:
                raise CypherUnsupported("coalesce needs at least one argument")
            compiled = [rec(a) for a in args]
            tags = [t for _, t in compiled]
            tag = "str" if "str" in tags else tags[0]
            return F.coalesce(*[c for c, _ in compiled]), tag
        if fname in ("toupper", "tolower", "trim", "ltrim", "rtrim"):
            need(1)
            c, _ = rec(args[0])
            spark_fn = {
                "toupper": F.upper, "tolower": F.lower,
                "trim": F.trim, "ltrim": F.ltrim, "rtrim": F.rtrim,
            }[fname]
            return spark_fn(c), "str"
        if fname == "tostring":
            need(1)
            c, _ = rec(args[0])
            return c.cast("string"), "str"
        if fname == "tointeger":
            # Neo4j toInteger() returns NULL for unparseable input —
            # try_cast, never the ANSI error (a string like 'de' must
            # yield NULL, not a NumberFormatException). Float-looking
            # strings truncate via an intermediate double, matching
            # Neo4j ('3.9' → 3).
            need(1)
            c, t = rec(args[0])
            if t == "str":
                return c.try_cast("double").try_cast("long"), "int"
            return c.try_cast("long"), "int"
        if fname == "tofloat":
            # same NULL-on-unparseable contract
            need(1)
            c, _ = rec(args[0])
            return c.try_cast("double"), "float"
        if fname == "size":
            # Cypher size() counts characters of a string and elements of
            # a list — dispatch on the compiled operand's type tag
            need(1)
            c, t = rec(args[0])
            if t == "list":
                return F.size(c).cast("bigint"), "int"
            return F.length(c).cast("bigint"), "int"
        if fname == "isempty":
            # Cypher isEmpty() — true for '' / [] (NULL in → NULL out,
            # both engines); same type dispatch as size()
            need(1)
            c, t = rec(args[0])
            if t == "list":
                return F.size(c) == 0, "other"
            return F.length(c) == 0, "other"
        if fname == "split":
            # Cypher split(s, delim) — delim is a literal string, escaped
            # so it splits verbatim (F.split takes a regex)
            need(2)
            c, _ = rec(args[0])
            if args[1][0] != "str":
                raise CypherUnsupported(
                    "split() needs a literal string delimiter"
                )
            delim = lits[args[1][1]]
            return F.split(c, re.escape(delim)), "list"
        if fname in ("head", "last"):
            # head([]) / last([]) are NULL in Cypher — try_element_at
            # instead of element_at, which ANSI-errors on the empty
            # list; a literal NULL argument is NULL outright (the
            # untyped VOID literal can't feed element_at)
            need(1)
            if args[0] == ("null",):
                return F.lit(None), "other"
            c, _ = rec(args[0])
            return (
                F.try_element_at(c, F.lit(1 if fname == "head" else -1)),
                "other",
            )
        if fname == "tail":
            # tail(xs) — everything after the head; empty list for a
            # singleton, NULL for NULL (slice semantics match Cypher)
            need(1)
            c, _ = rec(args[0])
            return (
                F.slice(c, 2, F.greatest(F.size(c) - 1, F.lit(0))),
                "list",
            )
        if fname == "reverse":
            # Cypher reverse() flips a string or a list; F.reverse does both
            need(1)
            c, t = rec(args[0])
            return F.reverse(c), t
        if fname == "range":
            # range(start, end[, step]) — INCLUSIVE end (Cypher/Spark
            # sequence semantics agree, unlike Python). One divergence
            # Spark must be guarded against: F.sequence AUTO-DESCENDS
            # when end < start (sequence(1, 0) = [1, 0]) where Cypher
            # returns []; with an explicit step, Cypher yields [] when
            # the step's sign cannot reach end from start (range(1, 5,
            # -1) = []), while Spark raises. Gate on the sign so the
            # empty-list semantics match openCypher exactly.
            need(2, 3)
            lo = rec(args[0])[0].cast("long")
            hi = rec(args[1])[0].cast("long")
            if len(args) == 3:
                st = rec(args[2])[0].cast("long")
                return (
                    F.when(
                        ((st > 0) & (hi >= lo)) | ((st < 0) & (hi <= lo)),
                        F.sequence(lo, hi, st),
                    ).otherwise(F.array().cast("array<long>")),
                    "list",
                )
            return (
                F.when(hi >= lo, F.sequence(lo, hi)).otherwise(
                    F.array().cast("array<long>")
                ),
                "list",
            )
        if fname == "date":
            # date() — today; date(x) — truncate an instant to its date
            need(0, 1)
            if not args:
                return F.current_date(), "other"
            c, _ = rec(args[0])
            return F.to_date(c), "other"
        if fname == "abs":
            need(1)
            c, t = rec(args[0])
            return F.abs(c), t
        if fname == "sign":
            need(1)
            c, _ = rec(args[0])
            return F.signum(c).cast("long"), "int"
        if fname == "round":
            need(1, 2)
            c, _ = rec(args[0])
            if len(args) == 2:
                return F.round(c, _int_literal(args[1], "round")), "float"
            return F.round(c), "float"
        if fname == "floor":
            need(1)
            c, _ = rec(args[0])
            return F.floor(c).cast("long"), "int"
        if fname == "ceil":
            need(1)
            c, _ = rec(args[0])
            return F.ceil(c).cast("long"), "int"
        if fname == "replace":
            need(3)
            c, _ = rec(args[0])
            s, st = rec(args[1])
            r, rt = rec(args[2])
            return F.replace(c, s, r), "str"
        if fname == "left":
            need(2)
            c, _ = rec(args[0])
            return F.substring(c, 1, _int_literal(args[1], "left")), "str"
        if fname == "right":
            need(2)
            c, _ = rec(args[0])
            k = _int_literal(args[1], "right")
            return F.substring(c, -k, k), "str"
        if fname == "substring":
            # Cypher substring(s, start[, length]) is 0-based
            need(2, 3)
            c, _ = rec(args[0])
            start = _int_literal(args[1], "substring") + 1
            length = (
                _int_literal(args[2], "substring")
                if len(args) == 3
                else 2147483647
            )
            return F.substring(c, start, length), "str"
        if fname in ("sqrt", "exp", "log", "log10", "sin", "cos", "tan",
                     "asin", "acos", "atan"):
            # Cypher's math library (openCypher §10.4); log is NATURAL log
            # (Neo4j semantics — Spark's F.log with one arg agrees)
            need(1)
            c, _ = rec(args[0])
            spark_fn = {
                "sqrt": F.sqrt, "exp": F.exp, "log": F.log, "log10": F.log10,
                "sin": F.sin, "cos": F.cos, "tan": F.tan,
                "asin": F.asin, "acos": F.acos, "atan": F.atan,
            }[fname]
            return spark_fn(c.cast("double")), "float"
        if fname == "atan2":
            need(2)
            y, _ = rec(args[0])
            x, _ = rec(args[1])
            return F.atan2(y.cast("double"), x.cast("double")), "float"
        if fname == "pi":
            need(0)
            return F.lit(math.pi), "float"
        if fname == "e":
            need(0)
            return F.lit(math.e), "float"
        if fname == "toboolean":
            # toBoolean('true'/'false', boolean passthrough; anything
            # else → NULL — Neo4j's lenient conversion)
            need(1)
            c, _ = rec(args[0])
            return (
                F.when(F.lower(c.cast("string")) == "true", F.lit(True))
                .when(F.lower(c.cast("string")) == "false", F.lit(False))
            ), "other"
        if fname == "timestamp":
            # timestamp() — current epoch millis (non-deterministic per
            # statement, like Neo4j's per-transaction clock). unix_millis
            # keeps millisecond resolution; unix_timestamp()*1000 would
            # truncate to whole seconds.
            need(0)
            return F.unix_millis(F.current_timestamp()), "int"
        if fname == "rand":
            # rand() — uniform [0, 1) per row, Neo4j's nondeterministic
            # contract (the engine's own operators stay RNG-free; this
            # exists for user queries only, so no oracle entry)
            need(0)
            return F.rand(), "float"
        if fname == "randomuuid":
            need(0)
            return F.expr("uuid()"), "str"
        raise CypherUnsupported(
            f"unsupported function {fname_raw!r} in expression (supported: "
            "coalesce, toUpper, toLower, toString, toInteger, toFloat, "
            "toBoolean, size, abs, sign, round, floor, ceil, sqrt, exp, log, "
            "log10, sin, cos, tan, asin, acos, atan, atan2, pi, e, trim, "
            "ltrim, rtrim, replace, left, right, substring, split, head, "
            "last, reverse, range, timestamp)"
        )

    return rec(ast)


_PRED_SPLIT_RE = re.compile(
    r"<=|>=|<>|=~|=|<|>|\(|\)"
    r"|(?<![\w$])(?:CASE|END|CONTAINS|STARTS_WITH|ENDS_WITH)(?![\w$])",
    re.IGNORECASE,
)

_IS_NULL_TAIL_RE = re.compile(
    r"^(?P<expr>.+?)\s+(?:IS\s+(?P<neg>NOT\s+)?NULL"
    r"|IS(?P<neg2>_NOT)?_NULL)$",
    re.IGNORECASE,
)


def _split_expr_predicate(text: str):
    """Split one WHERE conjunct of the form ``<expr> <cmp> <expr>`` (or
    ``<expr> IS [NOT] NULL``) at its TOP-LEVEL comparison — parens and
    CASE…END nesting are skipped so comparisons inside a CASE WHEN never
    split the predicate. Returns ``('cmp', left, op, right)`` /
    ``('isnull', expr, negated)`` or None if no top-level comparison."""
    depth = 0
    case_depth = 0
    for m in _PRED_SPLIT_RE.finditer(text):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif tok.upper() == "CASE":
            case_depth += 1
        elif tok.upper() == "END":
            case_depth -= 1
        elif depth == 0 and case_depth == 0:
            return ("cmp", text[: m.start()].strip(), tok, text[m.end():].strip())
    nm = _IS_NULL_TAIL_RE.match(text.strip())
    if nm:
        return (
            "isnull",
            nm.group("expr"),
            bool(nm.group("neg") or nm.group("neg2")),
        )
    return None


_LISTPRED_ITEM_RE = re.compile(
    r"^(?P<neg>NOT\s+)?(?:all|any|none|single)\s*\(.+\)$",
    re.IGNORECASE | re.DOTALL,
)


_LABEL_TEST_RE = re.compile(
    r"^(?P<alias>\w+)\s*:\s*(?P<labels>\w+(?:\s*:\s*\w+)*)$"
)


def _label_membership(df, prefix: str, label: str):
    """``n:Label`` membership over an aliased frame: the primary label
    column equality, widened over the ``_labels`` secondary set when the
    frame carries it — the same effective-set semantics as
    ``Graph._label_pred``, compiled against the alias's prefix."""
    pred = F.col(f"{prefix}label") == label
    lcol = f"{prefix}{EXTRA_LABELS}"
    if lcol in df.columns:
        pred = pred | F.array_contains(
            F.split(F.coalesce(F.col(lcol), F.lit("")), ","), label
        )
    return pred


def _label_test_col(item, df, aliases):
    """``n:Label[:Label2…]`` as a boolean Column (WHERE leaf or RETURN
    value — openCypher's label predicate), or None if not that shape."""
    lt = _LABEL_TEST_RE.match(item.strip())
    if not lt or lt.group("alias") not in aliases:
        return None
    pred = None
    for lb in (x.strip() for x in lt.group("labels").split(":") if x.strip()):
        t = _label_membership(df, aliases[lt.group("alias")], lb)
        pred = t if pred is None else (pred & t)
    return pred


def _compile_where_expr_pred(item, df, aliases, rel_alias, lits, params):
    """Compile an expression-form WHERE conjunct to one filter Column."""
    lc = _label_test_col(item, df, aliases)
    if lc is not None:
        return lc
    lm = _LISTPRED_ITEM_RE.match(item.strip())
    if lm:
        # a bare list predicate IS the conjunct — no comparator to split
        body = re.sub(r"^NOT\s+", "", item.strip(), flags=re.IGNORECASE)
        c, _ = _compile_scalar(
            _parse_scalar_expr(body), df, aliases, rel_alias, lits, params
        )
        return ~c if lm.group("neg") else c
    split = _split_expr_predicate(item)
    if split is None:
        # membership test `<scalar> IN <list expr>` — array_contains over
        # any list-typed expression (labels(n), split(...), literals)
        inm = re.match(
            r"^(?P<l>.+?)\s+IN\s+(?P<r>.+)$", item.strip(),
            re.IGNORECASE | re.DOTALL,
        )
        if inm:
            lc, _ = _compile_scalar(
                _parse_scalar_expr(inm.group("l")),
                df, aliases, rel_alias, lits, params,
            )
            rc, rtag = _compile_scalar(
                _parse_scalar_expr(inm.group("r")),
                df, aliases, rel_alias, lits, params,
            )
            return F.array_contains(rc, lc)
        # a bare BOOLEAN-valued expression as the whole conjunct
        # (`WHERE isEmpty(a.xs)`, `WHERE toBoolean(a.flag)`, `WHERE
        # a.ok`): compile it and verify the type really is boolean —
        # schema-only analysis, no job — so non-boolean leaves still
        # refuse instead of silently coercing
        try:
            col, _ = _compile_scalar(
                _parse_scalar_expr(item), df, aliases, rel_alias, lits, params
            )
            if df.select(col.alias("_p")).schema[0].dataType.simpleString() == "boolean":
                return col
        except CypherUnsupported:
            pass
        raise CypherUnsupported(f"unsupported WHERE predicate: {item!r}")
    if split[0] == "isnull":
        c, _ = _compile_scalar(
            _parse_scalar_expr(split[1]), df, aliases, rel_alias, lits, params
        )
        return c.isNotNull() if split[2] else c.isNull()
    _, left, op, right = split
    lc, _ = _compile_scalar(
        _parse_scalar_expr(left), df, aliases, rel_alias, lits, params
    )
    rc, _ = _compile_scalar(
        _parse_scalar_expr(right), df, aliases, rel_alias, lits, params
    )
    return _op_fn(op)(lc, rc)


def _compile_return_expr(item, df, aliases, rel_alias, lits, params):
    """One RETURN expression item → (Column, output name). With no
    ``AS``, the name is the whitespace-squeezed expression text (the
    Neo4j result-pane convention)."""
    am = _EXPR_AS_RE.match(item)
    body, out = (am.group("expr"), am.group("out")) if am else (item, None)
    lc = _label_test_col(body, df, aliases)
    if lc is not None:
        # `n:Label AS f` — the label predicate as a boolean VALUE
        return lc, (out or re.sub(r"\s+", "", body))
    mm = re.match(r"^\{(?P<body>.*)\}$", body.strip(), re.DOTALL)
    if mm:
        # map LITERAL `{k: <expr>, …}` — compiles to a struct of the
        # per-key expression Columns (the same Row shape map
        # projections produce); keys are identifiers, values any
        # scalar expression
        fields = []
        for pair in _split_top_commas(mm.group("body")):
            km = re.match(r"^\s*(\w+)\s*:\s*(.+)$", pair, re.DOTALL)
            if not km:
                raise CypherUnsupported(
                    f"unsupported map literal entry: {pair!r}"
                )
            c, _ = _compile_scalar(
                _parse_scalar_expr(km.group(2).strip()),
                df, aliases, rel_alias, lits, params,
            )
            fields.append(c.alias(km.group(1)))
        if not fields:
            raise CypherUnsupported("empty map literal")
        return F.struct(*fields), (out or re.sub(r"\s+", "", body))
    col, _ = _compile_scalar(
        _parse_scalar_expr(body), df, aliases, rel_alias, lits, params
    )
    return col, (out or re.sub(r"\s+", "", body))


_EXISTS_ITEM_RE = re.compile(
    r"^(?P<neg>NOT\s+)?EXISTS\s*\{(?P<pat>(?:[^{}]|\{[^{}]*\})+)\}$",
    re.IGNORECASE,
)


def _split_top_and(s: str) -> list[str]:
    """Split a WHERE body on ``AND`` connectives at nesting depth 0 —
    an ``AND`` inside an ``EXISTS { … WHERE x AND y }`` subquery body
    belongs to the subquery, not the outer conjunction (the naive
    ``re.split`` would cut straight through the braces)."""
    parts: list[str] = []
    depth, start, i, n = 0, 0, 0, len(s)
    up = s.upper()
    while i < n:
        ch = s[i]
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif (
            depth == 0
            and up.startswith("AND", i)
            and i > 0
            and s[i - 1].isspace()
            and i + 3 < n
            and s[i + 3].isspace()
        ):
            parts.append(s[start:i])
            i += 3
            start = i
            continue
        i += 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _extract_exists(body: str, out: list) -> str:
    """Pull ``[NOT] EXISTS { [MATCH] <relationship pattern> [WHERE …] }``
    conjuncts out of a WHERE body (they compile to LEFT SEMI / LEFT
    ANTI joins, not Columns, so they must be whole top-level AND
    conjuncts — anything else is refused). Returns the body with those
    conjuncts removed.

    Each entry appended to ``out`` is ``(src_alias, rel_type,
    direction, dst_label, negated, src_label, dst_alias, inner_where)``
    — the last three serve the full Neo4j-5 existential subquery form
    ``EXISTS { MATCH (a:Article)-[:T]->(p2:Publisher) WHERE p2.x =
    p.x }`` (inner alias + correlated predicate); they are None for
    the bare pattern form."""
    remaining: list[str] = []
    for it in _split_top_and(body):
        it_s = it.strip()
        m = _EXISTS_ITEM_RE.match(it_s)
        pat_text = None
        negated = False
        if m:
            # Cypher 5's full existential subquery `EXISTS { MATCH
            # <pattern> [WHERE <preds>] }` — the leading MATCH keyword
            # is noise; an inner WHERE rides along as a correlated
            # join condition
            pat_text = re.sub(
                r"^MATCH\s+", "", m.group("pat").strip(), flags=re.IGNORECASE
            )
            negated = bool(m.group("neg"))
        else:
            # Neo4j-3 `exists(...)` FUNCTION spelling: a pattern arg is
            # the bare pattern predicate; a property arg is IS NOT NULL
            fn = re.match(
                r"^(?P<neg>NOT\s+)?exists\s*\(\s*(?P<inner>.+?)\s*\)$",
                it_s, re.IGNORECASE | re.DOTALL,
            )
            if fn and re.match(r"^\w+\.\w+$", fn.group("inner")):
                remaining.append(
                    f"{fn.group('inner')} IS "
                    + ("NULL" if fn.group("neg") else "NOT NULL")
                )
                continue
            if fn and fn.group("inner").startswith("("):
                it_s = (
                    ("NOT " if fn.group("neg") else "")
                    + fn.group("inner")
                    # the conjunct splitter keeps the call's own closing
                    # paren inside `inner` — the non-greedy inner plus
                    # the anchored $ guarantee balance here
                )
            # legacy bare pattern predicate: `WHERE [NOT] (a)-[:T]->(:L)`
            # — the pre-EXISTS Cypher spelling, same semi/anti compile.
            # Inline endpoint property maps are legal (the shared
            # stripper below folds them into the inner WHERE), so the
            # shape gate runs on the props-STRIPPED text.
            bare = re.match(r"^(?P<neg>NOT\s+)?(?P<pat>\(.+\))$", it_s,
                            re.IGNORECASE | re.DOTALL)
            if bare:
                cand = bare.group("pat").strip()
                cand = re.sub(r"\)\s*-->\s*\(", ")-[]->(", cand)
                cand = re.sub(r"\)\s*<--\s*\(", ")<-[]-(", cand)
                cand = re.sub(r"\)\s*--\s*\(", ")-[]-(", cand)
                cand_stripped, _cl, _cr = _strip_endpoint_props(cand)
                if _REL_RE.match(cand_stripped):
                    pat_text = cand
                    negated = bool(bare.group("neg"))
        if pat_text is None:
            if re.search(r"(?<![.$\w])EXISTS\b", it_s, re.IGNORECASE):
                raise CypherUnsupported(
                    "EXISTS must be a whole AND conjunct of the form "
                    "[NOT] EXISTS { [MATCH] (a)-[:T]->(x:L) [WHERE …] } "
                    "(it compiles to a semi/anti join and cannot sit "
                    "under OR)"
                )
            remaining.append(it)
            continue
        inner_where = None
        wsplit = re.split(r"\s+WHERE\s+", pat_text, maxsplit=1,
                          flags=re.IGNORECASE)
        if len(wsplit) == 2:
            pat_text, inner_where = wsplit[0].strip(), wsplit[1].strip()
        # inline property map on the TARGET node — `EXISTS {
        # (a)-[:T]->(:L {k: $v}) }` — is sugar for the inner-WHERE
        # equality (Neo4j treats them identically); mint an alias for
        # the anonymous form and fold the pairs into the inner WHERE
        pat_text, x_lp, x_rp = _strip_endpoint_props(pat_text)
        if x_lp:
            raise CypherUnsupported(
                "EXISTS source properties are unsupported — the source "
                "is the bound alias; filter it in the outer WHERE"
            )
        pm = _REL_RE.match(pat_text)
        if not pm:
            raise CypherUnsupported(
                f"unsupported EXISTS pattern: {pat_text!r}"
            )
        if pm.group("star"):
            raise CypherUnsupported(
                "variable-length patterns are unsupported in EXISTS"
            )
        if not pm.group("src_alias"):
            raise CypherUnsupported(
                "EXISTS source must be a bound alias"
            )
        dst_alias = pm.group("dst_alias")
        if x_rp:
            dst_alias = dst_alias or "_xt"
            extra = [
                f"{dst_alias}.{prop} = {raw}"
                for prop, raw in _parse_value_props(x_rp)
            ]
            inner_where = " AND ".join(
                extra + ([inner_where] if inner_where else [])
            )
        if dst_alias and inner_where is None:
            raise CypherUnsupported(
                "EXISTS target alias needs an inner WHERE that uses it "
                "(otherwise write the anonymous form: () or (:Label))"
            )
        if inner_where is not None and not dst_alias:
            raise CypherUnsupported(
                "EXISTS inner WHERE needs a named target alias to "
                "reference: EXISTS { (a)-[:T]->(x:L) WHERE x.p = … }"
            )
        out.append(
            (
                pm.group("src_alias"),
                pm.group("rel_type"),
                _rel_direction(pm),
                _node_labels(pm.group("dst_label")),
                negated,
                _node_labels(pm.group("src_label")),
                dst_alias,
                inner_where,
                pm.group("rel_props"),
            )
        )
    return " AND ".join(remaining).strip()


def _op_fn(op: str):
    """Canonicalize an operator token (case, inner whitespace) to its
    Column predicate; the multi-word string predicates arrive with
    arbitrary spacing/case from the statement text."""
    return _OPS[re.sub(r"[_\s]+", " ", op.strip().upper())]


_POST_WHERE_RE = re.compile(
    r"^(?P<name>\w+)\s*(?P<op><=|>=|<>|=|<|>)\s*"
    r"(?P<val>\$\w+|-?\d+(?:\.\d+)?|\x00\d+\x00)$"
)
_POST_RETURN_RE = re.compile(
    r"^(?P<name>\w+)(?:\.(?P<field>\w+))?(?:\s+AS\s+(?P<out>\w+))?$",
    re.IGNORECASE,
)


def _run_post_with(
    df: DataFrame,
    clauses: list[_Clause],
    lits: list[str],
    params: dict | None,
) -> DataFrame:
    """The pipeline tail after an aggregating WITH: the frame is flat
    (WITH output names are plain columns), so WHERE compares bare names
    (Cypher's HAVING idiom — `WITH …, count(*) AS n WHERE n >= 2`),
    RETURN renames/projects them, ORDER BY/SKIP/LIMIT page as usual."""
    returns: list[str] = []
    order_by: list[tuple[str, bool]] = []
    skip: int | None = None
    limit: int | None = None
    for c in clauses:
        if c.kind == "WHERE":
            for item in re.split(r"\s+AND\s+", c.body, flags=re.IGNORECASE):
                m = _POST_WHERE_RE.match(item.strip())
                if not m or m.group("name") not in df.columns:
                    raise CypherUnsupported(
                        f"unsupported WHERE after WITH: {item!r}"
                    )
                df = df.filter(
                    _OPS[m.group("op")](
                        F.col(m.group("name")),
                        F.lit(_where_value(m.group("val"), lits, params)),
                    )
                )
        elif c.kind == "RETURN":
            returns = _split_top_commas(c.body)
        elif c.kind == "ORDER":
            body = re.sub(r"^BY\s+", "", c.body, flags=re.IGNORECASE)
            for item in _split_top_commas(body):
                m = re.match(r"^(?P<key>\w+)(?:\s+(?P<dir>ASC|DESC))?$", item, re.IGNORECASE)
                if not m:
                    raise CypherUnsupported(f"unsupported ORDER BY item: {item!r}")
                order_by.append((m.group("key"), (m.group("dir") or "ASC").upper() == "DESC"))
        elif c.kind == "SKIP":
            skip = _page_count(c.body, params, "SKIP")
        elif c.kind == "LIMIT":
            limit = _page_count(c.body, params, "LIMIT")
        elif c.kind == "UNWIND":
            # `WITH collect(x) AS xs UNWIND xs AS x` — the canonical
            # Cypher reshaping idiom: one narrow explode of the WITH
            # output column, no shuffle
            um = re.match(
                r"^(?P<name>\w+)\s+AS\s+(?P<alias>\w+)\s*$",
                c.body,
                re.IGNORECASE,
            )
            if not um or um.group("name") not in df.columns:
                raise CypherUnsupported(
                    f"UNWIND after WITH must explode a WITH name: {c.body!r}"
                )
            df = df.withColumn(
                um.group("alias"), F.explode(F.col(um.group("name")))
            )
        elif c.kind == "WITH":
            # a further non-aggregating WITH over the flat frame — a
            # plain re-projection/rename of the WITH output names
            # (Cypher's chained-horizon idiom `… WITH pub, n WHERE
            # n > 1 …`); expressions/aggregates in this position stay
            # out of the subset
            if c.body.strip() == "*":
                continue
            sel2 = []
            for item in _split_top_commas(c.body):
                mm = re.match(
                    r"^(?P<name>\w+)(?:\s+AS\s+(?P<out>\w+))?$",
                    item.strip(),
                    re.IGNORECASE,
                )
                if not mm or mm.group("name") not in df.columns:
                    raise CypherUnsupported(
                        "WITH after an aggregating WITH supports plain "
                        f"re-projections of its output names only: {item!r}"
                    )
                sel2.append(
                    F.col(mm.group("name")).alias(
                        mm.group("out") or mm.group("name")
                    )
                )
            df = df.select(*sel2)
        else:
            raise CypherUnsupported(f"{c.kind} unsupported after aggregating WITH")
    if not returns:
        raise CypherUnsupported("aggregating WITH needs a RETURN tail")
    if any(_is_agg_item(i) for i in returns):
        # RE-aggregation after the WITH (the collect→UNWIND→sum round
        # trip): the frame is flat, so the implicit-grouping compiler
        # runs with an empty alias map — WITH names and unwound
        # variables are plain columns to it
        return _aggregate_return(
            df, returns, {}, None, order_by, skip, limit, lits, params
        )
    out_cols = []
    name_map: dict[str, str] = {}
    for item in returns:
        m = _POST_RETURN_RE.match(item)
        if not m or m.group("name") not in df.columns:
            # expression over WITH names: `RETURN size(xs) AS n` — the
            # frame is flat, so the scalar compiler sees plain columns
            try:
                e, nm2 = _compile_return_expr(item, df, {}, None, lits, params)
            except CypherUnsupported:
                raise CypherUnsupported(
                    f"RETURN after WITH must use WITH names or "
                    f"expressions over them: {item!r}"
                ) from None
            out_cols.append(e.alias(nm2))
            name_map[nm2] = nm2
            continue
        name, field = m.group("name"), m.group("field")
        if field is not None:
            # `p.key` over a whole-entity WITH key — struct field access
            if not dict(df.dtypes)[name].startswith("struct"):
                raise CypherUnsupported(
                    f"{name!r} is not an entity column; {item!r} needs a "
                    "whole-entity WITH key"
                )
            # key-name fallback, the _prop_col convention: an entity's
            # merge key reads by its USER-facing name (`p.publisher` on
            # a Publisher keyed by publisher) even though the storage
            # column is `key`
            fnames = {f.name for f in df.schema[name].dataType.fields}
            if field not in fnames:
                if "key" not in fnames:
                    raise CypherUnsupported(
                        f"unknown field {field!r} on entity {name!r}"
                    )
                field = "key"
            out = m.group("out") or m.group("field")
            out_cols.append(F.col(name)[field].alias(out))
            name_map[out] = f"{name}.{field}"  # F.col resolves the field
        else:
            out = m.group("out") or name
            out_cols.append(F.col(name).alias(out))
            name_map[name] = name
            name_map[out] = name
    if order_by:
        # sort keys that resolve on the pre-projection frame (WITH names,
        # incl. non-returned ones) sort df; RETURN-computed expression
        # names only exist post-select, so those sort the projection
        def _pre_name(key):
            # pre-projection resolution: a RETURN name mapping onto a df
            # column/field, or a WITH name not re-projected by RETURN
            if key in name_map and (
                name_map[key] in df.columns or "." in name_map[key]
            ):
                return name_map[key]
            if key in df.columns:
                return key
            return None

        pre = all(_pre_name(key) is not None for key, _ in order_by)
        sorts = []
        for key, desc in order_by:
            if key not in name_map and key not in df.columns:
                raise CypherUnsupported(
                    f"ORDER BY key {key!r} is not a WITH/RETURN name"
                )
            if not pre and key not in name_map:
                raise CypherUnsupported(
                    "ORDER BY cannot mix RETURN-computed keys with "
                    f"non-returned WITH names: {key!r}"
                )
            c = F.col(_pre_name(key) if pre else key)
            sorts.append(c.desc_nulls_first() if desc else c.asc_nulls_last())
        if pre:
            df = df.orderBy(*sorts)
            return _page(df.select(*out_cols), skip, limit)
        return _page(df.select(*out_cols).orderBy(*sorts), skip, limit)
    return _page(df.select(*out_cols), skip, limit)


_MH_NODE_RE = re.compile(r"\(\s*(?P<alias>\w+)?\s*(?::(?P<label>[\w|:]+))?\s*\)")
_MH_REL_RE = re.compile(
    r"^(?P<in><-|-)\[\s*(?P<ralias>\w+)?\s*(?::(?P<rtype>[\w|]+))?\s*\]"
    r"(?P<out>->|-)$"
)


def _split_multi_hop(body: str):
    """Split a simple multi-hop relationship chain
    ``(a:L1)-[:T1]->(b:L2)-[:T2]->(c:L3)…`` into per-hop tuples
    ``(src_alias, src_label, rel_alias, rel_type, direction, dst_alias,
    dst_label)``. Returns None for anything that is not a ≥2-hop plain
    chain (single hops, var-length, inline props, path functions keep
    their existing compile paths). Anonymous intermediate nodes get
    synthetic ``_mh<i>`` aliases."""
    text = body.strip()
    nodes = []
    rels = []
    pos = 0
    while True:
        m = _MH_NODE_RE.match(text, pos)
        if not m:
            return None
        nodes.append((m.group("alias"), m.group("label")))
        pos = m.end()
        if pos == len(text):
            break
        nxt = text.find("(", pos)
        if nxt == -1:
            return None
        seg = text[pos:nxt].strip()
        rm = _MH_REL_RE.match(seg)
        if not rm:
            return None
        if rm.group("in") == "<-" and rm.group("out") == "->":
            return None
        if rm.group("in") == "<-":
            direction = "in"
        elif rm.group("out") == "->":
            direction = "out"
        else:
            direction = "both"
        rels.append((rm.group("ralias"), rm.group("rtype"), direction))
        pos = nxt
    if len(rels) < 2:
        return None
    named = []
    for i, (al, lb) in enumerate(nodes):
        named.append((al or f"_mh{i}", lb))
    out = []
    for i, (ra, rt, dr) in enumerate(rels):
        sa, sl = named[i]
        da, dl = named[i + 1]
        out.append((sa, sl if i == 0 else None, ra, rt, dr, da, dl))
    return out


def _compile_pattern_comp(pcm, df, graph, aliases, lits, params):
    """Compile one pattern-comprehension item — ``[(a)-[:T]->(x)
    [WHERE …] | x.prop] AS xs`` (optionally size()-wrapped) — onto
    the frame: ONE aggregation on the edge side grouped by the
    source node id, LEFT-joined back (never a fan-out). Returns
    ``(df, column, out_name)``. Shared by the RETURN-item and WITH
    projection paths."""
    # pattern comprehension `[(a)-[:T]->(x) | x.prop] AS xs`
    # (openCypher §3.10), optionally wrapped in size(). Compiles
    # like COUNT {…}: ONE aggregation on the edge side grouped
    # by the source node id, then a broadcastable left join —
    # never a fan-out of the main frame. The collected list is
    # sort_array'd: Neo4j leaves comprehension order undefined,
    # a canonical order makes results partitioning-independent.
    pc_pat = pcm.group("pat").strip()
    pc_where = None
    pc_wsp = re.split(
        r"\s+WHERE\s+", pc_pat, maxsplit=1, flags=re.IGNORECASE
    )
    if len(pc_wsp) == 2:
        # `[(p)<-[:W]-(a) WHERE a.year > 2019 | a.link]` — the
        # filtered comprehension; conjuncts on the TARGET alias
        # plant as filters into its label scan below
        pc_pat, pc_where = pc_wsp[0].strip(), pc_wsp[1].strip()
    pm = _REL_RE.match(pc_pat)
    if not pm:
        raise CypherUnsupported(
            f"unsupported comprehension pattern: {pcm.group('pat')!r}"
        )
    if pm.group("star") or pm.group("rel_props"):
        raise CypherUnsupported(
            "variable-length / property patterns are unsupported "
            "in pattern comprehensions"
        )
    ca = pm.group("src_alias")
    da = pm.group("dst_alias")
    pc_dir = _rel_direction(pm)
    pc_new_label = pm.group("dst_label")
    if ca and not pm.group("src_label") and ca in aliases:
        pass  # canonical: bound bare alias on the source side
    elif (
        da
        and not pm.group("dst_label")
        and da in aliases
        and ca not in aliases
    ):
        # bound alias on the TARGET side — `[(x:L)-[:T]->(p) |
        # x.prop]` with p bound: flip to the canonical
        # orientation (same rows once the direction reverses)
        ca, da = da, ca
        pc_new_label = pm.group("src_label")
        pc_dir = {"out": "in", "in": "out"}.get(pc_dir, "both")
    else:
        raise CypherUnsupported(
            "pattern comprehensions must anchor one BARE endpoint "
            "on a bound alias"
        )
    prm = re.fullmatch(
        r"(?P<a>\w+)\.(?P<p>\w+)", pcm.group("proj").strip()
    )
    if not da or not prm or prm.group("a") != da:
        raise CypherUnsupported(
            "pattern-comprehension projection must be "
            "<target alias>.<property>"
        )
    from neo4j_graphdb_spark.operators.cypher import _orient_edges

    ce = graph.edges_df
    ce = _cy_rel_filter(ce, _rel_types(pm.group("rel_type")))
    ce = _orient_edges(ce, pc_dir)
    dstn = graph.match(_node_labels(pc_new_label))
    if pc_where:
        for conj in _split_top_and(pc_where):
            wm2 = _WHERE_ITEM_RE.match(conj.strip())
            if not wm2 or wm2.group("alias") != da:
                raise CypherUnsupported(
                    "pattern-comprehension WHERE supports simple "
                    "target-alias conjuncts (<target>.<prop> <op> "
                    "<value>)"
                )
            wcol = _prop_col(dstn, "", wm2.group("prop"))
            if wm2.group("op").upper() == "IN":
                dstn = dstn.filter(
                    _isin(
                        wcol,
                        _in_list_values(wm2.group("val"), lits, params),
                    )
                )
            else:
                dstn = dstn.filter(
                    _op_fn(wm2.group("op"))(
                        wcol,
                        F.lit(
                            _where_value(wm2.group("val"), lits, params)
                        ),
                    )
                )
    # key-name fallback, same convention as _prop_col: an
    # unknown property name reads the storage key column
    prop = prm.group("p") if prm.group("p") in dstn.columns else "key"
    name = pcm.group("out")
    if not name:
        raise CypherUnsupported(
            "pattern comprehensions need an AS alias"
        )
    side = (
        ce.join(
            dstn.select(
                F.col(NODE_ID).alias("_pcid"),
                F.col(prop).alias("_pcval"),
            ),
            ce["dst"] == F.col("_pcid"),
        )
        .groupBy(F.col("src").alias("_pcsrc"))
        .agg(F.sort_array(F.collect_list("_pcval")).alias(f"_pcl_{name}"))
    )
    src_id = (
        F.col(f"{aliases[ca]}{NODE_ID}") if aliases[ca] else F.col(NODE_ID)
    )
    df = df.join(side, src_id == F.col("_pcsrc"), "left").drop("_pcsrc")
    arr_dt = dict(side.dtypes)[f"_pcl_{name}"]
    filled = F.coalesce(
        F.col(f"_pcl_{name}"), F.lit(None).cast(arr_dt)
    )
    if pcm.group("size"):
        e = F.coalesce(F.size(filled), F.lit(0)).cast("bigint")
    else:
        e = F.coalesce(
            filled, F.expr(f"cast(array() as {arr_dt})")
        )
    return df, e, name


def _run_read(
    clauses: list[_Clause],
    graph: Graph,
    lits: list[str] | None = None,
    params: dict | None = None,
    seed: DataFrame | None = None,
) -> DataFrame:
    tok = _STRICT_PROPS.set(
        bool(
            getattr(
                graph, "strict_props", bool(getattr(graph, "key_names", None))
            )
        )
    )
    try:
        return _run_read_inner(clauses, graph, lits, params, seed)
    finally:
        _STRICT_PROPS.reset(tok)


def _run_read_inner(
    clauses: list[_Clause],
    graph: Graph,
    lits: list[str] | None = None,
    params: dict | None = None,
    seed: DataFrame | None = None,
) -> DataFrame:
    lits = lits or []
    for i, c in enumerate(clauses):
        if c.kind == "WITH" and any(
            _is_agg_item(x) for x in _split_top_commas(c.body)
        ):
            # aggregating WITH: everything before it + the WITH body as
            # a RETURN runs through the normal path (WITH shares
            # RETURN's grammar), and the tail filters/pages the
            # aggregated frame — one recursion, no duplicate machinery
            inner = _run_read(
                clauses[:i] + [_Clause("RETURN", c.body)], graph, lits, params
            )
            if any(cc.kind == "MATCH" for cc in clauses[i + 1 :]):
                # `WITH min(x) AS lo MATCH (b) WHERE b.y = lo …` — the
                # scalar-subquery idiom: the aggregated frame (tiny by
                # construction) seeds the tail's fresh read as a
                # broadcast cross join; its flat names resolve in WHERE/
                # RETURN like carried WITH columns
                return _run_read(
                    clauses[i + 1 :], graph, lits, params, seed=inner
                )
            return _run_post_with(inner, clauses[i + 1 :], lits or [], params)
    df: DataFrame | None = None
    aliases: dict[str, str] = {}  # alias -> column prefix ('' = bare node frame)
    rel_alias: str | None = None
    rel_endpoints: tuple | None = None  # (start, end) aliases of the rel
    rel_prefixed = False
    path_bind: str | None = None  # path variable from `p = (…)-[*…]->(…)`
    all_shortest = False  # p = allShortestPaths(…): keep min-hop rows only
    limit: int | None = None
    skip: int | None = None
    returns: list[str] = []
    return_distinct = False
    node_match: tuple[str, str | None] | None = None
    predicates: list[tuple[str, str, str, str]] = []  # (alias, prop, op, raw val)
    where_exprs: list = []  # boolean ASTs from OR/NOT/paren WHERE bodies
    expr_predicates: list[str] = []  # expression-form conjuncts (a.x + 1 > 2)
    temporal_cols: list = []  # Columns behind \x01<i>\x01 operand sentinels
    temporal_srcs: list = []  # the sentinels' original source text
    exists_preds: list = []  # (alias, rel_type, direction, dst_label,
    #   negated, src_label, dst_alias, inner_where) — _extract_exists
    exists_markers: list = []  # pattern texts behind __xmark<i> columns
    #   (EXISTS under OR — compiled to per-row boolean marker joins)
    in_with = False  # inside a non-aggregating WITH segment
    with_narrowed = False  # a mid-pipeline SKIP/LIMIT shrank the row set
    with_order: list = []  # mid-pipeline sort Columns pending a LIMIT/SKIP
    order_by: list[tuple[str, bool]] = []  # (key, is_desc)

    unwind_name: str | None = None
    unwind_frame: DataFrame | None = None
    leading_opt_pad = False  # statement-leading OPTIONAL MATCH pending pad

    def _apply_pending() -> None:
        """Apply every deferred WHERE artifact (simple predicates,
        boolean ASTs, EXISTS semi/anti joins) to the current frame and
        clear the queues. Called terminally, and at each mid-pipeline
        WITH boundary — Cypher scopes a WHERE to its clause block, so
        filters recorded before a WITH must run before the WITH's
        projection/pagination, not after a later LIMIT."""
        nonlocal df
        def _operand(raw: str):
            """One WHERE comparand as a Column: temporal sentinel → its
            pre-compiled expression, anything else → literal value."""
            tm = re.fullmatch(r"\x01(\d+)\x01", raw)
            if tm:
                return temporal_cols[int(tm.group(1))]
            if re.fullmatch(r"[A-Za-z_]\w*", raw) and raw in df.columns:
                # flat carried/seeded column (WITH output) as comparand
                return F.col(raw)
            return F.lit(_where_value(raw, lits, params))

        for alias, prop, op, raw in predicates:
            if alias not in aliases:
                if rel_alias is not None and alias == rel_alias:
                    # relationship property predicate: edge prop columns ride
                    # the expand output unprefixed (operators/cypher.py expand
                    # keeps every edge column except src/dst)
                    if prop not in df.columns:
                        raise CypherUnsupported(f"unknown relationship property {prop!r}")
                    if op.upper() == "IN":
                        df = df.filter(
                            _isin(F.col(prop), _in_list_values(raw, lits, params))
                        )
                        continue
                    df = df.filter(_op_fn(op)(F.col(prop), _operand(raw)))
                    continue
                raise CypherUnsupported(f"WHERE on unbound alias: {alias!r}")
            if raw == unwind_name and unwind_frame is not None:
                # comparison against the unwound variable: a broadcast
                # equi-join (the batch point-lookup), not a per-value scan
                if op != "=":
                    raise CypherUnsupported("UNWIND comparisons support = only")
                df = df.join(
                    F.broadcast(unwind_frame),
                    _prop_col(df, aliases[alias], prop) == unwind_frame[unwind_name],
                )
                continue
            if op.upper() == "IN":
                # `prop IN $list | [literals]` — a pushdown-friendly In filter
                df = df.filter(
                    _isin(
                        _prop_col(df, aliases[alias], prop),
                        _in_list_values(raw, lits, params),
                    )
                )
                continue
            if re.fullmatch(r"[A-Za-z_]\w*", raw) and not raw.startswith("\x00"):
                if raw in df.columns:
                    # flat carried/seeded column (WITH output) comparand
                    df = df.filter(
                        _op_fn(op)(
                            _prop_col(df, aliases[alias], prop), F.col(raw)
                        )
                    )
                    continue
                raise CypherUnsupported(f"WHERE against unbound name: {raw!r}")
            # a plain column comparison Catalyst pushes into the scan —
            # WHERE costs a filter, never a different plan shape
            df = df.filter(
                _op_fn(op)(_prop_col(df, aliases[alias], prop), _operand(raw))
            )

        for item in expr_predicates:
            # expression-form conjunct: both comparands compile through the
            # scalar-expression Column compiler (arithmetic/CASE/functions),
            # one filter each — still plain Catalyst predicates
            df = df.filter(
                _compile_where_expr_pred(
                    item, df, aliases, rel_alias, lits, params
                )
            )
        expr_predicates.clear()

        for mi, mpat in enumerate(exists_markers):
            # EXISTS under OR — per-row boolean marker: the distinct
            # qualifying sources LEFT-join a True flag onto the frame
            # (the EXISTS-as-VALUE shape), and the rewritten WHERE body
            # reads the `__xmark<i>` column as an ordinary boolean leaf.
            # Restricted to the bound-bare-source / anonymous-target
            # form the value path supports; richer shapes keep the
            # conjunct-only refusal.
            xm_body = re.sub(r"^MATCH\s+", "", mpat, flags=re.IGNORECASE)
            xm_inner = None
            xm_wsp = re.split(
                r"\s+WHERE\s+", xm_body, maxsplit=1, flags=re.IGNORECASE
            )
            if len(xm_wsp) == 2:
                # inner WHERE — value conjuncts on the TARGET alias
                # plant into its label scan (correlated outer refs need
                # the conjunct-position semi-join; they refuse below)
                xm_body, xm_inner = xm_wsp[0].strip(), xm_wsp[1].strip()
            xm_pat, xm_lp, xm_rp = _strip_endpoint_props(xm_body)
            pm_x = _REL_RE.match(xm_pat)
            if not pm_x or pm_x.group("star"):
                raise CypherUnsupported(
                    f"unsupported EXISTS pattern under OR: {mpat!r}"
                )
            ea = pm_x.group("src_alias")
            if not ea or pm_x.group("src_label") or xm_lp or ea not in aliases:
                raise CypherUnsupported(
                    "EXISTS under OR needs a bound bare source alias"
                )
            if pm_x.group("dst_alias") and not xm_inner and not xm_rp:
                raise CypherUnsupported(
                    "EXISTS under OR needs an anonymous target: () or (:L)"
                )
            from neo4j_graphdb_spark.operators.cypher import _orient_edges

            xe = _cy_rel_filter(
                graph.edges_df, _rel_types(pm_x.group("rel_type"))
            )
            for prop, raw in _parse_value_props(pm_x.group("rel_props")):
                xe = (
                    xe.filter(
                        F.col(prop) == F.lit(_where_value(raw, lits, params))
                    )
                    if prop in xe.columns
                    else xe.filter(F.lit(False))
                )
            xe = _orient_edges(xe, _rel_direction(pm_x))
            if pm_x.group("dst_label") is not None or xm_rp or xm_inner:
                tgt_scan = graph.match(_node_labels(pm_x.group("dst_label")))
                for prop, raw in _parse_value_props(xm_rp):
                    tgt_scan = tgt_scan.filter(
                        _prop_col(tgt_scan, "", prop)
                        == F.lit(_where_value(raw, lits, params))
                    )
                if xm_inner:
                    xda = pm_x.group("dst_alias")
                    for conj in _split_top_and(xm_inner):
                        wm3 = _WHERE_ITEM_RE.match(conj.strip())
                        if not wm3 or wm3.group("alias") != xda:
                            raise CypherUnsupported(
                                "EXISTS under OR supports inner-WHERE "
                                "value conjuncts on the target alias "
                                "only (correlated refs need the "
                                "conjunct-position form)"
                            )
                        wcol3 = _prop_col(tgt_scan, "", wm3.group("prop"))
                        if wm3.group("op").upper() == "IN":
                            tgt_scan = tgt_scan.filter(
                                _isin(
                                    wcol3,
                                    _in_list_values(
                                        wm3.group("val"), lits, params
                                    ),
                                )
                            )
                        else:
                            tgt_scan = tgt_scan.filter(
                                _op_fn(wm3.group("op"))(
                                    wcol3,
                                    F.lit(
                                        _where_value(
                                            wm3.group("val"), lits, params
                                        )
                                    ),
                                )
                            )
                xe = xe.join(
                    tgt_scan.select(F.col(NODE_ID).alias("_xmid")),
                    xe["dst"] == F.col("_xmid"),
                    "left_semi",
                )
            marks = (
                xe.select(F.col("src").alias("_xmsrc"))
                .distinct()
                .withColumn(f"__xmark{mi}", F.lit(True))
            )
            src_id = (
                F.col(f"{aliases[ea]}{NODE_ID}")
                if aliases[ea]
                else F.col(NODE_ID)
            )
            df = df.join(marks, src_id == F.col("_xmsrc"), "left").drop(
                "_xmsrc"
            )
            df = df.withColumn(
                f"__xmark{mi}",
                F.coalesce(F.col(f"__xmark{mi}"), F.lit(False)),
            )
        had_markers = bool(exists_markers)
        exists_markers.clear()

        if where_exprs:
            # resolve each boolean AST to one filter Column: leaves reuse the
            # simple path's column/value resolution, connectives map to
            # Spark's three-valued &/|/~ — which IS Cypher's NULL semantics
            # (NOT null -> null -> row dropped)
            def _leaf(alias: str, prop: str, op: str, raw: str):
                if alias not in aliases:
                    if rel_alias is not None and alias == rel_alias:
                        if prop not in df.columns:
                            raise CypherUnsupported(
                                f"unknown relationship property {prop!r}"
                            )
                        col = F.col(prop)
                    else:
                        raise CypherUnsupported(f"WHERE on unbound alias: {alias!r}")
                else:
                    col = _prop_col(df, aliases[alias], prop)
                if op.upper() == "IN":
                    return _isin(col, _in_list_values(raw, lits, params))
                if re.fullmatch(r"[A-Za-z_]\w*", raw) and not raw.startswith("\x00"):
                    if raw in df.columns:
                        return _op_fn(op)(col, F.col(raw))
                    raise CypherUnsupported(f"WHERE against unbound name: {raw!r}")
                return _op_fn(op)(col, _operand(raw))

            def _walk(n):
                if n[0] == "pred":
                    return _leaf(n[1], n[2], n[3], n[4])
                if n[0] == "exprpred":
                    # reassembled list-predicate leaf (all/any/none/
                    # single) — the scalar compiler owns its grammar
                    return _compile_where_expr_pred(
                        n[1], df, aliases, rel_alias, lits, params
                    )
                if n[0] == "not":
                    return ~_walk(n[1])
                left, right = _walk(n[1]), _walk(n[2])
                if n[0] == "xor":
                    # Cypher XOR — null-propagating inequality of booleans
                    return left != right
                return (left & right) if n[0] == "and" else (left | right)

            for node in where_exprs:
                df = df.filter(_walk(node))

        if had_markers:
            # the marker flags served their filters — drop them so they
            # never leak into RETURN * or downstream projections
            df = df.drop(
                *[c for c in df.columns if c.startswith("__xmark")]
            )

        for (
            sa, rel_type, direction, dst_label, negated,
            src_label, dst_alias, inner_where, x_relp,
        ) in exists_preds:
            # [NOT] EXISTS { (a[:L0])-[:T]->(x:L) [WHERE …] } — one LEFT
            # SEMI (ANTI when negated) join of the bound frame against
            # the qualifying edge endpoints; label restrictions are
            # themselves semi joins on the dimension-sized node side, so
            # no new columns and no fan-out ever reach the main frame.
            # An inner WHERE (the Neo4j-5 existential subquery) rides
            # as extra conjuncts on the semi/anti join condition — the
            # correlated-predicate compile OPTIONAL MATCH + WHERE uses.
            if sa is None or sa not in aliases:
                raise CypherUnsupported(f"EXISTS on unbound alias: {sa!r}")
            from neo4j_graphdb_spark.operators.cypher import (
                _orient_edges,
                _prefix,
            )

            e = _cy_rel_filter(graph.edges_df, _rel_types(rel_type))
            if x_relp:
                # inline relationship property map — equality filters on
                # the edge columns before orientation; a prop no stored
                # edge carries reads NULL, and NULL = v never matches
                for prop, raw in _parse_value_props(x_relp):
                    if prop in e.columns:
                        e = e.filter(
                            F.col(prop)
                            == F.lit(_where_value(raw, lits, params))
                        )
                    else:
                        e = e.filter(F.lit(False))
            e = _orient_edges(e, direction)
            if src_label is not None:
                # `EXISTS { MATCH (a:Article)-[:T]->… }` re-states the
                # bound alias's label: the pattern only matches when the
                # source node carries it, so restrict the qualifying
                # edge srcs to that label's id set
                s_ids = graph.match(src_label).select(F.col(NODE_ID).alias("_xsid"))
                e = e.join(s_ids, e["src"] == F.col("_xsid"), "left_semi")
            src_id = (
                F.col(f"{aliases[sa]}{NODE_ID}") if aliases[sa] else F.col(NODE_ID)
            )
            how = "left_anti" if negated else "left_semi"
            if inner_where is None:
                if dst_label is not None:
                    lbl_ids = graph.match(dst_label).select(
                        F.col(NODE_ID).alias("_xid")
                    )
                    e = e.join(lbl_ids, e["dst"] == F.col("_xid"), "left_semi")
                srcs = e.select(F.col("src").alias("_xsrc"))
                df = df.join(srcs, src_id == F.col("_xsrc"), how)
                continue
            # full existential subquery: expose the target node's
            # properties under the inner alias's prefix, then compile
            # each inner conjunct into the join condition — correlated
            # comparands resolve against the OUTER frame, inner ones
            # against the subquery frame, literals/$params bind as
            # values. Still one semi/anti hash join; nothing fans out.
            if dst_alias in aliases:
                raise CypherUnsupported(
                    f"EXISTS target alias {dst_alias!r} is already bound"
                )
            tgt = _prefix(graph.match(dst_label), dst_alias)
            inner = (
                e.select("src", "dst")
                .join(tgt, e["dst"] == tgt[f"{dst_alias}_{NODE_ID}"])
                .drop("dst")
                .withColumnRenamed("src", "_xsrc")
            )
            cond = src_id == inner["_xsrc"]
            ref_re = re.compile(
                r"^(?P<a>\w+)\.(?P<p>\w+)$"
            )
            cmp_re = re.compile(
                r"^(?P<lhs>\w+\.\w+)\s*(?P<op><=|>=|<>|=|<|>)\s*(?P<rhs>.+)$"
            )
            # the WHERE preprocessor has already collapsed the
            # multi-word null tests to IS_NULL / IS_NOT_NULL tokens
            null_re = re.compile(
                r"^(?P<a>\w+)\.(?P<p>\w+)\s+IS[_\s]+(?P<neg2>NOT[_\s]+)?NULL$",
                re.IGNORECASE,
            )
            def _xq_operand(tok: str):
                rm_ = ref_re.match(tok.strip())
                if rm_:
                    al, pr = rm_.group("a"), rm_.group("p")
                    if al == dst_alias:
                        return _prop_col(inner, f"{dst_alias}_", pr)
                    if al in aliases:
                        return _prop_col(df, aliases[al], pr)
                    raise CypherUnsupported(
                        f"EXISTS inner WHERE references unbound alias {al!r}"
                    )
                return F.lit(_where_value(tok.strip(), lits, params))
            for cj in _split_top_and(inner_where):
                nm = null_re.match(cj)
                if nm:
                    c0 = _xq_operand(f"{nm.group('a')}.{nm.group('p')}")
                    cond = cond & (
                        c0.isNotNull() if nm.group("neg2") else c0.isNull()
                    )
                    continue
                cm2 = cmp_re.match(cj)
                if not cm2:
                    raise CypherUnsupported(
                        "EXISTS inner WHERE supports AND-joined "
                        "comparisons (alias.prop <op> alias.prop | "
                        "literal | $param) and IS [NOT] NULL, got: "
                        f"{cj!r}"
                    )
                cond = cond & _op_fn(cm2.group("op"))(
                    _xq_operand(cm2.group("lhs")),
                    _xq_operand(cm2.group("rhs")),
                )
            df = df.join(inner, cond, how)
        predicates.clear()
        where_exprs.clear()
        exists_preds.clear()
        nonlocal leading_opt_pad
        if leading_opt_pad and df is not None:
            # statement-leading OPTIONAL MATCH whose (filtered) segment
            # matched NOTHING yields exactly ONE all-NULL row
            # (openCypher). Distributed shape: a 1-row NULL frame
            # anti-joined against a broadcast 1-row probe of the match —
            # the pad survives only when the match is empty; never a
            # driver-side count.
            leading_opt_pad = False
            null_row = df.sparkSession.range(1).select(
                *[
                    F.lit(None).cast(df.schema[c0].dataType).alias(c0)
                    for c0 in df.columns
                ]
            )
            probe = df.limit(1).select(F.lit(1).alias("__any"))
            pad = null_row.join(
                F.broadcast(probe), on=F.lit(True), how="left_anti"
            )
            df = df.unionByName(pad)

    # consecutive node-pattern MATCH clauses fold into ONE comma
    # multi-anchor MATCH (`MATCH (a:X) MATCH (b:Y)` ≡ `MATCH (a:X),
    # (b:Y)` — Neo4j's repeated MATCH over disjoint anchors is the same
    # cartesian, and a WHERE equality between them becomes an equi-join
    # inside Catalyst). Only plain MATCH folds — an OPTIONAL-derived
    # clause keeps its pad semantics; rel patterns keep the chain path.
    def _pure_anchor(c0: _Clause) -> bool:
        parts0 = _split_top_commas(c0.body)
        return all(
            _NODE_RE.match(p.strip()) and not _REL_RE.match(p.strip())
            for p in parts0
        )

    folded: list[_Clause] = []
    for c in clauses:
        if c.kind == "MATCH" and folded and _pure_anchor(c):
            # look back past interleaved WHERE clauses — conjunctive
            # filters over a cross product commute, so `MATCH (a:X)
            # WHERE w MATCH (b:Y)` merges the same as the adjacent form
            # (WHERE application is deferred to _apply_pending anyway)
            j = len(folded) - 1
            while j >= 0 and folded[j].kind == "WHERE":
                j -= 1
            if (
                j >= 0
                and folded[j].kind == "MATCH"
                and _pure_anchor(folded[j])
            ):
                merged_body = folded[j].body + ", " + c.body
                anchor_aliases = [
                    _NODE_RE.match(p.strip()).group("alias")
                    for p in _split_top_commas(merged_body)
                ]
                if len(set(anchor_aliases)) == len(anchor_aliases) and all(
                    anchor_aliases
                ):
                    folded[j] = _Clause("MATCH", merged_body)
                    continue
        folded.append(c)
    clauses = folded

    consumed: set[int] = set()  # WHERE clauses folded into an OPTIONAL MATCH
    _pending_seed = seed
    for _ci, c in enumerate(clauses):
        if _ci in consumed:
            continue
        if df is not None and _pending_seed is not None:
            overlap = set(df.columns) & set(_pending_seed.columns)
            if overlap:
                raise CypherUnsupported(
                    f"WITH output names collide with match columns: {overlap}"
                )
            df = df.crossJoin(F.broadcast(_pending_seed))
            _pending_seed = None
        if c.kind == "OPTIONAL_MATCH" and df is None:
            # statement-leading OPTIONAL MATCH (VERDICT r14 missing #2):
            # the pattern matches as a plain MATCH; _apply_pending pads
            # the filtered segment with one all-NULL row when empty
            leading_opt_pad = True
            c = _Clause("MATCH", c.body)
        elif c.kind == "MATCH" and leading_opt_pad and df is not None:
            # a MATCH directly after the leading-optional segment closes
            # it: flush the deferred filters + the empty-pad NOW, so the
            # follow-up pattern composes with openCypher semantics (a
            # padded NULL anchor equi-joins to nothing; a fresh anchor
            # cross-joins the padded row through)
            _apply_pending()
        if c.kind == "UNWIND":
            if df is None and unwind_frame is not None:
                # chained UNWIND directly over a leading UNWIND
                # (`UNWIND [[1,2],[3]] AS xs UNWIND xs AS x`) — promote
                # the 1-column unwind frame to the pipeline frame so the
                # second UNWIND explodes it like any carried column
                df, unwind_frame = unwind_frame, None
            if df is not None:
                # mid-pipeline UNWIND (after MATCH or a WITH): explodes a
                # bound list — a carried flat column (`WITH collect(x) AS
                # xs UNWIND xs AS x`), an alias property, or any compiled
                # list expression. One narrow explode, no shuffle.
                xm = re.match(
                    r"^(?P<expr>.+?)\s+AS\s+(?P<alias>\w+)\s*$",
                    c.body,
                    re.IGNORECASE | re.DOTALL,
                )
                if not xm:
                    raise CypherUnsupported(
                        f"unsupported UNWIND form: {c.body!r}"
                    )
                _apply_pending()
                usrc = xm.group("expr").strip()
                if usrc in df.columns and usrc not in aliases:
                    ucol = F.col(usrc)
                else:
                    ucol, utag = _compile_scalar(
                        _parse_scalar_expr(usrc),
                        df,
                        aliases,
                        rel_alias,
                        lits,
                        params,
                    )
                    if utag not in ("list", "other"):
                        raise CypherUnsupported(
                            f"UNWIND needs a list expression, got {utag}"
                        )
                df = df.withColumn(xm.group("alias"), F.explode(ucol))
                continue
            # leading UNWIND: batch point-lookup — the list param
            # becomes a 1-column frame, and `WHERE alias.prop = name`
            # compiles to a broadcast join against it (Neo4j's idiomatic
            # "MATCH by id list" shape, distributed instead of N round
            # trips).
            um = _UNWIND_RE.match(c.body)
            if um:
                vals = (params or {}).get(um.group(1))
                if not isinstance(vals, list) or not vals:
                    raise CypherUnsupported(
                        f"read UNWIND ${um.group(1)} needs a non-empty list param"
                    )
                unwind_name = um.group(2)
            else:
                lm = _UNWIND_LIT_RE.match(c.body)
                vals = None
                if lm:
                    try:
                        vals = _unwind_literal_values(
                            lm.group("items"), lits, params
                        )
                        unwind_name = lm.group("alias")
                    except CypherUnsupported:
                        # bracketed but not a literal list — e.g. a list
                        # comprehension; falls through to the expression
                        # compiler below
                        vals = None
                if vals is None:
                    # UNWIND <list expression> AS x — range()/split()/
                    # comprehensions over literals and params: compile
                    # against a dummy 1-row frame (frame-independence is
                    # the requirement — props can't resolve here) and
                    # explode to the unwind frame
                    xm = re.match(
                        r"^(?P<expr>.+?)\s+AS\s+(?P<alias>\w+)\s*$",
                        c.body,
                        re.IGNORECASE | re.DOTALL,
                    )
                    if not xm:
                        raise CypherUnsupported(
                            f"unsupported UNWIND form: {c.body!r}"
                        )
                    dummy = graph.nodes_df.sparkSession.range(1)
                    col, tag = _compile_scalar(
                        _parse_scalar_expr(xm.group("expr")),
                        dummy,
                        {},
                        None,
                        lits,
                        params,
                    )
                    if tag not in ("list", "other"):
                        raise CypherUnsupported(
                            f"UNWIND needs a list expression, got {tag}"
                        )
                    unwind_name = xm.group("alias")
                    unwind_frame = dummy.select(
                        F.explode(col).alias(unwind_name)
                    )
                    continue
            unwind_frame = graph.nodes_df.sparkSession.createDataFrame(
                [(v,) for v in vals], [unwind_name]
            )
        elif c.kind == "MATCH":
            asm = _ALL_SHORTEST_RE.match(c.body)
            if asm is not None:
                # `p = allShortestPaths((a)-[:T*1..k]->(b))` — EVERY
                # minimal-length path per endpoint pair. Compiles to the
                # same path-collecting var-length ladder as a plain path
                # binding, then one window keeps rows whose hop count
                # equals the pair's minimum — Catalyst pushes endpoint
                # WHEREs through both, so the two-specific-nodes idiom
                # never ladders the whole label. (Neo4j semantics:
                # neo4j.com/docs/cypher-manual allShortestPaths; the
                # reference itself has no path queries — SURVEY §2.A.)
                if df is not None:
                    raise CypherUnsupported(
                        "allShortestPaths must be the statement's first MATCH"
                    )
                pat = re.sub(r"\*\s*\.\.", "*1..", asm.group("pat").strip())
                pat, as_lprops, as_rprops = _strip_endpoint_props(pat)
                mas = _REL_RE.match(pat)
                if not mas or not mas.group("max_h"):
                    raise CypherUnsupported(
                        "allShortestPaths needs a bounded variable-length "
                        "pattern: allShortestPaths((a)-[:T*1..k]->(b))"
                    )
                if mas.group("min_h") != "1":
                    raise CypherUnsupported(
                        "allShortestPaths supports a minimal length of 1 only"
                    )
                if mas.group("rel_alias"):
                    raise CypherUnsupported(
                        "bind the path OR the relationship, not both"
                    )
                path_bind = asm.group("palias")
                all_shortest = True
                # endpoint inline maps → pushed equality predicates
                # (applied at the next _apply_pending, once the ladder
                # below registers the aliases)
                for prop, raw in _parse_value_props(as_lprops):
                    predicates.append((mas.group("src_alias") or "a", prop, "=", raw))
                for prop, raw in _parse_value_props(as_rprops):
                    predicates.append((mas.group("dst_alias") or "b", prop, "=", raw))
                c.body = pat
            pbm = (
                None
                if _SHORTEST_RE.match(c.body) or all_shortest
                else _PATH_BIND_RE.match(c.body)
            )
            if pbm is not None:
                # `p = (a)-[:T*1..k]->(b)` — the path variable binds the
                # whole var-length match; nodes(p)/relationships(p)/
                # length(p) read the ladder's collected columns. Strip
                # the binding prefix and let the var-length branch below
                # compile the pattern (with collect_paths on).
                if df is not None:
                    raise CypherUnsupported(
                        "path binding must be the statement's first MATCH"
                    )
                pb_pat = pbm.group("pat").strip()
                # validate against the props-stripped form (endpoint
                # inline maps are legal — the var-length compile below
                # pops them into pushed predicates); keep the original
                # text in c.body so that compile sees the maps
                pb_clean, _pbl, _pbr = _strip_endpoint_props(pb_pat)
                mpb = _REL_RE.match(pb_clean)
                if mpb is not None and not mpb.group("star") and not mpb.group(
                    "rel_props"
                ):
                    # single-hop path binding `p = (a)-[:T]->(b)` —
                    # exactly the *1..1 var-length (nodes(p) = [a, b],
                    # length(p) = 1); normalize and recompile
                    pb_pat = re.sub(r"\]", "*1..1]", pb_pat, count=1)
                    pb_clean = re.sub(r"\]", "*1..1]", pb_clean, count=1)
                    mpb = _REL_RE.match(pb_clean)
                    pbm = _PATH_BIND_RE.match(
                        f"{pbm.group('palias')} = {pb_pat}"
                    )
                if not mpb or not mpb.group("min_h") or not mpb.group("max_h"):
                    raise CypherUnsupported(
                        "path binding needs a bounded variable-length "
                        "pattern: p = (a)-[:T*min..max]->(b) — bind "
                        "shortestPath(…) for shortest paths; single-hop "
                        "paths normalize to *1..1"
                    )
                if mpb.group("rel_alias"):
                    raise CypherUnsupported(
                        "bind the path OR the relationship, not both: "
                        "the path variable already exposes length()/"
                        "relationships()"
                    )
                path_bind = pbm.group("palias")
                c.body = pbm.group("pat").strip()
            sm = _SHORTEST_RE.match(c.body)
            if sm:
                if df is not None:
                    raise CypherUnsupported(
                        "shortestPath must be the statement's first MATCH"
                    )
                # `*..k` sugar → `*1..k` (Neo4j's shortestPath allows a
                # minimal length of 0 or 1 only; we support 1)
                pat = re.sub(r"\*\s*\.\.", "*1..", sm.group("pat").strip())
                pat, sp_lprops, sp_rprops = _strip_endpoint_props(pat)
                pm = _REL_RE.match(pat)
                if not pm or not pm.group("star"):
                    raise CypherUnsupported(
                        "shortestPath needs a variable-length pattern: "
                        "shortestPath((a)-[:T*1..k]->(b)) bounded, or "
                        "shortestPath((a)-[:T*]->(b)) unbounded"
                    )
                # unbounded [*]: no join-unrolled ladder — the ITERATIVE
                # BFS substrate (pairwise_shortest_paths) runs instead,
                # exiting at the first empty frontier (diameter rounds)
                unbounded = not pm.group("max_h")
                # Neo4j's shortestPath admits a minimal length of 0 or
                # 1; *0..k additionally matches the LENGTH-0 path when
                # both endpoints are one node (an identity layer the
                # min-hop aggregation prefers over any cycle)
                min_zero = pm.group("min_h") == "0"
                if pm.group("min_h") not in (None, "0", "1"):
                    raise CypherUnsupported(
                        "shortestPath supports a minimal length of 0 or 1"
                    )
                if pm.group("rel_props"):
                    raise CypherUnsupported(
                        "inline relationship properties are unsupported in "
                        "shortestPath"
                    )
                direction = _rel_direction(pm)
                max_h = 0 if unbounded else int(pm.group("max_h"))
                if max_h > 20:
                    raise CypherUnsupported(
                        "shortestPath depth cap must be <= 20 (deeper paths "
                        "want the unbounded [*] form, which runs the "
                        "iterative BFS substrate)"
                    )
                sa = pm.group("src_alias") or "a"
                da = pm.group("dst_alias") or "b"
                s_label = _node_labels(pm.group("src_label"))
                d_label = _node_labels(pm.group("dst_label"))
                if direction == "in":
                    # (a)<-[*1..k]-(b): walk the ladder from the right end
                    sa, da = da, sa
                    s_label, d_label = d_label, s_label
                # Pairwise depth-capped BFS as ONE LAZY join plan: level-h
                # pair set = distinct (source, node) endpoints reachable in
                # exactly h oriented steps, then min(hops) per pair.
                # Deliberately no checkpoints: the plan stays declarative,
                # so a later WHERE on the source/target alias is pushed by
                # Catalyst through the ladder into the node scans — the
                # two-specific-nodes idiom never BFSes the whole label.
                from neo4j_graphdb_spark.operators.cypher import _prefix

                e_sp = graph.edges_df
                e_sp = _cy_rel_filter(e_sp, _rel_types(pm.group("rel_type")))
                e_sp = e_sp.select(
                    F.col("src").alias("_spu"), F.col("dst").alias("_spv")
                ).distinct()
                if direction == "both":
                    # undirected shortestPath((a)-[:T*1..k]-(b)) — the
                    # BFS ladder walks the SYMMETRIZED edge set (each
                    # edge usable in either orientation: Neo4j's
                    # undirected traversal). For distinct endpoints a
                    # shortest WALK never repeats a node, so BFS over
                    # the symmetric closure is exactly Neo4j's shortest
                    # undirected trail; the degenerate a=b case (a
                    # cycle) is excluded below — Neo4j's shortestPath
                    # rejects same-node endpoints with min length >= 1.
                    e_sp = e_sp.unionByName(
                        e_sp.select(
                            F.col("_spv").alias("_spu"),
                            F.col("_spu").alias("_spv"),
                        )
                    ).distinct()
                if unbounded:
                    # a80 — `shortestPath((a)-[:T*]->(b))`: the ITERATIVE
                    # pairwise BFS substrate with the same endpoint
                    # geometry (sources = the src-label scan); the loop
                    # exits at the first empty frontier, so the cost is
                    # diameter rounds, never a join explosion. Eager by
                    # nature (per-round convergence checks), so a later
                    # WHERE filters the pair table instead of pushing
                    # into the iteration — restrict the source label for
                    # the two-specific-nodes idiom.
                    from neo4j_graphdb_spark.graph.algorithms import (
                        pairwise_shortest_paths,
                    )

                    pairs = pairwise_shortest_paths(
                        e_sp.select(
                            F.col("_spu").alias("src"),
                            F.col("_spv").alias("dst"),
                        ),
                        graph.match(s_label).select(F.col(NODE_ID).alias("id")),
                        max_rounds=64,
                    ).select(
                        F.col("source").alias("_sps"),
                        F.col("id").alias("_spn"),
                        "hops",
                    )
                else:
                    lvl = graph.match(s_label).select(
                        F.col(NODE_ID).alias("_sps"), F.col(NODE_ID).alias("_spn")
                    )
                    layers = []
                    for h in range(1, max_h + 1):
                        lvl = (
                            lvl.join(e_sp, lvl["_spn"] == e_sp["_spu"])
                            .select("_sps", F.col("_spv").alias("_spn"))
                            .distinct()
                        )
                        layers.append(lvl.withColumn("_sph", F.lit(h)))
                    pairs = layers[0]
                    for lyr in layers[1:]:
                        pairs = pairs.unionByName(lyr)
                    if min_zero:
                        pairs = pairs.unionByName(
                            graph.match(s_label).select(
                                F.col(NODE_ID).alias("_sps"),
                                F.col(NODE_ID).alias("_spn"),
                            ).withColumn("_sph", F.lit(0))
                        )
                    pairs = pairs.groupBy("_sps", "_spn").agg(
                        F.min("_sph").alias("hops")
                    )
                if unbounded and min_zero:
                    pairs = (
                        pairs.unionByName(
                            graph.match(s_label).select(
                                F.col(NODE_ID).alias("_sps"),
                                F.col(NODE_ID).alias("_spn"),
                            ).withColumn("hops", F.lit(0))
                        )
                        .groupBy("_sps", "_spn")
                        .agg(F.min("hops").alias("hops"))
                    )
                if direction == "both" and not min_zero:
                    # degenerate same-node endpoints (an undirected
                    # 2-hop a-b-a would reuse the one edge — not a
                    # trail); Neo4j finds no shortestPath there either —
                    # except at *0.., where the length-0 identity wins
                    pairs = pairs.filter(F.col("_sps") != F.col("_spn"))
                srcf = _prefix(graph.match(s_label), sa)
                dstf = _prefix(graph.match(d_label), da)
                df = (
                    pairs.join(srcf, F.col("_sps") == srcf[f"{sa}_{NODE_ID}"])
                    .join(dstf, F.col("_spn") == dstf[f"{da}_{NODE_ID}"])
                    .drop("_sps", "_spn")
                )
                aliases[sa] = f"{sa}_"
                aliases[da] = f"{da}_"
                # endpoint inline maps → pushed equality predicates,
                # keyed by the pattern's own (pre-swap) endpoint names
                for prop, raw in _parse_value_props(sp_lprops):
                    predicates.append((pm.group("src_alias") or "a", prop, "=", raw))
                for prop, raw in _parse_value_props(sp_rprops):
                    predicates.append((pm.group("dst_alias") or "b", prop, "=", raw))
                rel_alias = sm.group("palias")
                rel_prefixed = True
                continue
            if df is not None:
                in_with = False
                with_order = []
                # chained MATCH: `MATCH (a:L1)-[:T1]->(b:L2) MATCH
                # (b)-[:T2]->(c:L3)` — the second pattern must START from
                # an alias the first one bound; it compiles to one more
                # (edge ⋈ node) join pair hanging off the bound frame, so
                # a k-clause chain is k hash joins, dimension sides
                # broadcast (same shape as Graph.expand_path)
                m = _REL_RE.match(c.body)
                if not m:
                    # a FRESH node anchor onto an existing frame —
                    # `… WITH u LIMIT 1 MATCH (v:Tech) …` (and the
                    # leading-OPTIONAL + MATCH shape, once the pad has
                    # flushed): Neo4j's cartesian; the scan joins
                    # PREFIXED, so a later WHERE equality becomes an
                    # equi-join inside Catalyst exactly like the comma
                    # multi-anchor form. (The pre-loop fold merges
                    # adjacent anchor MATCHes; this path serves anchors
                    # separated by a WITH horizon or an optional pad.)
                    n2 = _NODE_RE.match(c.body)
                    if n2 and n2.group("alias") and n2.group(
                        "alias"
                    ) not in aliases:
                        from neo4j_graphdb_spark.operators.cypher import (
                            _prefix,
                        )

                        if leading_opt_pad:
                            _apply_pending()
                        a2 = n2.group("alias")
                        scan2 = _prefix(
                            graph.match(_node_labels(n2.group("label"))), a2
                        )
                        df = df.crossJoin(scan2)
                        aliases[a2] = f"{a2}_"
                        for prop, raw in _parse_value_props(n2.group("props")):
                            predicates.append((a2, prop, "=", raw))
                        continue
                    raise CypherUnsupported(
                        f"chained MATCH must be a relationship pattern: {c.body!r}"
                    )
                if m.group("star"):
                    raise CypherUnsupported(
                        "variable-length patterns are unsupported in chained MATCH"
                    )
                if m.group("rel_props"):
                    raise CypherUnsupported(
                        "inline relationship properties are unsupported in chained MATCH"
                    )
                sa2 = m.group("src_alias")
                if sa2 is None or sa2 not in aliases:
                    raise CypherUnsupported(
                        "chained MATCH must start from a bound alias"
                    )
                if m.group("src_label"):
                    raise CypherUnsupported(
                        "chained MATCH source must be the bare bound alias"
                    )
                if m.group("rel_alias"):
                    raise CypherUnsupported(
                        "relationship alias on a chained MATCH is unsupported"
                    )
                da2 = m.group("dst_alias") or "c"
                if da2 in aliases:
                    raise CypherUnsupported(f"alias {da2!r} is already bound")
                from neo4j_graphdb_spark.operators.cypher import (
                    _orient_edges,
                    _prefix,
                )

                e2 = graph.edges_df
                e2 = _cy_rel_filter(e2, _rel_types(m.group("rel_type")))
                e2 = _orient_edges(e2, _rel_direction(m)).select(
                    F.col("src").alias("_e2src"), F.col("dst").alias("_e2dst")
                )
                dstf = _prefix(graph.match(_node_labels(m.group("dst_label"))), da2)
                src_id = (
                    F.col(f"{aliases[sa2]}{NODE_ID}")
                    if aliases[sa2]
                    else F.col(NODE_ID)
                )
                df = (
                    df.join(e2, src_id == F.col("_e2src"))
                    .join(dstf, F.col("_e2dst") == dstf[f"{da2}_{NODE_ID}"])
                    .drop("_e2src", "_e2dst")
                )
                aliases[da2] = f"{da2}_"
                continue
            mh_body, mh_lp, mh_rp = _strip_endpoint_props(c.body)
            hops = _split_multi_hop(mh_body)
            if hops is not None and (mh_lp or mh_rp) and (
                (mh_lp and not hops[0][0]) or (mh_rp and not hops[-1][5])
            ):
                raise CypherUnsupported(
                    "inline properties on an anonymous multi-hop endpoint "
                    "are unsupported — name the endpoint"
                )
            if hops is not None:
                # multi-hop single pattern `(a:L1)-[:T1]->(b:L2)-[:T2]->(c:L3)`
                # — the #1 Cypher idiom after one-hop. Compiles exactly like
                # the a33 chained-MATCH shape: hop 1 is Graph.expand, every
                # further hop one more (edge ⋈ node) join pair hanging off
                # the bound frame — k hops = k hash joins, dimension sides
                # broadcast. Neo4j's per-MATCH relationship uniqueness is
                # enforced afterwards: for every pair of hops whose type
                # sets can overlap, rows reusing the same (src, dst) edge
                # are excluded (self-loops / cycle revisits).
                from neo4j_graphdb_spark.operators.cypher import (
                    _orient_edges,
                    _prefix,
                )

                if df is not None:
                    raise CypherUnsupported(
                        "multi-hop patterns must be the statement's first MATCH"
                    )
                (sa0, sl0, ra0, rt0, dir0, da0, dl0) = hops[0]
                df = graph.expand(
                    rel_type=_rel_types(rt0),
                    src_label=_node_labels(sl0),
                    dst_label=_node_labels(dl0),
                    src_alias=sa0, dst_alias=da0,
                    direction=dir0,
                )
                aliases[sa0] = f"{sa0}_"
                aliases[da0] = f"{da0}_"
                if ra0:
                    # hop-1 rel alias: expand leaves the edge's rel_type
                    # and prop columns unprefixed — move them under the
                    # alias prefix so `r1.prop` reads resolve per hop
                    if ra0 in aliases:
                        raise CypherUnsupported(f"alias {ra0!r} bound twice")
                    for rc in [
                        cc
                        for cc in df.columns
                        if not cc.startswith(f"{sa0}_")
                        and not cc.startswith(f"{da0}_")
                    ]:
                        df = df.withColumnRenamed(rc, f"{ra0}_{rc}")
                    aliases[ra0] = f"{ra0}_"
                rel_prefixed = True
                endpoints = [(sa0, rt0)]  # (src alias of hop i, rel type)
                prev_dst = da0
                for (sa_i, sl_i, ra_i, rt_i, dir_i, da_i, dl_i) in hops[1:]:
                    if ra_i and ra_i in aliases:
                        raise CypherUnsupported(f"alias {ra_i!r} bound twice")
                    if sa_i != prev_dst:
                        raise CypherUnsupported(
                            "multi-hop pattern is not a chain"
                        )
                    if da_i in aliases:
                        raise CypherUnsupported(
                            f"alias {da_i!r} is already bound"
                        )
                    eh = graph.edges_df
                    eh = _cy_rel_filter(eh, _rel_types(rt_i))
                    eh_sel = [
                        F.col("src").alias("_ehsrc"),
                        F.col("dst").alias("_ehdst"),
                    ]
                    if ra_i:
                        # hop-i rel alias: carry the edge's rel_type and
                        # prop columns under the alias prefix
                        eh_sel += [
                            F.col(cc).alias(f"{ra_i}_{cc}")
                            for cc in eh.columns
                            if cc not in ("src", "dst")
                        ]
                    eh = _orient_edges(eh, dir_i).select(*eh_sel)
                    dfh = _prefix(graph.match(_node_labels(dl_i)), da_i)
                    df = (
                        df.join(
                            eh,
                            F.col(f"{aliases[sa_i]}{NODE_ID}")
                            == F.col("_ehsrc"),
                        )
                        .join(
                            dfh, F.col("_ehdst") == dfh[f"{da_i}_{NODE_ID}"]
                        )
                        .drop("_ehsrc", "_ehdst")
                    )
                    aliases[da_i] = f"{da_i}_"
                    if ra_i:
                        aliases[ra_i] = f"{ra_i}_"
                    endpoints.append((sa_i, rt_i))
                    prev_dst = da_i
                # relationship uniqueness (per-MATCH, Neo4j semantics):
                # hop i's UNDERLYING edge row is the oriented node-id pair
                # — (alias_i, alias_{i+1}) for ->, reversed for <- ; hops
                # whose type sets can overlap must bind different edges.
                #
                # DOCUMENTED MULTIGRAPH DIVERGENCE (ADVICE r12): edge
                # identity is approximated by the oriented endpoint pair
                # plus type-SET overlap, because edges_df carries no
                # stable per-row edge id (model.as_edges emits
                # (src, dst, rel_type) only). Two consequences, both
                # conservative (over-filter, never wrong rows ADDED):
                # (1) parallel relationships sharing endpoints (e.g. two
                # distinct self-loop edges on one node) are conflated —
                # Neo4j would allow binding the two distinct edges, we
                # exclude the row; (2) hops whose declared type sets
                # merely OVERLAP are filtered even when the actually-
                # matched types differ (the matched type isn't carried
                # through Graph.expand's hop join). Forests and simple
                # graphs — every fixture here — are unaffected; pinned
                # by the self-loop golden test (a94 docstring).
                # outer-endpoint inline maps → pushed equality
                # predicates (the same sugar-for-WHERE fold every other
                # pattern shape uses)
                for prop, raw in _parse_value_props(mh_lp):
                    predicates.append((hops[0][0], prop, "=", raw))
                for prop, raw in _parse_value_props(mh_rp):
                    predicates.append((hops[-1][5], prop, "=", raw))
                chain = [h[0] for h in hops] + [hops[-1][5]]

                def _tset(rt):
                    if not rt:
                        return None  # untyped: overlaps everything
                    return {t.strip() for t in rt.split("|") if t.strip()}

                def _edge_pair(i):
                    u, v = chain[i], chain[i + 1]
                    return (v, u) if hops[i][4] == "in" else (u, v)

                for i in range(len(hops)):
                    for j in range(i + 1, len(hops)):
                        if "both" in (hops[i][4], hops[j][4]):
                            continue  # undirected: orientation unknown
                        si, sj = _tset(hops[i][3]), _tset(hops[j][3])
                        if si is not None and sj is not None and not (si & sj):
                            continue
                        (ui, vi), (uj, vj) = _edge_pair(i), _edge_pair(j)
                        df = df.filter(
                            ~(
                                (
                                    F.col(f"{ui}_{NODE_ID}")
                                    == F.col(f"{uj}_{NODE_ID}")
                                )
                                & (
                                    F.col(f"{vi}_{NODE_ID}")
                                    == F.col(f"{vj}_{NODE_ID}")
                                )
                            )
                        )
                continue
            m = _REL_RE.match(c.body)
            vl_lprops = vl_rprops = None
            if m is None and re.search(r"\)\s*<?-", c.body):
                # relationship pattern with inline endpoint property
                # maps — `(a:L {p: $v})-[:T]->(x:M {q: $w})`, var-length
                # included: pop the maps (same sugar-for-WHERE fold the
                # shortestPath forms use) and re-match; the common tail
                # below folds them into pushed predicates
                vl_stripped, vl_lprops, vl_rprops = _strip_endpoint_props(
                    c.body
                )
                m2 = _REL_RE.match(vl_stripped)
                if m2 is not None:
                    m = m2
            if m:
                sa = m.group("src_alias") or "a"
                da = m.group("dst_alias") or "b"
                direction = _rel_direction(m)
                if m.group("star"):
                    if not m.group("min_h") or not m.group("max_h"):
                        raise CypherUnsupported(
                            "unbounded [*] is supported only inside "
                            "shortestPath((a)-[:T*]->(b)) (the iterative BFS "
                            "substrate); a bare unbounded MATCH enumerates "
                            "every path - a join explosion at scale"
                        )
                    if m.group("rel_props"):
                        raise CypherUnsupported(
                            "inline properties on a variable-length pattern"
                        )
                    # `-[r:T*min..max]->` — bounded variable-length path
                    # (Graph.expand_var: union of fixed-length join
                    # ladders with relationship uniqueness). The alias
                    # binds the PATH; its one property is `hops`
                    # (`r.hops`), expand_var's path-length column.
                    # Incoming `<-[…*m..n]-` is the same ladder walked
                    # from the right end: swap the endpoint roles.
                    # Undirected `-[…*m..n]-` walks expand_var's
                    # symmetrized frame (each stored edge usable either
                    # way; uniqueness still on stored identity).
                    va_src, va_dst = (
                        (da, sa) if direction == "in" else (sa, da)
                    )
                    va_src_label, va_dst_label = (
                        (_node_labels(m.group("dst_label")), _node_labels(m.group("src_label")))
                        if direction == "in"
                        else (_node_labels(m.group("src_label")), _node_labels(m.group("dst_label")))
                    )
                    df = graph.expand_var(
                        rel_type=_rel_types(m.group("rel_type")),
                        min_hops=int(m.group("min_h")),
                        max_hops=int(m.group("max_h")),
                        src_label=va_src_label,
                        dst_label=va_dst_label,
                        src_alias=va_src, dst_alias=va_dst,
                        collect_paths=path_bind is not None,
                        direction="both" if direction == "both" else "out",
                    )
                    if all_shortest:
                        from pyspark.sql.window import Window

                        w = Window.partitionBy(
                            f"{va_src}_{NODE_ID}", f"{va_dst}_{NODE_ID}"
                        )
                        df = (
                            df.withColumn("_minh", F.min("hops").over(w))
                            .filter(F.col("hops") == F.col("_minh"))
                            .drop("_minh")
                        )
                else:
                    df = graph.expand(
                        rel_type=_rel_types(m.group("rel_type")),
                        src_label=_node_labels(m.group("src_label")),
                        dst_label=_node_labels(m.group("dst_label")),
                        src_alias=sa, dst_alias=da,
                        direction=direction,
                    )
                aliases[sa] = f"{sa}_"
                aliases[da] = f"{da}_"
                for prop, raw in _parse_value_props(vl_lprops):
                    predicates.append((sa, prop, "=", raw))
                for prop, raw in _parse_value_props(vl_rprops):
                    predicates.append((da, prop, "=", raw))
                rel_alias = path_bind or m.group("rel_alias")
                # startNode/endNode resolve to the DIRECTED edge's
                # endpoints; undirected matches leave them unbound
                if direction == "out":
                    rel_endpoints = (sa, da)
                elif direction == "in":
                    rel_endpoints = (da, sa)
                rel_prefixed = True
                if not m.group("star") and m.group("rel_props"):
                    # inline rel-prop map: equality filters on the edge
                    # columns (which ride the expand unprefixed), same
                    # value-resolution path as WHERE operands
                    for prop, raw in _parse_value_props(m.group("rel_props")):
                        if prop not in df.columns:
                            raise CypherUnsupported(
                                f"unknown relationship property {prop!r}"
                            )
                        df = df.filter(
                            F.col(prop) == F.lit(_where_value(raw, lits, params))
                        )
                continue
            mparts = _split_top_commas(c.body)
            if len(mparts) > 1:
                # comma-separated MATCH patterns — multi-anchor binding:
                # `MATCH (a:L1), (b:L2)` compiles each anchor as a
                # PREFIXED label scan chained by crossJoin; a WHERE
                # equality between anchors turns the cartesian into an
                # equi-join inside Catalyst (PushPredicateThroughJoin),
                # so the declared cross product only executes when the
                # user really asked for one — Neo4j's warn-but-run
                # semantics for the same shape
                if not all(_NODE_RE.match(p0.strip()) for p0 in mparts):
                    raise CypherUnsupported(
                        "comma-separated MATCH supports node anchors only: "
                        f"{c.body!r}"
                    )
                for p0 in mparts:
                    n0 = _NODE_RE.match(p0.strip())
                    a0 = n0.group("alias")
                    if not a0:
                        raise CypherUnsupported(
                            f"multi-anchor MATCH items need aliases: {p0!r}"
                        )
                    if a0 in aliases:
                        raise CypherUnsupported(
                            f"duplicate alias in MATCH anchors: {a0!r}"
                        )
                    scan0 = graph.match(_node_labels(n0.group("label")))
                    pref0 = f"{a0}_"
                    scan0 = scan0.select(
                        *[F.col(cc).alias(pref0 + cc) for cc in scan0.columns]
                    )
                    df = scan0 if df is None else df.crossJoin(scan0)
                    aliases[a0] = pref0
                    for prop, raw in _parse_value_props(n0.group("props")):
                        predicates.append((a0, prop, "=", raw))
                rel_prefixed = True
                continue
            n = _NODE_RE.match(c.body)
            if not n:
                raise CypherUnsupported(f"unsupported MATCH pattern: {c.body!r}")
            lbl_raw = n.group("label")
            # (n:A:B) label conjunction, (n:A|B) alternation, plain (n:A)
            # — all compiled by Graph.match (the conjunction is a
            # UNION-free AND of effective-label contains-predicates over
            # {primary} ∪ _labels)
            df = graph.match(_node_labels(lbl_raw))
            alias = n.group("alias") or "n"
            aliases[alias] = ""
            node_match = (alias, n.group("label"))
            # MATCH (n:L {prop: $param|'literal'|number}) — inline
            # equality filters; raw value tokens resolve downstream
            # through the same _where_value path as WHERE operands
            for prop, raw in _parse_value_props(n.group("props")):
                predicates.append((alias, prop, "=", raw))
        elif c.kind == "OPTIONAL_MATCH":
            if df is None:
                raise CypherUnsupported("OPTIONAL MATCH needs a preceding MATCH")
            # inline endpoint property maps are Cypher sugar for the
            # pattern-scoped WHERE — pop them off and fold them into the
            # outer join's ON condition below (a post-join filter would
            # wrongly DROP the source row)
            ob_body, ob_lp, ob_rp = _strip_endpoint_props(c.body)
            m = _REL_RE.match(ob_body)
            if not m:
                raise CypherUnsupported(f"unsupported OPTIONAL MATCH pattern: {c.body!r}")
            if m.group("star"):
                if ob_lp or ob_rp:
                    raise CypherUnsupported(
                        "inline properties are unsupported on an OPTIONAL "
                        "var-length pattern"
                    )
                # bounded variable-length OPTIONAL MATCH — `MATCH (a:L)
                # OPTIONAL MATCH (a)-[:T*1..k]->(x[:L2])`: run the same
                # expand_var ladder the plain MATCH uses, then LEFT-join
                # its target columns onto the bound frame by anchor id —
                # unmatched anchors keep their row with NULL targets
                # (openCypher), one row per path otherwise. The anchor
                # must be a bound bare endpoint; the fresh alias binds
                # the target.
                if not m.group("min_h") or not m.group("max_h"):
                    raise CypherUnsupported(
                        "OPTIONAL MATCH variable-length patterns must be "
                        "bounded: (a)-[:T*min..max]->(x)"
                    )
                if m.group("rel_props"):
                    raise CypherUnsupported(
                        "inline properties on a variable-length pattern"
                    )
                if m.group("rel_alias"):
                    raise CypherUnsupported(
                        "relationship aliases are unsupported on an "
                        "OPTIONAL var-length pattern"
                    )
                ov_dir = _rel_direction(m)
                ov_sa, ov_da = m.group("src_alias"), m.group("dst_alias")
                ov_s_label = m.group("src_label")
                ov_d_label = m.group("dst_label")
                if ov_dir == "in":
                    # the ladder always walks left→right: swap roles
                    ov_sa, ov_da = ov_da, ov_sa
                    ov_s_label, ov_d_label = ov_d_label, ov_s_label
                # the BOUND endpoint anchors the left join; the other
                # side binds fresh (either walk role works — the ladder
                # exposes both endpoint ids)
                if ov_sa and ov_sa in aliases and not ov_s_label:
                    anchored, fresh, fresh_label = ov_sa, ov_da or "b", ov_d_label
                elif ov_da and ov_da in aliases and not ov_d_label:
                    anchored, fresh, fresh_label = ov_da, ov_sa or "b", ov_s_label
                else:
                    raise CypherUnsupported(
                        "OPTIONAL var-length must anchor one bare "
                        "endpoint on a bound alias"
                    )
                if fresh in aliases:
                    raise CypherUnsupported(
                        f"OPTIONAL MATCH re-binds alias {fresh!r}"
                    )
                ladder = graph.expand_var(
                    rel_type=_rel_types(m.group("rel_type")),
                    min_hops=int(m.group("min_h")),
                    max_hops=int(m.group("max_h")),
                    src_label=_node_labels(ov_s_label),
                    dst_label=_node_labels(ov_d_label),
                    src_alias=ov_sa or "b",
                    dst_alias=ov_da or "b",
                    direction="both" if ov_dir == "both" else "out",
                )
                right = ladder.select(
                    F.col(f"{anchored}_{NODE_ID}").alias("_ovl_id"),
                    *[cc for cc in ladder.columns if cc.startswith(f"{fresh}_")],
                )
                anchor_id = F.col(f"{aliases[anchored]}{NODE_ID}")
                df = df.join(
                    right, anchor_id == F.col("_ovl_id"), "left"
                ).drop("_ovl_id")
                aliases[fresh] = f"{fresh}_"
                rel_prefixed = True
                continue
            if m.group("rel_props"):
                raise CypherUnsupported(
                    "inline relationship properties are unsupported in OPTIONAL MATCH"
                )
            p_src, p_dst = m.group("src_alias"), m.group("dst_alias")
            opt_direction = _rel_direction(m)
            # CHAINED leg: the anchor endpoint is already bound in the
            # current frame under its column prefix (a previous rel
            # MATCH or OPTIONAL MATCH leg — including an alias the
            # previous OPTIONAL leg bound: a NULL anchor id never
            # equi-joins, so openCypher's NULL-anchor rule falls out of
            # the outer join). Left-joins onto the CURRENT frame, never
            # rebuilding from the scan.
            opt_chained = False
            if p_src and aliases.get(p_src) == f"{p_src}_" and not m.group(
                "src_label"
            ):
                opt_chained = True
                sa, s_label = p_src, None
                da = p_dst or "b"
                opt_new_label = m.group("dst_label")
            elif p_dst and aliases.get(p_dst) == f"{p_dst}_" and not m.group(
                "dst_label"
            ) and p_src != p_dst:
                opt_chained = True
                sa, s_label = p_dst, None
                da = p_src or "b"
                opt_new_label = m.group("src_label")
                opt_direction = {"out": "in", "in": "out"}.get(
                    opt_direction, "both"
                )
            if opt_chained and da in aliases:
                raise CypherUnsupported(
                    f"OPTIONAL MATCH re-binds alias {da!r}"
                )
            # a WITH horizon (possibly with mid-pipeline ORDER/LIMIT)
            # narrowed the anchor set — the scan-rebuild path below
            # re-derives its left side from the scan, so capture the
            # surviving anchor ids NOW and semi-join the expanded frame
            # back onto them (silent row resurrection otherwise: `WITH a
            # LIMIT 1 OPTIONAL MATCH (a)-[…]->(b)` must expand ONE
            # anchor). The chained path joins onto the narrowed frame
            # directly, so it needs no capture.
            opt_keep_ids = None
            if in_with and with_narrowed:
                if with_order:
                    with_order = []
                if not opt_chained:
                    if node_match is None:
                        raise CypherUnsupported(
                            "OPTIONAL MATCH needs a preceding node MATCH"
                        )
                    _sa0 = node_match[0]
                    _idc = f"{aliases.get(_sa0, '')}{NODE_ID}"
                    if _sa0 not in aliases or _idc not in df.columns:
                        raise CypherUnsupported(
                            "OPTIONAL MATCH after WITH needs the anchor "
                            "alias carried through the WITH"
                        )
                    opt_keep_ids = df.select(
                        F.col(_idc).alias("_opt_anchor")
                    ).distinct()
                in_with = False
            if not opt_chained:
                if node_match is None:
                    raise CypherUnsupported(
                        "OPTIONAL MATCH needs a preceding node MATCH"
                    )
                sa, s_label = node_match
                if (p_src or sa) == sa and not m.group("src_label"):
                    da = p_dst or "b"
                    opt_new_label = m.group("dst_label")
                elif (
                    p_dst == sa and not m.group("dst_label")
                    and p_src and p_src != sa
                ):
                    # bound alias on the TARGET side — `MATCH (p:Pub)
                    # OPTIONAL MATCH (a:Article)-[:W]->(p)` — flip the
                    # pattern to the canonical source-anchored orientation
                    # (same rows: the left-outer expand is orientation-blind
                    # once direction is reversed with it)
                    da = p_src
                    opt_new_label = m.group("src_label")
                    opt_direction = {"out": "in", "in": "out"}.get(
                        opt_direction, "both"
                    )
                else:
                    raise CypherUnsupported(
                        "OPTIONAL MATCH must anchor one BARE endpoint on "
                        "an alias bound by a preceding MATCH or OPTIONAL "
                        "MATCH leg"
                    )
            # the node scan is re-expressed as the LEFT side of the
            # optional expand; deferred predicates on the source alias
            # re-resolve through its new column prefix
            opt_rel = m.group("rel_alias")
            on_extra = None
            nxt = clauses[_ci + 1] if _ci + 1 < len(clauses) else None
            opt_where_body = None
            if nxt is not None and nxt.kind == "WHERE":
                # Cypher scopes this WHERE to the OPTIONAL pattern: it
                # folds into the outer join's ON condition (a failing
                # predicate NULLs the optional side; a post-join filter
                # would wrongly DROP the source row). Temporal/EXISTS
                # forms stay out of this position.
                if re.search(
                    r"(?<![.$\w])(?:datetime|EXISTS)\b", nxt.body, re.IGNORECASE
                ):
                    raise CypherUnsupported(
                        "datetime()/EXISTS are unsupported in an "
                        "OPTIONAL MATCH … WHERE"
                    )
                opt_where_body = nxt.body
                consumed.add(_ci + 1)
            opt_prop_conj = []
            for side_props, side_alias in (
                (ob_lp, m.group("src_alias")),
                (ob_rp, m.group("dst_alias")),
            ):
                for prop, raw in _parse_value_props(side_props):
                    if not side_alias:
                        raise CypherUnsupported(
                            "inline properties on an anonymous OPTIONAL "
                            "MATCH endpoint are unsupported — name the "
                            "endpoint"
                        )
                    opt_prop_conj.append(f"{side_alias}.{prop} = {raw}")
            if opt_prop_conj:
                opt_where_body = " AND ".join(
                    opt_prop_conj
                    + ([f"({opt_where_body})"] if opt_where_body else [])
                )
            if opt_where_body is not None:
                opt_ast = _parse_bool_expr(opt_where_body)

                def _make_on_extra(ast, sa=sa, da=da, rel=opt_rel):
                    def _on(src_df, matched_df):
                        def _col_of(al, prop):
                            if al == sa:
                                return _prop_col(src_df, f"{sa}_", prop)
                            if al == da:
                                return _prop_col(matched_df, f"{da}_", prop)
                            if rel is not None and al == rel:
                                if prop not in matched_df.columns:
                                    raise CypherUnsupported(
                                        f"unknown relationship property {prop!r}"
                                    )
                                return matched_df[prop]
                            # any EARLIER-bound alias rides the
                            # accumulated source frame under its own
                            # column prefix (`WHERE b.link <> a.link`
                            # in a chained OPTIONAL MATCH)
                            try:
                                return _prop_col(src_df, f"{al}_", prop)
                            except Exception:
                                raise CypherUnsupported(
                                    "OPTIONAL MATCH WHERE on unbound "
                                    f"alias: {al!r}"
                                ) from None

                        def _leaf(al, prop, op, raw):
                            col = _col_of(al, prop)
                            if op.upper() == "IN":
                                return _isin(
                                    col, _in_list_values(raw, lits, params)
                                )
                            return _op_fn(op)(
                                col, F.lit(_where_value(raw, lits, params))
                            )

                        _CROSS_RE = re.compile(
                            r"^(\w+)\.(\w+)\s*"
                            r"(=~|<=|>=|<>|=|<|>"
                            r"|(?i:STARTS_WITH)|(?i:ENDS_WITH)|(?i:CONTAINS))"
                            r"\s*(\w+)\.(\w+)$"
                        )

                        def _walk(n):
                            if n[0] == "pred":
                                return _leaf(n[1], n[2], n[3], n[4])
                            if n[0] == "exprpred":
                                # cross-alias prop comparison — `WHERE
                                # b.link <> a.link` joins the optional
                                # side on the OTHER alias's column (both
                                # resolve against the join's two frames)
                                cm = _CROSS_RE.match(n[1].strip())
                                if cm:
                                    return _op_fn(cm.group(3))(
                                        _col_of(cm.group(1), cm.group(2)),
                                        _col_of(cm.group(4), cm.group(5)),
                                    )
                                raise CypherUnsupported(
                                    "only simple prop comparisons compose "
                                    "in an OPTIONAL MATCH … WHERE"
                                )
                            if n[0] == "not":
                                return ~_walk(n[1])
                            l, r = _walk(n[1]), _walk(n[2])
                            if n[0] == "xor":
                                return l != r
                            return (l & r) if n[0] == "and" else (l | r)

                        return _walk(ast)

                    return _on

                on_extra = _make_on_extra(opt_ast)
            if opt_chained:
                df = graph.expand_optional_from(
                    df,
                    rel_type=_rel_types(m.group("rel_type")),
                    dst_label=_node_labels(opt_new_label),
                    src_alias=sa, dst_alias=da,
                    direction=opt_direction,
                    on_extra=on_extra,
                )
            else:
                df = graph.expand_optional(
                    rel_type=_rel_types(m.group("rel_type")),
                    src_label=_node_labels(s_label),
                    dst_label=_node_labels(opt_new_label),
                    src_alias=sa, dst_alias=da,
                    direction=opt_direction,
                    on_extra=on_extra,
                )
            if opt_keep_ids is not None:
                # AQE picks broadcast for the (typically LIMIT-sized)
                # anchor set; semi keeps per-anchor multiplicities
                df = df.join(
                    opt_keep_ids,
                    F.col(f"{sa}_{NODE_ID}") == F.col("_opt_anchor"),
                    "left_semi",
                )
            aliases[sa] = f"{sa}_"
            aliases[da] = f"{da}_"
            rel_alias = opt_rel
            if opt_direction == "out":
                rel_endpoints = (sa, da)
            elif opt_direction == "in":
                rel_endpoints = (da, sa)
            else:
                rel_endpoints = None
            rel_prefixed = True
        elif c.kind == "WHERE":
            body = c.body
            if rel_alias and rel_endpoints:
                # startNode(r)/endNode(r) in WHERE — the same textual
                # rewrite onto the matched pattern's endpoint aliases
                # that RETURN applies (a107): `startNode(r).prop = 'x'`
                # becomes `sa.prop = 'x'` and flows through the normal
                # predicate grammar
                for fn0, al0 in (("startNode", rel_endpoints[0]),
                                 ("endNode", rel_endpoints[1])):
                    body = re.sub(
                        rf"(?i)(?<![\w$]){fn0}\(\s*{re.escape(rel_alias)}\s*\)",
                        al0,
                        body,
                    )
            # normalize null tests FIRST: `IS [NOT] NULL` masks to one
            # token so its NOT never triggers the boolean grammar, and
            # the legacy `exists(a.prop)` property test rewrites to it
            # before the EXISTS{} pattern extractor can grab the keyword
            body = re.sub(
                r"(?i)\bIS\s+NOT\s+NULL\b", "IS_NOT_NULL", body
            )
            body = re.sub(r"(?i)\bIS\s+NULL\b", "IS_NULL", body)
            body = re.sub(
                r"(?i)\bexists\s*\(\s*(\w+\.\w+)\s*\)",
                r"\1 IS_NOT_NULL",
                body,
            )
            if "exists" in body.lower() or re.search(
                r"\)\s*<?-\s*\[|\)\s*(?:-->|<--|--)\s*\(", body
            ):
                # pattern-existence predicates: `[NOT] EXISTS { (a)-[:T]->(:L) }`
                # compile to LEFT SEMI / LEFT ANTI joins, so they are
                # extracted as top-level AND conjuncts BEFORE the boolean
                # grammar sees the body. Under OR a join cannot compose —
                # those occurrences rewrite to boolean MARKER columns
                # (`__xmark<i>` — the EXISTS-as-VALUE flag join) that the
                # boolean grammar then treats as ordinary leaves.
                try:
                    ex_tmp: list = []
                    body2 = _extract_exists(body, ex_tmp)
                    exists_preds.extend(ex_tmp)
                    body = body2
                except CypherUnsupported as ex_err:
                    if "cannot sit under OR" not in str(ex_err):
                        raise
                    def _xmark(mm: re.Match) -> str:
                        idx = len(exists_markers)
                        exists_markers.append(mm.group("pat").strip())
                        return (
                            ("NOT " if mm.group("neg") else "")
                            + f"__xmark{idx}"
                        )

                    body = re.sub(
                        r"(?P<neg>(?<![.$\w])NOT\s+)?(?<![.$\w])EXISTS"
                        r"\s*\{(?P<pat>(?:[^{}]|\{[^{}]*\})*)\}",
                        _xmark,
                        body,
                        flags=re.IGNORECASE,
                    )
                if not body:
                    continue
            if "datetime" in body.lower():
                # temporal expressions compile to Columns FIRST and leave
                # \x01<i>\x01 operand sentinels, so their parentheses
                # never reach the boolean-grammar trigger or tokenizer
                def _stash(m: re.Match) -> str:
                    temporal_cols.append(_temporal_column(m, lits))
                    temporal_srcs.append(m.group(0))
                    return f"\x01{len(temporal_cols) - 1}\x01"

                body = _TEMPORAL_EXPR_RE.sub(_stash, body)
                # reversed comparand order — `datetime() - duration(…)
                # < a.ts` — flips onto the canonical prop-on-the-left
                # shape the item grammar takes (sentinels only ever
                # come from the stash above, so the rewrite is safe)
                flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<=",
                        "=": "=", "<>": "<>"}
                body = re.sub(
                    r"(\x01\d+\x01)\s*(<=|>=|<>|=|<|>)\s*(\w+\.\w+)",
                    lambda m: (
                        f"{m.group(3)} {flip[m.group(2)]} {m.group(1)}"
                    ),
                    body,
                )
            has_bool = re.search(
                r"(?<![.$\w])(?:OR|XOR|NOT)\b", body, re.IGNORECASE
            )
            if has_bool or re.search(r"[()]", body):
                # boolean combination: one deferred filter Column; the
                # plan-shaping conjunct specials (UNWIND equi-join) stay
                # exclusive to the plain-AND path below. Parens without
                # OR/NOT may instead be arithmetic grouping or function
                # calls — on a parse failure those fall through to the
                # expression-predicate path.
                try:
                    where_exprs.append(_parse_bool_expr(body))
                    continue
                except CypherUnsupported:
                    if has_bool:
                        raise
            for item in re.split(r"\s+AND\s+", body, flags=re.IGNORECASE):
                m = _WHERE_ITEM_RE.match(item.strip())
                if m:
                    predicates.append(
                        (m.group("alias"), m.group("prop"), m.group("op"), m.group("val"))
                    )
                else:
                    # expression-form conjunct (arithmetic / functions /
                    # CASE over bound props) — compiled in _apply_pending
                    # where the frame is known. Any temporal sentinel the
                    # stash left here UNSTASHES back to its source text:
                    # the scalar compiler handles datetime()/duration()
                    # natively (sentinels exist only for the simple
                    # prop-op-value grammar, whose operands are raw
                    # tokens, not expressions)
                    expr_predicates.append(
                        re.sub(
                            r"\x01(\d+)\x01",
                            lambda mm: temporal_srcs[int(mm.group(1))],
                            item.strip(),
                        )
                    )
        elif c.kind == "WITH":
            # non-aggregating WITH: a mid-pipeline horizon. Deferred
            # filters flush FIRST (Cypher scopes a WHERE to its clause
            # block — it must run before this projection, and before any
            # pagination that follows), then the frame narrows to the
            # listed aliases (everything else leaves scope) and the
            # following ORDER BY / SKIP / LIMIT apply mid-pipeline
            # instead of terminally. The aggregating form is handled by
            # the recursion pre-pass above.
            if df is None:
                # leading WITH of frame-independent expressions —
                # `WITH {a: 1} AS m RETURN m.a`, the standalone-RETURN
                # seed shape (alias references refuse downstream as
                # unknown names, honestly)
                df = graph.nodes_df.sparkSession.range(1).select(
                    F.lit(0).alias("_standalone")
                )
            wbody = c.body
            wdm = re.match(r"^DISTINCT\s+", wbody, re.IGNORECASE)
            with_distinct = bool(wdm)
            if wdm:
                wbody = wbody[wdm.end():]
            items = _split_top_commas(wbody)
            keep: list[str] = []
            with_exprs: list[tuple[str, str | None]] = []
            for it in items:
                if it == "*":
                    # WITH * — carry every bound alias (and the flat
                    # columns ride along untouched, Neo4j semantics)
                    keep.extend(a0 for a0 in aliases if a0 not in keep)
                elif it in aliases:
                    keep.append(it)
                elif it in df.columns:
                    # carry a flat column from an earlier WITH projection
                    with_exprs.append((it, it))
                else:
                    am2 = _EXPR_AS_RE.match(it)
                    if not am2:
                        raise CypherUnsupported(
                            "WITH items must be bound aliases, carried "
                            f"names, or `expr AS name`: {it!r}"
                        )
                    with_exprs.append((it, None))
            _apply_pending()
            computed_cols = []
            for raw, carried in with_exprs:
                if carried is not None:
                    computed_cols.append(F.col(carried))
                    continue
                pcm_w = _PAT_COMP_RE.match(raw)
                if pcm_w:
                    # pattern comprehension as a WITH projection —
                    # `WITH p, [(p)<-[:W]-(a) | a.link] AS links`:
                    # same side-aggregation join as the RETURN form;
                    # the helper's join column drops with the horizon
                    df, e, nm = _compile_pattern_comp(
                        pcm_w, df, graph, aliases, lits, params
                    )
                    computed_cols.append(e.alias(nm))
                    continue
                e, nm = _compile_return_expr(
                    raw, df, aliases, rel_alias, lits, params
                )
                computed_cols.append(e.alias(nm))
            keep_prefixes = [aliases[it] for it in keep]
            if "" not in keep_prefixes:
                cols = [
                    col
                    for col in df.columns
                    if any(col.startswith(p) for p in keep_prefixes)
                ]
                df = df.select(*cols, *computed_cols)
                rel_alias = None  # edge columns left the scope
            elif computed_cols:
                df = df.select("*", *computed_cols)
            aliases = {it: aliases[it] for it in keep}
            if with_distinct:
                # WITH DISTINCT …: dedup over exactly the projected scope
                # (every column still in frame belongs to a kept alias or
                # a computed item) — one shuffle, same as RETURN DISTINCT
                df = df.dropDuplicates()
            in_with = True
            with_order = []
        elif c.kind == "RETURN":
            if in_with:
                if with_order:
                    # a trailing WITH … ORDER BY with no LIMIT fixes the
                    # result order entering RETURN
                    df = df.orderBy(*with_order)
                    with_order = []
                in_with = False
            body = c.body
            dm = re.match(r"^DISTINCT\s+", body, re.IGNORECASE)
            if dm:
                return_distinct = True
                body = body[dm.end():]
            if rel_alias and rel_endpoints:
                # startNode(r)/endNode(r) [.prop] — rewrite onto the
                # matched pattern's endpoint aliases (Neo4j: the
                # DIRECTED edge's source/target)
                for fn0, al0 in (("startNode", rel_endpoints[0]),
                                 ("endNode", rel_endpoints[1])):
                    body = re.sub(
                        rf"(?i)(?<![\w$]){fn0}\(\s*{re.escape(rel_alias)}\s*\)",
                        al0,
                        body,
                    )
            if body.strip() == "*":
                # RETURN * — every bound variable, alphabetical (the
                # Neo4j column order); compiles as whole-entity items.
                # A bound path variable projects as its path struct
                # (nodes/relationships/length — see the bare-path
                # RETURN branch), matching Neo4j's RETURN-*-includes-
                # the-path behavior (VERDICT r14 missing #4).
                star = sorted(
                    [*aliases, rel_alias] if rel_alias else aliases
                )
                if not star:
                    raise CypherUnsupported("RETURN * needs bound variables")
                returns = star
            else:
                returns = _split_top_commas(body)
        elif c.kind == "ORDER":
            body = re.sub(r"^BY\s+", "", c.body, flags=re.IGNORECASE)
            for item in _split_top_commas(body):
                m = re.match(
                    r"^(?P<key>\w+(?:\.\w+)?)(?:\s+(?P<dir>ASC|DESC))?$",
                    item,
                    re.IGNORECASE,
                )
                if not m:
                    if in_with:
                        raise CypherUnsupported(
                            f"unsupported WITH ORDER BY item: {item!r}"
                        )
                    em = re.match(
                        r"^(?P<expr>.+?)(?:\s+(?P<dir>ASC|DESC))?$",
                        item,
                        re.IGNORECASE | re.DOTALL,
                    )
                    # \x02 marks a raw expression key, compiled at sort time
                    order_by.append(
                        (
                            "\x02" + em.group("expr"),
                            (em.group("dir") or "ASC").upper() == "DESC",
                        )
                    )
                    continue
                if in_with:
                    key, desc = m.group("key"), bool(m.group("dir")) and m.group("dir").upper() == "DESC"
                    if "." not in key:
                        raise CypherUnsupported(
                            f"WITH … ORDER BY needs alias.prop keys, got {key!r}"
                        )
                    a, prop = key.split(".", 1)
                    if a not in aliases:
                        raise CypherUnsupported(f"ORDER BY on unbound alias: {a!r}")
                    col = _prop_col(df, aliases[a], prop)
                    with_order.append(
                        col.desc_nulls_first() if desc else col.asc_nulls_last()
                    )
                else:
                    order_by.append(
                        (m.group("key"), (m.group("dir") or "ASC").upper() == "DESC")
                    )
        elif c.kind == "SKIP":
            # the reference pages its crawl the same way
            # (src/crwling.py:110 — start = (p_num * 10) + 1); SKIP is
            # Cypher's offset, applied after ORDER BY and before LIMIT
            if in_with:
                if with_order:
                    df = df.orderBy(*with_order)
                    with_order = []
                df = df.offset(_page_count(c.body, params, "SKIP"))
                with_narrowed = True
            else:
                skip = _page_count(c.body, params, "SKIP")
        elif c.kind == "LIMIT":
            if in_with:
                if with_order:
                    df = df.orderBy(*with_order)
                    with_order = []
                df = df.limit(_page_count(c.body, params, "LIMIT"))
                with_narrowed = True
            else:
                limit = _page_count(c.body, params, "LIMIT")
        else:
            raise CypherUnsupported(f"{c.kind} unsupported in read statements")

    if df is not None and _pending_seed is not None:
        overlap = set(df.columns) & set(_pending_seed.columns)
        if overlap:
            raise CypherUnsupported(
                f"WITH output names collide with match columns: {overlap}"
            )
        df = df.crossJoin(F.broadcast(_pending_seed))
        _pending_seed = None
    if df is None and unwind_frame is not None and returns:
        # pure `UNWIND […] AS x RETURN x` — the list itself is the frame
        df = unwind_frame
    if df is None and returns:
        # standalone `RETURN <expr>`: a 1-row frame through the ordinary
        # expression compiler — `RETURN 1` is every client's smoke test
        df = graph.nodes_df.sparkSession.range(1).select(
            F.lit(0).alias("_standalone")
        )
    if df is None or not returns:
        raise CypherUnsupported("read statement needs MATCH … RETURN …")

    _apply_pending()

    # ORDER BY on an UN-PROJECTED aggregate — `RETURN u.name ORDER BY
    # count(*)` (VERDICT r14 missing #5): Neo4j lets ORDER BY aggregate
    # even when the RETURN list doesn't. Each such key lifts into a
    # HIDDEN item of the same implicit groupBy (the non-aggregate RETURN
    # items become the grouping keys, openCypher's rule) and the hidden
    # column drops after the sort — one shuffle, same plan as if the
    # user had projected the aggregate. Keys that textually repeat an
    # aggregating RETURN item keep the existing name_map resolution.
    hidden_ord: list[str] = []
    if order_by:
        ret_norms = {
            re.sub(
                r"\s+", "",
                re.sub(r"\s+AS\s+\w+\s*$", "", i, flags=re.IGNORECASE),
            )
            for i in returns
        }
        returns_agg = any(_is_agg_item(i) for i in returns)
        new_ob: list[tuple[str, bool]] = []
        for key, desc in order_by:
            raw = key[1:].strip() if key.startswith("\x02") else None
            if raw is not None and _is_agg_item(raw):
                if returns_agg and re.sub(r"\s+", "", raw) in ret_norms:
                    new_ob.append((key, desc))  # repeats a RETURN item
                    continue
                h = f"__ord{len(hidden_ord)}"
                hidden_ord.append(f"{raw} AS {h}")
                new_ob.append((h, desc))
            else:
                new_ob.append((key, desc))
        order_by = new_ob

    if any(_is_agg_item(i) for i in returns) or hidden_ord:
        if return_distinct:
            raise CypherUnsupported("RETURN DISTINCT cannot combine with aggregation")
        out = _aggregate_return(
            df, returns + hidden_ord, aliases, rel_alias, order_by, skip,
            limit, lits, params,
        )
        if hidden_ord:
            # projection over the sorted/paged frame — drops the hidden
            # sort columns, keeps the row order
            out = out.drop(*[f"__ord{i}" for i in range(len(hidden_ord))])
        return out

    out_cols = []
    out_names: list[str] = []
    out_exprs: dict[str, object] = {}  # output name -> source expression
    for item in returns:
        cm = _COUNT_ITEM_RE.match(item)
        if cm:
            # per-row pattern count: one oriented [+ label-restricted]
            # degree aggregation LEFT-joined onto the frame, unmatched
            # rows coalesce to 0 — the expand-and-count a Neo4j user
            # writes as `COUNT { (a)-[:T]->(:L) }`; never fan-out on the
            # main frame, the aggregation happens on the edge side
            c_pat, c_lp, c_rp = _strip_endpoint_props(
                re.sub(r"^MATCH\s+", "", cm.group("pat").strip(),
                       flags=re.IGNORECASE)
            )
            pm = _REL_RE.match(c_pat)
            if not pm:
                raise CypherUnsupported(
                    f"unsupported COUNT pattern: {cm.group('pat').strip()!r}"
                )
            if pm.group("star"):
                raise CypherUnsupported(
                    "variable-length patterns are unsupported in COUNT"
                )
            ca = pm.group("src_alias")
            if not ca or pm.group("src_label") or c_lp or ca not in aliases:
                raise CypherUnsupported(
                    "COUNT source must be a bound bare alias"
                )
            if pm.group("dst_alias"):
                raise CypherUnsupported(
                    "COUNT target must be anonymous: () or (:Label)"
                )
            from neo4j_graphdb_spark.operators.cypher import _orient_edges

            ce = _cy_rel_filter(graph.edges_df, _rel_types(pm.group("rel_type")))
            # inline rel-prop map — equality filters on the edge columns;
            # a prop no stored edge carries reads NULL → never matches
            for prop, raw in _parse_value_props(pm.group("rel_props")):
                ce = (
                    ce.filter(
                        F.col(prop) == F.lit(_where_value(raw, lits, params))
                    )
                    if prop in ce.columns
                    else ce.filter(F.lit(False))
                )
            ce = _orient_edges(ce, _rel_direction(pm))
            if pm.group("dst_label") is not None or c_rp:
                tgt_scan = graph.match(_node_labels(pm.group("dst_label")))
                # target inline props — `COUNT { (a)-[:T]->(:L {k: $v}) }`
                # — equality filters planted into the label scan
                for prop, raw in _parse_value_props(c_rp):
                    tgt_scan = tgt_scan.filter(
                        _prop_col(tgt_scan, "", prop)
                        == F.lit(_where_value(raw, lits, params))
                    )
                lbl_ids = tgt_scan.select(F.col(NODE_ID).alias("_cid"))
                ce = ce.join(lbl_ids, ce["dst"] == F.col("_cid"), "left_semi")
            name = cm.group("out") or f"count_{ca}"
            cnt = ce.groupBy(F.col("src").alias("_csrc")).agg(
                F.count(F.lit(1)).alias(f"_cnt_{name}")
            )
            src_id = (
                F.col(f"{aliases[ca]}{NODE_ID}") if aliases[ca] else F.col(NODE_ID)
            )
            df = df.join(cnt, src_id == F.col("_csrc"), "left").drop("_csrc")
            e = F.coalesce(F.col(f"_cnt_{name}"), F.lit(0)).cast("bigint")
            out_cols.append(e.alias(name))
            out_exprs[name] = e
            out_names.append(name)
            continue
        em = _EXISTS_RET_RE.match(item)
        if em:
            # `[NOT] EXISTS { (a)-[:T]->(:L) } AS flag` as a VALUE:
            # same edge-side shape as COUNT {…} — distinct qualifying
            # sources LEFT-joined with a marker flag, unmatched rows
            # coalesce to false (never a fan-out of the main frame)
            x_pat, xv_lp, xv_rp = _strip_endpoint_props(
                re.sub(r"^MATCH\s+", "", em.group("pat").strip(),
                       flags=re.IGNORECASE)
            )
            pm = _REL_RE.match(x_pat)
            if not pm:
                raise CypherUnsupported(
                    f"unsupported EXISTS pattern: {em.group('pat').strip()!r}"
                )
            if pm.group("star"):
                raise CypherUnsupported(
                    "variable-length patterns are unsupported in EXISTS"
                )
            ea = pm.group("src_alias")
            if not ea or pm.group("src_label") or xv_lp or ea not in aliases:
                raise CypherUnsupported(
                    "EXISTS source must be a bound bare alias"
                )
            if pm.group("dst_alias"):
                raise CypherUnsupported(
                    "EXISTS target must be anonymous: () or (:Label)"
                )
            from neo4j_graphdb_spark.operators.cypher import _orient_edges

            xe = _cy_rel_filter(graph.edges_df, _rel_types(pm.group("rel_type")))
            # inline rel-prop map — same edge-column equality filters as
            # the COUNT form above
            for prop, raw in _parse_value_props(pm.group("rel_props")):
                xe = (
                    xe.filter(
                        F.col(prop) == F.lit(_where_value(raw, lits, params))
                    )
                    if prop in xe.columns
                    else xe.filter(F.lit(False))
                )
            xe = _orient_edges(xe, _rel_direction(pm))
            if pm.group("dst_label") is not None or xv_rp:
                tgt_scan = graph.match(_node_labels(pm.group("dst_label")))
                for prop, raw in _parse_value_props(xv_rp):
                    tgt_scan = tgt_scan.filter(
                        _prop_col(tgt_scan, "", prop)
                        == F.lit(_where_value(raw, lits, params))
                    )
                lbl_ids = tgt_scan.select(F.col(NODE_ID).alias("_xid"))
                xe = xe.join(lbl_ids, xe["dst"] == F.col("_xid"), "left_semi")
            name = em.group("out")
            marks = (
                xe.select(F.col("src").alias("_xsrc"))
                .distinct()
                .withColumn(f"_flag_{name}", F.lit(True))
            )
            src_id = (
                F.col(f"{aliases[ea]}{NODE_ID}") if aliases[ea] else F.col(NODE_ID)
            )
            df = df.join(marks, src_id == F.col("_xsrc"), "left").drop("_xsrc")
            e = F.coalesce(F.col(f"_flag_{name}"), F.lit(False))
            if em.group("neg"):
                e = ~e
            out_cols.append(e.alias(name))
            out_exprs[name] = e
            out_names.append(name)
            continue
        pcm = _PAT_COMP_RE.match(item)
        if pcm:
            df, e, name = _compile_pattern_comp(
                pcm, df, graph, aliases, lits, params
            )
            out_cols.append(e.alias(name))
            out_exprs[name] = e
            out_names.append(name)
            continue
        mp = _MAP_PROJ_RE.match(item)
        if mp:
            # map projection `n {.title, .link}` (openCypher §3.11) — a
            # struct of exactly the listed properties, field order as
            # written (deterministic, so value-hashes are stable). Only
            # the `.prop` entry form is in the subset; variables,
            # `.*`, and literal entries are refused below.
            alias = mp.group("alias")
            if alias not in aliases:
                raise CypherUnsupported(
                    f"map projection on unbound alias: {alias!r}"
                )
            entries = [
                f.strip()
                for f in _split_top_commas(mp.group("fields"))
                if f.strip()
            ]
            if not entries:
                raise CypherUnsupported("empty map projection")
            cols = []
            for f in entries:
                fm2 = re.fullmatch(r"\.\s*(\w+)", f)
                if fm2:
                    prop = fm2.group(1)
                    cols.append(
                        _prop_col(df, aliases[alias], prop).alias(prop)
                    )
                    continue
                if f == ".*":
                    # all-properties spread — every stored prop column
                    # of the alias (the merge key included; node id /
                    # label bookkeeping excluded), sorted for a
                    # deterministic field order
                    pre = aliases[alias]
                    mp_skip = {NODE_ID, "label", EXTRA_LABELS}
                    spread = sorted(
                        c0[len(pre):] if pre else c0
                        for c0 in df.columns
                        if (not pre or c0.startswith(pre))
                        and (c0[len(pre):] if pre else c0) not in mp_skip
                    )
                    cols.extend(
                        F.col(f"{pre}{p0}").alias(p0) for p0 in spread
                    )
                    continue
                km2 = re.match(r"^(\w+)\s*:\s*(.+)$", f, re.DOTALL)
                if km2:
                    # computed entry `era: a.year - 2000` — any scalar
                    # expression over the bound frame
                    ec, _ = _compile_scalar(
                        _parse_scalar_expr(km2.group(2).strip()),
                        df, aliases, rel_alias, lits, params,
                    )
                    cols.append(ec.alias(km2.group(1)))
                    continue
                raise CypherUnsupported(
                    "map projection entries are .prop, .*, or "
                    f"key: <expr> — got {f!r}"
                )
            name = mp.group("out") or alias
            e = F.struct(*cols)
            out_cols.append(e.alias(name))
            out_exprs[name] = e
            out_names.append(name)
            continue
        fm = _FN_ITEM_RE.match(item)
        if fm:
            # labels(n) / type(r) / id(n) — the introspection trio every
            # Neo4j result pane shows. labels() is a 1-element array
            # (single-label model, §1.3); id() is the deterministic
            # content-derived node id, NOT a Neo4j counter.
            fn = fm.group("fn").lower()
            fa, out = fm.group("alias"), fm.group("out")
            name = out or f"{fn}_{fa}"
            if fn == "length":
                # length(p) — the hop count of a shortestPath/var-length
                # path binding (the frame's `hops` column)
                if rel_alias is None or fa != rel_alias or "hops" not in df.columns:
                    raise CypherUnsupported(
                        f"length() needs a bound path alias, got {fa!r}"
                    )
                e = F.col("hops").cast("bigint")
            elif fn in ("nodes", "relationships"):
                # nodes(p)/relationships(p) over a `p = (…)-[*…]->(…)`
                # binding: the ladder collected the path as ordered
                # arrays — nodes(p) yields the node MERGE-KEY list and
                # relationships(p) the type list (full entity structs
                # along a path are outside the subset; the key/type
                # projections are the oracle-able core)
                if (
                    rel_alias is None
                    or fa != rel_alias
                    or "path_keys" not in df.columns
                ):
                    raise CypherUnsupported(
                        f"{fn}() needs a path variable bound with "
                        f"p = (…)-[:T*min..max]->(…), got {fa!r}"
                    )
                e = F.col("path_keys" if fn == "nodes" else "path_types")
            elif fn == "type":
                if rel_alias is not None and fa == rel_alias:
                    e = F.col("rel_type")
                elif (
                    fa in aliases
                    and f"{aliases[fa]}rel_type" in df.columns
                ):
                    # a multi-hop pattern's per-hop rel alias — its edge
                    # columns ride the frame under the alias prefix
                    e = F.col(f"{aliases[fa]}rel_type")
                else:
                    raise CypherUnsupported(
                        f"type() needs the bound relationship alias, got {fa!r}"
                    )
            elif fn in ("keys", "properties") and (
                fa in aliases
                or (rel_alias is not None and fa == rel_alias)
            ):
                # the entity's non-null property cells: keys() as a sorted
                # name array, properties() as a canonical JSON string
                # (to_json drops nulls; fields sort alphabetically so the
                # serialization is partitioning-independent). Suffixes are
                # validated against the nodes-table (or edges-table) schema
                # so frame columns that are NOT properties of the entity
                # (UNWIND variables, WITH-computed columns) never leak in.
                if fa in aliases:
                    prefix = aliases[fa]
                    ent_props = {
                        c
                        for c in graph.nodes_df.columns
                        if c not in (NODE_ID, "label")
                    }
                else:
                    # relationship alias: edge prop columns ride the
                    # expand output unprefixed
                    prefix = ""
                    ent_props = {
                        c
                        for c in (
                            graph.edges_df.columns
                            if graph.edges_df is not None
                            else []
                        )
                        if c not in ("src", "dst", "rel_type", BUCKET_COL)
                    }
                prop_names = sorted(
                    c[len(prefix):]
                    for c in df.columns
                    if c.startswith(prefix) and c[len(prefix):] in ent_props
                )
                if fn == "keys":
                    e = F.sort_array(
                        F.filter(
                            F.array(
                                *[
                                    F.when(
                                        F.col(f"{prefix}{p}").isNotNull(),
                                        F.lit(p),
                                    )
                                    for p in prop_names
                                ]
                            ),
                            lambda x: x.isNotNull(),
                        )
                    )
                else:
                    e = F.to_json(
                        F.struct(
                            *[
                                F.col(f"{prefix}{p}").alias(p)
                                for p in prop_names
                            ]
                        )
                    )
            elif fa in aliases:
                col = "label" if fn == "labels" else NODE_ID
                e = _prop_col(df, aliases[fa], col)
                if fn == "elementid":
                    # Neo4j 5's elementId(n): an opaque STRING identity —
                    # here the content-derived node id stringified
                    e = e.cast("string")
                if fn == "labels":
                    # labels(n) = [primary] ++ sorted extras (the
                    # SET n:Extra set, minus the primary and empties) —
                    # primary-first like Neo4j's creation order, extras
                    # canonically sorted so results are deterministic
                    extra_name = aliases[fa] + EXTRA_LABELS
                    if extra_name in df.columns:
                        prim = e
                        extras = F.filter(
                            F.split(
                                F.coalesce(F.col(extra_name), F.lit("")), ","
                            ),
                            lambda x: (x != "") & (x != prim),
                        )
                        e = F.concat(F.array(prim), F.array_sort(extras))
                    else:
                        e = F.array(e)
            else:
                raise CypherUnsupported(f"{fn}() on unbound alias: {fa!r}")
            out_cols.append(e.alias(name))
            out_exprs[name] = e
            out_names.append(name)
            continue
        m = _RETURN_ITEM_RE.match(item)
        if not m:
            # scalar-expression fallback: arithmetic / concat / coalesce /
            # CASE / whitelisted functions over bound props, compiled to
            # one Catalyst Column (stays in whole-stage codegen)
            e, name = _compile_return_expr(
                item, df, aliases, rel_alias, lits, params
            )
            out_cols.append(e.alias(name))
            out_exprs[name] = e
            out_names.append(name)
            continue
        alias, prop, out = m.group("alias"), m.group("prop"), m.group("out")
        if alias in aliases:
            prefix = aliases[alias]
            if prop is None:
                out_cols.append(_entity_struct(df, prefix, out or alias) if rel_prefixed
                                else _node_entity(df, out or alias))
                out_names.append(out or alias)
            else:
                e = _prop_col(df, prefix, prop)
                out_cols.append(e.alias(out or prop))
                out_exprs[out or prop] = e
                out_names.append(out or prop)
        elif rel_alias is not None and alias == rel_alias:
            if prop is not None:
                if prop not in df.columns:
                    raise CypherUnsupported(f"unknown relationship property {prop!r}")
                e = F.col(prop)
            elif path_bind is not None and alias == path_bind:
                # bare `RETURN p` / `RETURN *` over a bound path: a
                # path-shaped struct — the node key sequence, the
                # relationship type sequence, and the hop count (the
                # three projections this engine's path bindings carry;
                # full entity structs along a path are outside the
                # subset). shortestPath bindings carry only the length.
                fields = []
                if "path_keys" in df.columns:
                    fields.append(F.col("path_keys").alias("nodes"))
                if "path_types" in df.columns:
                    fields.append(F.col("path_types").alias("relationships"))
                if "hops" in df.columns:
                    fields.append(F.col("hops").cast("bigint").alias("length"))
                if not fields:
                    raise CypherUnsupported(
                        f"path variable {alias!r} carries no projectable "
                        "path columns"
                    )
                e = F.struct(*fields)
            else:
                e = F.col("rel_type")
            out_cols.append(e.alias(out or prop or alias))
            out_exprs[out or prop or alias] = e
            out_names.append(out or prop or alias)
        elif prop is None and alias in df.columns:
            # flat column (WITH projection) returned by bare name
            e = F.col(alias)
            out_cols.append(e.alias(out or alias))
            out_exprs[out or alias] = e
            out_names.append(out or alias)
        elif alias == unwind_name and prop is None:
            out_cols.append(F.col(unwind_name).alias(out or alias))
            out_exprs[out or alias] = F.col(unwind_name)
            out_names.append(out or alias)
        else:
            # not a bound alias — last chance: a scalar expression that
            # HAPPENS to match the alias grammar (`1 AS one`, `true AS t`)
            try:
                e, name = _compile_return_expr(
                    item, df, aliases, rel_alias, lits, params
                )
            except CypherUnsupported:
                raise CypherUnsupported(
                    f"RETURN of unbound alias: {item!r}"
                ) from None
            out_cols.append(e.alias(name))
            out_exprs[name] = e
            out_names.append(name)
    if return_distinct:
        # Cypher: DISTINCT dedups the projected rows, ORDER BY then sorts
        # the RESULT — so keys must be RETURN output names here (the
        # pre-projection sort below would be discarded by the dedup
        # exchange anyway)
        out = df.select(*out_cols).distinct()
        if order_by:
            sorts = []
            for key, desc in order_by:
                if key not in out_names:
                    raise CypherUnsupported(
                        f"ORDER BY with DISTINCT must use a RETURN name, got {key!r}"
                    )
                sorts.append(
                    F.col(key).desc_nulls_first() if desc
                    else F.col(key).asc_nulls_last()
                )
            out = out.orderBy(*sorts)
        return _page(out, skip, limit)
    if order_by:
        # sort BEFORE the projection so keys may be either RETURN output
        # names or any bound alias.prop; projection preserves the order
        sorts = []
        for key, desc in order_by:
            if key.startswith("\x02"):
                # raw ORDER BY expression (arithmetic/functions/CASE)
                e, _ = _compile_scalar(
                    _parse_scalar_expr(key[1:]), df, aliases, rel_alias,
                    lits, params,
                )
            elif "." in key:
                a, p = key.split(".", 1)
                if a not in aliases:
                    raise CypherUnsupported(f"ORDER BY on unbound alias: {key!r}")
                e = _prop_col(df, aliases[a], p)
            elif key in out_exprs:
                e = out_exprs[key]
            else:
                raise CypherUnsupported(
                    f"ORDER BY key {key!r} is neither alias.prop nor a RETURN name"
                )
            sorts.append(e.desc_nulls_first() if desc else e.asc_nulls_last())
        df = df.orderBy(*sorts)
    out = df.select(*out_cols)
    return _page(out, skip, limit)



def _page_count(body: str, params: dict | None, what: str) -> int:
    """Resolve a SKIP/LIMIT operand: integer literal or $param."""
    body = body.strip()
    if body.startswith("$"):
        v = (params or {}).get(body[1:])
        if not isinstance(v, int) or isinstance(v, bool) or v < 0:
            raise CypherUnsupported(
                f"{what} ${body[1:]} needs a non-negative integer param"
            )
        return v
    try:
        return int(body)
    except ValueError:
        raise CypherUnsupported(f"unsupported {what} operand: {body!r}") from None

def _page(df: DataFrame, skip: int | None, limit: int | None) -> DataFrame:
    """SKIP/LIMIT pagination: offset first, then limit — Cypher's
    ``SKIP s LIMIT l`` returns rows s..s+l of the ordered result."""
    if skip:
        df = df.offset(skip)
    return df.limit(limit) if limit is not None else df


def _aggregate_return(
    df: DataFrame,
    returns: list[str],
    aliases: dict[str, str],
    rel_alias: str | None,
    order_by: list[tuple[str, bool]],
    skip: int | None,
    limit: int | None,
    lits: list[str] | None = None,
    params: dict | None = None,
) -> DataFrame:
    """Cypher implicit grouping: when any RETURN item aggregates, every
    non-aggregate item becomes a grouping key (openCypher's rule — there
    is no GROUP BY clause to write). ``collect()`` lists are sorted:
    Neo4j guarantees no element order, and a canonical order is what
    makes the result value-comparable across partitionings and against
    the SQL oracle."""
    keys, aggs, name_map = [], [], {}
    hidden_keys: list[str] = []  # identity columns behind entity group keys
    lift_names: list[str] = []  # hidden aggregate columns behind composites
    post_exprs: list[tuple[str, str]] = []  # (skeleton over lifts, out name)

    def _source(alias: str, prop: str | None, fn: str | None = None):
        if alias in aliases:
            if prop is None:
                if fn in ("count",):
                    # count(n) / count(DISTINCT n): Cypher counts the
                    # non-null BINDINGS of the alias — the node-id column
                    # is exactly that (NULL on an unmatched OPTIONAL side,
                    # distinct per entity)
                    return _prop_col(df, aliases[alias], NODE_ID)
                if fn == "collect":
                    # collect(n) — the whole-entity list: each element is
                    # the node's stored-row struct (prefix-stripped field
                    # names, the same shape `RETURN n` projects). NULL
                    # bindings (unmatched OPTIONAL side) collapse to a
                    # NULL element, which collect_list skips — Neo4j
                    # skips null bindings too.
                    pre = aliases[alias]
                    ent_cols = (
                        [c for c in df.columns if c.startswith(pre)]
                        if pre
                        else list(df.columns)
                    )
                    ent = F.struct(
                        *[
                            F.col(c).alias(c[len(pre):] if pre else c)
                            for c in ent_cols
                        ]
                    )
                    idc = _prop_col(df, pre, NODE_ID)
                    return F.when(idc.isNotNull(), ent)
                raise CypherUnsupported(
                    f"whole-entity {alias!r} unsupported in {fn or 'aggregating'}()"
                )
            return _prop_col(df, aliases[alias], prop)
        if prop is None and alias in df.columns:
            return F.col(alias)  # flat column from a WITH projection
        if rel_alias is not None and alias == rel_alias:
            if prop is None:
                return F.col("rel_type")
            if prop in df.columns:
                return F.col(prop)
            raise CypherUnsupported(f"unknown relationship property {prop!r}")
        raise CypherUnsupported(f"RETURN of unbound alias: {alias!r}")

    def _build_agg(fn: str, dist: bool, e):
        """One aggregate Column from (function, DISTINCT?, source) — the
        single construction point shared by the plain-source and
        expression-source branches, so the supported-DISTINCT set and
        collect() canonical ordering can never diverge between them."""
        if dist:
            if fn == "count":
                return F.countDistinct(e)
            if fn == "collect":
                return F.array_sort(F.collect_set(e))
            if fn == "sum":
                return F.sum_distinct(e)
            if fn == "avg":
                # no avg_distinct builtin: exact as Σdistinct / #distinct
                # (both single-pass, same distinct-hash aggregation)
                return F.sum_distinct(e) / F.countDistinct(e)
            if fn in ("min", "max"):
                # DISTINCT is a no-op under min/max; accept the syntax
                return getattr(F, fn)(e)
            raise CypherUnsupported(
                f"DISTINCT inside {fn}() unsupported "
                "(count/collect/sum/avg/min/max)"
            )
        if fn == "collect":
            return F.array_sort(F.collect_list(e))
        if fn == "stdev":
            return F.stddev_samp(e)
        if fn == "stdevp":
            return F.stddev_pop(e)
        return getattr(F, fn)(e)

    def _sub_agg(txt: str):
        """One extracted aggregate call → its unaliased Column — the
        same three shapes the plain item paths accept (percentile /
        alias-source / expression-source), minus the AS handling."""
        qm = _PERCENTILE_RE.match(txt)
        if qm:
            e, _ = _compile_scalar(
                _parse_scalar_expr(qm.group("inner").strip()),
                df, aliases, rel_alias, lits or [], params,
            )
            p = float(qm.group("p"))
            if qm.group("fn").lower() == "percentiledisc":
                sorted_e = F.array_sort(F.collect_list(e))
                rank = F.greatest(
                    F.lit(1), F.ceil(F.size(sorted_e) * F.lit(p)).cast("int")
                )
                return F.element_at(sorted_e, rank)
            return F.percentile(e, p)
        am = _AGG_ITEM_RE.match(txt)
        if am:
            fn = am.group("fn").lower()
            if am.group("star"):
                if fn != "count":
                    raise CypherUnsupported(f"{fn}(*) is not Cypher")
                return F.count(F.lit(1))
            e = _source(am.group("alias"), am.group("prop"), fn)
            return _build_agg(fn, bool(am.group("dist")), e)
        xm = _AGG_EXPR_RE.match(txt)
        if xm:
            e, _ = _compile_scalar(
                _parse_scalar_expr(xm.group("inner").strip()),
                df, aliases, rel_alias, lits or [], params,
            )
            return _build_agg(xm.group("fn").lower(), bool(xm.group("dist")), e)
        raise CypherUnsupported(f"unsupported aggregate call: {txt!r}")

    # grouping-key references inside composite items: Neo4j allows
    # `RETURN a.x, a.x + count(*)` when a.x is itself a grouping key —
    # pre-scan the plain key items so composite skeletons can rewrite
    # `alias.prop` to the key's OUTPUT column (available post-groupBy)
    key_subst: dict[str, str] = {}
    for it in returns:
        if _is_agg_item(it):
            continue
        km = _RETURN_ITEM_RE.match(it)
        if km and km.group("prop") is not None:
            out_name = km.group("out") or km.group("prop")
            key_subst[f"{km.group('alias')}.{km.group('prop')}"] = out_name

    for item in returns:
        lifted = _lift_aggregates(item)
        if lifted is not None:
            # expression OVER aggregates — `sum(a.v) / count(a)`,
            # `size(collect(x))`: each extracted call aggregates under a
            # hidden placeholder column in the SAME groupBy, then the
            # outer expression re-assembles over the aggregated frame
            # (placeholders are plain columns there) and the hidden
            # columns drop — one shuffle, identical plan to the plain
            # aggregate path
            skeleton, calls, out = lifted
            name = out or re.sub(
                r"\s+", "",
                re.sub(r"\s+AS\s+\w+\s*$", "", item, flags=re.IGNORECASE),
            )
            for ref, key_name in key_subst.items():
                skeleton = re.sub(
                    rf"(?<![\w$]){re.escape(ref)}(?![\w$])",
                    key_name,
                    skeleton,
                )
            for i, call in enumerate(calls):
                g = f"_lift{len(lift_names)}"
                skeleton = re.sub(rf"\b_agg{i}\b", g, skeleton)
                aggs.append(_sub_agg(call.strip()).alias(g))
                lift_names.append(g)
            post_exprs.append((skeleton, name))
            name_map[name] = name
            name_map[
                re.sub(r"\s+", "", re.sub(r"\s+AS\s+\w+\s*$", "", item, flags=re.IGNORECASE))
            ] = name
            continue
        qm = _PERCENTILE_RE.match(item)
        if qm:
            # percentileCont(expr, p) — Cypher's continuous (linear
            # interpolation) percentile maps exactly onto Spark's exact
            # `percentile` aggregate. percentileDisc(expr, p) is Neo4j's
            # NEAREST-RANK discrete percentile: the value at 1-based
            # rank max(1, ceil(p·n)) of the sorted group — computed
            # EXACTLY as element_at(array_sort(collect_list(…)), rank),
            # never approximated (approx_percentile would silently
            # disagree with Neo4j). The collected group is one agg
            # buffer; fine for the grouped shapes Cypher aggregates
            # serve — a whole-corpus ungrouped percentile over 100 TB
            # wants approx_stats (c25) instead, by design.
            e, _ = _compile_scalar(
                _parse_scalar_expr(qm.group("inner").strip()),
                df,
                aliases,
                rel_alias,
                lits or [],
                params,
            )
            p = float(qm.group("p"))
            name = qm.group("out") or re.sub(r"\s+", "", item)
            if qm.group("fn").lower() == "percentiledisc":
                sorted_e = F.array_sort(F.collect_list(e))
                rank = F.greatest(
                    F.lit(1), F.ceil(F.size(sorted_e) * F.lit(p)).cast("int")
                )
                aggs.append(F.element_at(sorted_e, rank).alias(name))
            else:
                aggs.append(F.percentile(e, p).alias(name))
            name_map[name] = name
            name_map[
                re.sub(r"\s+", "", re.sub(r"\s+AS\s+\w+\s*$", "", item, flags=re.IGNORECASE))
            ] = name
            continue
        am = _AGG_ITEM_RE.match(item)
        xm = None if am else _AGG_EXPR_RE.match(item)
        if am:
            fn = am.group("fn").lower()
            name = am.group("out") or re.sub(r"\s+", "", item)
            if am.group("star"):
                if fn != "count":
                    raise CypherUnsupported(f"{fn}(*) is not Cypher")
                agg = F.count(F.lit(1))
            else:
                e = _source(am.group("alias"), am.group("prop"), fn)
                agg = _build_agg(fn, bool(am.group("dist")), e)
            aggs.append(agg.alias(name))
            name_map[name] = name
            # the whitespace-normalized item text resolves ORDER BY
            # expressions that repeat the aggregate (ORDER BY count(*))
            name_map[
                re.sub(r"\s+", "", re.sub(r"\s+AS\s+\w+\s*$", "", item, flags=re.IGNORECASE))
            ] = name
        elif xm:
            # aggregate over a scalar expression: the inner text compiles
            # through the expression Column compiler, the aggregate wraps it
            fn = xm.group("fn").lower()
            name = xm.group("out") or re.sub(r"\s+", "", item)
            e, _ = _compile_scalar(
                _parse_scalar_expr(xm.group("inner").strip()),
                df,
                aliases,
                rel_alias,
                lits or [],
                params,
            )
            agg = _build_agg(fn, bool(xm.group("dist")), e)
            aggs.append(agg.alias(name))
            name_map[name] = name
            name_map[
                re.sub(r"\s+", "", re.sub(r"\s+AS\s+\w+\s*$", "", item, flags=re.IGNORECASE))
            ] = name
        else:
            m = _RETURN_ITEM_RE.match(item)
            if not m:
                # expression grouping key — `a.price * 2 AS bucket, count(*)`
                e, name = _compile_return_expr(
                    item, df, aliases, rel_alias, lits or [], params
                )
                keys.append(e.alias(name))
                name_map[name] = name
                name_map[
                    re.sub(r"\s+", "", re.sub(r"\s+AS\s+\w+\s*$", "", item, flags=re.IGNORECASE))
                ] = name
                continue
            alias, prop, out = m.group("alias"), m.group("prop"), m.group("out")
            if prop is None and alias in aliases:
                # whole-entity grouping key — `WITH p, count(a) AS n` /
                # `RETURN p, count(a)`: the entity groups as ONE struct
                # column (deterministic field order → a valid, stable
                # grouping key), which a post-WITH tail can open with
                # `p.key`-style field access. Neo4j groups by node
                # IDENTITY, so two parallel nodes minted by CREATE
                # ordinals (same content, different ids) must stay two
                # groups: the node-id column joins the grouping key as a
                # HIDDEN column (it functionally determines the struct,
                # so (id, struct) groups exactly by identity) and is
                # dropped after the agg so the visible schema is unchanged
                name = out or alias
                prefix = aliases[alias]
                e = (
                    _entity_struct(df, prefix, name)
                    if prefix
                    else _node_entity(df, name)
                )
                id_col = f"{prefix}{NODE_ID}" if prefix else NODE_ID
                if id_col in df.columns:
                    hid = f"_gid_{name}"
                    keys.append(F.col(id_col).alias(hid))
                    hidden_keys.append(hid)
                keys.append(e)
                name_map[name] = name
                continue
            e = _source(alias, prop)
            name = out or prop or alias
            keys.append(e.alias(name))
            name_map[name] = name
            if prop is not None:
                name_map[f"{alias}.{prop}"] = name
    grouped = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
    if hidden_keys:
        grouped = grouped.drop(*hidden_keys)
    if post_exprs:
        # re-assemble composite items over the aggregated frame: the
        # lifted placeholders are plain columns now, so the outer
        # expression compiles through the ordinary scalar compiler;
        # the hidden aggregate columns drop afterwards
        for skeleton, name in post_exprs:
            e, _ = _compile_scalar(
                _parse_scalar_expr(skeleton), grouped, {}, None,
                lits or [], params,
            )
            grouped = grouped.withColumn(name, e)
        grouped = grouped.drop(*lift_names)
    if order_by:
        sorts = []
        for key, desc in order_by:
            if key.startswith("\x02"):
                # raw ORDER BY expression from the read path: in an
                # aggregating RETURN it must textually repeat a RETURN
                # item (ORDER BY count(*) DESC) — resolve through the
                # whitespace-normalized item text, and refuse with the
                # user's own expression, never the internal sentinel
                raw = key[1:].strip()
                key = re.sub(r"\s+", "", raw)
                if key not in name_map:
                    raise CypherUnsupported(
                        f"ORDER BY expression {raw!r} must repeat a RETURN "
                        "item of the aggregating RETURN (or use its alias)"
                    )
            if key not in name_map:
                raise CypherUnsupported(
                    f"ORDER BY key {key!r} is not a RETURN name or grouped alias.prop"
                )
            c = F.col(name_map[key])
            sorts.append(c.desc_nulls_first() if desc else c.asc_nulls_last())
        grouped = grouped.orderBy(*sorts)
    return _page(grouped, skip, limit)


def _node_entity(df: DataFrame, out: str):
    cols = [c for c in df.columns if c != NODE_ID]
    return F.struct(*[F.col(c) for c in cols]).alias(out)


def run_cypher_script(
    spark: SparkSession,
    script: str,
    params: dict | DataFrame | None = None,
    graph: Graph | None = None,
    store: GraphStore | None = None,
) -> list[CypherResult]:
    """Execute a ``;``-separated statement script — the shape the
    reference ships as a file (/root/reference/cypher.txt:4-8 holds two
    statements). Statements run sequentially against the same store, so
    later reads see earlier writes; string literals are masked before
    splitting, so quoted semicolons don't split. Returns one
    :class:`CypherResult` per non-empty statement, in order.
    """
    masked, lits = _mask_strings(script)

    def _unmask(text: str) -> str:
        return re.sub(
            r"\x00(\d+)\x00", lambda m: f"'{lits[int(m.group(1))]}'", text
        )

    results: list[CypherResult] = []
    for stmt in masked.split(";"):
        if not stmt.strip():
            continue
        results.append(
            run_cypher(spark, _unmask(stmt), params, graph=graph, store=store)
        )
    return results
