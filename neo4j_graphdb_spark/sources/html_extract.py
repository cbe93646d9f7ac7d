"""HTML parse + field extraction (SURVEY.md §2 B3/B4) with per-record
error isolation (B9) and a quarantine sink (B10).

Re-expresses the reference's SERP scraping transform
(``/root/reference/src/crwling.py:136-199``) as a Spark stage over a
DataFrame of raw HTML documents — the engine's contract starts at
"DataFrame of HTML", the live crawling itself stays outside (B1/B2 are a
source concern; see :func:`paginated_param_table` for the page-parameter
generator that drives a fetcher).

Selector semantics preserved from the reference:

* candidates: every ``div[data-ved]`` (``:138``), fallback
  ``div#rso > div`` (``:141``);
* link: first ``a[href]`` in the candidate; skip the record when absent
  or when the href contains ``google.com`` (``:146-147``);
* title: first ``div``/``h3`` with ``role="heading"`` inside the link,
  else first ``div``/``span`` (``:149-151``); skip when absent or
  shorter than 5 chars stripped (``:153``);
* publisher: candidate's first ``span`` text, default ``"Google News"``
  (``:168``);
* detail content: first match among ``#dic_area``,
  ``#articleBodyContents``, ``.se-main-container``, ``#articleBody``
  (``:77-79``), empty string when nothing matches (``:85-87``);
* per-record failures skip the record, not the run (``:177-179``);
  page-level failures produce a debug artifact (``save_debug_info``,
  ``:23-32``) — here an ``_error`` column routed to a quarantine sink.

Execution shape: the parser is Python (HTML selector logic is opaque to
SQL), so it runs as ``mapInPandas`` — Arrow-batched, zero driver-side
loops, linear in executors. The container has no bs4/lxml; the DOM is a
minimal stdlib ``html.parser`` tree implementing exactly the selector
subset above.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# minimal DOM (stdlib only)
# --------------------------------------------------------------------------

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent", "text_parts")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "_Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[_Node] = []
        self.parent = parent
        self.text_parts: list[str] = []

    # document-order descendant iteration
    def iter(self) -> Iterator["_Node"]:
        for c in self.children:
            yield c
            yield from c.iter()

    def get_text(self) -> str:
        out: list[str] = []
        self._collect_text(out)
        return "".join(out)

    def _collect_text(self, out: list[str]) -> None:
        i = 0
        # text parts recorded before/between/after children, in order
        for part in self.text_parts[: len(self.children) + 1]:
            out.append(part)
            if i < len(self.children):
                self.children[i]._collect_text(out)
                i += 1
        for c in self.children[i:]:
            c._collect_text(out)

    def find(self, tags: tuple[str, ...], **attr_filters) -> "_Node | None":
        for n in self.iter():
            if n.tag in tags and _attrs_match(n, attr_filters):
                return n
        return None

    def find_all(self, tags: tuple[str, ...], **attr_filters) -> list["_Node"]:
        return [
            n for n in self.iter() if n.tag in tags and _attrs_match(n, attr_filters)
        ]


def _attrs_match(n: _Node, filters: dict) -> bool:
    for k, v in filters.items():
        if v is True:  # attribute presence
            if k not in n.attrs:
                return False
        elif n.attrs.get(k) != v:
            return False
    return True


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("[document]", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs), self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_endtag(self, tag):
        # pop to the nearest matching open tag (tolerates misnesting)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        top = self.stack[-1]
        # record text position relative to children for in-order get_text
        while len(top.text_parts) < len(top.children):
            top.text_parts.append("")
        if len(top.text_parts) == len(top.children):
            top.text_parts.append(data)
        else:
            top.text_parts[-1] += data


def parse_html(html: str) -> _Node:
    b = _TreeBuilder()
    b.feed(html or "")
    return b.root


# --------------------------------------------------------------------------
# reference extraction logic (pure Python, runs inside mapInPandas)
# --------------------------------------------------------------------------


def _candidates(root: _Node) -> list[_Node]:
    """``div[data-ved]`` with ``div#rso > div`` fallback
    (src/crwling.py:138-141)."""
    arts = root.find_all(("div",), **{"data-ved": True})
    if not arts:
        rso = root.find(("div",), id="rso")
        if rso is not None:
            arts = [c for c in rso.children if c.tag == "div"]
    return arts


def _extract_one(art: _Node) -> dict[str, str] | None:
    """One candidate → record dict, or None when the reference would
    ``continue`` (src/crwling.py:146-153)."""
    link_tag = art.find(("a",), href=True)
    if link_tag is None or "google.com" in link_tag.attrs.get("href", ""):
        return None
    title_tag = link_tag.find(("div", "h3"), role="heading")
    if title_tag is None:
        title_tag = link_tag.find(("div", "span"))
    if title_tag is None or len(title_tag.get_text().strip()) < 5:
        return None
    span = art.find(("span",))
    return {
        "title": title_tag.get_text().strip(),
        "link": link_tag.attrs["href"],
        "publisher": span.get_text().strip() if span is not None else "Google News",
    }


_CONTENT_SELECTORS = (
    ("id", "dic_area"),
    ("id", "articleBodyContents"),
    ("class", "se-main-container"),
    ("id", "articleBody"),
)


def _extract_content_one(html: str) -> str:
    """Detail-page content: first matching selector's text, '' on any
    failure (src/crwling.py:71-87)."""
    try:
        root = parse_html(html)
        for kind, name in _CONTENT_SELECTORS:
            if kind == "id":
                el = root.find((), id=name) or _find_any_by_attr(root, "id", name)
            else:
                el = _find_by_class(root, name)
            if el is not None:
                return el.get_text()
        return ""
    except Exception:
        return ""


def _find_any_by_attr(root: _Node, attr: str, value: str) -> _Node | None:
    for n in root.iter():
        if n.attrs.get(attr) == value:
            return n
    return None


def _find_by_class(root: _Node, cls: str) -> _Node | None:
    for n in root.iter():
        if cls in (n.attrs.get("class") or "").split():
            return n
    return None


# --------------------------------------------------------------------------
# Spark stage (B3 + B9): DataFrame-of-HTML → exploded article records
# --------------------------------------------------------------------------

EXTRACT_SCHEMA = (
    "page_id string, title string, link string, publisher string, _error string"
)


def extract_articles(df: DataFrame, html_col: str = "html", id_col: str = "page_id") -> DataFrame:
    """B3 — parse each HTML page and explode its article candidates.

    Output: one row per extracted article ``(page_id, title, link,
    publisher, _error)``. A page whose parse *fails* yields exactly one
    row with ``_error`` set and null fields (B9 permissive mode — route
    it to :func:`write_quarantine`); candidates the reference would skip
    are silently dropped, exactly as its ``continue`` does.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for pid, html in zip(pdf[id_col], pdf[html_col]):
                try:
                    root = parse_html(html)
                    for art in _candidates(root):
                        try:
                            rec = _extract_one(art)
                        except Exception as inner:  # per-record isolation (:177)
                            rec = None
                            _ = inner
                        if rec is not None:
                            out.append(
                                {
                                    "page_id": str(pid),
                                    "title": rec["title"],
                                    "link": rec["link"],
                                    "publisher": rec["publisher"],
                                    "_error": None,
                                }
                            )
                except Exception as e:  # page-level failure (:181-184)
                    out.append(
                        {
                            "page_id": str(pid),
                            "title": None,
                            "link": None,
                            "publisher": None,
                            "_error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(
                out, columns=["page_id", "title", "link", "publisher", "_error"]
            )

    from neo4j_graphdb_spark.session import spread_partitions

    return spread_partitions(df.select(F.col(id_col), F.col(html_col))).mapInPandas(
        run, schema=EXTRACT_SCHEMA
    )


def extract_content(
    df: DataFrame, html_col: str = "detail_html", out_col: str = "content"
) -> DataFrame:
    """B4 — detail-page content extraction: selector coalesce over the
    four reference selectors; '' when nothing matches. Cleaning (B5) is
    applied Spark-side afterwards so it stays a JVM expression."""
    from neo4j_graphdb_spark.functions.text import clean_text

    @F.pandas_udf("string")
    def _content(html: pd.Series) -> pd.Series:
        return html.map(lambda h: _extract_content_one(h or ""))

    return df.withColumn(out_col, clean_text(_content(F.col(html_col))))


# --------------------------------------------------------------------------
# B9/B10: quarantine
# --------------------------------------------------------------------------


def quarantine_split(df: DataFrame, error_col: str = "_error") -> tuple[DataFrame, DataFrame]:
    """Split permissive-mode output into (good, quarantined)."""
    return (
        df.filter(F.col(error_col).isNull()).drop(error_col),
        df.filter(F.col(error_col).isNotNull()),
    )


def write_quarantine(bad: DataFrame, root: str) -> str:
    """B10 — the debug sink (``save_debug_info``, src/crwling.py:23-32):
    failed records land in a ``_quarantine/`` parquet dir with a batch
    timestamp column instead of timestamped filenames."""
    path = os.path.join(root, "_quarantine")
    bad.withColumn("_quarantined_at", F.current_timestamp()).write.mode(
        "append"
    ).parquet(path)
    return path


# --------------------------------------------------------------------------
# B1/B2 contract: the paginated-source parameter table
# --------------------------------------------------------------------------


def apply_status_policy(
    df: DataFrame, page_col: str = "page_num", status_col: str = "status"
) -> DataFrame:
    """B2 — the reference's HTTP status policy
    (``/root/reference/src/crwling.py:119-125``) over a DataFrame of
    fetched pages:

    * ``429`` *aborts the crawl* (the reference ``break``s): every page at
      or after the first 429 — in page order — is dropped, because the
      sequential crawler would never have fetched them;
    * any other non-200 is warned and *skipped* (the page yields no
      records but the crawl continues);
    * ``200`` pages pass through to extraction.

    Physical shape: the abort cutoff is a 1-row aggregate broadcast to
    every partition — no sort, no window, one scan of pages + one scan for
    the min. At 100 TB of fetch logs this stays a broadcast-join plan.
    """
    cutoff = df.filter(F.col(status_col) == 429).agg(
        F.min(F.col(page_col)).alias("_abort_page")
    )
    return (
        df.join(F.broadcast(cutoff))
        .filter(
            F.col("_abort_page").isNull() | (F.col(page_col) < F.col("_abort_page"))
        )
        .filter(F.col(status_col) == 200)
        .drop("_abort_page")
    )


def paginated_param_table(spark, keyword: str, pages: int) -> DataFrame:
    """B1 — the pagination parameter generator (``start = p*10 + 1``,
    src/crwling.py:110-112) as a DataFrame the fetcher maps over. The
    HTTP fetch itself belongs to the source outside the engine; its
    contract is to fill a ``html`` column and a ``status`` column, after
    which :func:`apply_status_policy` (B2, ``:119-125``) and
    :func:`extract_articles` take over."""
    return spark.range(pages).select(
        (F.col("id") + 1).alias("page_num"),
        (F.col("id") * 10 + 1).alias("start"),
        F.lit(keyword).alias("keyword"),
    )
