"""HTML/boilerplate extraction — the CCNet/RefinedWeb ingest stage.

Web-scale training corpora start from raw HTML, not clean text; the
pipeline stage every curation recipe runs first is: strip markup, drop
non-content elements (``<script>``/``<style>``/comments/``<title>``),
assemble text at BLOCK granularity, and flag boilerplate blocks by
LINK DENSITY (navigation bars, footers and share widgets are mostly
anchor text — the jusText/Boilerpipe/RefinedWeb heuristic).  The corpus
surface in this repo previously started at clean text; this module
completes the ingest story the way the BMP/PNG/WAV codecs did for
media: a real, stdlib-only parser (``html.parser.HTMLParser`` — no
external dependency) behind Arrow-batched ``mapInPandas``.

Determinism contract: the extractor is a pure function of the HTML
string — fixed block-tag set, whitespace collapsed to single spaces
within a block, blocks joined by ``\\n``, entity references decoded by
the stdlib (``convert_charrefs=True``) — so planted fixtures pin it
byte-exact and a SQL oracle can replay it whenever the HTML was
generated from a known template (the registry entry does exactly
that).

Scale shape: one ``mapInPandas`` pass — a narrow per-document map, no
shuffle, no window, no driver state; the parser is O(len(html)) per
document and each Arrow batch bounds memory.  At 100 TB this is the
embarrassingly-parallel stage of the pipeline; everything downstream
(quality gate, dedup, LSH) consumes its bounded text output.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: elements whose start OR end tag terminates the current text block
#: (the HTML5 flow-content block set plus table/list internals)
BLOCK_TAGS = frozenset(
    {
        "html", "head", "body", "title",
        "p", "div", "section", "article", "header", "footer", "nav",
        "aside", "main", "blockquote", "pre", "figure", "figcaption",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "ul", "ol", "li", "dl", "dt", "dd",
        "table", "thead", "tbody", "tfoot", "tr", "td", "th",
        "form", "fieldset", "hr", "br",
    }
)

#: elements whose CONTENT is never text (dropped wholesale); <title>
#: is head metadata, not body content — RefinedWeb drops it too
NON_CONTENT_TAGS = frozenset({"script", "style", "template", "noscript", "title"})

#: HTML5 ASCII whitespace (space, tab, LF, FF, CR — the spec's
#: inter-element whitespace set), NOT Python unicode \s: this exactly
#: matches RE2's ASCII \s, so a SQL oracle replaying the collapse with
#: regexp_replace(..., '\s+', ...) agrees byte-for-byte on non-ASCII
#: text too (U+00A0 etc. are CONTENT, per spec)
_WS = " \t\n\f\r"
_WS_RE = re.compile(r"[ \t\n\f\r]+")
_NONSPACE_RE = re.compile(r"[^ \t\n\f\r]")


class _BlockExtractor(HTMLParser):
    """One-pass block-level text extractor.

    Collects ``(text, nonspace_chars, anchor_nonspace_chars)`` per
    non-empty block; counts ``<a>`` start tags.  Link density is
    measured over NON-WHITESPACE characters so it is invariant under
    the whitespace collapsing the text assembly performs.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []
        self.n_links = 0
        #: finalized ``(href, anchor_text)`` per <a>, document order;
        #: href is None when the tag has no href attribute
        self.links: list[tuple[str | None, str]] = []
        self._parts: list[str] = []
        self._anchor_nonspace = 0
        self._anchor_depth = 0
        self._skip_depth = 0
        self._open_link: list | None = None

    def _flush(self) -> None:
        raw = "".join(self._parts)
        self._parts = []
        anchor_ns = self._anchor_nonspace
        self._anchor_nonspace = 0
        text = _WS_RE.sub(" ", raw).strip(_WS)
        if not text:
            return
        ns = len(_NONSPACE_RE.findall(text))
        self.blocks.append((text, ns, anchor_ns))

    def _close_link(self) -> None:
        if self._open_link is not None:
            href, parts = self._open_link
            self.links.append(
                (href, _WS_RE.sub(" ", "".join(parts)).strip(_WS))
            )
            self._open_link = None

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in NON_CONTENT_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth > 0:
            # markup INSIDE a dropped element is dropped wholesale — an
            # <a> in <noscript> must not emit a link record and a <div>
            # there must not split the enclosing text block
            return
        if tag == "a":
            self.n_links += 1
            self._anchor_depth += 1
            # nested <a> is invalid HTML; browsers implicitly close the
            # outer link — match that
            self._close_link()
            self._open_link = [dict(attrs).get("href"), []]
        if tag in BLOCK_TAGS:
            # a block boundary ends any open link AND any anchor scope:
            # an UNCLOSED <a> (ubiquitous in real crawls) must not bleed
            # anchor-char accounting into every following block, or the
            # rest of the document reads as 100%-link boilerplate
            self._anchor_depth = 0
            self._close_link()
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        # self-closing (<br/>, <hr/>): block boundary, but never opens
        # a skip/anchor scope
        if self._skip_depth > 0:
            return
        if tag == "a":
            self.n_links += 1
            self._close_link()
            self.links.append((dict(attrs).get("href"), ""))
        if tag in BLOCK_TAGS:
            self._anchor_depth = 0
            self._close_link()
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in NON_CONTENT_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth > 0:
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
            self._close_link()
        if tag in BLOCK_TAGS:
            self._anchor_depth = 0
            self._close_link()
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth > 0:
            return
        self._parts.append(data)
        if self._anchor_depth > 0:
            self._anchor_nonspace += len(_NONSPACE_RE.findall(data))
            if self._open_link is not None:
                self._open_link[1].append(data)

    # comments (incl. ones containing markup) are never content
    def handle_comment(self, data: str) -> None:  # noqa: D102
        return

    def close(self) -> None:
        super().close()
        self._close_link()
        self._flush()


def extract_blocks(html: str, boiler_link_density: float = 0.5):
    """Parse one HTML string → ``(blocks, n_links)`` where each block
    is ``(text, nonspace, anchor_nonspace, is_boiler)``.  A block is
    boilerplate when anchor characters exceed ``boiler_link_density``
    of its non-whitespace characters (strictly greater — a 50/50 block
    survives at the 0.5 default)."""
    p = _BlockExtractor()
    p.feed(html)
    p.close()
    out = []
    for text, ns, ans in p.blocks:
        is_boiler = ns > 0 and (float(ans) / float(ns)) > boiler_link_density
        out.append((text, ns, ans, is_boiler))
    return out, p.n_links


def html_links(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Extract the LINK RECORDS from an HTML column — the other half of
    the web-ingest stage (a CommonCrawl WAT extraction): one row per
    ``<a>`` tag in document order,

    ``(id_col, link_pos, href, anchor_text)``

    with ``link_pos`` 1-based, ``href`` NULL when the tag has no href
    attribute, and ``anchor_text`` the whitespace-collapsed text inside
    the tag (entities decoded; ``""`` for self-closing/empty anchors).
    Nested ``<a>`` follows the browser rule (the outer link is
    implicitly closed); a block boundary ends an open link.  Documents
    with no links produce no rows.  This is the edge-list feed for a
    web link graph — downstream ``groupBy(href)`` / graph analytics
    consume it directly.

    Scale shape: the same one-pass Arrow-batched ``mapInPandas`` as
    :func:`html_extract` — no shuffle, no window; output cardinality is
    the corpus link count with narrow rows.
    """
    id_field = docs.schema[id_col]
    schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType, id_field.nullable),
            T.StructField("link_pos", T.LongType(), False),
            T.StructField("href", T.StringType(), True),
            T.StructField("anchor_text", T.StringType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, html in zip(pdf[id_col], pdf[html_col]):
                p = _BlockExtractor()
                p.feed(html if isinstance(html, str) else "")
                p.close()
                for i, (href, anchor) in enumerate(p.links):
                    rows.append((did, i + 1, href, anchor))
            yield pd.DataFrame(
                rows, columns=[id_col, "link_pos", "href", "anchor_text"]
            )

    return docs.select(id_col, html_col).mapInPandas(run, schema)


HTML_EXTRACT_FIELDS = [
    T.StructField("n_blocks", T.LongType(), False),
    T.StructField("n_boiler_blocks", T.LongType(), False),
    T.StructField("n_links", T.LongType(), False),
    T.StructField("text_chars", T.LongType(), False),
    T.StructField("text", T.StringType(), False),
]


def html_extract(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    boiler_link_density: float = 0.5,
) -> DataFrame:
    """Extract clean text from an HTML column — tag strip, script/
    style/comment/title drop, block-level assembly, link-density
    boilerplate removal.  Returns one row per input row:

    ``(id_col, n_blocks, n_boiler_blocks, n_links, text_chars, text)``

    where ``text`` is the non-boilerplate blocks joined by ``\\n`` (and
    ``""`` for empty/markup-only documents — rows are never dropped),
    ``n_blocks`` counts non-empty blocks BEFORE the boilerplate filter,
    and ``text_chars = length(text)``.  The id column keeps its input
    type.  NULL html extracts as the empty document.

    Scale shape: one Arrow-batched ``mapInPandas`` over ``(id, html)``
    only (column-pruned scan — the other input columns never reach
    Python); no shuffle, no window; output is input-cardinality with
    bounded-width rows.  Pure Python per batch, O(len(html)) per doc.
    """
    id_field = docs.schema[id_col]
    schema = T.StructType(
        [T.StructField(id_col, id_field.dataType, id_field.nullable)]
        + HTML_EXTRACT_FIELDS
    )
    thr = float(boiler_link_density)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, html in zip(pdf[id_col], pdf[html_col]):
                blocks, n_links = extract_blocks(
                    html if isinstance(html, str) else "", thr
                )
                kept = [b[0] for b in blocks if not b[3]]
                text = "\n".join(kept)
                rows.append(
                    (
                        did,
                        len(blocks),
                        sum(1 for b in blocks if b[3]),
                        n_links,
                        len(text),
                        text,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "n_blocks",
                    "n_boiler_blocks",
                    "n_links",
                    "text_chars",
                    "text",
                ],
            )

    return docs.select(id_col, html_col).mapInPandas(run, schema)
