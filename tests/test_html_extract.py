"""X155 HTML/boilerplate extraction (VERDICT r11 ask #2): byte-exact
planted fixtures for the stdlib-parser extractor — the
``docs_compression`` convention — plus the Spark ``mapInPandas``
plumbing (schema, null handling, id-dtype preservation)."""

from __future__ import annotations

from graph_loom_spark.ops import html as ops_html

NASTY = (
    '<html><head><title>Skip me</title>'
    '<script>var x = "<div>not text</div>";</script>\n'
    "<style>p { color: red }</style></head>\n"
    "<body>\n"
    "<h1>Hello &amp; <b>World</b></h1>\n"
    "<!-- <p>ghost</p> -->\n"
    "<p>First   paragraph\nspans lines &#65;&lt;ok&gt;</p>\n"
    "<p>Unclosed paragraph\n"
    '<div class="nav" title="a > b"><a href="/">Home</a> '
    '<a href="/about">About</a></div>\n'
    '<p>mixed <a href="x">link text</a> and plenty of ordinary words here</p>\n'
    "</body></html>"
)

EXPECTED_TEXT = (
    "Hello & World\n"
    "First paragraph spans lines A<ok>\n"
    "Unclosed paragraph\n"
    "mixed link text and plenty of ordinary words here"
)


def test_extract_blocks_nasty_fixture_byte_exact():
    """Script/style/comment/title content never leaks (even when it
    contains markup); entities decode; inline tags don't split blocks;
    an unclosed <p> is terminated by the next block tag; a quoted
    attribute containing '>' doesn't break the parse; the all-link nav
    div is flagged boilerplate."""
    blocks, n_links = ops_html.extract_blocks(NASTY)
    assert n_links == 3
    assert [b[0] for b in blocks] == [
        "Hello & World",
        "First paragraph spans lines A<ok>",
        "Unclosed paragraph",
        "Home About",
        "mixed link text and plenty of ordinary words here",
    ]
    assert [b[3] for b in blocks] == [False, False, False, True, False]
    # nav block: 9 nonspace chars, all anchor text
    assert blocks[3][1] == 9 and blocks[3][2] == 9
    # mixed block: "linktext" = 8 anchor chars of 41 nonspace
    assert blocks[4][1] == 41 and blocks[4][2] == 8
    kept = "\n".join(b[0] for b in blocks if not b[3])
    assert kept == EXPECTED_TEXT


def test_extract_blocks_link_density_strictly_greater():
    """A 50/50 block survives at the 0.5 default (strict >); a
    majority-anchor block does not; <br/> is a block boundary and a
    self-closing <a/> still counts as a link."""
    blocks, n_links = ops_html.extract_blocks(
        "<p>ab <a>cd</a></p><p>a <a>bc</a></p><p>one<br/>two<a/></p>"
    )
    assert [(b[0], b[3]) for b in blocks] == [
        ("ab cd", False),   # 2/4 anchor → not > 0.5
        ("a bc", True),     # 2/3 anchor → boiler
        ("one", False),
        ("two", False),
    ]
    assert n_links == 3


def test_extract_blocks_degenerate_inputs():
    assert ops_html.extract_blocks("") == ([], 0)
    assert ops_html.extract_blocks("<html><body></body></html>") == ([], 0)
    # bare text with no markup at all is one block
    blocks, n = ops_html.extract_blocks("just words")
    assert blocks == [("just words", 9, 0, False)] and n == 0


def test_html_extract_spark_plumbing(spark):
    """The mapInPandas wrapper: null html → empty row (never dropped),
    id column keeps its input dtype (string here), stats match the
    pure-python extractor."""
    df = spark.createDataFrame(
        [("a", NASTY), ("b", None), ("c", "<p><a>x</a></p>")],
        "doc_id string, html string",
    )
    out = ops_html.html_extract(df)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_blocks", "n_boiler_blocks", "n_links", "text_chars", "text",
    ]
    assert dict(out.dtypes)["doc_id"] == "string"
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {"a", "b", "c"}
    ra = rows["a"]
    assert (ra["n_blocks"], ra["n_boiler_blocks"], ra["n_links"]) == (5, 1, 3)
    assert ra["text"] == EXPECTED_TEXT
    assert ra["text_chars"] == len(EXPECTED_TEXT)
    assert (rows["b"]["n_blocks"], rows["b"]["text"]) == (0, "")
    # doc c: single all-anchor block → everything boilerplate
    assert (rows["c"]["n_blocks"], rows["c"]["n_boiler_blocks"]) == (1, 1)
    assert rows["c"]["text"] == ""


def test_html_links_fixture_records():
    """X157: link records in document order — href from the attribute
    (NULL when absent), anchor text collapsed and entity-decoded;
    nested <a> follows the browser rule (outer link implicitly
    closed); a block boundary ends an open link; self-closing <a/>
    yields an empty anchor."""
    blocks, n = ops_html.extract_blocks(NASTY)  # parser sanity reuse
    p = ops_html._BlockExtractor()
    p.feed(NASTY)
    p.close()
    assert p.links == [
        ("/", "Home"),
        ("/about", "About"),
        ("x", "link text"),
    ]
    p2 = ops_html._BlockExtractor()
    p2.feed(
        '<p><a href="/o">out <a href="/i">in&amp;er</a> tail</p>'
        "<a>no href</a><a/>"
    )
    p2.close()
    assert p2.links == [
        ("/o", "out"),          # implicitly closed by the nested <a>
        ("/i", "in&er"),        # entity decoded
        (None, "no href"),
        (None, ""),             # self-closing
    ]
    # the </p> block boundary closed "/i" before "tail": tail is block
    # text but not anchor text
    assert p2.n_links == 4


def test_html_links_spark_plumbing(spark):
    """mapInPandas wrapper: per-doc 1-based positions, linkless docs
    produce no rows, id dtype preserved."""
    df = spark.createDataFrame(
        [
            (1, '<p><a href="/a">A</a> mid <a>B</a></p>'),
            (2, "<p>no links at all</p>"),
            (3, None),
        ],
        "doc_id long, html string",
    )
    out = ops_html.html_links(df)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "link_pos", "href", "anchor_text",
    ]
    rows = sorted(map(tuple, out.collect()))
    assert rows == [(1, 1, "/a", "A"), (1, 2, None, "B")]


def test_unclosed_anchor_does_not_bleed_into_later_blocks():
    """Real-crawl hazard: an <a> never explicitly closed must end at
    the next block boundary — later blocks carry NO anchor chars, so a
    document full of real content isn't flagged 100%-link boilerplate."""
    blocks, n = ops_html.extract_blocks(
        '<p><a href="/x">click<p>Real article paragraph with plenty of '
        "ordinary words</p>"
    )
    assert [(b[0], b[3]) for b in blocks] == [
        ("click", True),   # the all-anchor stub is boiler
        ("Real article paragraph with plenty of ordinary words", False),
    ]
    assert blocks[1][2] == 0  # zero anchor chars bled through
    p = ops_html._BlockExtractor()
    p.feed('<p><a href="/x">click<p>tail</p>')
    p.close()
    assert p.links == [("/x", "click")]  # link closed at the boundary


def test_skip_region_markup_is_dropped_wholesale():
    """An <a> inside <noscript> must not emit a link record or count
    toward n_links, and a <div> there must not split the enclosing
    block — only handle_data used to honor the skip depth."""
    html = (
        '<p>Hello <noscript><a href="/x">enable js</a><div>x</div>'
        "</noscript> world</p>"
    )
    blocks, n_links = ops_html.extract_blocks(html)
    assert [b[0] for b in blocks] == ["Hello world"]
    assert n_links == 0
    p = ops_html._BlockExtractor()
    p.feed(html)
    p.close()
    assert p.links == []


def test_html5_ascii_whitespace_only():
    """Whitespace collapsing uses the HTML5 ASCII set (space/tab/LF/FF/
    CR) — exactly RE2's \\s, so the SQL oracle replay agrees on
    non-ASCII text: U+00A0 and \\x0b are CONTENT, not whitespace."""
    blocks, _ = ops_html.extract_blocks("<p>a b</p><p>c\x0bd</p><p>e \t\n f</p>")
    assert [b[0] for b in blocks] == ["a b", "c\x0bd", "e f"]
    # nonspace counts include the non-ASCII 'whitespace' characters
    assert blocks[0][1] == 3 and blocks[1][1] == 3 and blocks[2][1] == 2
