"""Byte-identity goldens for the extractor (SURVEY.md section 5.2-1).

Every expected value is a pinned literal derived by hand-tracing the cited Go
reference code (extractor.go / fetcher.go) and the reference's own test
goldens (extractor_test.go, fetcher_test.go:180).
"""

from datetime import datetime, timezone

from webcrawler_spark.extract.extractor import (
    extract_page,
    gate_and_extract,
    parse_rfc3339,
)
from webcrawler_spark.functions.textnorm import normalize_text


# --- reference's own test documents -------------------------------------

REF_FULL_PAGE = """<html lang="en">
\t\t\t<head>
\t\t\t\t<title>Test Page</title>
\t\t\t\t<base href="https://example.com/"/>
\t\t\t\t<meta charset="UTF-8">
\t\t\t\t<meta name="description" content="A simple test page">
\t\t\t</head>
\t\t\t<body>
\t\t\t\t<p>Some visible text.</p>
\t\t\t\t<a href="/internal">Internal Link</a>
\t\t\t\t<a href="http://external.com/page">External Link</a>
\t\t\t\t<a href="https://facebook.com/profile">Facebook Link</a>
\t\t\t\t<img alt="Image Alt Text" src="image.jpg"/>
\t\t\t\t<h1>Heading 1</h1>
\t\t\t\t<script type="application/ld+json">
\t\t\t\t\t{"@context": "https://schema.org", "@type": "WebPage"}
\t\t\t\t</script>
\t\t\t</body>
\t\t</html>"""


def test_ref_full_page():
    """extractor_test.go:26-50 + the FIXTURES.md ex-basic golden text."""
    pd = extract_page(REF_FULL_PAGE, "https://example.com")
    assert pd.fetch_error == ""
    assert pd.title == "Test Page"
    assert pd.language == "en"
    assert pd.is_secure is True
    assert pd.internal_links == ["https://example.com/internal"]
    assert pd.external_links == [
        "http://external.com/page",
        "https://facebook.com/profile",
    ]
    assert pd.social_links == ["https://facebook.com/profile"]
    assert pd.headings == {"h1": ["Heading 1"]}
    assert pd.alt_texts == ["Image Alt Text"]
    assert len(pd.structured_data) == 1
    assert '"@type": "WebPage"' in pd.structured_data[0]
    assert pd.charset == "UTF-8"
    assert pd.meta_description == "A simple test page"
    assert pd.anchor_texts == ["Internal Link", "External Link", "Facebook Link"]
    # ex-basic golden (FIXTURES.md section 1a): title text IS included,
    # JSON-LD script text is NOT.
    assert pd.visible_text == (
        "Test Page Some visible text. Internal Link External Link "
        "Facebook Link Heading 1"
    )


def test_ref_fetch_golden():
    """fetcher_test.go:156-183: VisibleText == 'Test Fetch Hello Fetch'."""
    html = (
        "<html lang='en'><head><title>Test Fetch</title></head>"
        "<body><p>Hello Fetch</p></body></html>"
    )
    pd = extract_page(html, "http://example.com")
    assert pd.visible_text == "Test Fetch Hello Fetch"
    assert pd.is_secure is False


def test_non_english_rejected():
    html = "<html lang=\"es\"><head><title>Test Page</title></head><body><p>Hola</p></body></html>"
    pd = extract_page(html, "https://example.com")
    assert pd.fetch_error == "non-English content"


def test_lang_regional_variant_passes():
    pd = extract_page("<html lang='en-GB'><body>hi</body></html>", "https://e.com")
    assert pd.fetch_error == ""
    assert pd.language == "en-GB"


def test_lang_missing_passes_and_defaults():
    pd = extract_page("<html><body>hi</body></html>", "https://e.com")
    assert pd.fetch_error == ""
    assert pd.language == "unspecified"  # extractor.go:174-175


def test_no_html_element_defaults_unspecified():
    pd = extract_page("<body>hi</body>", "https://e.com")
    assert pd.fetch_error == ""
    assert pd.language == "unspecified"  # implied <html> in x/net/html


def test_title_filter_all_terms():
    """extractor.go:23 — ci substring, any of the 6 terms kills the page."""
    for term in ("xxx", "Porn", "SEX", "OnlyFans", "gore", "Hentai"):
        html = f"<html lang='en'><head><title>My {term} Site</title></head><body>x</body></html>"
        pd = extract_page(html, "https://e.com")
        assert pd.fetch_error.startswith("title contains filtered term"), term
    # substring semantics: 'Sussex' contains 'sex'
    pd = extract_page(
        "<html lang='en'><head><title>Sussex History</title></head><body>x</body></html>",
        "https://e.com",
    )
    assert pd.fetch_error != ""


def test_skip_parents_immediate_only():
    """extractor.go:125-138: only the immediate parent is checked."""
    html = (
        "<html lang='en'><body>"
        "<script>var x = 1;</script>"
        "<style>.a{color:red}</style>"
        "<noscript>no js</noscript>"
        "<template>tpl text</template>"
        "<div>kept</div>"
        "</body></html>"
    )
    pd = extract_page(html, "https://e.com")
    assert pd.visible_text == "kept"


def test_base_tag_rebases_and_flips_is_secure():
    """extractor.go:40-46 (ex-base-flip): base rebases link resolution and
    IsSecure is computed on the REBASED scheme."""
    html = (
        "<html lang='en'><head><base href='http://other.example/'></head>"
        "<body><a href='/p'>L</a>body text</body></html>"
    )
    pd = extract_page(html, "https://example.com")
    assert pd.is_secure is False
    # base host changed => /p resolves against other.example => internal
    assert pd.internal_links == ["http://other.example/p"]
    assert pd.visible_text == "L body text"


def test_entities_decoded():
    html = "<html lang='en'><body>a &amp; b &lt;c&gt; &#65;</body></html>"
    pd = extract_page(html, "https://e.com")
    assert pd.visible_text == "a & b <c> A"


def test_comment_is_text_node_barrier():
    """x/net/html: comment nodes split adjacent text => two buffer writes."""
    pd = extract_page("<html lang='en'><body>a<!--x-->b</body></html>", "https://e.com")
    assert pd.visible_text == "a b"


def test_64k_line_rule():
    long_line = "y" * 70_000
    html = f"<html lang='en'><body><pre>before\n{long_line}\nafter</pre></body></html>"
    pd = extract_page(html, "https://e.com")
    assert pd.visible_text == "before"


def test_64k_whole_page_truncation():
    body = "z" * 70_000
    html = f"<html lang='en'><body>{body}</body></html>"
    pd = extract_page(html, "https://e.com")
    # buffer is '<70k chars> ' with no newline: final segment > 64 KiB => ""
    assert pd.visible_text == ""


def test_go_whitespace_collapse():
    """ex-ws: Go space class collapsed; U+001C-U+001F are NOT whitespace."""
    html = (
        "<html lang='en'><body>a\t b cd\x1ce</body></html>"
    )
    pd = extract_page(html, "https://e.com")
    assert pd.visible_text == "a b c d\x1ce"


def test_meta_precedence_and_opengraph():
    html = (
        "<html lang='en'><head>"
        "<meta http-equiv='Content-Type' content='text/html; charset=iso-8859-1'>"
        "<meta property='og:title' content='OG Title'>"
        "<meta property='og:image' content='http://e.com/i.png'>"
        "<meta name='description' content='desc here'>"
        "</head><body>x</body></html>"
    )
    pd = extract_page(html, "https://e.com")
    assert pd.charset == "iso-8859-1"
    assert pd.open_graph == {
        "og:title": "OG Title",
        "og:image": "http://e.com/i.png",
    }
    assert pd.meta_description == "desc here"


def test_charset_meta_wins_over_later():
    # each meta sets at most one field; later charset meta overwrites
    html = (
        "<html lang='en'><head>"
        "<meta charset='utf-8'>"
        "<meta http-equiv='content-type' content='text/html; charset=latin1'>"
        "</head><body>x</body></html>"
    )
    pd = extract_page(html, "https://e.com")
    assert pd.charset == "latin1"  # last assignment wins (two metas both match)


def test_timestamps_rfc3339_strict():
    html = (
        "<html lang='en'><head>"
        "<meta property='article:published_time' content='2024-03-05T10:20:30Z'>"
        "<meta property='article:modified_time' content='March 5 2024'>"
        "</head><body>x</body></html>"
    )
    pd = extract_page(html, "https://e.com")
    assert pd.date_published == datetime(2024, 3, 5, 10, 20, 30, tzinfo=timezone.utc)
    assert pd.date_modified is None  # non-RFC3339 ignored (extractor.go:246-251)


def test_parse_rfc3339_cases():
    assert parse_rfc3339("2024-01-02T03:04:05+02:00") == datetime(
        2024, 1, 2, 1, 4, 5, tzinfo=timezone.utc
    )
    assert parse_rfc3339("2024-01-02T03:04:05.123456Z") == datetime(
        2024, 1, 2, 3, 4, 5, 123456, tzinfo=timezone.utc
    )
    for bad in (
        "2024-01-02 03:04:05Z",  # space separator
        "2024-01-02T03:04Z",  # no seconds
        "2024-13-02T03:04:05Z",  # bad month
        "2024-01-02T03:04:05",  # no offset
        "24-01-02T03:04:05Z",  # 2-digit year
    ):
        assert parse_rfc3339(bad) is None, bad


def test_canonical_link():
    html = (
        "<html lang='en'><head>"
        "<link rel='canonical' href='/canon'>"
        "</head><body>x</body></html>"
    )
    pd = extract_page(html, "https://e.com/page?q=1")
    assert pd.canonical_url == "https://e.com/canon"


def test_social_links_no_www_stripping():
    """filterSocialLinks uses Hostname() exact match — www.facebook.com is
    NOT in the allowlist (extractor.go:16-22,296-300)."""
    html = (
        "<html lang='en'><body>"
        "<a href='https://www.facebook.com/x'>a</a>"
        "<a href='https://twitter.com/y'>b</a>"
        "</body></html>"
    )
    pd = extract_page(html, "https://e.com")
    assert pd.social_links == ["https://twitter.com/y"]
    assert len(pd.external_links) == 2


def test_internal_external_host_with_port():
    """resolved.Host == base.Host includes the port (extractor.go:278)."""
    html = (
        "<html lang='en'><body>"
        "<a href='https://e.com:8080/a'>a</a>"
        "<a href='https://e.com/b'>b</a>"
        "</body></html>"
    )
    pd = extract_page(html, "https://e.com:8080")
    assert pd.internal_links == ["https://e.com:8080/a"]
    assert pd.external_links == ["https://e.com/b"]


def test_non_http_links_skipped():
    html = (
        "<html lang='en'><body>"
        "<a href='mailto:a@b.c'>m</a>"
        "<a href='javascript:void(0)'>j</a>"
        "<a href='ftp://x.com/f'>f</a>"
        "<a href='https://ok.com/'>k</a>"
        "</body></html>"
    )
    pd = extract_page(html, "https://e.com")
    assert pd.internal_links == []
    assert pd.external_links == ["https://ok.com/"]
    # anchor text recorded only for links that pass the scheme gate
    assert pd.anchor_texts == ["k"]


def test_headings_collect_by_level():
    html = (
        "<html lang='en'><body><h1>A</h1><h2>B1</h2><h2>B2</h2>"
        "<h3> C </h3></body></html>"
    )
    pd = extract_page(html, "https://e.com")
    assert pd.headings == {"h1": ["A"], "h2": ["B1", "B2"], "h3": ["C"]}


def test_title_rcdata_tags_literal():
    """<title> is RCDATA: tags inside stay literal text, entities decode."""
    html = "<html lang='en'><head><title>a &amp; <b>c</title></head><body>t</body></html>"
    pd = extract_page(html, "https://e.com")
    assert pd.title == "a & <b>c"


def test_utf8_gate_and_truncation():
    bad = "<html lang='en'><body>ok</body></html>".encode() + b"\xff\xfe"
    pd = gate_and_extract(bad, "e.com")
    assert pd.fetch_error == "invalid UTF-8 content"
    assert pd.url == "https://e.com"  # BuildFullUrl prepends scheme


def test_gate_truncates_at_2mib():
    # page whose closing tags fall beyond the 2 MiB cut: the parse sees
    # the truncated bytes (fetcher.go:159-169 semantics)
    filler = "f" * (2 * 1024 * 1024)
    html = ("<html lang='en'><body><p>head text</p>" + filler + "<p>tail</p></body></html>").encode()
    pd = gate_and_extract(html, "https://e.com")
    assert pd.fetch_error == ""
    assert "tail" not in pd.visible_text
    # the 2 MiB filler text node contains no newline, so the whole
    # accumulated buffer is one >64 KiB line: Go's scanner drops everything
    assert pd.visible_text == ""


def test_normalize_text_ref_golden():
    """extractor_test.go:140-147."""
    assert normalize_text("  This  is \n a   test \n") == "This is a test"


def test_multiple_img_alts_and_empty_skipped():
    html = (
        "<html lang='en'><body>"
        "<img alt='one'><img alt=''><img src='x.png'><img alt='two'>"
        "</body></html>"
    )
    pd = extract_page(html, "https://e.com")
    assert pd.alt_texts == ["one", "two"]


def test_json_ld_only_matching_type():
    html = (
        "<html lang='en'><body>"
        "<script type='text/javascript'>var a;</script>"
        "<script type='application/ld+json'>{\"a\":1}</script>"
        "<script type='APPLICATION/LD+JSON'>{\"b\":2}</script>"
        "</body></html>"
    )
    pd = extract_page(html, "https://e.com")
    assert pd.structured_data == ['{"a":1}', '{"b":2}']


def test_base_tag_head_reversal_quirk():
    """findBaseTag (extractor.go:433-437) pushes <head> children in document
    order onto the stack, so they pop in REVERSE: with two base tags in
    head, the LAST one wins (unlike the HTML5 'first wins' rule the comment
    claims). Faithfully preserved."""
    html = (
        "<html lang='en'><head>"
        "<base href='http://first.example/'>"
        "<base href='http://second.example/'>"
        "</head><body><a href='/x'>L</a></body></html>"
    )
    pd = extract_page(html, "https://orig.example")
    # the rebased base IS second.example, so /x is INTERNAL to it
    assert pd.internal_links == ["http://second.example/x"]
    assert pd.external_links == []


def test_base_tag_outside_head_found_by_dfs():
    html = (
        "<html lang='en'><body>"
        "<base href='http://inbody.example/'>"
        "<a href='/y'>L</a></body></html>"
    )
    pd = extract_page(html, "https://orig.example")
    assert pd.internal_links == ["http://inbody.example/y"]


def test_base_without_href_terminates_search():
    """First base element encountered wins even with no href: search stops,
    base URL unchanged (extractor.go:429)."""
    html = (
        "<html lang='en'><head>"
        "<base target='_blank'>"
        "<base href='http://later.example/'>"
        "</head><body><a href='/z'>L</a></body></html>"
    )
    pd = extract_page(html, "https://orig.example")
    # head reversal: the LAST base (with href) pops FIRST => it wins here
    assert pd.internal_links == ["http://later.example/z"]


def test_multiple_titles_each_checked():
    """Each <title> visit overwrites Title and re-checks the filter."""
    html = (
        "<html lang='en'><head><title>Fine Title</title></head>"
        "<body><svg><title>porn</title></svg>x</body></html>"
    )
    pd = extract_page(html, "https://e.com")
    assert pd.fetch_error.startswith("title contains filtered term")


def test_heading_with_nested_markup():
    html = (
        "<html lang='en'><body><h1>Big <em>bold</em> move</h1></body></html>"
    )
    pd = extract_page(html, "https://e.com")
    assert pd.headings == {"h1": ["Big bold move"]}
    assert pd.visible_text == "Big bold move"
