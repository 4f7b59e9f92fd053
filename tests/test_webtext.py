"""HTML main-content extraction tests (the web half of the extraction tier):
boilerplate strip, link-density filtering, entity round-trips, and the
mixed-corpus dispatch (pipeline.extract_any) — byte-identical per url for
BOTH payload kinds."""

from __future__ import annotations

from pyspark.sql import functions as F

from tesseract_wasm_spark.fixtures import HTML_ARTICLES, article_html, fixtures_df
from tesseract_wasm_spark.datapipe.webtext import main_content, main_content_expr
from tesseract_wasm_spark.pipeline import extract_any


def _extract_one(spark, html: str) -> str:
    df = spark.createDataFrame([("u", html)], "url string, html_text string")
    return main_content(df).collect()[0]["main_text"]


def test_boilerplate_stripped(spark):
    html = (
        "<html><head><title>T</title><script>var x=1;</script><style>p{}</style>"
        '</head><body><nav><a href="/">Home</a> <a href="/x">More</a></nav>'
        "<!-- comment -->"
        '<div>intro text here with <b>bold</b> and <a href="y">one link</a> inside</div>'
        "<p>main   paragraph two</p>"
        '<ul><li>point one</li><li><a href="z">linky</a></li></ul>'
        '<aside><a href="/ad">ad</a></aside>'
        '<footer>&copy; 2024 <a href="f">contact</a></footer></body></html>'
    )
    assert _extract_one(spark, html) == (
        "intro text here with bold and one link inside\n"
        "main paragraph two\npoint one"
    )


def test_entities_and_whitespace(spark):
    html = "<html><body><p>a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;   f</p></body></html>"
    assert _extract_one(spark, html) == 'a & b <c> "d" \'e\' f'


def test_link_density_filter(spark):
    nav_like = '<p><a href="1">one</a> <a href="2">two</a> <a href="3">three</a></p>'
    texty = "<p>this sentence is long enough that its single <a href='d'>anchor</a> stays under the density limit</p>"
    html = f"<html><body>{nav_like}{texty}</body></html>"
    out = _extract_one(spark, html)
    assert "one two three" not in out
    assert out.startswith("this sentence is long enough")


def test_article_fixtures_round_trip(spark):
    for paras in HTML_ARTICLES:
        html = article_html(paras).decode("utf-8")
        assert _extract_one(spark, html) == "\n".join(paras)


def test_extract_any_mixed_corpus_byte_identical(spark):
    """The unified dispatcher recovers ground truth per url for BOTH payload
    kinds (OCR on DRF images, webtext strip on HTML) — the north rule's
    byte-identity invariant over a mixed crawl table."""
    pages = fixtures_df(spark, n_corpus_pages=4)
    out = extract_any(pages)
    truth = pages.filter(~F.col("url").contains("/rot-")).select(
        "url", F.col("text").alias("expected")
    )
    joined = out.filter(F.col("error").isNull()).join(truth, "url")
    bad = joined.filter(F.col("text_out") != F.col("expected")).collect()
    assert bad == [], bad[:3]
    kinds = {r["kind"] for r in out.collect()}
    assert kinds == {"ocr", "html", "pdf", "image"}
    # html fixtures took the html branch, not the OCR-error path
    html_rows = out.filter(F.col("url").contains("html-")).collect()
    assert all(r["kind"] == "html" and r["error"] is None for r in html_rows)
    # FlateDecode PDFs extract through the byte-level path (never silent '')
    pdfz = {r["url"].rsplit("/", 1)[-1]: r for r in
            out.filter(F.col("url").contains("pdfz-")).collect()}
    truth_z = {r["url"].rsplit("/", 1)[-1]: r["text"] for r in
               pages.filter(F.col("url").contains("pdfz-")).collect()}
    assert set(pdfz) == set(truth_z) and len(pdfz) == 2
    for name, row in pdfz.items():
        assert row["kind"] == "pdf" and row["error"] is None
        assert row["text_out"] == truth_z[name]
    # PNG/JPEG containers: explicit error rows, same contract as media_metadata
    img = {r["url"].rsplit("/", 1)[-1]: r for r in
           out.filter(F.col("kind") == "image").collect()}
    assert img["img-png"]["error"] == "decoder not available: png"
    assert img["img-jpeg"]["error"] == "decoder not available: jpeg"
    assert all(r["text_out"] is None for r in img.values())


def test_extract_any_single_scan(spark, tmp_path):
    """The 100 TB plan invariant: extract_any reads the pages table exactly
    ONCE — the payload column is ~all the bytes, and the round-2 union plan
    re-read it once per payload-kind branch (prefix predicates can't push
    down into parquet). The fused plan must show a single parquet Scan and
    no Union."""
    path = str(tmp_path / "pages")
    fixtures_df(spark, n_corpus_pages=2).write.parquet(path)
    out = extract_any(spark.read.parquet(path))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "Union" not in plan, plan
    # and the scan projects only the columns the pass needs (url/html/lang —
    # never text/warc_ts: column pruning reached the reader)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "text" not in read_schema[0].split("ReadSchema")[1].replace("text_out", "")
    assert "warc_ts" not in read_schema[0]


def test_container_and_block_tag_breadth(spark):
    """Common-Crawl-shaped boilerplate beyond the classic six containers:
    header/form/noscript/iframe/svg/figure are stripped whole; h4-h6,
    blockquote, pre, main, dd/dt delimit blocks."""
    html = (
        "<html><head><title>t</title></head><body>"
        "<header>site chrome <a href='/'>logo</a></header>"
        "<form><input name='q'>search the archive</form>"
        "<noscript>enable javascript to continue</noscript>"
        "<iframe src='/ad'>ad frame text</iframe>"
        "<svg><text>chart label</text></svg>"
        "<figure><figcaption>figure caption text</figcaption></figure>"
        "<main><h4>deep heading</h4><blockquote>a quoted passage that is long enough</blockquote>"
        "<pre>preformatted code block</pre>"
        "<dl><dt>term</dt><dd>definition text for the term</dd></dl></main>"
        "</body></html>"
    )
    out = _extract_one(spark, html)
    for gone in ("site chrome", "search the archive", "enable javascript",
                 "ad frame text", "chart label", "figure caption"):
        assert gone not in out
    assert out.splitlines() == [
        "deep heading", "a quoted passage that is long enough",
        "preformatted code block", "term", "definition text for the term",
    ]


def test_quality_filtered_main_text(spark):
    """The per-block quality filter drops symbol-soup blocks the link-density
    heuristic keeps, and leaves real text blocks untouched."""
    from tesseract_wasm_spark.datapipe.webtext import (
        main_content,
        quality_filtered_main_text,
    )

    html = (
        "<html><body><article>"
        "<p>the quick brown fox jumps over the lazy dog in the park with the kids</p>"
        "<p>!!! ??? ... #### %% ^^</p>"
        "<p>a second real paragraph about the weather and the news of the day</p>"
        "</article></body></html>"
    )
    df = spark.createDataFrame([("u", html)], "url string, html_text string")
    # link-density alone keeps the junk block; quality drops it
    plain = main_content(df).collect()[0]["main_text"]
    assert "!!!" in plain
    out = quality_filtered_main_text(df).collect()[0]["main_text"]
    assert out == (
        "the quick brown fox jumps over the lazy dog in the park with the kids\n"
        "a second real paragraph about the weather and the news of the day"
    )
    # pure codegen: no Python node in the plan
    qdf = quality_filtered_main_text(df)
    p = qdf._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in p and "BatchEvalPython" not in p


def test_block_languages_detect_mixed_page(spark):
    """Per-block language ID catches a mixed-language page that a
    whole-document classifier would average away."""
    from tesseract_wasm_spark.datapipe.webtext import block_languages, main_content_blocks

    html = ("<html><body>"
            "<p>the cat and the dog went to the park for the day</p>"
            "<p>der hund und die katze sind nicht mit der maus</p>"
            "<p>le chat et la souris sont dans la maison pour le jour</p>"
            "</body></html>")
    df = spark.createDataFrame([("u", html)], "url string, html_text string")
    blocks = main_content_blocks(df).collect()
    assert [r["block_pos"] for r in blocks] == sorted(r["block_pos"] for r in blocks)
    assert len(blocks) == 3
    langs = {r["block_pos"]: r["pred_lang"] for r in block_languages(df).collect()}
    assert [langs[k] for k in sorted(langs)] == ["en", "de", "fr"]


def test_mixed_extraction_resume(spark, tmp_path):
    """The mixed-payload pipeline honors the same checkpoint-resume contract
    as the OCR job: anti-join on completed urls, idempotent replay."""
    from tesseract_wasm_spark.scale import run_extract_with_resume

    pages = fixtures_df(spark, n_corpus_pages=2)
    out = str(tmp_path / "mx")
    s1 = run_extract_with_resume(spark, pages, out)
    assert s1["pages"] == pages.count() and s1["resumed"] is False
    assert set(s1["kinds"]) == {"ocr", "html", "pdf", "image"}
    s2 = run_extract_with_resume(spark, pages, out)
    assert s2["pages"] == 0 and s2["resumed"] is True
    res = spark.read.parquet(f"{out}/extracted")
    assert res.count() == res.select("url").distinct().count() == pages.count()


def test_html_branch_is_pure_codegen(spark):
    """The HTML branch must stay JVM-side: no Python evaluation node in its
    executed plan."""
    pages = fixtures_df(spark, n_corpus_pages=2).filter(F.col("url").contains("html-"))
    df = pages.select(main_content_expr(F.col("html").cast("string")).alias("t"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_extract_any_dispatch_fuzz(spark):
    """Robustness fuzz for the fused dispatcher: payloads with every magic
    prefix plus truncated/garbage bodies classify exactly like the reference
    predicate and NEVER throw — a 10^12-row job must treat arbitrary bytes
    as values (errors included), not exceptions."""
    import numpy as np

    rng = np.random.default_rng(77)
    magics = [b"DRF1", b"%PDF-", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff",
              b"<html>", b"random text ", b"\xff\xd8", b"\x89PNG", b""]
    payloads = []
    for i in range(144):
        m = magics[i % len(magics)]
        body = bytes(rng.integers(0, 256, size=int(rng.integers(0, 48))).astype(np.uint8))
        payloads.append((f"u{i:03d}", m + body))

    def ref_kind(p: bytes) -> str:
        if p[:4] == b"DRF1":
            return "ocr"
        if p[:5] == b"%PDF-":
            return "pdf"
        if p[:8] == b"\x89PNG\r\n\x1a\n" or p[:3] == b"\xff\xd8\xff":
            return "image"
        return "html"

    df = spark.createDataFrame(
        [(u, bytearray(p)) for u, p in payloads], "url string, html binary"
    )
    rows = {r["url"]: r for r in extract_any(df).collect()}  # must not throw
    assert len(rows) == len(payloads)
    for u, p in payloads:
        assert rows[u]["kind"] == ref_kind(p), (u, p[:12])
        if rows[u]["kind"] == "image":
            assert rows[u]["error"].startswith("decoder not available")
        elif rows[u]["kind"] == "ocr" and len(p) < 16:
            assert rows[u]["error"] is not None  # truncated DRF: error value


def test_nested_same_tag_containers(spark):
    """Same-tag nesting (`<nav>`-in-`<nav>`, the real-page menu shape) is one
    boilerplate unit: the innermost-first strip iterated NESTED_STRIP_PASSES
    times removes depth <= 3 completely — including the tail content after
    the inner close that the old single non-greedy pass leaked — and the
    DuckDB twin (the identical interpolated pattern) agrees byte-for-byte."""
    import duckdb

    from tesseract_wasm_spark.queries import _sql_main_text_over

    html = (
        "<html><body>"
        "<nav>menu a<nav>sub b<nav>subsub c</nav>tail c</nav>tail b</nav>"
        "<p>kept paragraph</p>"
        "<header>h1<header>h2</header>h tail</header>"
        "<div>second kept</div>"
        "</body></html>"
    )
    expected = "kept paragraph\nsecond kept"
    assert _extract_one(spark, html) == expected
    con = duckdb.connect()
    got = con.execute(
        f"WITH pages AS (SELECT '{html}' AS h) "
        f"SELECT {_sql_main_text_over('h')} FROM pages"
    ).fetchone()[0]
    assert got == expected


def test_nested_depth_beyond_passes_degrades_gracefully(spark):
    """Depth-4 nesting (beyond NESTED_STRIP_PASSES) leaves only the
    outermost residue, never crashes, and still drops the inner levels."""
    html = (
        "<html><body>"
        "<nav>a<nav>b<nav>c<nav>d</nav>e</nav>f</nav>g</nav>"
        "<p>real text</p></body></html>"
    )
    # passes peel innermost-first: d, then c/e, then b/f resolve; the
    # outermost level has no pass left, so its own text ('a g') leaks as a
    # block — the documented degradation, identical in the twin
    assert _extract_one(spark, html) == "a g\nreal text"


def test_charset_aware_decode(spark):
    """Real crawls are not all UTF-8: BOMs and <meta charset> declarations
    route the payload through the right decode before extraction — inside
    the same fused single-scan plan (pure expressions, no Python)."""
    from tesseract_wasm_spark.pipeline import extract_any

    body = "<body><article><p>caf\xe9 r\xe9sum\xe9 d\xe9j\xe0 vu</p></article></body></html>"
    meta_page = ('<html><head><meta charset="iso-8859-1"><title>t</title></head>'
                 + body)
    plain_page = "<html><head><title>t</title></head>" + body
    rows = [
        ("u-latin1", bytearray(meta_page.encode("iso-8859-1"))),
        ("u-utf8bom", bytearray(b"\xef\xbb\xbf" + plain_page.encode("utf-8"))),
        ("u-utf16", bytearray(plain_page.encode("utf-16"))),  # LE + BOM
        ("u-utf8", bytearray(plain_page.encode("utf-8"))),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    out = {r["url"]: r for r in extract_any(pages).collect()}
    for url, r in out.items():
        assert r["kind"] == "html" and r["error"] is None, url
        assert r["text_out"] == "caf\xe9 r\xe9sum\xe9 d\xe9j\xe0 vu", url


def test_cp1252_punctuation_repair(spark):
    """A windows-1252 page full of smart quotes / dashes / ellipses must
    decode to the real typographic characters (not C1 controls) and pass
    mojibake screening clean — the decode/quality interplay that would
    otherwise drop punctuation-heavy cp1252 pages from the corpus."""
    from tesseract_wasm_spark.datapipe.textstats import mojibake_cols
    from tesseract_wasm_spark.datapipe.webtext import decode_html_expr

    text = "“Quoted” — it’s caf\xe9… • 80–90%"
    page = ('<html><head><meta charset="windows-1252"></head><body><p>'
            + text + "</p></body></html>")
    rows = [("u-cp1252", bytearray(page.encode("cp1252"))),
            # same page labeled iso-8859-1: WHATWG folds the label family
            # to windows-1252, so the repair applies there too
            ("u-latin1-label", bytearray(page.replace(
                "windows-1252", "iso-8859-1").encode("cp1252")))]
    df = spark.createDataFrame(rows, "url string, html binary")
    decoded = df.select("url", decode_html_expr(F.col("html")).alias("t"))
    got = {r["url"]: r for r in decoded.select(
        "url", "t", *[c.alias(n) for n, c in
                      mojibake_cols(F.col("t")).items()]).collect()}
    for url, r in got.items():
        assert text in r["t"], (url, r["t"])
        assert r["n_control"] == 0 and r["clean"], url


def test_detect_charset_expr(spark):
    from tesseract_wasm_spark.datapipe.webtext import detect_charset_expr

    rows = [
        ("bom8", bytearray(b"\xef\xbb\xbf<html>x")),
        ("bom16be", bytearray("<html>".encode("utf-16-be"))),
        ("meta", bytearray(b'<html><head><meta charset="Windows-1252"></head>')),
        ("metaeq", bytearray(b"<html><meta http-equiv=Content-Type "
                             b"content=\"text/html; charset=utf-8\">")),
        ("none", bytearray(b"<html><body>plain</body></html>")),
    ]
    # a 16be-encoded page has no BOM unless written; prepend one explicitly
    rows[1] = ("bom16be", bytearray(b"\xfe\xff" + "<html>".encode("utf-16-be")))
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r["cs"] for r in df.select(
        "url", detect_charset_expr(F.col("html")).alias("cs")).collect()}
    assert got == {"bom8": "utf-8", "bom16be": "utf-16be",
                   "meta": "windows-1252", "metaeq": "utf-8", "none": "utf-8"}


def test_charset_round_trip_property(spark):
    """Property: a page built in any supported charset (BOM or meta-declared,
    case/spacing/quote variations) decodes back to its exact text through
    detect+decode — driven as ONE Spark job over the generated corpus."""
    from hypothesis import given, settings, strategies as st

    from tesseract_wasm_spark.datapipe.webtext import decode_html_expr

    cases = []

    @settings(max_examples=60, deadline=None)
    @given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=255,
                                          exclude_characters='<>&"'),
                   min_size=1, max_size=40).map(str.strip).filter(bool),
           st.sampled_from(["utf-8", "iso-8859-1", "windows-1252", "utf-16"]),
           st.sampled_from(['charset="{}"', "charset={}", "charset = '{}'",
                            'http-equiv="Content-Type" content="text/html; charset={}"']),
           st.booleans())
    def gen(text, label, meta_fmt, upper):
        label_out = label.upper() if upper else label
        meta = f"<meta {meta_fmt.format(label_out)}>"
        page = f"<html><head>{meta}</head><body><p>{text}</p></body></html>"
        enc = "cp1252" if label == "windows-1252" else label
        try:
            raw = page.encode(enc)
        except UnicodeEncodeError:
            return  # char not in target charset: not a valid page for it
        if label == "utf-16":  # BOM wins over meta, like browsers
            pass
        expected = text
        if label in ("iso-8859-1", "windows-1252"):
            # WHATWG: the latin-1 label family IS windows-1252, so bytes
            # 0x80-0x9F decode to cp1252 punctuation (the 5 undefined
            # positions pass through) — mirror that lens in the expectation
            expected = "".join(
                bytes([ord(c)]).decode("cp1252", "ignore") or c
                if 0x80 <= ord(c) <= 0x9F else c
                for c in text
            )
        cases.append((len(cases), bytearray(raw), expected))

    gen()
    assert cases, "hypothesis generated no cases"
    df = spark.createDataFrame(cases, "i long, html binary, expected string")
    bad = (
        df.select("i", "expected", decode_html_expr(F.col("html")).alias("d"))
        .filter(~F.col("d").contains(F.col("expected")))
        .collect()
    )
    assert bad == [], bad[:3]


def test_density_main_text(spark):
    """The Readability-family relative cut: short LINK-FREE boilerplate
    ("Share this post") passes any absolute link-ratio rule but falls under
    DENSITY_KEEP_FRAC of the article block's score — density drops it; the
    absolute extractor (main_content_expr) keeps it. Link farms drop under
    both. On a page whose blocks are all comparable, density keeps all."""
    from tesseract_wasm_spark.datapipe.webtext import (
        density_main_text_expr, main_content_expr,
    )

    article = "word " * 120
    page = ("<html><body><article><p>" + article + "</p></article>"
            "<p>Share this post</p>"
            '<p><a href="/a">home</a> <a href="/b">tags</a></p>'
            "</body></html>")
    balanced = ("<html><body><p>first paragraph of comparable size here</p>"
                "<p>second paragraph of comparable size too</p></body></html>")
    df = spark.createDataFrame([(1, page), (2, balanced)], "id long, h string")
    got = {r["id"]: (r["d"], r["a"]) for r in df.select(
        "id", density_main_text_expr(F.col("h")).alias("d"),
        main_content_expr(F.col("h")).alias("a")).collect()}
    dens, absolute = got[1]
    assert "Share this post" not in dens          # relative cut drops it
    assert "Share this post" in absolute          # absolute rule keeps it
    assert "home" not in dens and article.strip() in dens
    d2, _ = got[2]
    assert "first paragraph" in d2 and "second paragraph" in d2
