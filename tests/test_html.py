"""X2-X6 HTML pipeline: cleaning, main-content detection, markdown
conversion, post-processing — golden tests over the stdlib-parser kernels
and the Spark pandas-UDF faces."""

from __future__ import annotations

from pyspark.sql import functions as F

from eget_spark.functions.html import (
    clean_tree,
    dom_to_markdown,
    extract_links_col,
    extract_meta,
    extract_meta_col,
    find_main_content,
    html_to_markdown,
    html_to_markdown_col,
    parse_html,
    post_process_markdown,
)

PAGE = """<html lang="en"><head>
<title>Test Page</title>
<meta name="description" content="a test page">
<meta property="og:title" content="OG Test">
<meta name="twitter:card" content="summary">
<link rel="canonical" href="https://x.com/canonical">
<script>evil()</script><style>.x{}</style>
</head><body>
<nav><a href="/home">home</a></nav>
<header><span>banner</span></header>
<main>
<h1>Title</h1>
<p>First <strong>bold</strong> and <em>ital</em> paragraph with a
<a href="https://x.com/link">link</a>.</p>
<ul><li>one</li><li>two</li></ul>
<pre>code line 1
code line 2</pre>
<img src="/img/pic.png?v=2" alt="">
<p onclick="hack()" data-x="1" class="c">Second paragraph.</p>
</main>
<footer>foot</footer>
</body></html>"""


def test_clean_tree_drops_and_whitelists():
    root = clean_tree(parse_html(PAGE))
    tags = [n.tag for n in root.find_all({"script", "style", "nav", "footer", "header"})]
    assert tags == []  # none contain main/article/section
    p2 = [n for n in root.find_all({"p"}) if "Second" in n.text()][0]
    assert "onclick" not in p2.attrs and p2.attrs.get("data-x") == "1" and p2.attrs.get("class") == "c"


def test_main_content_detection():
    root = clean_tree(parse_html(PAGE))
    main = find_main_content(root)
    assert main is not None and main.tag == "main"
    # fallback: largest div when no main/article
    root2 = parse_html("<div>tiny</div><div>a much longer text container here</div>")
    assert "much longer" in find_main_content(root2).text()


def test_extract_meta():
    m = extract_meta(parse_html(PAGE))
    assert m["title"] == "Test Page"
    assert m["description"] == "a test page"
    assert m["og:title"] == "OG Test"
    assert m["twitter:card"] == "summary"
    assert m["canonical_url"] == "https://x.com/canonical"
    assert m["language"] == "en"


def test_html_to_markdown_golden():
    md = html_to_markdown(PAGE)
    assert md.startswith("# Title")
    assert "**bold**" in md and "*ital*" in md
    assert "[link](https://x.com/link)" in md
    assert "* one" in md and "* two" in md
    # mark_code [code] rewritten to fences by X6
    assert "```\ncode line 1\ncode line 2\n```" in md
    # image: alt defaulted, title from filename sans query (scraper.py:517-528)
    assert '![Image](/img/pic.png?v=2 "pic.png")' in md
    assert "Second paragraph." in md
    assert "banner" not in md and "foot" not in md and "evil()" not in md


def test_post_process_quirks():
    raw = "#Header\nline   \n\n\n\n- a\n-b\n*\n[code]\nx=1\n[/code]\n&nbsp;end\xa0."
    out = post_process_markdown(raw)
    assert out.startswith("# Header")  # '#Header' fixed
    assert "- b" in out  # '-b' fixed
    assert "\n\n\n" not in out  # newline cap
    assert "```\nx=1\n```" in out  # [code] -> fences
    assert "*" not in out.split("```")[0]  # '*'-only line dropped
    assert " end ." in out or "end ." in out  # nbsp replaced


def test_spark_udf_faces(spark):
    df = spark.createDataFrame([(PAGE,)], "html string")
    row = df.select(
        html_to_markdown_col(F.col("html")).alias("md"),
        extract_meta_col(F.col("html")).alias("meta"),
        extract_links_col(F.col("html")).alias("links"),
    ).collect()[0]
    assert row["md"] == html_to_markdown(PAGE)
    assert row["meta"]["og:title"] == "OG Test"
    assert row["links"] == ["/home", "https://x.com/link"]
