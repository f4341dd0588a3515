from __future__ import annotations

from pyspark.sql import functions as F

from jirlbot_spark.functions.html import html_text


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "body string")
    return df.select(html_text("body").alias("t")).collect()[0].t


def test_html_text_basic(spark):
    html = (
        "<html><head><title>T</title><style>p{color:red}</style>"
        "<script>var a = '<p>not text</p>';</script></head>"
        "<body><h1>Hello</h1><p>world &amp; friends</p>"
        "<!-- hidden --><div>bye</div></body></html>"
    )
    assert _extract(spark, html) == "T Hello world & friends bye"


def test_html_text_edge_cases(spark):
    # unclosed script drops to end-of-document (browser behavior)
    assert _extract(spark, "keep <script>var x = 1; lost") == "keep"
    # unclosed comment drops to end
    assert _extract(spark, "keep <!-- lost forever") == "keep"
    # entity set incl. double-encoded amp decodes ONE level
    assert (
        _extract(spark, "a&nbsp;b &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp;amp;")
        == "a b <tag> \"q\" 's' &amp;"
    )
    # case-insensitive tags, attributes, whitespace collapse
    assert (
        _extract(spark, "<DIV CLASS='x'>  a\n\t b  </DIV><BR/>c")
        == "a b c"
    )
    # noscript/template contents dropped; cdata dropped; doctype dropped
    assert (
        _extract(
            spark,
            "<!DOCTYPE html><noscript>no js</noscript>x"
            "<template><b>tpl</b></template>y<![CDATA[raw]]>z",
        )
        == "x y z"
    )
    # plain text with no markup is trimmed/collapsed only
    assert _extract(spark, "  just   text  ") == "just text"
    # numeric entities beyond &#39; survive as-is (pinned contract)
    assert _extract(spark, "a &#169; b") == "a &#169; b"
