package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{CorpusPipeline, HtmlOps}

class HtmlOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def extractMain(html: String): String =
    Seq(html).toDF("h").select(HtmlOps.htmlMainText(col("h"))).first().getString(0)

  private def extractFull(html: String): String =
    Seq(html).toDF("h").select(HtmlOps.htmlToText(col("h"))).first().getString(0)

  test("nested tags: block segmentation survives, inline markup joins") {
    val html = "<div><h1>Title</h1><p>one <b>bold</b> two</p>" +
      "<ul><li>a</li><li>b</li></ul></div>"
    assert(extractMain(html) == "Title\none bold two\na\nb")
  }

  test("script/style/comment bodies vanish, even with embedded markup and '<'") {
    val html = "<head><style>p { color: red; }</style>" +
      "<script>var n = 1 < 2; var s = \"<div>fake</div>\";</script></head>" +
      "<body><!-- note --><p>kept</p></body>"
    assert(extractMain(html) == "kept")
  }

  test("entities decode once; &amp; decodes last; unknown entities pass through") {
    val html = "<p>A&amp;B &lt;tag&gt; &quot;q\" &#39;s &nbsp; gap &amp;lt;still&amp;gt; &copy;</p>"
    assert(extractMain(html) ==
      "A&B <tag> \"q\" 's gap &lt;still&gt; &copy;")
  }

  test("boilerplate nav/header/footer/aside dropped from main, kept in full") {
    val html = "<body><nav><ul><li>Home</li><li>About</li></ul></nav>" +
      "<header>Site</header><div><p>the article body</p></div>" +
      "<aside>related</aside><footer>legal</footer></body>"
    assert(extractMain(html) == "the article body")
    val full = extractFull(html)
    assert(full.contains("Home") && full.contains("Site") &&
      full.contains("legal") && full.contains("related") &&
      full.contains("the article body"))
  }

  test("whitespace canonicalization: one block per line, trimmed ends") {
    val html = "<div>\r\n   <p>  a   b  </p>\n\n\n<p>c</p>   </div>\t"
    assert(extractMain(html) == "a b\nc")
  }

  test("implicit </head>: HTML5 pages omitting the close still drop title/meta") {
    val html = "<html><head><title>Breaking News</title>" +
      "<meta name=\"d\" content=\"x\"><body><p>story</p></body></html>"
    assert(extractMain(html) == "story")
    // explicit close unaffected; a head script with a \"<body>\" string
    // literal cannot confuse the injected close (scripts drop first)
    val tricky = "<head><script>var s = \"<body>\";</script>" +
      "<title>T</title></head><body><p>ok</p></body>"
    assert(extractMain(tricky) == "ok")
  }

  test("block-tag prefix guard: <picture>/<param>/<line> are not block boundaries") {
    val html = "<div><p>A <picture><img src=\"x\"></picture> B</p>" +
      "<p>C <line x1='0'/> D<br/>E</p></div>"
    // picture/line strip inline (no newline); br/ (self-closing) still breaks
    assert(extractMain(html) == "A B\nC D\nE")
  }

  test("extractLinks: both quote styles harvested, chrome links excluded") {
    val html = "<html><head><title>t</title></head><body>" +
      "<nav><a href=\"/home\">home</a></nav>" +
      "<div><p><a href=\"/doc/1\">a</a> and <a href='/doc/2'>b</a> " +
      "and <a class='x' href=\"/doc/3\">c</a></p></div>" +
      "<footer><a href=\"/doc/0\">decoy</a></footer></body></html>"
    val main = Seq(html).toDF("h")
      .select(HtmlOps.extractLinks(col("h")).as("l"))
      .first().getSeq[String](0)
    // double-quoted hrefs first (document order), then single-quoted
    assert(main == Seq("/doc/1", "/doc/3", "/doc/2"))
    val full = Seq(html).toDF("h")
      .select(HtmlOps.extractLinks(col("h"), mainOnly = false).as("l"))
      .first().getSeq[String](0)
    assert(full.toSet == Set("/home", "/doc/0", "/doc/1", "/doc/2", "/doc/3"))
  }

  test("cleanHtml: the funnel runs on extracted text and keeps input schema") {
    val docs = Seq(
      (1L, "<body><nav>Home About Contact</nav><p>the quick brown fox jumps over the lazy dog and that is that</p></body>"),
      (2L, "<body><nav>Home About Contact</nav><p>the quick brown fox jumps over the lazy dog and that is that</p></body>"),
      (3L, "<body><p>zz</p></body>"), // no stopword hits in any language -> langId "und", language-gated
    ).toDF("doc_id", "html")
    val cleaned = CorpusPipeline.cleanHtml(docs, col("doc_id"), col("html"),
      lang = "en", minQuality = 0.0)
    assert(cleaned.columns.toSeq == Seq("doc_id", "html"))
    val ids = cleaned.select("doc_id").as[Long].collect().sorted.toSeq
    // 1 and 2 extract to identical text -> exact dedup keeps min id 1;
    // nav chrome is excluded from the digest (else all-distinct pages
    // with shared nav would never dedup)
    assert(ids == Seq(1L))
  }
}
