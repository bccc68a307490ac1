package graft

import graft.ext.HtmlOps

/** Adversarial-markup FLOOR probe for the HTML extraction chain: times
  * [[graft.ext.HtmlOps.chain]] exactly as Spark executes it (a fold of
  * java.util.regex `replaceAll`s — `regexp_replace` compiles to the
  * same engine) on pathological documents a real crawl contains, with
  * NO Spark in the timing path. The r14 verdict flagged the non-greedy
  * subtree drops (`(?is)<script…>.*?</script…>`) as potentially
  * quadratic on unclosed-tag documents: for every `<script` candidate
  * whose close never arrives, the backtracking engine scans to end of
  * input before giving up — K unclosed opens over an N-char document
  * is O(K·N). One such document paces its whole partition at 100 TB
  * (a partition is one thread; the scan is per-row). DuckDB's RE2 is
  * linear-time by construction, so only the Spark side is at risk —
  * which is why the probe times the JAVA engine.
  *
  * Fixture classes (sizes parameterizable):
  *  - `normal`: a well-formed page (the q210 shape) — the baseline;
  *  - `unclosed_script_1`: ONE unclosed `<script>` at the front of an
  *    N-char text tail (per-open cost: one wasted O(N) scan);
  *  - `unclosed_script_many`: K unclosed `<script x>` markers spread
  *    through N chars (the K·N worst case);
  *  - `script_bomb`: the document is nothing but repeated `<script>`
  *    (maximum K for its size);
  *  - `unclosed_comment_many`: the same shape on the `<!--` step;
  *  - `deep_div`: 100k repeated unclosed `<div class=x>` opens (block
  *    step + generic strip — linear replaces, the control arm).
  *
  * Usage: runMain graft.HtmlAdversarialProbe [sizes-csv-bytes]
  * (default "65536,262144,1048576"). Prints ONE JSON line:
  * per-fixture per-size seconds, plus the growth exponent between the
  * two largest sizes (≈1 linear, ≈2 quadratic). */
object HtmlAdversarialProbe {

  private val steps: Seq[(java.util.regex.Pattern, String)] =
    HtmlOps.chain.map(s =>
      (java.util.regex.Pattern.compile(s.pattern), s.replacement))

  private val scanRunner =
    new graft.functions.HtmlScanExpressions.FoldRunner(HtmlOps.chain.map(_.op))

  /** SPARK_GRAFT_HTML_PROBE=regex times the pure-regex fold (the
    * pre-r15 execution); default times the FoldRunner the HtmlFold
    * expression actually executes (linear scanners + compiled regex
    * for the benign steps). */
  private val regexMode = sys.env.get("SPARK_GRAFT_HTML_PROBE").contains("regex")

  /** The main-variant chain fold. Returns output length (sink). */
  private def runChain(doc: String): Int =
    if (regexMode) {
      var acc = doc
      steps.foreach { case (p, r) => acc = p.matcher(acc).replaceAll(r) }
      acc.length
    } else {
      scanRunner.run(
        org.apache.spark.unsafe.types.UTF8String.fromString(doc)).numChars()
    }

  private def fixture(kind: String, n: Int): String = kind match {
    case "normal" =>
      val para = "<p>the quick brown fox jumps over the lazy dog &amp; runs.</p>\n"
      val body = para * math.max(1, n / para.length)
      s"<html><head><title>t</title><script>var x=1;</script></head>" +
        s"<body><nav>m</nav><div>$body</div><footer>f</footer></body></html>"
    case "unclosed_script_1" =>
      "<script>" + ("word " * math.max(1, n / 5))
    case "unclosed_script_many" =>
      val block = "<script x>" + ("word " * 18) // ~100 chars per block
      block * math.max(1, n / block.length)
    case "script_bomb" =>
      "<script>" * math.max(1, n / 8)
    case "unclosed_comment_many" =>
      val block = "<!-- " + ("word " * 19) // ~100 chars per block
      block * math.max(1, n / block.length)
    case "deep_div" =>
      "<div class=x>" * math.max(1, n / 13)
    case "div_bomb" => // block-tag step: '<div ' runs, no '>' ever
      "<div " * math.max(1, n / 5)
    case "lt_bomb" => // generic strip step: bare '<'s, no '>' ever
      "< a " * math.max(1, n / 4)
    case "a_bomb" => // href harvest: '<a ' runs, no quotes, no '>'
      "<a x " * math.max(1, n / 5)
  }

  /** Times ONLY the href harvest (q212's extractLinks): find() loops
    * as regexp_extract_all executes in regex mode, the AnchorHrefs
    * scanner otherwise. */
  private def timeHref(doc: String): Double = {
    val ps = Seq(HtmlOps.hrefDq, HtmlOps.hrefSq)
      .map(java.util.regex.Pattern.compile(_))
    val t0 = System.nanoTime()
    var c = 0
    if (regexMode)
      ps.foreach { p => val m = p.matcher(doc); while (m.find()) c += 1 }
    else
      c = graft.functions.HtmlScanExpressions.hrefValues(doc, '"').length +
        graft.functions.HtmlScanExpressions.hrefValues(doc, '\'').length
    val dt = (System.nanoTime() - t0) / 1e9
    if (c == Int.MinValue) println("")
    dt
  }

  private def timeOne(doc: String): Double = {
    val t0 = System.nanoTime()
    val sink = runChain(doc)
    val dt = (System.nanoTime() - t0) / 1e9
    if (sink == Int.MinValue) println("") // keep the sink observable
    dt
  }

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("65536,262144,1048576")
      .split(",").map(_.trim.toInt).toSeq
    val kinds = Seq("normal", "unclosed_script_1", "unclosed_script_many",
      "script_bomb", "unclosed_comment_many", "deep_div",
      "div_bomb", "lt_bomb", "a_bomb")
    // JIT warmup on the smallest size
    kinds.foreach(k => timeOne(fixture(k, sizes.min / 4)))
    val rows = kinds.map { k =>
      val f: String => Double = if (k == "a_bomb") timeHref else timeOne
      val times = sizes.map(nn => (nn, f(fixture(k, nn))))
      // growth exponent between the two largest sizes:
      // log(t2/t1) / log(n2/n1) — ≈1 linear, ≈2 quadratic
      val exp =
        if (times.length < 2) 0.0
        else {
          val (n1, t1) = times(times.length - 2)
          val (n2, t2) = times.last
          if (t1 <= 0) 0.0
          else math.log(t2 / t1) / math.log(n2.toDouble / n1)
        }
      val timesJson = times.map { case (nn, t) =>
        f""""$nn":$t%.4f""" }.mkString("{", ",", "}")
      f""""$k":{"sec_by_bytes":$timesJson,"growth_exp":$exp%.2f}"""
    }
    println(rows.mkString("{\"metric\":\"html_adversarial_floor\",", ",", "}"))
  }
}
