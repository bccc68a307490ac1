package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Linear-time scanners for the HTML extraction chain's five
  * backtracking-hostile regex shapes, plus the two codegen'd
  * expressions that run the chain ([[HtmlFold]]) and the href harvest
  * ([[AnchorHrefs]]) as ONE node each.
  *
  * Why this exists: the chain's subtree drops
  * (`(?is)<t(?:[ \t\r\n][^>]*)?>.*?</t[ \t\r\n]*>`), comment drop,
  * block-tag segmentation, generic tag strip and href harvest are all
  * leftmost-match patterns whose FAILED candidates make
  * java.util.regex (the engine behind `regexp_replace` /
  * `regexp_extract_all`) scan to end-of-input before giving up — K
  * unclosed opens over an N-char document is O(K·N). The
  * `graft.HtmlAdversarialProbe` artifact (BENCH_html_adversarial.json)
  * measures growth exponent ~2.0 on every one of these shapes: a 1 MB
  * document of repeated `<script>` costs 418 s, of `<div ` 107 s for
  * 256 KB — one such crawl document paces an entire partition at
  * 100 TB. DuckDB's RE2 side is linear by construction, so only the
  * Spark side needed replacing.
  *
  * Every scanner is an EXACT re-implementation of its pattern's
  * java.util.regex `replaceAll`/`find` semantics — leftmost match,
  * non-greedy shortest close, ordered alternation, greedy-backtracking
  * rightmost `href=`, ASCII-only case folding (Java `(?i)` without
  * UNICODE_CASE) — pinned by HtmlLinearScanSpec, which compares every
  * scanner against the live regex on adversarial and randomized
  * markup. Linearity arguments live on each function: the key shared
  * fact is that "first '>' at or after x" is monotone in x, so a
  * failed close/'>' search at one candidate proves failure for every
  * later candidate (terminate), and successful matches only ever
  * advance the scan position.
  */
object HtmlScanExpressions {

  /** One step of a [[HtmlFold]] chain. `RegexOp` steps run through the
    * same compiled `java.util.regex` replaceAll a `regexp_replace`
    * node executes; the linear ops replace specific pattern shapes. */
  sealed trait FoldOp extends Serializable
  final case class RegexOp(pattern: String, replacement: String) extends FoldOp
  /** `(?s)OPEN.*?CLOSE` → " " for literal delimiters. */
  final case class DropDelimsOp(open: String, close: String) extends FoldOp
  /** `(?is)<t(?:[ \t\r\n][^>]*)?>.*?</t[ \t\r\n]*>` → " ". */
  final case class DropTagOp(tag: String) extends FoldOp
  /** `(?i)</?(n1|n2|…)(?:[ \t\r\n][^>]*)?/?>` → "\n", names in
    * pattern (alternation) order. */
  final case class BlockNewlineOp(names: Seq[String]) extends FoldOp
  /** `<[^>]*>` → "". */
  case object StripTagsOp extends FoldOp

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n'

  /** ASCII-case-insensitive compare of s[i, i+t.length) against
    * lowercase `t` — Java's `(?i)` folding is ASCII-only by default,
    * so this is the exact match rule. */
  private def tagAt(s: String, i: Int, t: String): Boolean = {
    if (i < 0 || i + t.length > s.length) return false
    var k = 0
    while (k < t.length) {
      val c = s.charAt(i + k)
      val lo = t.charAt(k)
      val ok = c == lo ||
        (lo >= 'a' && lo <= 'z' && c == (lo - 32).toChar)
      if (!ok) return false
      k += 1
    }
    true
  }

  /** `(?s)open.*?close` → " " (literal delimiters; the comment step).
    * Leftmost open, shortest span to the FIRST close at/after the open
    * end; a missing close fails this open — and, opens being literal,
    * every later open too (no close exists after a later position
    * either), so the scan terminates: linear. */
  def dropDelims(s: String, open: String, close: String): String = {
    var i = s.indexOf(open)
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var pos = 0
    while (i >= 0) {
      val c = s.indexOf(close, i + open.length)
      if (c < 0) { i = -1 } // no close anywhere later: done
      else {
        sb.append(s, pos, i).append(' ')
        pos = c + close.length
        i = s.indexOf(open, pos)
      }
    }
    sb.append(s, pos, s.length).toString
  }

  /** `(?is)<t(?:[ \t\r\n][^>]*)?>.*?</t[ \t\r\n]*>` → " ".
    * Open = `<` + tag(ci) + (`>` | ws + non-'>'* + `>`); close =
    * `</` + tag(ci) + ws* + `>`; match = leftmost open with ANY close
    * after its end, spanning to the FIRST such close (non-greedy).
    * Linearity: openEnd(p) = (first '>' at ≥ p+1+|t|)+1 is monotone in
    * p, so "no close at ≥ openEnd" at one candidate proves no candidate
    * after it can match either — terminate; matches advance past their
    * close, so no region is scanned twice. */
  def dropTagSubtree(s: String, tag: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pos = 0 // emitted up to here
    var i = 0   // open-candidate scan position
    while (i >= 0 && i < n) {
      i = s.indexOf('<', i)
      if (i < 0 || i + 1 + tag.length > n) {
        i = -1
      } else if (!tagAt(s, i + 1, tag)) {
        i += 1
      } else {
        val after = i + 1 + tag.length
        var openEnd = -1
        if (after < n && s.charAt(after) == '>') openEnd = after + 1
        else if (after < n && isWs(s.charAt(after))) {
          val gt = s.indexOf('>', after + 1)
          // no '>' anywhere later ⇒ no later open can complete either
          if (gt < 0) i = -1 else openEnd = gt + 1
        } else i += 1 // name not followed by '>' or ws: not an open
        if (openEnd >= 0) {
          // first close at ≥ openEnd
          var c = openEnd
          var closeEnd = -1
          while (closeEnd < 0 && c >= 0) {
            c = s.indexOf("</", c)
            if (c < 0) ()
            else if (tagAt(s, c + 2, tag)) {
              var k = c + 2 + tag.length
              while (k < n && isWs(s.charAt(k))) k += 1
              if (k < n && s.charAt(k) == '>') closeEnd = k + 1
              else c += 1
            } else c += 1
          }
          if (closeEnd < 0) i = -1 // no close ≥ openEnd ⇒ done (monotone)
          else {
            sb.append(s, pos, i).append(' ')
            pos = closeEnd
            i = closeEnd
          }
        }
      }
    }
    if (pos == 0) s else sb.append(s, pos, s.length).toString
  }

  /** `(?i)</?(n1|…|nk)(?:[ \t\r\n][^>]*)?/?>` → "\n". Ordered
    * alternation: at each `<`, the FIRST name (pattern order) whose
    * tail completes wins — `>`, `/>`, or ws + run-to-first-'>'
    * (the greedy `[^>]*` then optional `/` then `>` always ends at
    * that first '>'). Linearity: a ws-path '>' search only happens on
    * a hit (its span is consumed) or proves no '>' remains (every
    * match form ends in '>' ⇒ terminate). */
  def blockTagsToNewline(s: String, names: Array[String]): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pos = 0
    var i = 0
    while (i >= 0 && i < n) {
      i = s.indexOf('<', i)
      if (i < 0) i = -1
      else {
        val start = if (i + 1 < n && s.charAt(i + 1) == '/') i + 2 else i + 1
        var matchEnd = -1
        var stop = false
        var ni = 0
        while (matchEnd < 0 && !stop && ni < names.length) {
          val name = names(ni)
          if (tagAt(s, start, name)) {
            val after = start + name.length
            if (after < n) {
              val c = s.charAt(after)
              if (c == '>') matchEnd = after + 1
              else if (c == '/' && after + 1 < n && s.charAt(after + 1) == '>')
                matchEnd = after + 2
              else if (isWs(c)) {
                val gt = s.indexOf('>', after + 1)
                if (gt < 0) stop = true // no '>' remains: nothing matches
                else matchEnd = gt + 1
              }
            }
          }
          ni += 1
        }
        if (stop) i = -1
        else if (matchEnd >= 0) {
          sb.append(s, pos, i).append('\n')
          pos = matchEnd
          i = matchEnd
        } else i += 1
      }
    }
    if (pos == 0) s else sb.append(s, pos, s.length).toString
  }

  /** `<[^>]*>` → "": leftmost '<' to the first '>' after it; a missing
    * '>' ends the scan (no later '<' can match). Linear. */
  def stripTags(s: String): String = {
    var i = s.indexOf('<')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var pos = 0
    while (i >= 0) {
      val gt = s.indexOf('>', i + 1)
      if (gt < 0) i = -1
      else {
        sb.append(s, pos, i)
        pos = gt + 1
        i = s.indexOf('<', pos)
      }
    }
    sb.append(s, pos, s.length).toString
  }

  /** All group-1 values of `(?is)<a[ \t\r\n][^>]*href=Q([^Q]*)Q` in
    * find() order, for quote Q. Backtracking semantics reproduced
    * exactly: the greedy `[^>]*` makes each match use the RIGHTMOST
    * `href=Q` (ci) inside the candidate's non-'>' run that still finds
    * a closing quote; the capture (`[^Q]*` then `Q`) runs to the first
    * Q after it and may cross '>'; find() resumes after the closing
    * quote. Linearity: the run end is the first '>' (monotone; absent
    * '>' leaves the run unbounded but the literal scan is shared), the
    * `href=Q` occurrence scan advances a single watermark across
    * candidates, and only ONE close-quote search can fail per
    * document (no Q after it ⇒ every shorter candidate closes at the
    * next literal's own quote, a bounded hop). */
  def hrefValues(s: String, quote: Char): Array[String] = {
    val n = s.length
    val lit = "href=" + quote
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    // Monotone caches — the linearity backbone. Candidate ranges only
    // move right, so each is a single forward cursor over the string:
    //  - gt cache: first '>' at ≥ x (runEnd bound);
    //  - literal positions: every ci `href=Q` start, harvested once by
    //    a cursor that each candidate advances through its own range;
    //  - noQuoteFrom: the one close-quote search allowed to fail marks
    //    everything to its right quote-free.
    var gtFrom = 0; var gtPos = -2 // cache: first '>' at ≥ gtFrom (-2 unset)
    def firstGt(x: Int): Int = {
      if (gtPos != -2 && x >= gtFrom) {
        if (gtPos == -1) return -1 // none at ≥ gtFrom ⇒ none at ≥ x
        if (x <= gtPos) return gtPos // no '>' in [gtFrom, gtPos) ⊇ [x, gtPos)
      }
      gtFrom = x; gtPos = s.indexOf('>', x); gtPos
    }
    val litPos = scala.collection.mutable.ArrayBuffer.empty[Int]
    var litScanned = 0 // positions < litScanned are harvested
    def scanLitTo(bound: Int): Unit = {
      var p = litScanned
      val last = math.min(bound, n - lit.length)
      while (p <= last) {
        if (tagAt(s, p, "href=") && s.charAt(p + 5) == quote) litPos += p
        p += 1
      }
      litScanned = math.max(litScanned, last + 1)
    }
    var noQuoteFrom = Int.MaxValue // positions ≥ this have no Q at all
    var from = 0
    while (from < n) {
      // next candidate: '<' + 'a'(ci) + one ws
      var i = s.indexOf('<', from)
      var cand = -1
      while (cand < 0 && i >= 0 && i + 2 < n) {
        if ((s.charAt(i + 1) | 0x20) == 'a' && isWs(s.charAt(i + 2))) cand = i
        else i = s.indexOf('<', i + 1)
      }
      if (cand < 0) return out.toArray
      val runStart = cand + 3
      var runEnd = firstGt(runStart) // exclusive bound for href= starts
      if (runEnd < 0) runEnd = n
      // ci `href=Q` occurrences starting within [runStart, runEnd]
      // (the literal contains no '>', so it may extend past runEnd)
      scanLitTo(runEnd)
      // binary search the harvested ascending positions for the range
      var lo = 0; var hi = litPos.length
      while (lo < hi) { // first index with pos >= runStart
        val mid = (lo + hi) >>> 1
        if (litPos(mid) < runStart) lo = mid + 1 else hi = mid
      }
      var hi2 = hi // advance to one past the last index with pos <= runEnd
      while (hi2 < litPos.length && litPos(hi2) <= runEnd) hi2 += 1
      var matched = false
      var idx = hi2 - 1 // rightmost literal first (greedy [^>]* backtracks)
      while (!matched && idx >= lo) {
        val h = litPos(idx)
        idx -= 1
        val q = h + lit.length
        val c = if (q >= noQuoteFrom) -1 else s.indexOf(quote, q)
        if (c < 0) noQuoteFrom = math.min(noQuoteFrom, q)
        else {
          out += s.substring(q, c)
          from = c + 1
          matched = true
        }
      }
      if (!matched) from = cand + 1
    }
    out.toArray
  }

  /** Precompiled chain runner — the reference object codegen calls. */
  final class FoldRunner(ops: Seq[FoldOp]) extends Serializable {
    @transient private lazy val compiled: Array[Either[
        (java.util.regex.Pattern, String), FoldOp]] =
      ops.map {
        case RegexOp(p, r) => Left((java.util.regex.Pattern.compile(p), r))
        case op => Right(op)
      }.toArray

    def run(in: UTF8String): UTF8String = {
      var acc = in.toString
      var i = 0
      while (i < compiled.length) {
        compiled(i) match {
          case Left((p, r)) => acc = p.matcher(acc).replaceAll(r)
          case Right(DropDelimsOp(o, c)) => acc = dropDelims(acc, o, c)
          case Right(DropTagOp(t)) => acc = dropTagSubtree(acc, t)
          case Right(BlockNewlineOp(names)) =>
            acc = blockTagsToNewline(acc, names.toArray)
          case Right(StripTagsOp) => acc = stripTags(acc)
          case Right(r: RegexOp) => throw new IllegalStateException(r.toString)
        }
        i += 1
      }
      UTF8String.fromString(acc)
    }
  }

  /** `html_fold(text)`: the extraction chain as ONE codegen'd node —
    * string materialized once per step inside the runner instead of
    * once per regexp_replace node, linear scanners for the five
    * hostile shapes, plain compiled-regex replaceAll (identical
    * semantics to `regexp_replace`) for the rest. */
  case class HtmlFold(child: Expression, ops: Seq[FoldOp])
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "html_fold"

    @transient private lazy val runner = new FoldRunner(ops)

    override protected def nullSafeEval(v: Any): Any =
      runner.run(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val ref = ctx.addReferenceObj("htmlFoldRunner", runner,
          classOf[FoldRunner].getName)
        s"${ev.value} = $ref.run($a);"
      })

    override protected def withNewChildInternal(c: Expression): HtmlFold =
      copy(child = c)
  }

  /** Harvest runner: double-quoted hrefs then single-quoted, exactly
    * `concat(regexp_extract_all(dq, 1), regexp_extract_all(sq, 1))`. */
  final class HrefRunner extends Serializable {
    def run(in: UTF8String): GenericArrayData = {
      val s = in.toString
      val dq = hrefValues(s, '"')
      val sq = hrefValues(s, '\'')
      val all = new Array[Any](dq.length + sq.length)
      var i = 0
      while (i < dq.length) { all(i) = UTF8String.fromString(dq(i)); i += 1 }
      var j = 0
      while (j < sq.length) {
        all(dq.length + j) = UTF8String.fromString(sq(j)); j += 1
      }
      new GenericArrayData(all)
    }
  }

  /** `anchor_hrefs(markup)`: both quote styles' href values, document
    * order within each style, double-quoted first. */
  case class AnchorHrefs(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def prettyName: String = "anchor_hrefs"

    @transient private lazy val runner = new HrefRunner

    override protected def nullSafeEval(v: Any): Any =
      runner.run(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val ref = ctx.addReferenceObj("hrefRunner", runner,
          classOf[HrefRunner].getName)
        s"${ev.value} = $ref.run($a);"
      })

    override protected def withNewChildInternal(c: Expression): AnchorHrefs =
      copy(child = c)
  }

  def htmlFold(text: Column, ops: Seq[FoldOp]): Column =
    ColumnBridge.column(HtmlFold(
      ColumnBridge.expression(text.cast(StringType)), ops.toVector))

  def anchorHrefs(markup: Column): Column =
    ColumnBridge.column(AnchorHrefs(
      ColumnBridge.expression(markup.cast(StringType))))
}
