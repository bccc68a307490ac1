package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML/markup → plain-text extraction: the stage every real
  * pretraining corpus needs BEFORE the text funnel ([[TextOps]]
  * normalize → quality → dedup assumes extracted plain text, but
  * Common-Crawl-shaped input arrives as markup). Beyond-reference
  * operator — the reference's pipeline starts from already-extracted
  * text (fresco-hpc `data-pipeline` ingests CSV metrics, not web text).
  *
  * Everything is a chain of codegen'd `regexp_replace` column
  * transforms in the Java-regex/RE2 COMMON SUBSET — no backreferences,
  * no lookaround, no `\s` (Java and RE2 disagree on U+000B), explicit
  * `[ \t\r\n]` classes, inline `(?is)` flags only — so the exact same
  * pattern strings drive the Spark plan and the DuckDB oracle
  * ([[htmlChainSql]] folds the very same chain into SQL). Per-row,
  * stateless, whole-stage-codegen friendly: at 100 TB this is a pure
  * map over the scan with zero shuffle.
  *
  * The chain, in order:
  *  1. drop invisible content: comments, `<script>`, `<style>`, then
  *     the whole `<head>` subtree (title/meta are page metadata, not
  *     content; HTML5's optional `</head>` is handled by injecting an
  *     explicit close before `<body>`). Non-greedy to the matching
  *     close tag; embedded `<` / quoted markup inside script bodies is
  *     handled, same-tag nesting — invalid HTML anyway — truncates at
  *     the first close;
  *  2. (main-content variant) drop page chrome wholesale: `<nav>`,
  *     `<header>`, `<footer>`, `<aside>` subtrees — the
  *     boilerplate-vs-main-content cut;
  *  3. block-level tags (`p div h1..h6 li ul ol table tr td th br hr
  *     section article blockquote pre form`) become newlines — block
  *     segmentation survives into the text;
  *  4. every remaining tag is deleted (inline markup joins its text);
  *  5. the five ubiquitous named entities + `&#39;`/`&apos;`/`&nbsp;`
  *     decode, `&amp;` LAST so double-encoded text decodes one level
  *     exactly like a standards-compliant single pass; unknown
  *     entities pass through verbatim (auditable, never guessed);
  *  6. whitespace canonicalization: CR out, runs of spaces/tabs to one
  *     space, space-padded newlines tightened, newline runs collapsed,
  *     ends trimmed — one block per line in the output.
  */
object HtmlOps {

  import graft.functions.HtmlScanExpressions.{
    BlockNewlineOp, DropDelimsOp, DropTagOp, FoldOp, RegexOp, StripTagsOp}

  /** One extraction step: regex pattern (Java/RE2 common subset) and
    * its literal replacement. `mainOnly` steps run only in the
    * main-content variant. The pattern string is THE semantic contract
    * (the oracle SQL generator emits it verbatim); `scan`, when set, is
    * the linear-time scanner the SPARK side executes instead of the
    * backtracking java.util.regex engine — semantics pinned equal by
    * HtmlLinearScanSpec, motivation measured in
    * BENCH_html_adversarial.json (the five backtracking-hostile shapes
    * are O(candidates × length) on unclosed-tag documents: 418 s for
    * ONE 1 MB script-bomb doc — a partition-pacing hazard at 100 TB;
    * DuckDB's RE2 is linear, so only the Spark side changes). */
  final case class Step(pattern: String, replacement: String,
                        mainOnly: Boolean = false,
                        scan: Option[FoldOp] = None) {
    /** What the Spark fold executes: the linear scanner when one
      * exists, the compiled pattern otherwise. */
    def op: FoldOp = scan.getOrElse(RegexOp(pattern, replacement))
  }

  // The opening tag matches `<t>` or `<t ...>` but never a LONGER tag
  // name sharing the prefix (`<head>` must not swallow `<header>`):
  // after the name, either `>` or whitespace-then-attributes.
  private def dropTag(t: String, mainOnly: Boolean) =
    Step(s"(?is)<$t(?:[ \\t\\r\\n][^>]*)?>.*?</$t[ \\t\\r\\n]*>", " ", mainOnly,
      scan = Some(DropTagOp(t)))

  /** Phase 1 — SUBTREE DROPS, markup-preserving: invisible content
    * (comments, head, script, style) and, in the main variant, the
    * chrome subtrees. The output is still HTML; [[extractLinks]] runs
    * link extraction after just this phase so chrome links (nav menus,
    * footer boilerplate) never enter a link graph. */
  val dropSteps: Seq[Step] = Seq(
    Step("(?s)<!--.*?-->", " ", scan = Some(DropDelimsOp("<!--", "-->"))),
    // script/style drop FIRST: with their bodies gone, a "<body>"
    // string literal inside a head script can no longer confuse the
    // implicit-close injection below
    dropTag("script", mainOnly = false),
    dropTag("style", mainOnly = false),
    // </head> is OPTIONAL in valid HTML5 (the head closes implicitly
    // at <body>): inject an explicit close before <body> so the head
    // drop below fires on such pages too. With </head> already
    // present the injected duplicate sits after the real one and the
    // generic tag strip deletes it; lookahead is not in the RE2
    // subset, so the whitespace form re-emits a space inside the tag
    // (harmless — the tag itself is later dropped or stripped).
    Step("(?i)<body>", "</head><body>"),
    Step("(?i)<body[ \\t\\r\\n]", "</head><body "),
    // the whole <head> subtree is invisible in a browser — title/meta
    // are page METADATA, not content; dropping it in BOTH variants
    // keeps titles out of dedup digests and quality scores
    dropTag("head", mainOnly = false),
    dropTag("nav", mainOnly = true),
    dropTag("header", mainOnly = true),
    dropTag("footer", mainOnly = true),
    dropTag("aside", mainOnly = true),
  )

  /** Phase 2 — markup → text: block segmentation, tag strip, entity
    * decode, whitespace canonicalization. */
  val textSteps: Seq[Step] = Seq(
    // same prefix guard as dropTag: the name must be followed by '>',
    // '/>', or whitespace-then-attributes — else <p> would swallow
    // <picture>/<param>/<path>, <li> would swallow <line>, <tr> would
    // swallow <track>, turning inline/void tags into block boundaries
    Step("(?i)</?(p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|table|thead|tbody|tr|td|th|br|hr|section|article|blockquote|pre|form)(?:[ \\t\\r\\n][^>]*)?/?>", "\n",
      scan = Some(BlockNewlineOp(Seq("p", "div", "h1", "h2", "h3", "h4",
        "h5", "h6", "li", "ul", "ol", "table", "thead", "tbody", "tr",
        "td", "th", "br", "hr", "section", "article", "blockquote",
        "pre", "form")))),
    Step("<[^>]*>", "", scan = Some(StripTagsOp)),
    Step("&lt;", "<"),
    Step("&gt;", ">"),
    Step("&quot;", "\""),
    Step("&#39;", "'"),
    Step("&apos;", "'"),
    Step("&nbsp;", " "),
    Step("&amp;", "&"),
    Step("\\r", ""),
    Step("[ \\t]+", " "),
    Step("[ ]*\\n[ ]*", "\n"),
    Step("\\n+", "\n"),
    Step("^[ \\n]+|[ \\n]+$", ""),
  )

  /** The full extraction chain — THE single source of truth; the Spark
    * column fold and the oracle SQL fold both walk this list. */
  val chain: Seq[Step] = dropSteps ++ textSteps

  /** The Spark-side fold: ONE codegen'd [[graft.functions
    * .HtmlScanExpressions.HtmlFold]] node running every applicable
    * step — linear scanners for the five backtracking-hostile shapes,
    * compiled-regex replaceAll (identical to what a `regexp_replace`
    * node runs) for the rest. One string materialization per step
    * inside the runner, vs one UTF8String↔String round trip per
    * chain node before. */
  private def foldSteps(steps: Seq[Step], html: Column, main: Boolean): Column =
    graft.functions.HtmlScanExpressions.htmlFold(html,
      steps.filterNot(s => s.mainOnly && !main).map(_.op))

  private def fold(html: Column, main: Boolean): Column =
    foldSteps(chain, html, main)

  /** Whole-page plain text: chrome (nav/header/footer/aside) text is
    * KEPT — the faithful "what the page says" extraction. */
  def htmlToText(html: Column): Column = fold(html, main = false)

  /** Main-content plain text: chrome subtrees dropped before
    * stripping — the "what the page is about" extraction a training
    * funnel wants (boilerplate nav/footer text never reaches the
    * quality gate or the dedup shingles). */
  def htmlMainText(html: Column): Column = fold(html, main = true)

  /** `href` values of anchor tags, double- or single-quoted, after the
    * phase-1 subtree drops (`mainOnly = true` additionally removes the
    * chrome subtrees first, so nav/footer boilerplate links never
    * reach a link graph). One array column, document order within each
    * quote style; dedup at the edge level is the consumer's call
    * (repeated hrefs on a page are real data). Patterns live in the
    * Java-regex/RE2 common subset like everything else here. */
  val hrefDq = "(?is)<a[ \\t\\r\\n][^>]*href=\"([^\"]*)\""
  val hrefSq = "(?is)<a[ \\t\\r\\n][^>]*href='([^']*)'"

  def extractLinks(html: Column, mainOnly: Boolean = true): Column =
    // anchor_hrefs ≡ concat(regexp_extract_all(hrefDq, 1),
    // regexp_extract_all(hrefSq, 1)) — one linear node (the greedy
    // [^>]* harvest is the fifth hostile shape; a_bomb in
    // BENCH_html_adversarial.json), and the phase-1 fold evaluates
    // once instead of once per quote style
    graft.functions.HtmlScanExpressions.anchorHrefs(
      foldSteps(dropSteps, html, mainOnly))

  private def stepsSql(steps: Seq[Step], inner: String, main: Boolean): String =
    steps.foldLeft(inner) { (acc, s) =>
      if (s.mainOnly && !main) acc
      else {
        val rep =
          if (s.replacement == "\n") "chr(10)"
          else "'" + s.replacement.replace("'", "''") + "'"
        s"regexp_replace($acc, '${s.pattern.replace("'", "''")}', $rep, 'g')"
      }
    }

  /** The SAME chain folded into DuckDB SQL around `inner` — the oracle
    * generator. Patterns are emitted verbatim (both engines read the
    * identical bytes); replacements are quoted, newline as chr(10). */
  def htmlChainSql(inner: String, main: Boolean): String =
    stepsSql(chain, inner, main)

  /** Phase-1 subtree drops in DuckDB SQL (still markup) — the oracle
    * materializes this once in a CTE, then applies [[hrefListSql]]. */
  def dropChainSql(inner: String, main: Boolean): String =
    stepsSql(dropSteps, inner, main)

  /** The href harvest of [[extractLinks]] in DuckDB SQL over an
    * ALREADY-STRIPPED markup column ([[dropChainSql]] output). */
  def hrefListSql(inner: String): String = {
    def esc(p: String) = p.replace("'", "''")
    s"list_concat(regexp_extract_all($inner, '${esc(hrefDq)}', 1), " +
      s"regexp_extract_all($inner, '${esc(hrefSq)}', 1))"
  }
}
