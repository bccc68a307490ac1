package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring scan as ONE codegen'd expression node — the
  * blocklist/PII-phrase/contamination-marker primitive.
  *
  * Why it exists (the built-ins genuinely can't express this
  * efficiently): `contains` composed per pattern is O(text × patterns)
  * and puts one expression node per pattern in the plan — a 10k-entry
  * blocklist is 10k re-scans of every document and a plan Catalyst
  * chokes on. The Aho–Corasick automaton (Aho & Corasick 1975, CACM
  * 18(6)) matches ALL patterns in one O(text + matches) pass with the
  * pattern set carried as a single reference object — the same
  * plan-size/codegen shape as [[VecExpressions.MatSignBucket]]'s plane
  * matrix. At 100 TB the scan is pure map-side CPU on the pruned text
  * column: no shuffle, no join, no second pass as the pattern set
  * grows.
  *
  * Matching is over raw UTF-8 BYTES (valid: a whole-string UTF-8
  * pattern can only match at character boundaries of well-formed
  * text), case-sensitive, overlaps included — semantically identical
  * to per-pattern `contains`/`instr`, which is what lets a DuckDB
  * oracle replay the scan relationally (q204).
  */
object TextScanExpressions {

  /** Frozen Aho–Corasick automaton. Built once on the driver, shipped
    * with the plan as a reference object; `matchedIds` is the only
    * hot-path entry. Nodes use sorted parallel byte/next arrays
    * (binary search) — ~9 bytes per pattern byte total, vs the 1 KiB
    * per node a dense 256-way table costs at blocklist scale. */
  final class AcAutomaton private (
      childKeys: Array[Array[Byte]], childNext: Array[Array[Int]],
      fail: Array[Int], outs: Array[Array[Int]],
      val nPatterns: Int) extends Serializable {

    private def step(from: Int, b: Byte): Int = {
      var s = from
      while (true) {
        val keys = childKeys(s)
        var lo = 0; var hi = keys.length - 1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          val k = keys(mid)
          if (k == b) return childNext(s)(mid)
          else if (k < b) lo = mid + 1
          else hi = mid - 1
        }
        if (s == 0) return 0
        s = fail(s)
      }
      0 // unreachable
    }

    /** Distinct ids of every pattern occurring in `text`, ascending. */
    def matchedIds(text: Array[Byte]): Array[Int] = {
      val hit = new Array[Boolean](nPatterns)
      var nHit = 0
      var s = 0
      var i = 0
      while (i < text.length && nHit < nPatterns) {
        s = step(s, text(i))
        val out = outs(s)
        var j = 0
        while (j < out.length) {
          val pid = out(j)
          if (!hit(pid)) { hit(pid) = true; nHit += 1 }
          j += 1
        }
        i += 1
      }
      val res = new Array[Int](nHit)
      var k = 0
      var pid = 0
      while (pid < nPatterns) {
        if (hit(pid)) { res(k) = pid; k += 1 }
        pid += 1
      }
      res
    }

    /** Codegen entry: boxed as Catalyst array data in one call. */
    def matchedArray(text: UTF8String): GenericArrayData =
      new GenericArrayData(matchedIds(text.getBytes))
  }

  object AcAutomaton {
    def build(patterns: Seq[String]): AcAutomaton = {
      require(patterns.nonEmpty, "pattern list must be non-empty")
      require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")
      val pats = patterns.map(_.getBytes("UTF-8")).toArray
      // growable trie
      val kids = mutable.ArrayBuffer(mutable.TreeMap.empty[Byte, Int])
      val ends = mutable.ArrayBuffer(List.empty[Int])
      pats.zipWithIndex.foreach { case (p, pid) =>
        var s = 0
        p.foreach { b =>
          s = kids(s).getOrElseUpdate(b, {
            kids += mutable.TreeMap.empty[Byte, Int]
            ends += Nil
            kids.length - 1
          })
        }
        ends(s) = pid :: ends(s)
      }
      val n = kids.length
      val fail = new Array[Int](n)
      val outs = new Array[Array[Int]](n)
      outs(0) = ends(0).sorted.toArray
      // BFS: failure links + output merge (a node emits its own ends
      // plus everything its longest proper suffix emits)
      val queue = mutable.Queue.empty[Int]
      kids(0).foreach { case (_, c) =>
        fail(c) = 0
        outs(c) = ends(c).sorted.toArray
        queue.enqueue(c)
      }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        kids(u).foreach { case (b, c) =>
          var f = fail(u)
          while (f != 0 && !kids(f).contains(b)) f = fail(f)
          fail(c) = kids(f).get(b).filter(_ != c).getOrElse(0)
          outs(c) = (ends(c) ++ outs(fail(c))).sorted.toArray
          queue.enqueue(c)
        }
      }
      new AcAutomaton(
        kids.map(_.keys.toArray).toArray,
        kids.map(_.values.toArray).toArray,
        fail, outs, pats.length)
    }
  }

  /** `multi_match_ids(text)`: ascending distinct indices (into the
    * pattern list) of every pattern occurring in the string. Empty
    * array = clean document; the ids keep the audit trail (WHICH
    * blocklist entries fired), which a boolean can't. */
  case class MultiPatternIds(child: Expression, patterns: Seq[String])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "multi_match_ids"

    @transient private lazy val automaton = AcAutomaton.build(patterns)

    override protected def nullSafeEval(v: Any): Any =
      automaton.matchedArray(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val ref = ctx.addReferenceObj("acAutomaton", automaton,
          classOf[AcAutomaton].getName)
        s"${ev.value} = $ref.matchedArray($a);"
      })

    override protected def withNewChildInternal(c: Expression): MultiPatternIds =
      copy(child = c)
  }

  /** Column builders. `patterns` ride the expression as one reference
    * object; indices in the result address this exact Seq. */
  def multiMatchIds(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiPatternIds(
      ColumnBridge.expression(text.cast(StringType)), patterns.toVector))

  /** True iff ANY pattern occurs — the blocklist-filter form. */
  def multiMatchAny(text: Column, patterns: Seq[String]): Column =
    org.apache.spark.sql.functions.size(multiMatchIds(text, patterns)) > 0
}
