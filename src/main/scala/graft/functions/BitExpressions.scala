package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd Morton (Z-order) bit interleave.
  *
  * The composed-functions form of the interleave
  * ([[graft.etl.StoreMaintenance.zorderKey]]'s original fold) expands
  * to a ~6·bits-node expression tree — 2·bits shifts, masks, and ORs
  * that codegen as one enormous nested expression. This expression
  * emits the interleave as an actual Java LOOP: constant code size for
  * any width, and the JIT sees the idiomatic shift-mask-or pattern it
  * already knows how to optimize.
  *
  * Generated-code rule (round-4 lesson, pinned by the ordering spec
  * below): no emitted line may BEGIN with `|` — GenerateOrdering strips
  * pipe margins from the class body, and its LazilyGeneratedOrdering
  * path has no interpreted fallback.
  */
object BitExpressions {

  /** Interleave the low `bits` bits of two longs: bit i of `left` →
    * position 2i, bit i of `right` → 2i+1. */
  case class InterleaveBits(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    override def dataType: DataType = LongType
    override def prettyName: String = "interleave_bits"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      InterleaveBits.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val z = ctx.freshName("z")
        val i = ctx.freshName("i")
        s"""
           |long $z = 0L;
           |for (int $i = 0; $i < $bits; $i++) {
           |  $z |= (($a >>> $i) & 1L) << (2 * $i);
           |  $z |= (($b >>> $i) & 1L) << (2 * $i + 1);
           |}
           |${ev.value} = $z;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): InterleaveBits =
      copy(left = newLeft, right = newRight)
  }

  object InterleaveBits {
    private[functions] def interleave(a: Long, b: Long, bits: Int): Long = {
      var z = 0L
      var i = 0
      while (i < bits) {
        z |= ((a >>> i) & 1L) << (2 * i)
        z |= ((b >>> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
  }

  def interleaveBits(a: Column, b: Column, bits: Int): Column =
    ColumnBridge.column(InterleaveBits(
      ColumnBridge.expression(a.cast("long")),
      ColumnBridge.expression(b.cast("long")), bits))
}
