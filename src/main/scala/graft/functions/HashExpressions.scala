package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd MD5-prefix hash for the portable-hash family.
  *
  * [[graft.ext.PortableHash]] derives every engine-portable hash value
  * from the leading hex chars of `md5(s)`. The built-in composition
  * `conv(substring(md5(s), ...), 16, 10)` computes the 16 digest bytes,
  * hex-encodes all 32 chars, copies a substring, and string-parses it
  * back to a long — three string round-trips per hashed token/shingle,
  * the dominant scan-side cost of the sketch pipelines (SimHash hashes
  * every token; MinHash every shingle).
  *
  * `Md5Prefix64` returns the first 8 DIGEST BYTES big-endian as one
  * signed long — no hex string ever exists. Every PortableHash value is
  * a cheap bit-slice of it, BIT-IDENTICAL to the hex-parse forms:
  *  - first 15 hex chars  = bits 63..4  = `prefix >>> 4`  (long60)
  *  - hex chars 1-8       = bits 63..32 = `prefix >>> 32` (int32 half 0)
  *  - hex chars 9-16      = bits 31..0  = `prefix & 0xffffffff` (half 1)
  * so every DuckDB oracle (which keeps the readable hex-substring SQL)
  * stays valid unchanged.
  */
object HashExpressions {

  /** First 8 bytes of md5(utf8(s)) as a big-endian signed long. */
  case class Md5Prefix64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "md5_prefix64"

    override protected def nullSafeEval(s: Any): Any =
      Md5Prefix64.prefix(s.asInstanceOf[UTF8String].getBytes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s => {
        // one MessageDigest per generated-class instance (= per task),
        // lazily created — getInstance per row costs more than the hash
        val md = ctx.addMutableState("java.security.MessageDigest", "md5prefixMd")
        val d = ctx.freshName("d")
        s"""
           |if ($md == null) {
           |  try { $md = java.security.MessageDigest.getInstance("MD5"); }
           |  catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
           |}
           |byte[] $d = $md.digest($s.getBytes());
           |${ev.value} = (($d[0] & 0xffL) << 56) | (($d[1] & 0xffL) << 48) |
           |  (($d[2] & 0xffL) << 40) | (($d[3] & 0xffL) << 32) |
           |  (($d[4] & 0xffL) << 24) | (($d[5] & 0xffL) << 16) |
           |  (($d[6] & 0xffL) << 8) | ($d[7] & 0xffL);
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Md5Prefix64 =
      copy(child = c)
  }

  object Md5Prefix64 {
    private val localMd = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
    private[functions] def prefix(bytes: Array[Byte]): Long = {
      val d = localMd.get().digest(bytes)
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    }
  }

  def md5Prefix64(s: Column): Column =
    ColumnBridge.column(Md5Prefix64(ColumnBridge.expression(s)))
}
