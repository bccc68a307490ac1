package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Custom codegen'd Catalyst expressions for the vector hot paths.
  *
  * Why these exist (the one place built-ins genuinely can't express the
  * semantics EFFICIENTLY, per the design preference order):
  *
  *  - `aggregate(zip_with(a, b, ...))` dots are higher-order functions:
  *    interpreted per row, never codegen'd, no subexpression
  *    elimination — the dominant per-pair cost in similarity scoring.
  *  - The literal-chain alternative (element_at(v,1)*w1 + ...) IS
  *    codegen'd but puts dim×bits expression NODES in the plan —
  *    measured ~1.5 s of pure Catalyst analysis per run on the
  *    multi-table LSH query (and 16×64-term chains blow janino's 64 KB
  *    method limit → interpreted fallback anyway).
  *
  * One expression node holding the weight matrix as a reference object
  * gets both: O(1) plan size and a tight unboxed codegen loop. At 100 TB
  * the corpus-side projections these back are pure scan-side CPU.
  *
  * Floating-point contract: accumulation is left-to-right from +0.0 in
  * ascending element order — BIT-IDENTICAL to both shapes it replaces
  * (the zip_with fold and the left-associated literal chain), so every
  * DuckDB oracle stays valid. Inputs are equal-length float/double
  * arrays with no null elements and finite values (embedding columns);
  * mismatched lengths truncate to the shorter side.
  */
object VecExpressions {

  private def elemGetter(t: DataType, arr: String, i: String): String = t match {
    case FloatType  => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case ByteType   => s"(double) $arr.getByte($i)" // int8-quantized codes
    case other => throw new IllegalArgumentException(s"vector element type $other")
  }

  private def elemAt(t: DataType, arr: ArrayData, i: Int): Double = t match {
    case FloatType  => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case ByteType   => arr.getByte(i).toDouble
    case other => throw new IllegalArgumentException(s"vector element type $other")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Σ a[i]·b[i] accumulated in double, left-to-right. */
  case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val (tx, ty) = (elemType(left), elemType(right))
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc = acc + elemAt(tx, x, i) * elemAt(ty, y, i); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (i, n, acc) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("acc"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc = $acc + ${elemGetter(elemType(left), a, i)} * ${elemGetter(elemType(right), b, i)};
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
      copy(left = l, right = r)
  }

  /** Sign-LSH bucket id: bit i set iff Σ vec[j]·planes[i][j] ≥ 0. */
  case class MatSignBucket(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "mat_sign_bucket"

    override protected def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val t = elemType(child)
      var bucket = 0L
      var i = 0
      while (i < planes.length) {
        val w = planes(i)
        val n = math.min(x.numElements(), w.length)
        var acc = 0.0
        var j = 0
        while (j < n) { acc = acc + elemAt(t, x, j) * w(j); j += 1 }
        if (acc >= 0) bucket |= (1L << i)
        i += 1
      }
      bucket
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val ref = ctx.addReferenceObj("planes", planes, "double[][]")
        val (i, j, n, acc, w, bkt) = (ctx.freshName("i"), ctx.freshName("j"),
          ctx.freshName("n"), ctx.freshName("acc"), ctx.freshName("w"),
          ctx.freshName("bucket"))
        s"""
           |long $bkt = 0L;
           |for (int $i = 0; $i < $ref.length; $i++) {
           |  double[] $w = $ref[$i];
           |  int $n = java.lang.Math.min($a.numElements(), $w.length);
           |  double $acc = 0.0;
           |  for (int $j = 0; $j < $n; $j++) {
           |    $acc = $acc + ${elemGetter(elemType(child), a, j)} * $w[$j];
           |  }
           |  if ($acc >= 0) $bkt |= (1L << $i);
           |}
           |${ev.value} = $bkt;
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): MatSignBucket =
      copy(child = c)

    // value equality over the matrix (case-class equals would compare
    // Java arrays by REFERENCE): two plans carrying equal planes are
    // semantically equal — which is what canonicalization, CacheManager
    // plan-keyed reuse, and the SQL-vs-DataFrame parity spec compare
    override def equals(o: Any): Boolean = o match {
      case m: MatSignBucket => m.child == child &&
        java.util.Arrays.deepEquals(
          m.planes.asInstanceOf[Array[AnyRef]], planes.asInstanceOf[Array[AnyRef]])
      case _ => false
    }
    override def hashCode(): Int = 31 * child.hashCode() +
      java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])
  }

  /** Argmax centroid id by dot similarity; ties take the LARGER id —
    * the same tiebreak as `array_max` over (sim, id) structs, which this
    * replaces (ascending scan with `>=` keeps the last maximum). */
  case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "nearest_centroid"

    override protected def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val t = elemType(child)
      var best = 0
      var bestSim = Double.NegativeInfinity
      var i = 0
      while (i < centroids.length) {
        val w = centroids(i)
        val n = math.min(x.numElements(), w.length)
        var acc = 0.0
        var j = 0
        while (j < n) { acc = acc + elemAt(t, x, j) * w(j); j += 1 }
        if (acc >= bestSim) { bestSim = acc; best = i }
        i += 1
      }
      best
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
        val (i, j, n, acc, w) = (ctx.freshName("i"), ctx.freshName("j"),
          ctx.freshName("n"), ctx.freshName("acc"), ctx.freshName("w"))
        val (best, bestSim) = (ctx.freshName("best"), ctx.freshName("bestSim"))
        s"""
           |int $best = 0;
           |double $bestSim = Double.NEGATIVE_INFINITY;
           |for (int $i = 0; $i < $ref.length; $i++) {
           |  double[] $w = $ref[$i];
           |  int $n = java.lang.Math.min($a.numElements(), $w.length);
           |  double $acc = 0.0;
           |  for (int $j = 0; $j < $n; $j++) {
           |    $acc = $acc + ${elemGetter(elemType(child), a, j)} * $w[$j];
           |  }
           |  if ($acc >= $bestSim) { $bestSim = $acc; $best = $i; }
           |}
           |${ev.value} = $best;
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): NearestCentroid =
      copy(child = c)

    // value equality over the centroid matrix — see MatSignBucket
    override def equals(o: Any): Boolean = o match {
      case m: NearestCentroid => m.child == child &&
        java.util.Arrays.deepEquals(
          m.centroids.asInstanceOf[Array[AnyRef]],
          centroids.asInstanceOf[Array[AnyRef]])
      case _ => false
    }
    override def hashCode(): Int = 31 * child.hashCode() +
      java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])
  }

  /** max |v[i]| — the symmetric-quantization scale numerator. */
  case class VecAbsMax(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_abs_max"

    override protected def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val t = elemType(child)
      var mx = 0.0
      var i = 0
      while (i < x.numElements()) {
        val a = math.abs(elemAt(t, x, i)); if (a > mx) mx = a; i += 1
      }
      mx
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val (i, mx, t) = (ctx.freshName("i"), ctx.freshName("mx"), ctx.freshName("t"))
        s"""
           |double $mx = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $t = java.lang.Math.abs(${elemGetter(elemType(child), a, i)});
           |  if ($t > $mx) $mx = $t;
           |}
           |${ev.value} = $mx;
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): VecAbsMax =
      copy(child = c)
  }

  /** Symmetric per-vector int8 quantization for the ANN storage path:
    * q[i] = clamp(floor(v[i]/scale + 0.5), −127, 127) as TINYINT, with
    * scale = max(absmax, 1e-30)/127 computed internally — 4× (fp32) to
    * 8× (fp64) smaller vectors for bucketed candidate stages, one plan
    * node, one O(dim) codegen loop per row. The floor(x+0.5) rounding
    * matches the engine-portable convention used everywhere else, so
    * the codes are reproducible in any engine from the same floats. */
  case class Int8Quantize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(ByteType, containsNull = false)
    override def prettyName: String = "int8_quantize"

    override protected def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val t = elemType(child)
      val n = x.numElements()
      var mx = 0.0
      var i = 0
      while (i < n) { val a = math.abs(elemAt(t, x, i)); if (a > mx) mx = a; i += 1 }
      val s = math.max(mx, 1e-30) / 127.0
      val out = new Array[Byte](n)
      i = 0
      while (i < n) {
        var q = math.floor(elemAt(t, x, i) / s + 0.5)
        if (q > 127.0) q = 127.0
        if (q < -127.0) q = -127.0
        out(i) = q.toByte
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val (i, n, mx, t, s, q, out) = (ctx.freshName("i"), ctx.freshName("n"),
          ctx.freshName("mx"), ctx.freshName("t"), ctx.freshName("s"),
          ctx.freshName("q"), ctx.freshName("out"))
        s"""
           |int $n = $a.numElements();
           |double $mx = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $t = java.lang.Math.abs(${elemGetter(elemType(child), a, i)});
           |  if ($t > $mx) $mx = $t;
           |}
           |double $s = java.lang.Math.max($mx, 1e-30) / 127.0;
           |byte[] $out = new byte[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  double $q = java.lang.Math.floor(${elemGetter(elemType(child), a, i)} / $s + 0.5);
           |  if ($q > 127.0) $q = 127.0;
           |  if ($q < -127.0) $q = -127.0;
           |  $out[$i] = (byte) $q;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Int8Quantize =
      copy(child = c)
  }

  // ── Column API ──────────────────────────────────────────────────────

  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def matSignBucket(vec: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(
      MatSignBucket(ColumnBridge.expression(vec), planes))

  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(
      NearestCentroid(ColumnBridge.expression(vec), centroids))

  def vecAbsMax(vec: Column): Column =
    ColumnBridge.column(VecAbsMax(ColumnBridge.expression(vec)))

  def int8Quantize(vec: Column): Column =
    ColumnBridge.column(Int8Quantize(ColumnBridge.expression(vec)))
}
