package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** FunctionRegistry surface for the engine's custom Catalyst
  * primitives, so a pure-`spark.sql` user can run the ANN/dedup
  * building blocks with no DataFrame code — same expression NODES as
  * the Column API (the analyzer resolves the SQL call to the identical
  * Catalyst expression, so plans and codegen are byte-for-byte the
  * DataFrame path's):
  *
  *  - `vec_dot(a, b)`            — Σ a[i]·b[i] (float/double/int8 arrays)
  *  - `vec_abs_max(v)`           — max |v[i]|
  *  - `int8_quantize(v)`         — symmetric per-vector int8 codes
  *  - `md5_prefix64(s)`          — portable 64-bit hash (MinHash family base)
  *  - `interleave_bits(a, b, k)` — Z-order bit interleave, k a literal
  *  - `mat_sign_bucket(v, m)`    — sign-LSH bucket id; m a foldable
  *                                 `array(array(double))` plane matrix
  *  - `nearest_centroid(v, m)`   — argmin centroid id over a foldable matrix
  *  - `top_k_by_score(id, s, k)` — bounded-heap exact top-k aggregate,
  *                                 k a literal
  *  - `multi_match_ids(s, ps)`   — Aho–Corasick multi-pattern scan; ps a
  *                                 foldable `array(string)` pattern list
  *  - `mg_summary(item, k)`      — Misra–Gries frequent-items summary,
  *                                 k a literal
  *
  * Register on a live session with [[register]], or for every session
  * via `spark.sql.extensions=graft.GraftExtensions` (which also
  * injects the time-bound contract rule). */
object GraftFunctions {

  private def usage(name: String, sig: String): Nothing =
    throw new IllegalArgumentException(s"usage: $name($sig)")

  /** A foldable integer argument (LITERAL in SQL), e.g. top-k's k. */
  private def intArg(e: Expression, name: String, sig: String): Int = {
    if (!e.foldable) usage(name, sig)
    e.eval() match {
      case n: Number => n.intValue()
      case _ => usage(name, sig)
    }
  }

  /** A foldable `array(array(<numeric>))` argument evaluated to the
    * plane/centroid matrix the vector expressions carry as a reference
    * object (broadcast once per plan, not per row). */
  private def matrixArg(e: Expression, name: String, sig: String)
      : Array[Array[Double]] = {
    if (!e.foldable) usage(name, sig)
    val cast = Cast(e, ArrayType(ArrayType(DoubleType)), Some("UTC"))
    cast.eval() match {
      case outer: ArrayData =>
        Array.tabulate(outer.numElements()) { i =>
          val inner = outer.getArray(i)
          Array.tabulate(inner.numElements())(inner.getDouble)
        }
      case _ => usage(name, sig)
    }
  }

  private def cast(e: Expression, t: DataType): Expression = Cast(e, t, Some("UTC"))

  /** A foldable `array(<string>)` argument — the pattern list the text
    * scan carries as its automaton's source (one reference object per
    * plan, like the matrix args). */
  private def stringsArg(e: Expression, name: String, sig: String): Seq[String] = {
    if (!e.foldable) usage(name, sig)
    val cast = Cast(e, ArrayType(org.apache.spark.sql.types.StringType), Some("UTC"))
    cast.eval() match {
      case arr: ArrayData =>
        val out = (0 until arr.numElements()).map { i =>
          val s = arr.getUTF8String(i)
          if (s == null) usage(name, sig) // null pattern → usage, not an NPE
          s.toString
        }.toVector
        // empty list / empty-string patterns would otherwise surface as
        // a raw require() from the automaton build at execution time —
        // misuse fails at RESOLUTION with the usage message instead
        if (out.isEmpty || out.exists(_.isEmpty)) usage(name, sig)
        out
      case _ => usage(name, sig)
    }
  }

  private def fn(name: String, sig: String, note: String)
                (builder: PartialFunction[Seq[Expression], Expression])
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftFunctions.getClass.getCanonicalName, null, name,
        s"$name($sig) - $note", "", "", "", "", "", "", "built-in"),
      (args: Seq[Expression]) =>
        builder.applyOrElse(args, (_: Seq[Expression]) => usage(name, sig)))

  /** All registrations — the shape `SparkSessionExtensions.injectFunction`
    * and `FunctionRegistry.registerFunction` both take. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("vec_dot", "a, b", "dot product over numeric arrays") {
      case Seq(a, b) => VecExpressions.VecDot(a, b)
    },
    fn("vec_abs_max", "v", "max absolute element") {
      case Seq(v) => VecExpressions.VecAbsMax(v)
    },
    fn("int8_quantize", "v", "symmetric per-vector int8 quantization") {
      case Seq(v) => VecExpressions.Int8Quantize(v)
    },
    fn("md5_prefix64", "s", "first 8 md5 digest bytes as a big-endian long") {
      case Seq(s) => HashExpressions.Md5Prefix64(cast(s, org.apache.spark.sql.types.StringType))
    },
    fn("interleave_bits", "a, b, bits", "Z-order interleave of the low `bits` bits") {
      case Seq(a, b, bits) => BitExpressions.InterleaveBits(
        cast(a, LongType), cast(b, LongType),
        intArg(bits, "interleave_bits", "a, b, bits"))
    },
    fn("mat_sign_bucket", "v, planes", "sign-LSH bucket over a literal plane matrix") {
      case Seq(v, m) => VecExpressions.MatSignBucket(
        v, matrixArg(m, "mat_sign_bucket", "v, planes"))
    },
    fn("nearest_centroid", "v, centroids", "argmin-distance centroid id over a literal matrix") {
      case Seq(v, m) => VecExpressions.NearestCentroid(
        v, matrixArg(m, "nearest_centroid", "v, centroids"))
    },
    fn("top_k_by_score", "id, score, k", "exact bounded-heap top-k (id,score) aggregate") {
      case Seq(id, score, k) => TopKByScore(
        cast(id, LongType), cast(score, DoubleType),
        intArg(k, "top_k_by_score", "id, score, k"))
    },
    fn("multi_match_ids", "text, patterns",
       "Aho-Corasick scan: ids of every literal-array pattern found") {
      case Seq(t, p) => TextScanExpressions.MultiPatternIds(
        cast(t, org.apache.spark.sql.types.StringType),
        stringsArg(p, "multi_match_ids", "text, patterns"))
    },
    fn("mg_summary", "item, k", "Misra-Gries frequent-items summary, k a literal") {
      case Seq(item, k) => MisraGriesAgg(
        cast(item, org.apache.spark.sql.types.StringType),
        intArg(k, "mg_summary", "item, k"))
    })

  /** Register every function on an EXISTING session (temp-function
    * scope — the extensions path below covers session construction). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
