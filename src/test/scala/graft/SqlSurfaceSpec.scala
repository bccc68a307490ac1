package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BitExpressions, GraftFunctions, HashExpressions,
  TopKAgg, VecExpressions}

/** The SQL surface of the custom Catalyst primitives: a pure
  * `spark.sql` user runs the ANN/dedup building blocks, resolving to
  * the SAME expression nodes the DataFrame API builds — verified by
  * value parity AND by plan equality (`sameResult` on the optimized
  * plans) for the end-to-end banding + top-k query. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val s = {
    val ns = spark.newSession()
    GraftFunctions.register(ns)
    Tables.load(ns, SparkTestSession.sfDir, "embeddings")
      .createOrReplaceTempView("emb")
    ns
  }

  // deterministic 4×64 plane/centroid matrix, used identically as a
  // Scala array (DataFrame path) and a SQL literal (SQL path) —
  // Double.toString round-trips exactly through the SQL `…D` literal
  private lazy val planes: Array[Array[Double]] =
    Array.tabulate(4, 64)((i, j) => math.sin(i * 64 + j + 1))
  private lazy val planesSql: String =
    planes.map(_.map(d => s"${d}D").mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")

  test("scalar functions: SQL calls equal the Column API values") {
    val df = s.table("emb").filter(col("vec_id") < 16)
    df.createOrReplaceTempView("emb16")
    val viaSql = s.sql(
      """SELECT vec_id,
        |  md5_prefix64(CAST(vec_id AS STRING)) AS h,
        |  vec_dot(embedding, embedding) AS sq,
        |  vec_abs_max(embedding) AS mx,
        |  int8_quantize(embedding) AS q8,
        |  interleave_bits(vec_id, vec_id + 1, 8) AS z
        |FROM emb16""".stripMargin)
    val viaCol = df.select(col("vec_id"),
      HashExpressions.md5Prefix64(col("vec_id").cast("string")).as("h"),
      VecExpressions.vecDot(col("embedding"), col("embedding")).as("sq"),
      VecExpressions.vecAbsMax(col("embedding")).as("mx"),
      VecExpressions.int8Quantize(col("embedding")).as("q8"),
      BitExpressions.interleaveBits(col("vec_id"), col("vec_id") + 1, 8).as("z"))
    assert(viaSql.orderBy("vec_id").collect().map(_.toString).toSeq
      == viaCol.orderBy("vec_id").collect().map(_.toString).toSeq)
  }

  test("banding + top-k end-to-end in SQL; plan identical to the DataFrame path") {
    val sqlDf = s.sql(
      s"""WITH b AS (
         |  SELECT vec_id, embedding,
         |    mat_sign_bucket(embedding, $planesSql) AS bucket
         |  FROM emb)
         |SELECT a.vec_id AS qid,
         |  top_k_by_score(c.vec_id, vec_dot(a.embedding, c.embedding), 3) AS topk
         |FROM b a JOIN b c
         |  ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
         |WHERE a.vec_id < 8
         |GROUP BY a.vec_id""".stripMargin)

    val e = s.table("emb")
    val b = e.select(col("vec_id"), col("embedding"),
      VecExpressions.matSignBucket(col("embedding"), planes).as("bucket"))
    val a = b.as("a").filter(col("a.vec_id") < 8)
    val c = b.as("c")
    val dfDf = a.join(c,
        col("a.bucket") === col("c.bucket") &&
          col("a.vec_id") =!= col("c.vec_id"))
      .groupBy(col("a.vec_id").as("qid"))
      .agg(TopKAgg.topKByScore(col("c.vec_id"),
        VecExpressions.vecDot(col("a.embedding"), col("c.embedding")), 3)
        .as("topk"))

    val got = sqlDf.orderBy("qid").collect().map(_.toString).toSeq
    assert(got == dfDf.orderBy("qid").collect().map(_.toString).toSeq)
    assert(got.nonEmpty)
    // the SQL text resolved to the same Catalyst plan, not a lookalike
    if (!sqlDf.queryExecution.optimizedPlan
        .sameResult(dfDf.queryExecution.optimizedPlan)) {
      info("SQL plan:\n" + sqlDf.queryExecution.optimizedPlan.toString)
      info("DF plan:\n" + dfDf.queryExecution.optimizedPlan.toString)
      fail("plans differ")
    }
    // native nodes in the executed plan: codegen'd bucket/dot, the
    // bounded-heap aggregate under ObjectHashAggregate — and no UDFs
    val plan = sqlDf.queryExecution.executedPlan.toString
    assert(plan.contains("mat_sign_bucket") || plan.contains("MatSignBucket"))
    assert(plan.contains("top_k_by_score"))
    assert(plan.contains("ObjectHashAggregate"))
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }

  test("registered aggregate keeps map-side partial aggregation in SQL") {
    val plan = s.sql(
      """SELECT vec_id % 4 AS g, top_k_by_score(vec_id, CAST(vec_id AS DOUBLE), 2) AS t
        |FROM emb GROUP BY vec_id % 4""".stripMargin)
      .queryExecution.executedPlan.toString
    // two ObjectHashAggregate stages (partial + final) around the exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2)
  }

  test("multi_match_ids in SQL: plan identical to the DataFrame path") {
    val pats = Seq("alpha", "bet", "ha be")
    val patsSql = pats.map(p => s"'$p'").mkString("array(", ",", ")")
    s.sql("SELECT * FROM VALUES (1, 'alpha beta'), (2, 'gamma') t(id, txt)")
      .createOrReplaceTempView("tscan")
    val sqlDf = s.sql(
      s"SELECT id, multi_match_ids(txt, $patsSql) AS ids FROM tscan")
    val dfDf = s.table("tscan").select(col("id"),
      graft.functions.TextScanExpressions.multiMatchIds(col("txt"), pats)
        .as("ids"))
    assert(sqlDf.orderBy("id").collect().map(_.toString).toSeq
      == dfDf.orderBy("id").collect().map(_.toString).toSeq)
    assert(sqlDf.queryExecution.optimizedPlan
      .sameResult(dfDf.queryExecution.optimizedPlan),
      "SQL must resolve to the identical MultiPatternIds node")
  }

  test("mg_summary in SQL: exact-regime summary equals the Column API") {
    val viaSql = s.sql(
      """SELECT mg_summary(CAST(vec_id % 7 AS STRING), 32) AS mg
        |FROM emb""".stripMargin).collect().head.toString
    val viaCol = s.table("emb")
      .agg(graft.functions.FreqSketch.mgSummary(
        col("vec_id") % 7, 32).as("mg")).collect().head.toString
    assert(viaSql == viaCol)
    assert(viaSql.contains("[0,")) // err_bound 0: the 7-item domain fits k=32
  }

  test("arity/literal misuse fails with a usage message, not a MatchError") {
    val ex = intercept[Exception] {
      s.sql("SELECT top_k_by_score(vec_id, 1.0, vec_id) FROM emb").collect()
    }
    assert(ex.getMessage.contains("usage: top_k_by_score"))
    val ex2 = intercept[Exception] {
      s.sql("SELECT multi_match_ids('t', array('a', CAST(NULL AS STRING))) ").collect()
    }
    assert(ex2.getMessage.contains("usage: multi_match_ids"),
      "a null pattern element must report usage, not NPE")
    // empty list / empty-string patterns fail at RESOLUTION with the
    // usage message — not as a raw require() from the automaton build
    // at execution/codegen time
    val ex3 = intercept[Exception] {
      s.sql("SELECT multi_match_ids('t', array()) ").collect()
    }
    assert(ex3.getMessage.contains("usage: multi_match_ids"),
      s"an empty pattern list must report usage: ${ex3.getMessage}")
    val ex4 = intercept[Exception] {
      s.sql("SELECT multi_match_ids('t', array('a', '')) ").collect()
    }
    assert(ex4.getMessage.contains("usage: multi_match_ids"),
      s"an empty-string pattern must report usage: ${ex4.getMessage}")
  }
}
