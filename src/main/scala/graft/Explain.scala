package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan for the named
  * queries (or a default headline set). Used to keep the plans honest —
  * pushed filters, broadcasts, whole-stage codegen spans, no stray
  * shuffles. `runMain graft.Explain [sfDir] [q1,q2,...]` */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q04_hourly_profile", "q05_percentile_hourly",
        "q07_smart_histogram", "q17_dim_join_rollup", "q18_fact_dim_join",
        "q20_lag_rates", "q35_minhash_neardup", "q38_knn_bruteforce",
        "q89_pagerank", "q94_tfidf_search", "q100_snapshot_diff",
        "q113_market_share")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      Queries.byName(n).run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
