package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator: replicates the sf0.1 test tables
  * `factor`× with key offsets, producing an sf≈(0.1·factor) directory
  * the bench can point at (`SPARK_GRAFT_SF_DIR`). Used for the "would
  * this constant survive 100×?" rehearsal — NOT for correctness gating
  * (oracles stay on the driver-generated sf0.01).
  *
  * Replication semantics:
  *  - all BIGINT entity keys are offset per copy (copy·stride) so joins
  *    fan out realistically instead of colliding;
  *  - foreign keys get the SAME stride as the table they reference, so
  *    referential structure is preserved copy-locally;
  *  - `documents.text`: every 3rd token is replaced by a copy marker,
  *    so every 3-token shingle of a copy covers a mutated position —
  *    copies of one doc share NO shingles (Jaccard 0 at any doc
  *    length), while the copies of a planted dup cluster mutate
  *    identically and stay a cluster. Dup-cluster COUNT scales
  *    ×factor, cluster SIZE stays real — a trailing-salt variant
  *    (round 5) left copies as mutual near-dups and turned every doc
  *    into a factor-sized LSH clique, which made candidate pairs grow
  *    quadratically in the factor (q35 measured 49× time for 10×
  *    data) — a storm no real corpus exhibits;
  *  - `embeddings.embedding`: each copy applies a signed cyclic shift
  *    (coordinates rotated by `copy`, signs flipped per (copy, i)
  *    hash) — an exact isometry, so within-copy dot products (planted
  *    near-dup pairs, cluster geometry) are bit-preserved, while
  *    cross-copy cosines of formerly-identical vectors decorrelate to
  *    ≈0, below the sign-LSH thresholds. Bit-identical replication
  *    (round 5) made every vector a factor-sized cosine-1 clique;
  *  - region/nation stay fixed (TPC-H does not scale dimensions).
  *
  * Usage: runMain graft.ScaleUp <srcDir> <outDir> <factor> [tables]
  * where [tables] is an optional comma list restricting which tables
  * are produced (dimension tables region/nation are always copied).
  * IMPORTANT: always scale from the DRIVER-generated directory in one
  * pass — composing two ScaleUp passes re-mutates the same every-3rd
  * token positions, which OVERWRITES the first pass's copy markers and
  * collapses its copies back into exact-duplicate cliques.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val (src, out, factorS, tablesArg) = args match {
      case Array(s, o, f)     => (s, o, f, None)
      case Array(s, o, f, ts) => (s, o, f, Some(ts.split(",").map(_.trim).toSet))
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, out, factorS.toInt, tablesArg)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, out: String, factor: Int,
          only: Option[Set[String]] = None): Unit = {
    // stride per keyed table: a round power of ten above the sf0.1 key
    // domain, so offset keys stay readable and never collide
    val strides = Map(
      "customer" -> 100000L, "supplier" -> 10000L, "part" -> 100000L,
      "orders" -> 1000000L, "events" -> 1000000L,
      "documents" -> 10000L, "embeddings" -> 10000L)
    // foreign keys reference their owning table's stride
    val keyCols: Map[String, Seq[(String, String)]] = Map(
      "customer" -> Seq("c_custkey" -> "customer"),
      "supplier" -> Seq("s_suppkey" -> "supplier"),
      "part" -> Seq("p_partkey" -> "part"),
      "orders" -> Seq("o_orderkey" -> "orders", "o_custkey" -> "customer"),
      "lineitem" -> Seq("l_orderkey" -> "orders", "l_partkey" -> "part",
        "l_suppkey" -> "supplier"),
      "events" -> Seq("event_id" -> "events", "user_id" -> "customer"),
      "documents" -> Seq("doc_id" -> "documents"),
      "embeddings" -> Seq("vec_id" -> "embeddings"))

    def replicate(name: String, df: DataFrame, copies: Int): DataFrame = {
      val fanned = df.withColumn("__copy",
        explode(sequence(lit(0L), lit(copies.toLong - 1))))
      val keyed = keyCols(name).foldLeft(fanned) { case (d, (c, owner)) =>
        d.withColumn(c, col(c) + col("__copy") * strides(owner))
      }
      val salted = name match {
        case "documents" =>
          keyed.withColumn("text",
            when(col("__copy") === 0, col("text")).otherwise(
              concat_ws(" ", transform(split(col("text"), "\\s+"),
                (t, i) => when(pmod(i, lit(3)) === 0,
                  concat(lit("r"), col("__copy"))).otherwise(t)))))
        case "embeddings" =>
          val d = size(col("embedding"))
          keyed.withColumn("embedding",
            when(col("__copy") === 0, col("embedding")).otherwise(
              transform(sequence(lit(0), d - 1), i =>
                element_at(col("embedding"),
                  (pmod(i + col("__copy"), d) + 1).cast("int")) *
                when(pmod(xxhash64(col("__copy"), i), lit(2)) === 0, lit(1.0f))
                  .otherwise(lit(-1.0f)))))
        case _ => keyed
      }
      salted.drop("__copy")
    }

    // Tables.load, not raw read: events carries INT64 TIMESTAMP(NANOS)
    // that plain Spark reads reject; the rehearsal copy lands as µs,
    // which every query treats identically (second-grain truncations)
    for (t <- Seq("region", "nation")) {
      Tables.load(spark, src, t)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t: copied")
    }
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings")
         if only.forall(_.contains(t))) {
      val base = Tables.load(spark, src, t)
      val files = math.max(4, (base.count() * factor / 2000000L).toInt)
      replicate(t, base, factor)
        .repartition(files)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t: x$factor -> $files files")
    }
  }
}
