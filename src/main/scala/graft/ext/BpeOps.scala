package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (word-level, Sennrich-style):
  * learn the top merge per round over the word-frequency vocabulary.
  *
  * The working set after the first aggregation is the VOCABULARY (word,
  * count) — corpus-sized work happens exactly once, and every merge
  * round then runs over vocab-sized frames: adjacent-pair counts
  * weighted by word frequency (map-side combined), a 1-row argmax
  * attached by broadcast, and a narrow literal-replace projection that
  * applies the merge.
  *
  * Words are held as space-delimited symbol strings (" h e l l o ").
  * Applying a merge is `replace(sym, " l r ", " lr ")`: literal string
  * replace is left-to-right and non-overlapping in every engine — which
  * is exactly BPE's greedy merge order — so the whole induction is
  * DuckDB-oracle-able by unrolling the rounds as CTE stages. Argmax
  * ties break by (count desc, left, right) — binary string order in
  * both engines.
  *
  * Simplification vs a production tokenizer: no end-of-word marker and
  * no byte fallback; the merge-learning loop itself is the operator.
  */
object BpeOps {

  /** The learned merge table: (round, left_sym, right_sym, pair_count)
    * for `rounds` merges. Each round's vocabulary and argmax are
    * persisted so later rounds extend a materialized frame instead of
    * re-deriving the whole prefix of the loop. */
  def bpeMerges(df: DataFrame, text: Column, rounds: Int,
                cacheKey: Option[String] = None): DataFrame =
    induceCached(df, text, rounds, cacheKey)._1

  /** The corpus ENCODED with the learned merges: the final vocabulary's
    * segment column exploded to (symbol, weighted count), top `topK` by
    * count — i.e. the learned sub-word inventory actually in use. */
  def bpeEncodedSymbols(df: DataFrame, text: Column, rounds: Int,
                        topK: Int, cacheKey: Option[String] = None): DataFrame = {
    val vocab = induceCached(df, text, rounds, cacheKey)._2
    vocab.select(explode(split(trim(col("sym")), " ")).as("symbol"), col("n"))
      .groupBy("symbol").agg(sum(col("n")).as("cnt"))
      .orderBy(col("cnt").desc, col("symbol")).limit(topK)
  }

  /** Per-word segmentation arity under the learned merges: one row per
    * corpus word TYPE — (w, pieces, n) where `pieces` is how many
    * sub-word symbols the final vocabulary splits the word into and `n`
    * its corpus count. The word string is recovered by stripping the
    * segmentation spaces (merges move spaces, never characters).
    * Feeds fertility reports (q159): tokens-per-word by domain is THE
    * tokenizer-efficiency metric a mixed-domain corpus owner tracks. */
  def bpeWordPieces(df: DataFrame, text: Column, rounds: Int,
                    cacheKey: Option[String] = None): DataFrame = {
    val vocab = induceCached(df, text, rounds, cacheKey)._2
    vocab.select(replace(col("sym"), lit(" "), lit("")).as("w"),
      size(split(trim(col("sym")), " "))
        .cast(org.apache.spark.sql.types.LongType).as("pieces"),
      col("n"))
  }

  /** Learn-once cache: q76 (merge table) and q82 (encoding) share one
    * induction per (session, key, rounds) — a deployment trains the
    * tokenizer once and both artifacts derive from it. Session-scoped
    * so a cached frame never outlives the SparkSession persisting it. */
  private val induceCache =
    new graft.SessionMemo[(String, Int), (DataFrame, DataFrame)]

  private def induceCached(df: DataFrame, text: Column, rounds: Int,
                           cacheKey: Option[String]): (DataFrame, DataFrame) =
    cacheKey match {
      case None => induce(df, text, rounds)
      case Some(key) =>
        induceCache.getOrBuild(df.sparkSession, (key, rounds)) {
          // durable through FrameStore when configured: the induction's
          // merge-round corpus passes publish once per (key, rounds);
          // a fresh session re-hydrates the tokenizer tables from
          // parquet. The lazy holder runs induce at most once — only
          // when at least one of the two frames is unpublished.
          val s = df.sparkSession
          lazy val built = induce(df, text, rounds)
          (graft.etl.FrameStore.getOrBuild(s, key, s"bpe-$rounds-merges")(built._1),
            graft.etl.FrameStore.getOrBuild(s, key, s"bpe-$rounds-vocab")(built._2))
        }
    }

  private def induce(df: DataFrame, text: Column,
                     rounds: Int): (DataFrame, DataFrame) = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var vocab = df.select(explode(TextOps.tokens(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")).as("sym"),
        col("n"))
      .persist(lvl)
    var merges = Vector.empty[DataFrame]
    for (round <- 1 to rounds) {
      val t = split(trim(col("sym")), " ")
      val best = vocab
        .select(col("n"), explode(arrays_zip(
          slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1))).as("p"))
        .select(col("p").getField("0").as("left_sym"),
          col("p").getField("1").as("right_sym"), col("n"))
        .groupBy("left_sym", "right_sym").agg(sum(col("n")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
        .limit(1)
        .persist(lvl)
      merges = merges :+ best.withColumn("round", lit(round.toLong))
      vocab = vocab.crossJoin(broadcast(best))
        .select(replace(col("sym"),
          concat(lit(" "), col("left_sym"), lit(" "), col("right_sym"), lit(" ")),
          concat(lit(" "), col("left_sym"), col("right_sym"), lit(" "))).as("sym"),
          col("n"))
        .persist(lvl)
    }
    val mergesDf = merges.reduce(_ unionByName _)
      .select(col("round"), col("left_sym"), col("right_sym"), col("pair_count"))
    (mergesDf, vocab)
  }

  /** Oracle CTE chain mirroring `bpeMerges` round by round (used by the
    * driver query's SQL; kept here so the unroll count always matches). */
  def oracleSql(rounds: Int): String = {
    def pairs(src: String, out: String) =
      s"""$out AS (
         |  SELECT p[1] AS left_sym, p[2] AS right_sym, CAST(sum(n) AS BIGINT) AS pair_count
         |  FROM (SELECT n, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p
         |        FROM (SELECT string_split_regex(trim(sym), ' ') AS t, n FROM $src) z)
         |  GROUP BY 1, 2)""".stripMargin
    def argmax(src: String, out: String) =
      s"$out AS (SELECT left_sym, right_sym, pair_count FROM $src ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1)"
    def apply(src: String, m: String, out: String) =
      s"""$out AS (
         |  SELECT replace(sym, ' ' || $m.left_sym || ' ' || $m.right_sym || ' ',
         |                 ' ' || $m.left_sym || $m.right_sym || ' ') AS sym, n
         |  FROM $src, $m)""".stripMargin
    val v0 =
      """v0 AS (
        |  SELECT ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS sym,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents)
        |  GROUP BY 1)""".stripMargin
    val stages = (1 to rounds).flatMap { r =>
      val last = if (r == rounds) Nil
        else Seq(apply(s"v${r - 1}", s"m$r", s"v$r"))
      Seq(pairs(s"v${r - 1}", s"p$r"), argmax(s"p$r", s"m$r")) ++ last
    }
    val selects = (1 to rounds).map { r =>
      s"SELECT CAST($r AS BIGINT) AS round, left_sym, right_sym, pair_count FROM m$r"
    }
    s"""WITH $v0,
       |${stages.mkString(",\n")}
       |${selects.mkString("\nUNION ALL ")}
       |ORDER BY round""".stripMargin
  }

  /** Oracle for [[bpeEncodedSymbols]]: the same round unroll, but every
    * round applies its merge (the final vocabulary exists), then the
    * symbol inventory is counted. */
  def encodeOracleSql(rounds: Int, topK: Int): String = {
    def pairs(src: String, out: String) =
      s"""$out AS (
         |  SELECT p[1] AS left_sym, p[2] AS right_sym, CAST(sum(n) AS BIGINT) AS pair_count
         |  FROM (SELECT n, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p
         |        FROM (SELECT string_split_regex(trim(sym), ' ') AS t, n FROM $src) z)
         |  GROUP BY 1, 2)""".stripMargin
    def argmax(src: String, out: String) =
      s"$out AS (SELECT left_sym, right_sym FROM $src ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1)"
    def apply(src: String, m: String, out: String) =
      s"""$out AS (
         |  SELECT replace(sym, ' ' || $m.left_sym || ' ' || $m.right_sym || ' ',
         |                 ' ' || $m.left_sym || $m.right_sym || ' ') AS sym, n
         |  FROM $src, $m)""".stripMargin
    val v0 =
      """v0 AS (
        |  SELECT ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS sym,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents)
        |  GROUP BY 1)""".stripMargin
    val stages = (1 to rounds).flatMap { r =>
      Seq(pairs(s"v${r - 1}", s"p$r"), argmax(s"p$r", s"m$r"),
        apply(s"v${r - 1}", s"m$r", s"v$r"))
    }
    s"""WITH $v0,
       |${stages.mkString(",\n")}
       |SELECT symbol, CAST(sum(n) AS BIGINT) AS cnt FROM (
       |  SELECT unnest(string_split_regex(trim(sym), ' ')) AS symbol, n FROM v$rounds)
       |GROUP BY 1 ORDER BY cnt DESC, symbol LIMIT $topK""".stripMargin
  }

  /** Oracle for per-source fertility (q159): the same round unroll down
    * to the final vocabulary, then word→pieces joined onto per-source
    * word counts — mirroring [[bpeWordPieces]] + the q159 rollup. */
  def fertilityOracleSql(rounds: Int): String = {
    def pairs(src: String, out: String) =
      s"""$out AS (
         |  SELECT p[1] AS left_sym, p[2] AS right_sym, CAST(sum(n) AS BIGINT) AS pair_count
         |  FROM (SELECT n, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p
         |        FROM (SELECT string_split_regex(trim(sym), ' ') AS t, n FROM $src) z)
         |  GROUP BY 1, 2)""".stripMargin
    def argmax(src: String, out: String) =
      s"$out AS (SELECT left_sym, right_sym FROM $src ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1)"
    def apply(src: String, m: String, out: String) =
      s"""$out AS (
         |  SELECT replace(sym, ' ' || $m.left_sym || ' ' || $m.right_sym || ' ',
         |                 ' ' || $m.left_sym || $m.right_sym || ' ') AS sym, n
         |  FROM $src, $m)""".stripMargin
    val v0 =
      """v0 AS (
        |  SELECT ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS sym,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents)
        |  GROUP BY 1)""".stripMargin
    val stages = (1 to rounds).flatMap { r =>
      Seq(pairs(s"v${r - 1}", s"p$r"), argmax(s"p$r", s"m$r"),
        apply(s"v${r - 1}", s"m$r", s"v$r"))
    }
    s"""WITH $v0,
       |${stages.mkString(",\n")},
       |vmap AS (
       |  SELECT replace(sym, ' ', '') AS w,
       |    CAST(len(string_split_regex(trim(sym), ' ')) AS BIGINT) AS pieces
       |  FROM v$rounds),
       |swc AS (
       |  SELECT source, w, count(*) AS k FROM (
       |    SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS w
       |    FROM documents) GROUP BY 1, 2)
       |SELECT source,
       |  CAST(sum(k) AS BIGINT) AS n_word_tokens,
       |  CAST(sum(k * pieces) AS BIGINT) AS n_pieces,
       |  CAST((10000 * sum(k * pieces)) // sum(k) AS BIGINT) AS fertility_fp,
       |  CAST((100 * sum(k * length(w))) // sum(k * pieces) AS BIGINT)
       |    AS chars_per_piece_fp
       |FROM swc JOIN vmap USING (w)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
