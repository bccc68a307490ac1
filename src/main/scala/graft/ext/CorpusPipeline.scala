package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: the composed pipeline a
  * 100 TB pretraining-data run actually executes, built from the
  * individually-verified stages —
  *
  *   language gate → quality gate → exact dedup (keep min id) →
  *   fingerprint near-dup resolution (connected components, keep min)
  *
  * Every stage is a narrow filter or a key-shuffle; nothing collects.
  * The near-dup stage here uses fingerprint collisions (deterministic
  * and oracle-able); swap `DedupOps.nearDedup` in for MinHash-LSH
  * recall when approximate coverage matters more than auditability.
  */
object CorpusPipeline {

  /** Exact dedup keeping the MINIMUM id of each duplicate class —
    * deterministic, unlike dropDuplicates' arbitrary survivor. ONE
    * digest-partitioned window pass: rank within the digest class and
    * keep rank 1 (ids are unique, so min-id ≡ row_number 1 ordered by
    * id). The previous agg + left-semi form read `df` twice and paid a
    * SECOND corpus-row shuffle (by id, full text payload) for the
    * join; the window moves the rows once, by digest (guide §2.4). */
  def exactDedupKeepMin(df: DataFrame, id: Column, text: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(md5(text)).orderBy(id)))
      .filter(col("__rn") === 1).drop("__rn")
  }

  private def gate(df: DataFrame, text: Column,
                   lang: String, minQuality: Double): DataFrame =
    df.filter(TextOps.langId(text) === lang &&
      TextOps.qualityScore(text) >= minQuality)

  /** Fingerprint near-dup resolution over an (already exact-deduped)
    * frame: keep the min-id row of each fingerprint class. The
    * fingerprint is ONE value per doc, so the "collision graph" is a
    * disjoint union of same-fp cliques and connected components ARE
    * the fp groups — the survivor is a map-side-combined grouped min
    * plus one semi join, NOT a pair join + union-find. (The earlier
    * pair-join + resolveClusters form computed the same answer but
    * paid a quadratic self-join inside large fp classes: at the ×1000
    * probe, two 234-s union-find checkpoint rounds over 3.7 GB frames
    * — for a groupBy. resolveClusters remains the right tool where a
    * doc carries MANY keys — MinHash bands, SimHash blocks.)
    * `exact` should be persisted by the caller (it feeds the
    * fingerprint pass AND the final semi join). */
  private def fpResolve(exact: DataFrame, id: Column, text: Column): DataFrame = {
    // persisted: the class-count-sized survivor set caches the
    // EXPENSIVE input pass (per-shingle md5 fingerprints over the
    // corpus) the way the old fps.persist did — repeat executions
    // plan-key onto it instead of re-hashing every shingle
    val keep = exact
      .select(id.as("__cid"), TextOps.fingerprint(text, 5).as("__fp"))
      .groupBy(col("__fp")).agg(min(col("__cid")).as("__keep_id"))
      .select(col("__keep_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    exact.join(keep, id === col("__keep_id"), "left_semi")
  }

  /** The cleaned corpus: rows of `df` that survive all four stages. */
  def clean(df: DataFrame, id: Column, text: Column,
            lang: String = "en", minQuality: Double = 0.5): DataFrame = {
    val exact = exactDedupKeepMin(gate(df, text, lang, minQuality), id, text)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fpResolve(exact, id, text)
  }

  /** [[clean]] over RAW-MARKUP input: [[HtmlOps.htmlMainText]]
    * extraction first (chrome dropped, blocks segmented), then the
    * identical four-stage funnel over the extracted text. The
    * extraction is a per-row codegen'd map fused into the first gate's
    * scan — Common-Crawl-shaped corpora enter here instead of
    * pre-extracting in a separate pass. Output keeps `df`'s schema. */
  def cleanHtml(df: DataFrame, id: Column, html: Column,
                lang: String = "en", minQuality: Double = 0.5): DataFrame =
    clean(df.withColumn("__extracted_text", HtmlOps.htmlMainText(html)),
        id, col("__extracted_text"), lang, minQuality)
      .drop("__extracted_text")

  /** [[cleanSummary]] over RAW-MARKUP input — the [[cleanHtml]]
    * extraction feeding the same four-stage attrition funnel. */
  def cleanHtmlSummary(df: DataFrame, id: Column, html: Column,
                       lang: String = "en", minQuality: Double = 0.5): DataFrame =
    cleanSummary(df.withColumn("__extracted_text", HtmlOps.htmlMainText(html)),
      id, col("__extracted_text"), lang, minQuality)

  /** One-row funnel summary (input → gated → exact-deduped → final):
    * the per-stage attrition a pipeline owner monitors. Stage frames
    * are persisted so the gates / dedup run ONCE, not once per count
    * branch; 1-row counts attach via broadcast cross joins — no driver
    * collect. */
  def cleanSummary(df: DataFrame, id: Column, text: Column,
                   lang: String = "en", minQuality: Double = 0.5): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val gated = gate(df, text, lang, minQuality)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val exact = exactDedupKeepMin(gated, id, text)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cleaned = fpResolve(exact, id, text)
    df.agg(count(lit(1)).as("n_input"))
      .crossJoin(broadcast(gated.agg(count(lit(1)).as("n_gated"))))
      .crossJoin(broadcast(exact.agg(count(lit(1)).as("n_exact"))))
      .crossJoin(broadcast(cleaned.agg(count(lit(1)).as("n_final"))))
  }
}
