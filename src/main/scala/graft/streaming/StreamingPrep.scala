package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

import graft.ext.TextOps

/** Streaming corpus preparation: the batch prep gates — language ID,
  * quality score, PII redaction — are narrow column expressions, so the
  * EXACT same `TextOps` operators the batch pipeline runs compose
  * unchanged into a Structured Streaming query; no re-implementation,
  * no semantic drift between batch and streaming corpus prep. The only
  * stateful stage is the first-seen dedup ([[StreamingDedup]]), keyed
  * on the digest of the REDACTED text (so two docs differing only in
  * their PII dedup together).
  *
  * Scale notes: gates run per micro-batch at scan speed (codegen'd
  * regex/arithmetic, zero shuffle); dedup state = one boolean per
  * distinct digest, partitioned across the cluster and checkpointed.
  */
object StreamingPrep {

  /** Stateless gate + redaction stage. Works identically on batch and
    * streaming frames; expects (doc_id, text). */
  def prep(df: DataFrame, minQuality: Double = 0.3,
           langs: Seq[String] = Seq("en")): DataFrame =
    df.withColumn("lang", TextOps.langId(col("text")))
      .withColumn("quality", TextOps.qualityScore(col("text")))
      .filter(col("lang").isin(langs: _*) && col("quality") >= minQuality)
      .withColumn("text", TextOps.redactPii(col("text")))

  /** Stateless blocklist tagging at INGEST time — contamination
    * markers stamped at the door, not after the corpus landed: ONE
    * Aho–Corasick automaton pass
    * ([[graft.functions.TextScanExpressions.multiMatchIds]]) per
    * document finds every blocklist pattern, and the whole pattern set
    * rides the plan as one reference object, so per-batch cost is
    * O(text + matches) regardless of blocklist size (rehearsal-pinned
    * flat from 10 to 10k patterns). Works identically on batch and
    * streaming frames; composes before/after [[prep]]. */
  def tagBlocklist(df: DataFrame, patterns: Seq[String],
                   textCol: String = "text"): DataFrame =
    df.withColumn("blocklist_ids",
      graft.functions.TextScanExpressions.multiMatchIds(col(textCol), patterns))

  /** [[tagBlocklist]] as a gate: rows matching ANY blocklist pattern
    * are dropped before they reach the corpus. */
  def dropBlocklisted(df: DataFrame, patterns: Seq[String],
                      textCol: String = "text"): DataFrame =
    tagBlocklist(df, patterns, textCol)
      .filter(size(col("blocklist_ids")) === 0)
      .drop("blocklist_ids")

  /** Stateless media fingerprinting at INGEST
    * ([[graft.ext.MultimodalOps.mediaFingerprints]] on a streaming
    * frame): image rows get their perceptual dHash, audio rows their
    * loudness-delta fingerprint, in ONE decode pass at the door — the
    * key a later exact-dup gate (first-seen on (kind, fingerprint) via
    * [[StreamingDedup]]) or near-dup block join consumes. Expects
    * `(media_id, kind, payload)`. */
  def fingerprintMedia(df: DataFrame): DataFrame =
    graft.ext.MultimodalOps.mediaFingerprints(df)

  /** Stateless HTML → text extraction at INGEST
    * ([[graft.ext.HtmlOps.htmlMainText]] on a streaming frame): markup
    * corpora enter the stream already extracted, so every downstream
    * gate — language/quality, blocklist, the dedup digest — sees
    * main-content text and page chrome never reaches a quality score
    * or a dedup key. One codegen'd per-row regexp chain, stateless,
    * no state store; composes before [[prep]] exactly like the batch
    * funnel's [[graft.ext.CorpusPipeline.cleanHtml]]. Reads `htmlCol`,
    * emits/overwrites `text`. */
  def extractHtml(df: DataFrame, htmlCol: String = "html"): DataFrame =
    df.withColumn("text", graft.ext.HtmlOps.htmlMainText(col(htmlCol)))

  /** [[cleanStream]] over RAW-MARKUP input: extraction → gates →
    * redaction → stateful first-seen dedup on the extracted+redacted
    * digest — two pages differing only in chrome (or PII) dedup
    * together. */
  def cleanHtmlStream(df: DataFrame, minQuality: Double = 0.3,
                      langs: Seq[String] = Seq("en"),
                      htmlCol: String = "html"): Dataset[StreamingDedup.Doc] =
    cleanStream(extractHtml(df, htmlCol), minQuality, langs)

  /** Full streaming prep: gates → redaction → stateful first-seen
    * dedup on the redacted digest. Append-mode output. */
  def cleanStream(df: DataFrame, minQuality: Double = 0.3,
                  langs: Seq[String] = Seq("en")): Dataset[StreamingDedup.Doc] = {
    implicit val docEnc = Encoders.product[StreamingDedup.Doc]
    StreamingDedup.dedup(
      prep(df, minQuality, langs)
        .select(md5(col("text")).as("digest"),
          col("doc_id").cast("long").as("docId"), col("text"))
        .as[StreamingDedup.Doc])
  }
}
