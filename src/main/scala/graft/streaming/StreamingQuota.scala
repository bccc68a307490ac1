package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online admission under a per-group token quota — the streaming APPLY
  * of a mixture plan (q178 UniMax allocation, q162 temperature quotas,
  * q163 raked weights), closing the plan→apply loop the way q187 does
  * in batch and StreamingScore does for classifiers.
  *
  * Semantics match q187's hard-prefix rule exactly: the per-group state
  * is the total tokens SEEN (admitted or not), and a document is
  * admitted iff seen-so-far + its tokens fits the quota — so one
  * oversized document cuts the tail for its group, deterministically,
  * exactly like the batch cumsum gate. Within a micro-batch, arrivals
  * are processed in docId order (the q187 order); on an in-order
  * replay the admitted set is therefore BIT-IDENTICAL to the batch
  * verdicts (spec-pinned). On an out-of-order transport the semantics
  * degrade to arrival-order prefix — the honest online policy (an
  * admission cannot be revoked), with deviation bounded by the
  * transport's reordering window.
  *
  * Scale notes: state is ONE long per group (language/source) — the
  * smallest state in the streaming family; no TTL needed. The
  * per-batch sort is per-group within a micro-batch (executor-local,
  * batch-sized). Quotas are plan metadata (model-sized), captured as a
  * broadcast-friendly literal map. */
object StreamingQuota {

  case class Doc(group: String, docId: Long, nTokens: Long)
  case class Verdict(group: String, docId: Long, nTokens: Long,
                     cumTokens: Long, admitted: Boolean)

  /** Admission verdicts for a stream of documents. Emits EVERY doc with
    * its running group total and the admit/cut decision (callers
    * filtering `admitted` get the curated stream; keeping both sides
    * makes the fill auditable downstream). */
  def admit(docs: Dataset[Doc], quotas: Map[String, Long]): Dataset[Verdict] = {
    StreamConf.ensureStateStore(docs.sparkSession)
    implicit val vEnc = Encoders.product[Verdict]
    implicit val longEnc = Encoders.scalaLong
    def step(key: String, it: Iterator[Doc],
             state: GroupState[Long]): Iterator[Verdict] = {
      val quota = quotas.getOrElse(key, 0L)
      var seen = state.getOption.getOrElse(0L)
      val out = it.toSeq.sortBy(_.docId).map { d =>
        seen += d.nTokens
        Verdict(key, d.docId, d.nTokens, seen, seen <= quota)
      }
      state.update(seen)
      out.iterator
    }
    docs.groupByKey(_.group)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step)
  }
}
