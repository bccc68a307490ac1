package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous CDC apply: a stream of change rows maintained into a
  * parquet base store, one transactional rewrite per micro-batch via
  * `foreachBatch` — the streaming half of the lakehouse loop whose
  * batch pieces already exist (ChangeCapture derives change streams,
  * q81's latest-wins upsert applies them in batch).
  *
  * Per batch: latest change per key wins (ordered by `seqCol`, so
  * replays and intra-batch races resolve deterministically), deletes
  * drop, everything else upserts into the base; the write is
  * tmp-rewrite → directory swap, same single-writer discipline as
  * StoreMaintenance.compact. On an object store a table format's
  * manifest commit replaces the swap — the distributed merge below is
  * the part that stays. The foreachBatch checkpoint makes the apply
  * effectively exactly-once: a replayed batch re-derives the same
  * merged store, and [[recover]] repairs the one non-atomic window (a
  * crash between the two swap moves leaves the base stranded at
  * `._apply_bak`; replaying against a missing base would silently
  * rebuild the store from batch rows alone).
  */
object StreamingApply {

  private def rmTree(p: java.nio.file.Path): Unit =
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  /** Crash recovery, run at every batch start before touching data:
    *  - base missing but `._apply_bak` present → the previous run died
    *    between the two swap moves; restore the bak as the base (the
    *    checkpointed batch replays against the true base).
    *  - base present and `._apply_bak` present → died during bak
    *    cleanup (swap already complete); finish deleting the bak.
    *  - any leftover `._apply_tmp` is an incomplete rewrite → drop it
    *    (also unwedges the next swap's `Files.move` onto that name).
    */
  private[graft] def recover(store: String): Unit = {
    val dir = Paths.get(store)
    val bak = Paths.get(store + "._apply_bak")
    val tmp = Paths.get(store + "._apply_tmp")
    if (Files.exists(bak)) {
      if (!Files.exists(dir)) Files.move(bak, dir, StandardCopyOption.ATOMIC_MOVE)
      else rmTree(bak)
    }
    if (Files.exists(tmp)) rmTree(tmp)
  }

  private[graft] def applyBatch(batch: DataFrame, key: String,
                                    seqCol: String, store: String): Unit = {
    recover(store)
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val w = Window.partitionBy(col(key)).orderBy(col(seqCol).desc)
    val latest = batch.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val upserts = latest.filter(col("change") =!= "delete")
      .drop("change")
    val dir = Paths.get(store)
    val merged =
      if (Files.exists(dir))
        spark.read.parquet(store)
          .join(latest.select(col(key)), Seq(key), "left_anti")
          .unionByName(upserts)
      else upserts
    val tmp = Paths.get(store + "._apply_tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (Files.exists(dir)) {
      val bak = Paths.get(store + "._apply_bak")
      Files.move(dir, bak, StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
      rmTree(bak)
    } else Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Start applying `changes` (rows: key, `change` ∈
    * insert|update|delete, `seqCol`, payload…) into the parquet store
    * at `storePath`. Processes everything available, then stops. */
  def start(changes: DataFrame, key: String, seqCol: String,
            storePath: String, checkpointDir: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, _: Long) =>
        applyBatch(batch, key, seqCol, storePath))
      .trigger(Trigger.AvailableNow())
      .start()
}
