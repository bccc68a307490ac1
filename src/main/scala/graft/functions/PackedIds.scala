package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Guarded composite-id packing for chunk/passage grids (q137 shape):
  * `doc_id * stride + chunk_id` encodes (document, grid position) in one
  * long so downstream joins/rollups key on a single column. The packing
  * is only injective while `0 <= chunk_id < stride` and the multiply
  * stays inside Long — outside that envelope ids silently collide into
  * another document's id space and corrupt every cross-doc filter built
  * on `id div stride`. The guard makes out-of-range corpora FAIL LOUDLY
  * (SparkRuntimeException from `raise_error`) instead of mis-attributing
  * pairs; it costs two comparisons per row inside codegen.
  */
object PackedIds {

  /** Grid stride used by the passage queries: positions < 1e6 (at the
    * q137 window stride of 48 tokens that is ~48M tokens per document
    * before the grid overflows). */
  val GridStride: Long = 1000000L

  private def maxDoc(stride: Long): Long = (Long.MaxValue - (stride - 1)) / stride

  /** `docId * stride + chunkId`, or raise_error when either component
    * leaves the injective envelope. */
  def packGridId(docId: Column, chunkId: Column, stride: Long = GridStride): Column = {
    require(stride > 0, s"stride must be positive, got $stride")
    when(
      chunkId >= 0L && chunkId < stride && docId.between(0L, maxDoc(stride)),
      docId * stride + chunkId)
      .otherwise(raise_error(format_string(
        s"packGridId: id outside the injective envelope for stride $stride " +
          "(doc_id=%s, chunk_id=%s)",
        docId, chunkId)))
  }

}
