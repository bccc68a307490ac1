package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment: a streaming fact joined to a static
  * dimension. Stream-static joins are STATELESS — each micro-batch
  * joins against the dimension as-of plan time, no state store, no
  * watermark needed — which is why this is the first join shape to
  * reach for before a stateful stream-stream join.
  *
  * The dimension is broadcast explicitly: at 100 TB/day stream rates
  * the dim side is the small one by construction, and pinning the
  * broadcast keeps the per-batch plan from ever shuffling the stream.
  * `how = "left"` keeps unmatched facts (dimension columns NULL) so
  * late dimension arrivals do not silently drop events.
  */
object StreamingEnrich {

  def enrich(stream: DataFrame, dim: DataFrame, key: String,
             how: String = "left"): DataFrame =
    stream.join(broadcast(dim), Seq(key), how)
}
