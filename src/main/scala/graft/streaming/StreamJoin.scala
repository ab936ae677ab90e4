package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join: each purchase joined to the
  * same user's views from the preceding `windowSec` seconds — the
  * attribution join, expressed the only way it stays bounded on two
  * unbounded feeds.
  *
  * Spark buffers BOTH sides in state; the watermarks plus the explicit
  * time-range predicate are what let it evict: a view older than
  * `watermark + windowSec` can never match a future purchase, so its
  * state is dropped. Without the range condition the state grows
  * forever — the condition is correctness AND the retention policy at
  * once (the knob a 100 TB/day dual feed tunes).
  *
  * Inner join: a purchase emits once per matching view, when both
  * sides have arrived; late rows beyond the watermark are dropped like
  * every event-time operator.
  */
object StreamJoin {

  /** @param purchases streaming frame `(user, pts, purchase cols…)`
    * @param views     streaming frame `(user, vts, view cols…)`
    * joined on equal `userCol` and `vts ∈ [pts - windowSec, pts]`.
    * Both frames must carry distinct column names apart from `userCol`.
    */
  def attributionJoin(
      purchases: DataFrame, views: DataFrame, userCol: String,
      purchaseTsCol: String, viewTsCol: String,
      windowSec: Long, watermark: String): DataFrame = {
    require(windowSec > 0, s"window must be positive, got $windowSec")
    val p = purchases.withWatermark(purchaseTsCol, watermark)
    val v = views.withWatermark(viewTsCol, watermark)
    p.join(v,
      p(userCol) === v(userCol) &&
        v(viewTsCol) >= p(purchaseTsCol) - expr(s"INTERVAL $windowSec SECONDS") &&
        v(viewTsCol) <= p(purchaseTsCol))
      .drop(v(userCol))
  }
}
