package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier politeness scheduling — the step between
  * [[Robots.allowed]] admission and the fetcher fleet: per host, URLs
  * fetch one at a time spaced by the host's crawl delay, so slot k
  * fires at `k × delay_ms`. A frontier that ignores this either
  * hammers hosts or (the subtler production failure) lets one
  * million-URL host serialize a whole fetch wave.
  *
  * Scale shape: hosts schedule independently — a per-HOST window
  * (priority desc, id asc — total order, deterministic) assigns slots,
  * a size-conditional broadcast joins the per-host delay table
  * (distinct hosts ≪ URLs), and the per-host budget cap bounds any
  * single host's contribution to the wave, which is ALSO the skew
  * guard: the window's largest partition group is `maxPerHost` after
  * the filter, but the rank itself is computed pre-filter, so a giant
  * host costs one window pass over its own rows, never a global sort.
  */
object Frontier {

  /** Assign fetch slots: `(… urls …, delay_ms, slot, fetch_offset_ms)`
    * for the first `maxPerHost` URLs per host by descending priority
    * (id ascending tiebreak). `delays` is (hostCol, delay_ms) from
    * [[Robots.crawlDelays]] (or any source); hosts absent from it get
    * `defaultDelayMs`.
    */
  def schedule(urls: DataFrame, idCol: String, hostCol: String,
      priorityCol: Column, delays: DataFrame, defaultDelayMs: Long,
      maxPerHost: Int): DataFrame = {
    require(maxPerHost > 0, s"maxPerHost must be positive: $maxPerHost")
    val d = delays.withColumnRenamed(hostCol, "__dhost")
    val w = Window.partitionBy(col(hostCol))
      .orderBy(priorityCol.desc, col(idCol).asc)
    urls
      .join(broadcast(d), urls(hostCol) === col("__dhost"), "left")
      .withColumn("delay_ms",
        coalesce(col("delay_ms"), lit(defaultDelayMs)))
      .drop("__dhost")
      .withColumn("slot", (row_number().over(w) - 1).cast("long"))
      .filter(col("slot") < maxPerHost)
      .withColumn("fetch_offset_ms", col("slot") * col("delay_ms"))
  }
}
