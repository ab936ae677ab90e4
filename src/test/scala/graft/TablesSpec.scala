package graft

import java.sql.Timestamp

/** Pins `Tables.loadEvents`' footer probe across the two timestamp
  * physical types the driver's generator has shipped:
  *
  *  - `events_us/`  — parquet TIMESTAMP(MICROS) (generator since r4's
  *    testdata refresh): must read natively.
  *  - `events_ns/`  — parquet TIMESTAMP(NANOS) (earlier generator;
  *    Spark's vectorized reader rejects it at schema inference): must
  *    take the BIGINT-nanos fallback and truncate to micros.
  *
  * The two fixtures encode the SAME instants (the nanos file adds 999
  * trailing nanoseconds, which ns→us truncation must drop — DuckDB's
  * CAST(ns AS TIMESTAMP) semantics), so both paths must produce
  * byte-identical rows. A generator flip can never silently collapse
  * event timestamps again (CORRECTNESS_r04's 8 red event-time rows).
  */
class TablesSpec extends SparkSpec {
  private def fixture(name: String): String =
    getClass.getResource(s"/$name/events.parquet") match {
      case null => fail(s"missing test fixture $name/events.parquet")
      case url  => new java.io.File(url.toURI).getParent
    }

  private val expected = Seq(
    (0L, Timestamp.valueOf("2024-01-01 00:00:07.179575"), 7L, "view", 1.5),
    (1L, Timestamp.valueOf("2024-01-01 00:03:52.824425"), 8L, "click", 2.25),
    (2L, Timestamp.valueOf("2024-01-01 00:06:29.165275"), 9L, "error", 3.0))

  private def rows(dir: String) =
    Tables.load(spark, dir, "events")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
                 r.getString(3), r.getDouble(4)))
      .sortBy(_._1).toSeq

  test("micros-typed events read natively with exact sub-ms precision") {
    assert(rows(fixture("events_us")) == expected)
  }

  test("nanos-typed events fall back to BIGINT read, truncated to micros") {
    assert(rows(fixture("events_ns")) == expected)
  }

  test("ts column lands as session-TZ TimestampType on both paths") {
    import org.apache.spark.sql.types.TimestampType
    for (f <- Seq("events_us", "events_ns"))
      assert(Tables.load(spark, fixture(f), "events")
        .schema("ts").dataType == TimestampType, f)
  }
}
