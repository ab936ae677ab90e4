package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one entry per implemented operator from
  * SURVEY.md §2; `oracleSql` carries the DuckDB-equivalent SQL for the
  * driver's correctness gate. Column names are aligned between both
  * sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_multi_join_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.TextOps.queries ++
      graft.queries.VectorOps.queries ++ graft.queries.Curation.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++ graft.queries.TextOps.oracle ++
      graft.queries.VectorOps.oracle ++ graft.queries.Curation.oracle
}
