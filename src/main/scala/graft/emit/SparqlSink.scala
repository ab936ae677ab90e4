package graft.emit

import org.apache.spark.sql.Dataset

/** S9 — SPARQL sink statement generation (reference
  * `core/src/core/services/graph_db_manufacturer_service.py:11-34`,
  * client `core/src/core/utils/graph_db_client.py:21-52`).
  *
  * Per-company graph replacement is DELETE-where-prefix + INSERT DATA.
  * The engine's job is generating those statements per company from the
  * triples Dataset; actually POSTing them is a `foreachPartition` HTTP
  * stage behind [[SparqlEndpoint]] (stubbed offline) with bounded
  * parallelism — N-Triples files remain the primary output (T21).
  */
object SparqlSink {

  /** DELETE statement removing every subject under the company's URI
    * prefix (the reference deletes `STRSTARTS(str(?s), prefix)`).
    */
  def deleteStatement(etld1: String): String = {
    val prefix = s"${Triples.SDK}${Triples.uriStrip(etld1)}-"
    s"""DELETE { ?s ?p ?o } WHERE { ?s ?p ?o . FILTER(STRSTARTS(STR(?s), "$prefix")) }"""
  }

  def insertStatement(triples: Seq[Triple]): String =
    triples.map(Triples.toNTriple).mkString("INSERT DATA {\n", "\n", "\n}")

  /** One (etld1, deleteStatement, insertStatement) row per company. */
  def statements(triples: Dataset[(String, Triple)]): Dataset[(String, String, String)] = {
    val spark = triples.sparkSession
    import spark.implicits._
    triples.groupByKey(_._1).mapGroups { (etld1, rows) =>
      (etld1, deleteStatement(etld1), insertStatement(rows.map(_._2).toSeq))
    }
  }

  /** External endpoint boundary (120 s timeout in the reference). */
  trait SparqlEndpoint extends Serializable {
    def update(statement: String): Unit
  }

  /** Push per-company replacements with per-partition connection reuse. */
  def push(stmts: Dataset[(String, String, String)], endpoint: SparqlEndpoint): Unit =
    stmts.foreachPartition { (it: Iterator[(String, String, String)]) =>
      it.foreach { case (_, del, ins) =>
        endpoint.update(del)
        endpoint.update(ins)
      }
    }
}
