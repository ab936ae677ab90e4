package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants that are otherwise only enforced by
  * reading CORRECTNESS output after the fact:
  *  - every gate query has a DuckDB oracle (a missing key silently
  *    downgrades that query to a rows-only check);
  *  - no orphan oracles;
  *  - query numbering is unique (a duplicated qNN key would make one
  *    Map entry silently shadow the other).
  */
class GateContractSpec extends AnyFunSuite {

  test("every query is oracled and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries with no oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
  }

  test("query names are well-formed and numbers are unique") {
    val names = SparkEntry.queries.keySet
    names.foreach(n => assert(n.matches("q\\d{2,3}_[a-z0-9_]+"), s"bad name: $n"))
    val nums = names.toSeq.map(_.drop(1).takeWhile(_.isDigit).toInt)
    assert(nums.distinct.size == nums.size,
      s"duplicate query numbers: ${nums.diff(nums.distinct)}")
  }

  test("oracle SQL bodies are non-trivial") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.length > 20 && sql.toUpperCase.contains("SELECT"),
        s"$name oracle looks empty")
    }
  }
}
