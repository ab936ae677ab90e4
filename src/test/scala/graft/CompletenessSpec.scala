package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.chunk.Chunker
import graft.emit.{SparqlSink, Triple, Triples}
import graft.plans.{PromptRegistry, Reports}

class SparqlSinkSpec extends SparkSpec {
  import spark.implicits._

  test("delete statement targets the company's URI prefix") {
    val del = SparqlSink.deleteStatement("example.com")
    assert(del.contains(s"${Triples.SDK}example.com-"))
    assert(del.startsWith("DELETE"))
  }

  test("statements: one delete+insert pair per company") {
    val triples = Seq(
      ("a.com", Triple("http://s1", "http://p", "x", objectIsLiteral = true)),
      ("a.com", Triple("http://s2", "http://p", "http://o", objectIsLiteral = false)),
      ("b.com", Triple("http://s3", "http://p", "y", objectIsLiteral = true)))
    val stmts = SparqlSink.statements(triples.toDS()).collect()
      .map(s => s._1 -> s).toMap
    assert(stmts.size == 2)
    assert(stmts("a.com")._3.contains("<http://s1> <http://p> \"x\" ."))
    assert(stmts("a.com")._3.contains("<http://s2> <http://p> <http://o> ."))
    assert(!stmts("b.com")._3.contains("s1"))
  }

  test("push calls the endpoint delete-then-insert per company") {
    SparqlSinkSpec.calls.clear()
    val stmts = SparqlSink.statements(Seq(
      ("a.com", Triple("http://s1", "http://p", "x", objectIsLiteral = true))).toDS())
    // static collector: task closures are serialized even in local mode,
    // so an instance field would observe the executor's copy
    SparqlSink.push(stmts, new SparqlSink.SparqlEndpoint {
      override def update(statement: String): Unit =
        SparqlSinkSpec.calls.add(statement.take(6))
    })
    val seq = SparqlSinkSpec.calls.toArray(Array.empty[String]).toSeq
    assert(seq == Seq("DELETE", "INSERT"))
  }
}

object SparqlSinkSpec {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

class ReportsSpec extends SparkSpec {
  import spark.implicits._

  test("orphanRequests = ledger minus expected") {
    val ledger = Seq("a>F>mapping", "b>F>mapping", "stale>F>mapping")
      .toDF("custom_id")
    val expected = Seq("a>F>mapping", "b>F>mapping").toDF("custom_id")
    val orphans = Reports.orphanRequests(ledger, expected)
      .as[String].collect().toSeq
    assert(orphans == Seq("stale>F>mapping"))
  }
}

class PromptRegistrySpec extends AnyFunSuite {
  test("registry resolves names and versions; unknown raises") {
    val reg = PromptRegistry.fixture("v7")
    assert(reg("binary_classification").text.nonEmpty)
    assert(reg.versionOf("mapping_certificates") == "v7")
    assert(reg.names.length == 14)
    assertThrows[NoSuchElementException](reg("nope"))
  }
}

class ByteChunkerSpec extends AnyFunSuite {
  test("splits at newline boundaries under the cap") {
    val data = "{\"a\":1}\n{\"b\":2}\n{\"c\":3}\n".getBytes("UTF-8")
    val chunks = Chunker.splitBytesOnLineBoundaries(data, 10)
    assert(chunks.forall(_.length <= 10))
    chunks.dropRight(1).foreach(c => assert(c.last == '\n'.toByte))
    assert(chunks.map(new String(_, "UTF-8")).mkString == new String(data, "UTF-8"))
  }

  test("small input returned whole; empty returns none") {
    val data = "ab\ncd".getBytes
    assert(Chunker.splitBytesOnLineBoundaries(data, 100).map(_.toSeq) == Vector(data.toSeq))
    assert(Chunker.splitBytesOnLineBoundaries(Array.empty[Byte], 10).isEmpty)
  }

  test("no newline in window: hard split") {
    val data = ("x" * 50).getBytes
    val chunks = Chunker.splitBytesOnLineBoundaries(data, 20, newlineSearchWindow = 5)
    assert(chunks.map(_.length).sum == 50)
    assert(chunks.forall(_.length <= 20))
  }
}
