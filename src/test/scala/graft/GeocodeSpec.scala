package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.reconcile.{Address, Geocode}
import graft.reconcile.Geocode.{Geocoder, GeoResult}

class GeocodeSpec extends AnyFunSuite {
  private val addr = Address("HQ", "Phoenix", "AZ", "US",
    Seq("Suite 5", "123 Main St"), null, "85001", None, None, null, Nil, Nil)

  test("query candidates drop leading parts progressively") {
    assert(Geocode.queryCandidates(addr) == Seq(
      "Suite 5, 123 Main St, Phoenix, 85001, AZ, US",
      "123 Main St, Phoenix, 85001, AZ, US",
      "Phoenix, 85001, AZ, US",
      "85001, AZ, US",
      "AZ, US",
      "US"))
  }

  test("'Not Applicable' state is excluded; empty address yields none") {
    val na = addr.copy(state = "Not Applicable", address_lines = Nil, postal_code = null)
    assert(Geocode.queryCandidates(na) == Seq("Phoenix, US", "US"))
    val empty = Address(null, null, null, null, Nil, null, null, None, None, null, Nil, Nil)
    assert(Geocode.queryCandidates(empty).isEmpty)
    assert(Geocode.resolve(empty, _ => fail("should not be called")).isEmpty)
  }

  test("resolve shortens until the provider hits; errors are misses") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    val flakyCityLevel: Geocoder = q => {
      calls += q
      if (q.startsWith("Suite")) throw new RuntimeException("quota")
      else if (q.startsWith("Phoenix")) Some(GeoResult(33.4, -112.0, "place-1"))
      else None
    }
    val got = Geocode.resolve(addr, flakyCityLevel)
    assert(got.contains(GeoResult(33.4, -112.0, "place-1")))
    assert(calls.length == 3) // full (error), street (miss), city (hit)
  }

  test("cache hit skips the provider unless forced") {
    val cached = addr.copy(latitude = Some(1.0), longitude = Some(2.0), place_id = "p")
    assert(Geocode.resolve(cached, _ => fail("provider must not be called"))
      .contains(GeoResult(1.0, 2.0, "p")))
    val forced = Geocode.resolve(cached,
      (_: String) => Some(GeoResult(9.0, 9.0, "fresh")), force = true)
    assert(forced.contains(GeoResult(9.0, 9.0, "fresh")))
  }
}

class GeocodeSparkSpec extends SparkSpec {
  import spark.implicits._

  test("resolveAll attaches coordinates; misses pass through") {
    val rows = Seq(
      ("a.com", Address(null, "Phoenix", "AZ", "US", Nil, null, null, None, None, null, Nil, Nil)),
      ("b.com", Address(null, "Nowhere", "ZZ", "US", Nil, null, null, None, None, null, Nil, Nil)))
    val geocoder: Geocode.Geocoder = q =>
      if (q.contains("Phoenix")) Some(GeoResult(33.4, -112.0, "px")) else None
    val out = Geocode.resolveAll(rows.toDS().coalesce(1), geocoder)
      .collect().map(r => r._1 -> r._2).toMap
    assert(out("a.com").latitude.contains(33.4) && out("a.com").place_id == "px")
    assert(out("b.com").latitude.isEmpty)
  }
}
