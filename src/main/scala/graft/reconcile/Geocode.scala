package graft.reconcile

import org.apache.spark.sql.Dataset

/** T14's geocoding stage (reference
  * `data_etl_app/src/data_etl_app/utils/lat_lng_util.py:18-95`).
  *
  * Query construction: address_lines ++ city ++ postal_code ++
  * state (unless "Not Applicable") ++ country; on a miss, retry with
  * progressively SHORTER queries by dropping leading parts (street
  * first, country last). Already-geocoded addresses (lat+lng+place_id
  * present) are cache hits unless forced.
  *
  * The provider is an external service — pluggable [[Geocoder]], driven
  * through `mapPartitions` with one client per partition and the same
  * bounded-parallelism rules as the inline exchange. Offline tests use
  * deterministic fakes.
  */
object Geocode {

  final case class GeoResult(latitude: Double, longitude: Double, placeId: String)

  trait Geocoder extends Serializable {
    /** None = no result for this query (triggers the shortening loop);
      * exceptions are treated as misses, like the reference.
      */
    def geocode(query: String): Option[GeoResult]
  }

  /** Build the full-to-shortest query candidates for an address. */
  def queryCandidates(addr: Address): Seq[String] = {
    val parts = Seq.newBuilder[String]
    Option(addr.address_lines).foreach(ls => ls.filter(l => l != null && l.nonEmpty).foreach(parts += _))
    if (addr.city != null && addr.city.nonEmpty) parts += addr.city
    if (addr.postal_code != null && addr.postal_code.nonEmpty) parts += addr.postal_code
    if (addr.state != null && addr.state.nonEmpty && addr.state != "Not Applicable")
      parts += addr.state
    if (addr.country != null && addr.country.nonEmpty) parts += addr.country
    val all = parts.result()
    all.indices.map(i => all.drop(i).mkString(", "))
  }

  /** Resolve one address: cache hit unless `force`; else the
    * progressively-shorter-query loop.
    */
  def resolve(addr: Address, geocoder: Geocoder, force: Boolean = false): Option[GeoResult] = {
    if (!force && addr.latitude.nonEmpty && addr.longitude.nonEmpty && addr.place_id != null)
      return Some(GeoResult(addr.latitude.get, addr.longitude.get, addr.place_id))
    queryCandidates(addr).iterator
      .map { q =>
        try geocoder.geocode(q)
        catch { case _: Exception => None } // provider errors = miss, keep shortening
      }
      .collectFirst { case Some(r) => r }
  }

  /** Geocode a Dataset of (etld1, address): one geocoder per partition,
    * results attached (misses keep the address un-coordinated).
    * Callers cap fan-out with `coalesce(n)` first — the reference runs
    * geocoding serially per company.
    */
  def resolveAll(
      addrs: Dataset[(String, Address)],
      geocoder: Geocoder): Dataset[(String, Address)] = {
    val spark = addrs.sparkSession
    import spark.implicits._
    val g = geocoder
    addrs.mapPartitions { rows =>
      rows.map { case (etld1, addr) =>
        resolve(addr, g) match {
          case Some(r) => (etld1, addr.copy(
            latitude = Some(r.latitude), longitude = Some(r.longitude),
            place_id = r.placeId))
          case None => (etld1, addr)
        }
      }
    }
  }
}
