package graft.emit

import org.apache.spark.sql.Dataset

import graft.reconcile.{Address, AddressMerge}
import graft.vocab.Concept

/** One RDF triple; `objectIsLiteral` picks N-Triples serialization. */
final case class Triple(s: String, p: String, o: String, objectIsLiteral: Boolean,
    datatype: String = null)

/** The manufacturer output row feeding the knowledge graph (subset of
  * SURVEY.md §1.3 relevant to triple emission).
  */
final case class MfgOut(
    etld1: String,
    name: String,
    web_address: String,
    founded_in: Option[Int],
    num_employees: Option[Int],
    email_addresses: Seq[String],
    business_desc: String,
    products: Seq[String],
    certificates: Seq[String],
    industries: Seq[String],
    process_caps: Seq[String],
    material_caps: Seq[String],
    addresses: Seq[Address],
    business_statuses: Seq[String] = Nil,
    primary_naics: Option[String] = None,
    secondary_naics: Seq[String] = Nil)

/** T21 — triple generation (reference
  * `core/src/core/services/ttl_generator_service.py:77-632`) and the
  * N-Triples writer. One `flatMap` per manufacturer row; the ontology
  * label→Concept lookup rides the closure (broadcast-sized).
  *
  * `strict = true` raises on missing required fields; lenient skips
  * (reference per-field `strict` flag).
  */
object Triples {

  // Public ontology namespaces used by the reference KG.
  val SDK = "http://asu.edu/semantics/SUDOKN/"
  val IofCore = "https://spec.industrialontologies.org/ontology/core/Core/"
  val IofScro = "https://spec.industrialontologies.org/ontology/supplychain/SupplyChainReferenceOntology/"
  val Geo = "http://www.opengis.net/ont/geosparql#"
  val Schema = "https://schema.org/"
  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  val RdfsLabel = "http://www.w3.org/2000/01/rdf-schema#label"
  val XsdInt = "http://www.w3.org/2001/XMLSchema#int"

  /** Percent-encode for URI slugs (reference
    * `data_etl_app/src/data_etl_app/utils/ttl_generator_util.py:4-16`):
    * everything outside `~.-_` + alphanumerics is %XX-encoded.
    */
  def uriStrip(value: String): String = {
    require(value != null, "Value for URI stripping cannot be None")
    val safe = "~.-_0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    val bytes = value.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new StringBuilder
    bytes.foreach { b =>
      val c = (b & 0xff).toChar
      if (safe.indexOf(c) >= 0) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  def mfgInstanceUri(etld1: String): (String, String) = {
    val stripped = uriStrip(etld1)
    (s"$SDK$stripped-company-instance", stripped)
  }

  private def res(s: String, p: String, o: String) = Triple(s, p, o, objectIsLiteral = false)
  private def lit(s: String, p: String, o: String, dt: String = null) =
    Triple(s, p, o, objectIsLiteral = true, datatype = dt)

  /** Ownership-status lookup including altLabels (reference
    * `ontology_service.py:318-329`). [[emit]] builds this ONCE and
    * passes it through the per-row overload — rebuilding an
    * O(|ontology|) map per manufacturer row would dominate at scale.
    */
  def ownershipMap(conceptsByName: Map[String, Concept]): Map[String, Concept] =
    conceptsByName.values.filter(_.scheme == "ownership")
      .flatMap(c => (c.name +: c.altLabels).map(_ -> c)).toMap

  /** All triples for one manufacturer. `conceptsByName` resolves
    * certificate/industry/process/material names to ontology concepts
    * for typed individuals.
    */
  def forManufacturer(
      m: MfgOut,
      conceptsByName: Map[String, Concept],
      strict: Boolean = false): Vector[Triple] =
    forManufacturer(m, conceptsByName, ownershipMap(conceptsByName), strict)

  /** Per-row form with the ownership lookup precomputed (see [[emit]]). */
  def forManufacturer(
      m: MfgOut,
      conceptsByName: Map[String, Concept],
      ownershipByLabel: Map[String, Concept],
      strict: Boolean): Vector[Triple] = {
    require(m.etld1 != null && m.etld1.nonEmpty, "manufacturer must have a valid etld1")
    val (mfg, stripped) = mfgInstanceUri(m.etld1)
    val out = Vector.newBuilder[Triple]
    out += res(mfg, RdfType, s"${IofCore}Manufacturer")

    def required(field: String, ok: Boolean)(body: => Unit): Unit =
      if (!ok) { if (strict) throw new IllegalArgumentException(s"$field cannot be empty") }
      else body
    // Reference `add_manufacturer_triples` (`ttl_generator_service.py:576-586`)
    // hardcodes strict=False for founded_in / emails / num_employees /
    // business statuses / NAICS / addresses / business description —
    // missing values skip even in strict mode; only element-level
    // emptiness raises.
    def optional(ok: Boolean)(body: => Unit): Unit = if (ok) body

    required("name", m.name != null && m.name.nonEmpty) {
      out += lit(mfg, RdfsLabel, m.name)
    }
    required("web address", m.web_address != null && m.web_address.nonEmpty) {
      val wa = s"$SDK${uriStrip(m.web_address)}-web-address-instance"
      out += res(wa, RdfType, s"${SDK}WebAddress")
      out += res(wa, RdfType, s"${SDK}VirtualLocationIdentifier")
      out += lit(wa, s"${SDK}hasVirtualLocationIdentifierValue", m.web_address)
      out += res(mfg, s"${SDK}hasWebAddress", wa)
    }
    optional(m.founded_in.nonEmpty) {
      out += lit(mfg, s"${SDK}hasOrganizationYearOfEstablishment",
        m.founded_in.get.toString, XsdInt)
    }
    optional(m.email_addresses != null) {
      m.email_addresses.foreach { email =>
        require(email != null && email.nonEmpty, "Email address cannot be empty")
        val e = s"$SDK$stripped-email-${uriStrip(email)}-instance"
        out += res(e, RdfType, s"${SDK}VirtualLocationIdentifier")
        out += res(e, RdfType, s"${SDK}EmailAddress")
        out += lit(e, s"${SDK}hasVirtualLocationIdentifierValue", email)
        out += res(mfg, s"${SDK}hasEmailAddress", e)
      }
    }
    optional(m.num_employees.nonEmpty) {
      out += lit(mfg, s"${SDK}hasTotalNumberOfEmployee",
        m.num_employees.get.toString, XsdInt)
    }

    // NAICS concepts are name-keyed with names like "NAICS 332710"
    // (`ontology_service.py:360-367`), so the shared `conceptsByName`
    // map serves the "NAICS " + code lookup directly.
    optional(m.business_statuses != null && m.business_statuses.nonEmpty) {
      m.business_statuses.foreach { label =>
        require(label != null && label.nonEmpty, "Business ownership status cannot be empty")
        val c = ownershipByLabel.getOrElse(label, throw new IllegalArgumentException(
          s"Ownership status '$label' not found in ontology."))
        val ind = s"$SDK${uriStrip(c.name)}-ownership-status-individual"
        out += res(ind, RdfType, c.uri)
        out += res(mfg, s"${SDK}hasOwnershipStatusClassifier", ind)
      }
    }

    def conceptOf(name: String, what: String): Concept =
      conceptsByName.getOrElse(name,
        throw new IllegalArgumentException(s"unknown $what concept: $name"))

    optional(m.primary_naics.exists(c => c != null && c.nonEmpty)) {
      val c = conceptOf("NAICS " + m.primary_naics.get, "NAICS code")
      val ind = s"$SDK${uriStrip(c.name)}-individual"
      out += res(ind, RdfType, c.uri)
      out += res(mfg, s"${SDK}hasPrimaryNAICSClassifier", ind)
    }
    optional(m.secondary_naics != null && m.secondary_naics.nonEmpty) {
      m.secondary_naics.foreach { code =>
        require(code != null && code.nonEmpty, "Secondary NAICS code cannot be empty")
        val c = conceptOf("NAICS " + code, "NAICS code")
        val ind = s"$SDK${uriStrip(c.name)}-individual"
        out += res(ind, RdfType, c.uri)
        out += res(mfg, s"${SDK}hasSecondaryNAICSClassifier", ind)
      }
    }

    optional(m.business_desc != null && m.business_desc.nonEmpty) {
      val d = s"$SDK$stripped-business-description-instance"
      out += res(d, RdfType, s"${SDK}BusinessDescription")
      out += lit(d, s"${IofScro}hasTextValue", m.business_desc)
      out += res(mfg, s"${SDK}hasBusinessDescription", d)
    }
    required("products", m.products != null) {
      m.products.foreach { prod =>
        require(prod != null && prod.nonEmpty, "Product name cannot be empty")
        val p = s"$SDK$stripped-${uriStrip(prod)}-product-instance"
        out += res(p, RdfType, s"${IofCore}MaterialProduct")
        out += lit(p, RdfsLabel, prod)
        out += res(mfg, s"${SDK}manufactures", p)
      }
    }

    // Certificates/industries: SHARED individuals (keyed by concept name
    // only); process/material capabilities: PER-COMPANY instances.
    required("certificates", m.certificates != null) {
      m.certificates.foreach { cert =>
        val c = conceptOf(cert, "certificate")
        val ind = s"$SDK${uriStrip(c.name)}-certificate-individual"
        out += res(ind, RdfType, c.uri)
        out += res(mfg, s"${SDK}hasCertificate", ind)
      }
    }
    required("industries", m.industries != null) {
      m.industries.foreach { indName =>
        val c = conceptOf(indName, "industry")
        val ind = s"$SDK${uriStrip(c.name)}-industry-individual"
        out += res(ind, RdfType, c.uri)
        out += res(mfg, s"${SDK}suppliesToIndustry", ind)
      }
    }
    required("process capabilities", m.process_caps != null) {
      m.process_caps.foreach { pc =>
        val c = conceptOf(pc, "process capability")
        val inst = s"$SDK$stripped-${uriStrip(c.name)}-process-capability-instance"
        out += res(inst, RdfType, c.uri)
        out += res(mfg, s"${SDK}hasProcessCapability", inst)
      }
    }
    required("material capabilities", m.material_caps != null) {
      m.material_caps.foreach { mc =>
        val c = conceptOf(mc, "material capability")
        val inst = s"$SDK$stripped-${uriStrip(c.name)}-material-capability-instance"
        out += res(inst, RdfType, c.uri)
        out += res(mfg, s"${SDK}hasMaterialCapability", inst)
      }
    }

    optional(m.addresses != null && m.addresses.nonEmpty) {
      AddressMerge.dedupe(m.addresses).zipWithIndex.foreach { case (addr, idx) =>
        val i = idx + 1
        val geo = s"$SDK$stripped-geolocation-$i-instance"
        out += res(geo, RdfType, s"${SDK}GeospatialLocation")
        out += res(geo, RdfType, s"${Geo}Feature")
        out += res(geo, RdfType, s"${Schema}Place")
        if (addr.name != null && addr.name.nonEmpty) out += lit(geo, RdfsLabel, addr.name)
        val street = Option(addr.address_lines).getOrElse(Nil).mkString(", ")
        if (street.nonEmpty) out += lit(geo, s"${Schema}streetAddress", street)
        val city = s"$SDK${uriStrip(addr.city)}-city-individual"
        out += res(city, RdfType, s"${SDK}City")
        out += lit(city, RdfsLabel, addr.city)
        out += res(geo, s"${SDK}locatedInCity", city)
        val state = s"$SDK${uriStrip(addr.state)}-state-individual"
        out += res(state, RdfType, s"${SDK}State")
        out += lit(state, RdfsLabel, addr.state)
        out += res(geo, s"${SDK}locatedInState", state)
        if (addr.county != null && addr.county.nonEmpty) {
          val county = s"$SDK${uriStrip(addr.county)}-county-individual"
          out += res(county, RdfType, s"${SDK}County")
          out += lit(county, RdfsLabel, addr.county)
          out += res(geo, s"${SDK}locatedInCounty", county)
        }
        if (addr.postal_code != null)
          out += lit(geo, s"${Schema}postalCode", addr.postal_code)
        val country = s"$SDK${uriStrip(addr.country)}-country-individual"
        out += res(country, RdfType, s"${SDK}Country")
        out += lit(country, RdfsLabel, addr.country)
        out += res(geo, s"${SDK}locatedInCountry", country)
        Option(addr.phone_numbers).getOrElse(Nil).filter(p => p != null && p.nonEmpty)
          .foreach(p => out += lit(geo, s"${Schema}telephone", p))
        Option(addr.fax_numbers).getOrElse(Nil).filter(f => f != null && f.nonEmpty)
          .foreach(f => out += lit(geo, s"${Schema}faxNumber", f))
        (addr.latitude, addr.longitude) match {
          case (Some(lat), Some(lng)) =>
            require(lat >= -90 && lat <= 90, "Latitude must be between -90 and 90 degrees")
            require(lng >= -180 && lng <= 180, "Longitude must be between -180 and 180 degrees")
            val geom = s"$SDK$stripped-geolocation-$i-geometry-instance"
            out += res(geom, RdfType, s"${Geo}Geometry")
            out += lit(geom, s"${Geo}asWKT", s"POINT($lng $lat)", s"${Geo}wktLiteral")
            out += res(geo, s"${Geo}hasGeometry", geom)
          case _ => // coordinates missing → no geometry node
        }
        out += res(mfg, s"${SDK}organizationLocatedIn", geo)
      }
    }
    out.result()
  }

  /** Escape an N-Triples literal (backslash, quote, newline, CR, tab). */
  def escapeLiteral(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  def toNTriple(t: Triple): String = {
    val obj =
      if (!t.objectIsLiteral) s"<${t.o}>"
      else if (t.datatype != null) s""""${escapeLiteral(t.o)}"^^<${t.datatype}>"""
      else s""""${escapeLiteral(t.o)}""""
    s"<${t.s}> <${t.p}> $obj ."
  }

  /** Distributed emission: one flatMap over manufacturer rows. Write
    * with `.map(toNTriple)` → text, partitioned by etld1 prefix for
    * per-company replacement at the SPARQL sink (S9).
    */
  def emit(mfgs: Dataset[MfgOut], concepts: Seq[Concept],
      strict: Boolean = false): Dataset[Triple] = {
    val spark = mfgs.sparkSession
    import spark.implicits._
    val byName = concepts.map(c => c.name -> c).toMap
    val ownership = ownershipMap(byName) // built once, rides the closure
    mfgs.flatMap(m => forManufacturer(m, byName, ownership, strict))
  }

  /** T19 — RDF sanity validation (reference
    * `rdf_validation_service.py:37-80`): every subject must be an
    * http(s) URI; returns (valid, totalUniqueSubjects, issues).
    */
  def validate(triples: Seq[Triple]): (Boolean, Int, Seq[String]) = {
    val subjects = triples.map(_.s).distinct
    val issues = subjects.filterNot(s => s.startsWith("http://") || s.startsWith("https://"))
      .map(s => s"subject is not an http(s) URI: $s")
    (issues.isEmpty, subjects.size, issues)
  }
}
