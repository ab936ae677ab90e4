package graft.reconcile

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}

import graft.functions.JsonRepair

/** LLM response parsers (reconcile input layer). Behavior per reference:
  *
  *  - search results (`llm_search_service.py:50-84`): repair then parse a
  *    JSON array; any failure → empty set;
  *  - concept mapping (`map_known_to_unknown_service.py:59-84`): strip
  *    fences/labels, parse an object; failure RAISES (the mapping
  *    response is load-bearing);
  *  - binary classification (`binary_classifier_service.py:160-175`):
  *    `{answer, confidence, reason}`; failure raises;
  *  - business description (`extract_basic_service.py:193-212`):
  *    `{name, description}`; failure raises;
  *  - addresses (`extract_basic_service.py:106-160`): repair, parse an
  *    array of objects, default `country="US"`, uppercase country,
  *    skip unparseable entries; non-array → empty.
  */
object Parsers {

  @transient private lazy val mapper: ObjectMapper =
    new ObjectMapper().enable(DeserializationFeature.FAIL_ON_TRAILING_TOKENS)

  private def stripFences(s: String): String =
    JsonRepair.stripFenceMarkers(s)

  def parseSearchResponse(response: String): Set[String] = {
    if (response == null || response.isEmpty) return Set.empty
    val cleaned = try JsonRepair.repair(response) catch { case _: Exception => return Set.empty }
    try {
      val node = mapper.readTree(cleaned)
      // Bug-compatible `set(json.loads(x))` (`llm_search_service.py:70`):
      // Python's set() iterates whatever it got — an array yields its
      // elements, an OBJECT yields its field names, a STRING yields its
      // characters; scalars raise (→ empty set). Non-string array
      // elements project through asText — the differential harness's
      // canonical form (they can never match a string vocabulary label
      // either way).
      if (node == null) Set.empty
      else if (node.isArray) node.elements().asScala.map(_.asText()).toSet
      else if (node.isObject) node.fieldNames().asScala.toSet
      else if (node.isTextual)
        // code POINTS, not UTF-16 chars: Python iterates a string by
        // code point, so an emoji stays one element, not two surrogates
        node.textValue.codePoints().toArray
          .map(cp => new String(Character.toChars(cp))).toSet
      else Set.empty
    } catch { case _: Exception => Set.empty }
  }

  /** Values may be null (unknown couldn't be mapped) — preserved as null
    * and filtered by `Mapping.applyMapping`.
    */
  def parseMappingResponse(response: String): Map[String, String] = {
    require(response != null && response.nonEmpty,
      "parseMappingResponse: empty or invalid response")
    val node =
      try mapper.readTree(stripFences(response))
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"parseMappingResponse: invalid response: $response", e)
      }
    require(node != null && node.isObject,
      s"parseMappingResponse: expected a JSON object, got: $response")
    // non-string values canonicalize to null: the reference keeps the
    // raw JSON value, but a non-string can never match a (string)
    // vocabulary label in applyMapping — null is the equivalent form
    node.properties().asScala.map { e =>
      e.getKey -> (if (e.getValue.isTextual) e.getValue.textValue else null)
    }.toMap
  }

  final case class BinaryResult(answer: Boolean, confidence: Int, reason: String)

  def parseBinaryResponse(response: String): BinaryResult = {
    require(response != null && response.nonEmpty,
      "parseBinaryResponse: empty or invalid response")
    val node =
      try mapper.readTree(stripFences(response))
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"parseBinaryResponse: invalid response: $response", e)
      }
    require(node.isObject, s"parseBinaryResponse: expected object: $response")
    // pydantic model validation (`ChunkBinaryClassificationResult`):
    // required fields raise when missing; lax coercion per field type
    BinaryResult(
      answer = PydanticLax.bool(node.get("answer")),
      confidence = PydanticLax.int(node.get("confidence")),
      reason = PydanticLax.str(node.get("reason")))
  }

  final case class BusinessDesc(name: String, description: String)

  def parseBusinessDescResponse(response: String): BusinessDesc = {
    require(response != null && response.nonEmpty,
      "parseBusinessDescResponse: empty or invalid response")
    val node =
      try mapper.readTree(stripFences(response))
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"parseBusinessDescResponse: invalid response: $response", e)
      }
    require(node.isObject, s"parseBusinessDescResponse: expected object: $response")
    // `BusinessDescriptionResult(name: Optional[str], description:
    // Optional[str])` — str-or-null ONLY (pydantic lax str is strict:
    // a numeric name raises, it does not stringify)
    BusinessDesc(
      name = PydanticLax.optStr(node.get("name")),
      description = PydanticLax.optStr(node.get("description")))
  }

  def parseAddressesResponse(response: String): Seq[Address] = {
    if (response == null || response.isEmpty) return Nil
    val cleaned = try JsonRepair.repair(response) catch { case _: Exception => return Nil }
    val node = try mapper.readTree(cleaned) catch { case _: Exception => return Nil }
    if (node == null || !node.isArray) return Nil
    node.elements().asScala.flatMap { a =>
      // any failure skips THIS entry, like the reference's per-address
      // try block (`extract_basic_service.py:141-152`)
      try {
        if (!a.isObject) None // .get on a non-dict raises → skipped
        else {
          // country pre-step (`:143-148`): Python-falsy values (null,
          // "", false, 0) default to "US"; a truthy NON-string hits
          // .upper() → AttributeError → entry skipped
          val c = a.get("country")
          val country =
            if (c == null || c.isNull) "US"
            else if (c.isTextual) {
              if (c.textValue.isEmpty) "US" else c.textValue.toUpperCase
            }
            else if (c.isBoolean && !c.booleanValue) "US"
            else if (c.isNumber && c.doubleValue == 0.0) "US"
            else if ((c.isArray || c.isObject) && c.isEmpty) "US"
            else throw new PydanticLax.Invalid(s"country: $c")
          // pydantic Address validation: city/state required strict str;
          // the rest Optional (lax per type)
          Some(Address(
            name = PydanticLax.optStr(a.get("name")),
            city = PydanticLax.str(a.get("city")),
            state = PydanticLax.str(a.get("state")),
            country = country,
            address_lines = PydanticLax.optListStr(a.get("address_lines")),
            county = PydanticLax.optStr(a.get("county")),
            postal_code = PydanticLax.optStr(a.get("postal_code")),
            latitude = PydanticLax.optFloat(a.get("latitude")),
            longitude = PydanticLax.optFloat(a.get("longitude")),
            place_id = PydanticLax.optStr(a.get("place_id")),
            phone_numbers = PydanticLax.optListStr(a.get("phone_numbers")),
            fax_numbers = PydanticLax.optListStr(a.get("fax_numbers"))))
        }
      } catch { case _: Exception => None }
    }.toSeq
  }
}
