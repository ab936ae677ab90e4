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
      if (!node.isArray) return Set.empty
      node.elements().asScala.map(_.asText()).toSet
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
    node.properties().asScala.map { e =>
      e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
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
    BinaryResult(
      answer = node.path("answer").asBoolean(),
      confidence = node.path("confidence").asInt(),
      reason = node.path("reason").asText(null))
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
    BusinessDesc(
      name = node.path("name").asText(null),
      description = node.path("description").asText(null))
  }

  def parseAddressesResponse(response: String): Seq[Address] = {
    if (response == null || response.isEmpty) return Nil
    val cleaned = try JsonRepair.repair(response) catch { case _: Exception => return Nil }
    val node = try mapper.readTree(cleaned) catch { case _: Exception => return Nil }
    if (node == null || !node.isArray) return Nil
    node.elements().asScala.flatMap { a =>
      try {
        if (!a.isObject) None
        else {
          def str(f: String): String = {
            val v = a.path(f)
            if (v.isMissingNode || v.isNull) null else v.asText()
          }
          def dbl(f: String): Option[Double] = {
            val v = a.path(f)
            if (v.isMissingNode || v.isNull) None else Some(v.asDouble())
          }
          def arr(f: String): Seq[String] = {
            val v = a.path(f)
            if (v.isArray) v.elements().asScala.map(_.asText()).toSeq else Nil
          }
          val rawCountry = str("country")
          Some(Address(
            name = str("name"),
            city = str("city"),
            state = str("state"),
            country = if (rawCountry == null || rawCountry.isEmpty) "US" else rawCountry.toUpperCase,
            address_lines = arr("address_lines"),
            county = str("county"),
            postal_code = str("postal_code"),
            latitude = dbl("latitude"),
            longitude = dbl("longitude"),
            place_id = str("place_id"),
            phone_numbers = arr("phone_numbers"),
            fax_numbers = arr("fax_numbers")))
        }
      } catch { case _: Exception => None }
    }.toSeq
  }
}
