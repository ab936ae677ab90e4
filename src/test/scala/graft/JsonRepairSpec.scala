package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JsonRepair

/** Behavior pinned to the reference suite `core/tests/test_str_util.py`
  * for `make_json_array_parse_safe` (`core/src/core/utils/str_util.py:8-133`).
  */
class JsonRepairSpec extends AnyFunSuite {

  test("valid JSON array passes through") {
    assert(JsonRepair.repair("""["Front Brake Kit", "Rear Brake Kit"]""") ==
      """["Front Brake Kit", "Rear Brake Kit"]""")
  }

  test("code fences and json label are stripped") {
    assert(JsonRepair.repair("```json\n[\"item1\", \"item2\"]\n```") ==
      """["item1", "item2"]""")
  }

  test("fence without label stripped") {
    assert(JsonRepair.repair("```\n[\"a\"]\n```") == """["a"]""")
  }

  test("unescaped interior quotes are escaped") {
    val fixed = JsonRepair.repair("""["Item with "quotes" inside"]""")
    assert(fixed == """["Item with \"quotes\" inside"]""")
    assert(JsonRepair.parses(fixed))
  }

  test("already-escaped quotes are preserved") {
    val in = """["Item with \"quotes\" inside"]"""
    assert(JsonRepair.repair(in) == in)
  }

  test("multiple elements with interior quotes") {
    val fixed = JsonRepair.repair("""["say "hi"", "plain", "and "bye""]""")
    assert(JsonRepair.parses(fixed))
  }

  test("empty and null inputs returned as-is") {
    assert(JsonRepair.repair("") == "")
    assert(JsonRepair.repair(null) == null)
  }

  test("non-array garbage returns cleaned string") {
    assert(JsonRepair.repair("not a json at all") == "not a  at all".trim ||
           JsonRepair.repair("not a json at all") == "not a  at all")
  }

  test("the literal substring json is deleted anywhere (bug-compatible)") {
    // The reference removes `json` from content, not just the fence label.
    assert(JsonRepair.repair("""["json tooling"]""") == """[" tooling"]""")
  }

  test("whitespace-padded arrays are trimmed") {
    assert(JsonRepair.repair("  [\"x\"] \n") == """["x"]""")
  }

  test("unterminated string does not crash") {
    val out = JsonRepair.repair("""["unclosed""")
    assert(out != null)
  }

  test("json object (not array) falls back to cleaned") {
    val in = """{"a": "b"}"""
    assert(JsonRepair.repair(in) == in) // parses as-is, returned directly
  }
}
