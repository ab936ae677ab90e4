package graft

import graft.functions.TextNormalize

/** Unicode normalization: NFC composition cases (the q114 oracle
  * re-verifies these against DuckDB's utf8proc), NFKC compatibility
  * folds, idempotence, null safety, and the dedup-key motivation —
  * decomposed and composed spellings collide after normalization.
  */
class TextNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("NFC composes combining marks; already-composed text is untouched") {
    assert(TextNormalize.nfc("café") === "café")
    assert(TextNormalize.nfc("Äb") === "Äb")
    assert(TextNormalize.nfc("ố") === "ố")
    assert(TextNormalize.nfc("café") === "café")
    assert(TextNormalize.nfc("plain ascii") === "plain ascii")
    assert(TextNormalize.nfc(null) === null)
    // idempotent
    val s = "ñ ç é"
    assert(TextNormalize.nfc(TextNormalize.nfc(s)) === TextNormalize.nfc(s))
  }

  test("NFKC additionally folds compatibility characters") {
    assert(TextNormalize.nfkc("ﬃ") === "ffi")     // ffi ligature
    assert(TextNormalize.nfkc("²") === "2")       // superscript two
    assert(TextNormalize.nfkc("Ａ") === "A")       // full-width A
    assert(TextNormalize.nfkc("é") === "é") // still composes
    // NFC leaves compatibility characters alone
    assert(TextNormalize.nfc("ﬃ") === "ﬃ")
    assert(TextNormalize.nfkc(null) === null)
  }

  test("decomposed and composed spellings collide after normalization (the dedup-key case)") {
    val df = Seq(
      (1L, "café menu"),      // composed
      (2L, "café menu"),     // decomposed — same rendered text
      (3L, "cafe menu")            // genuinely different
    ).toDF("doc_id", "text")
    val keys = df.select($"doc_id",
        TextNormalize.nfcCol($"text").as("k"))
      .as[(Long, String)].collect().toMap
    assert(keys(1L) === keys(2L))
    assert(keys(1L) !== keys(3L))
  }
}
