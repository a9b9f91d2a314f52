package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Soundex key: canonical vectors (the NARA/Wikipedia worked examples the
  * H/W-transparent variant is defined by) + normalization edges. */
class PhoneticSpec extends SparkFunSuite {

  private val vectors = Seq(
    "Robert" -> "R163", "Rupert" -> "R163",          // same key, the point
    "Ashcraft" -> "A261", "Ashcroft" -> "A261",      // H-transparent collapse
    "Tymczak" -> "T522",                             // vowel-separated repeats survive
    "Pfister" -> "P236",                             // leading same-code pair absorbed
    "Honeyman" -> "H555",                            // H first letter kept, not dropped
    "Jackson" -> "J250",                             // padding
    "Washington" -> "W252",
    "Lee" -> "L000",
    "small ring" -> "S546", "red widget" -> "R332",  // non-letter stripping
    "o'Brien-87" -> "O165",                          // punctuation + digits
    "robert" -> "R163",                              // case-insensitive
    "" -> "", "123" -> "", "  " -> "")               // letterless -> empty key

  test("soundexKey matches the canonical vectors through codegen") {
    import spark.implicits._
    val got = vectors.map(_._1).toDF("name")
      .select(col("name"), Phonetic.soundexKey(col("name")).as("sdx"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    vectors.foreach { case (name, want) =>
      assert(got(name) == want, s"soundex($name)")
    }
  }

  test("null propagates") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("name")
      .select(Phonetic.soundexKey(col("name"))).head()
    assert(r.isNullAt(0))
  }
}
