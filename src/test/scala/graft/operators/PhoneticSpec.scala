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

  // ------------------------------------------------------- Refined Soundex

  /** Hand-derived per the pinned table (A0 B1 C3 D6 E0 F2 G4 H0 I0 J4 K3
    * L7 M8 N8 O0 P1 Q5 R9 S3 T6 U0 V2 W0 X5 Y0 Z5; adjacent-duplicate
    * collapse; first letter + ALL digits, no pad, no cap). */
  private val refinedVectors = Seq(
    // T6 E0 S3 T6 I0 N8 G4 — the Commons-Codec worked example
    "TESTING" -> "T6036084",
    // B1 O0 B1 — vowel keeps the two Bs apart
    "BOB" -> "B101",
    // A0 S3 H0 C3 R9 A0 F2 T6 — H codes 0 and merges with neighboring vowels
    "Ashcraft" -> "A03039026",
    "Ashcroft" -> "A03039026",                       // same bucket, the point
    // D6 O0 G4 G4 S3 → the GG run collapses, landing on dogs' exact key
    "doggs" -> "D6043",
    "dogs" -> "D6043",
    // L7 E0 E0 → EE collapses to one 0
    "Lee" -> "L70",
    "o'Brien-87" -> "O01908",                        // stripping + O0 B1 R9 I0 E0 N8
    "testing" -> "T6036084",                         // case-insensitive
    "" -> "", "123" -> "", "  " -> "")

  test("refinedSoundexKey matches hand-derived vectors; finer than classic") {
    import spark.implicits._
    val got = refinedVectors.map(_._1).toDF("name")
      .select(col("name"), Phonetic.refinedSoundexKey(col("name")).as("k"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    refinedVectors.foreach { case (name, want) =>
      assert(got(name) == want, s"refined_soundex($name)")
    }
    // refinement property: classic lumps B,F,P,V into one class (Abby and
    // Avey both key A100); refined splits BP from FV (A010 vs A020)
    val pair = Seq("Abby", "Avey").toDF("name")
      .select(Phonetic.soundexKey(col("name")).as("c"),
        Phonetic.refinedSoundexKey(col("name")).as("r"))
      .collect()
    assert(pair(0).getString(0) == pair(1).getString(0),  // classic merges
      s"classic ${pair(0).getString(0)} vs ${pair(1).getString(0)}")
    assert(pair(0).getString(1) != pair(1).getString(1),  // refined splits
      s"refined ${pair(0).getString(1)} vs ${pair(1).getString(1)}")
    // null propagates
    val r = Seq[Option[String]](None).toDF("name")
      .select(Phonetic.refinedSoundexKey(col("name"))).head()
    assert(r.isNullAt(0))
  }

  // ----------------------------------------------------------------- NYSIIS

  /** Hand-derived per the PINNED rules on TextKernels.nysiis (step-by-step
    * derivations in the comments — these DEFINE the variant). */
  private val nysiisVectors = Seq(
    // KN→NN prefix; I→A; GH: H between G,T dropped → NAGT
    "KNIGHT" -> "NAGT",
    // SCH→SSS prefix collapses to one S; DT→D suffix; M→N → SNAD
    "SCHMIDT" -> "SNAD",
    // PH→FF prefix; LL collapses; trailing S dropped → FALAP
    "PHILLIPS" -> "FALAP",
    // FILLIPS lands on the same key — the phonetic point
    "FILLIPS" -> "FALAP",
    // MAC→MCC prefix; CC collapses; EO → A (run-collapsed) → MCLAD
    "MACLEOD" -> "MCLAD",
    // ND→D suffix; W kept (word-initial, not post-vowel); 6-char truncation
    // of WASTARLAD
    "WESTERLUND" -> "WASTAR",
    // W after vowel O skipped → BRAN
    "BROWN" -> "BRAN",
    // punctuation stripped; IE inside (no suffix hit); E,I→A collapse
    "O'Brien" -> "OBRAN",
    // first char kept raw (even a vowel); V after E → F; trailing S dropped
    "EVERS" -> "EFAR",
    // case-insensitive; interior U→A (dup-collapsed with A); Z→S which the
    // trailing-S cleanup then drops; the leading Q survives raw — only
    // interior Qs map to G
    "quartz" -> "QART",
    "" -> "", "123" -> "", "  " -> "")

  test("nysiis_key matches the pinned hand-derived vectors (codegen + SQL)") {
    import spark.implicits._
    val df = nysiisVectors.map(_._1).toDF("name")
    val got = df.select(col("name"), graft.functions.nysiis_key(col("name")).as("k"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    nysiisVectors.foreach { case (name, want) =>
      assert(got(name) == want, s"nysiis($name)")
      assert(graft.strsim.TextKernels.nysiis(name) == want, s"kernel nysiis($name)")
    }
    df.createOrReplaceTempView("ny_names")
    val sql = spark.sql("SELECT name, nysiis_key(name) FROM ny_names")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    nysiisVectors.foreach { case (name, want) => assert(sql(name) == want) }
    val n = Seq[Option[String]](None).toDF("name")
      .select(graft.functions.nysiis_key(col("name"))).head()
    assert(n.isNullAt(0))
  }

  /** Published Kölner Phonetik worked examples plus rule-edge vectors
    * hand-derived per the pinned steps on TextKernels.cologne. */
  private val cologneVectors = Seq(
    "Müller-Lüdenscheidt" -> "65752682", // Wikipedia worked example
    "Breschnew" -> "17863",              // Wikipedia worked example
    "Wikipedia" -> "3412",               // Wikipedia worked example
    "Müller" -> "657",
    "Meyer" -> "67",
    "Maier" -> "67",      // sound-alike of Meyer: same key
    "Schmidt" -> "862",   // S8 C8(after S, collapses) H· M6 I0 D2 T2(collapses)
    "Ohm" -> "06",        // leading 0 kept
    "Axt" -> "0482",      // X after vowel → the two codes 48
    "Xaver" -> "4837",    // initial X → 48; raw 480307 → strip 0s
    "akx" -> "048",       // X directly after K → 8 only
    "Pharma" -> "376",    // P before H → 3
    "Cäsar" -> "487",     // initial C before (Ä→A) → 4
    "Aachen" -> "046",    // raw 00406 → collapse 0406 → strip 046
    "hhh" -> "",          // all-silent → empty
    "" -> "")

  test("cologne_key matches published and pinned vectors (codegen + SQL)") {
    import spark.implicits._
    // kernel-direct first (catches rule bugs without Spark in the loop)
    cologneVectors.foreach { case (name, want) =>
      assert(graft.strsim.TextKernels.cologne(name) == want,
        s"kernel cologne($name)")
    }
    val df = cologneVectors.map(_._1).filter(_.nonEmpty).toDF("name")
    val got = df.select(col("name"), graft.functions.cologne_key(col("name")).as("k"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cologneVectors.filter(_._1.nonEmpty).foreach { case (name, want) =>
      assert(got(name) == want, s"cologne_key($name)")
    }
    df.createOrReplaceTempView("co_names")
    val sql = spark.sql("SELECT name, cologne_key(name) FROM co_names")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cologneVectors.filter(_._1.nonEmpty).foreach { case (name, want) =>
      assert(sql(name) == want)
    }
    val n = Seq[Option[String]](None).toDF("name")
      .select(graft.functions.cologne_key(col("name"))).head()
    assert(n.isNullAt(0))
  }

  /** Hand-derived per the PINNED positional rules on
    * TextKernels.metaphone (step-by-step in the comments there). */
  private val metaphoneVectors = Seq(
    "metaphone" -> "MTFN",   // PH→F, final E dropped
    "Knight" -> "NT",        // KN- initial drop, GH silent before T
    "Wright" -> "RT",        // WR- initial drop
    "school" -> "SKL",       // SCH→K, OO dedup
    "science" -> "SNS",      // C silent in SCI
    "lamb" -> "LM",          // final MB → M
    "judge" -> "JJ",         // DGE→J, its G silent
    "watch" -> "WX",         // TCH: T silent, CH→X
    "ghost" -> "KST",        // GH before vowel → K
    "Thompson" -> "0MPSN",   // TH→0 (pinned: position-local, no lookback)
    "Xavier" -> "SFR",       // initial X→S, V→F
    "accept" -> "AKSPT",     // CC not deduped: K then S
    "pizza" -> "PS",         // ZZ dedups, Z→S
    "who" -> "W",            // WH- → W, O non-initial vowel dropped
    "hhh" -> "H",            // dedup collapses; leading H kept (no prior)
    "" -> "")

  test("metaphone_key matches the pinned hand-derived vectors (codegen + SQL)") {
    import spark.implicits._
    metaphoneVectors.foreach { case (name, want) =>
      assert(graft.strsim.TextKernels.metaphone(name) == want,
        s"kernel metaphone($name)")
    }
    val df = metaphoneVectors.map(_._1).filter(_.nonEmpty).toDF("name")
    val got = df.select(col("name"),
        graft.functions.metaphone_key(col("name")).as("k"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    metaphoneVectors.filter(_._1.nonEmpty).foreach { case (name, want) =>
      assert(got(name) == want, s"metaphone_key($name)")
    }
    df.createOrReplaceTempView("mp_names")
    val sql = spark.sql("SELECT name, metaphone_key(name) FROM mp_names")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    metaphoneVectors.filter(_._1.nonEmpty).foreach { case (name, want) =>
      assert(sql(name) == want)
    }
    val n = Seq[Option[String]](None).toDF("name")
      .select(graft.functions.metaphone_key(col("name"))).head()
    assert(n.isNullAt(0))
  }

  // Caverphone 2.0 published vectors (Hood 2004; same vectors pinned by
  // Apache commons-codec's Caverphone2 tests) plus the edge rules: empty
  // input is all-pad, the trailing-vowel → A rule (Peter), and the
  // rewrite interplay on ph/h (Thompson).
  private val caverphoneVectors = Seq(
    "Stevenson" -> "STFNSN1111",
    "Peter" -> "PTA1111111",
    "Thompson" -> "TMPSN11111",
    "Lee" -> "LA11111111",
    "" -> "1111111111",
    "123" -> "1111111111") // non-letters strip to empty → all pad

  test("caverphone 2.0 key matches the published vectors and null-propagates") {
    import spark.implicits._
    val df = caverphoneVectors.map(_._1).toDF("name")
    val got = df.select(col("name"),
        Phonetic.caverphoneKey(col("name")).as("k"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    caverphoneVectors.foreach { case (name, want) =>
      assert(got(name) == want, s"caverphone($name)")
    }
    val n = Seq[Option[String]](None).toDF("name")
      .select(Phonetic.caverphoneKey(col("name"))).head()
    assert(n.isNullAt(0))
  }
}
