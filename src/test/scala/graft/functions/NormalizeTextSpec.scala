package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkFunSuite
import graft.functions.{normalize_match, strip_accents, unicode_norm}
import graft.strsim.TextKernels

/** Unicode normalization / accent strip / match-normalization chain —
  * checked against java.text.Normalizer re-derivations, the pinned
  * fast-path semantics, the Column and SQL paths, and the null/empty
  * contract. */
class NormalizeTextSpec extends SparkFunSuite {

  import spark.implicits._

  private def refStrip(s: String): String = {
    val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val kept = nfd.codePoints().toArray.filter { cp =>
      val t = Character.getType(cp)
      t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
        t != Character.ENCLOSING_MARK
    }
    java.text.Normalizer.normalize(
      new String(kept, 0, kept.length), java.text.Normalizer.Form.NFC)
  }

  test("stripAccents matches the NFD-drop-marks-NFC reference on the palette") {
    val palette = Seq("áàâäãåçéèêëíìîïñóòôöõúùûüýÿ", "ÁÀÂÄÃÅÇÉÈÊËÍÌÎÏÑ",
      "ŠšŽžŁł", "中🙂ßæÆøØ", "José Müller", "élise", "no accents",
      "", "á̂b", "Ĉapek")
    for (s <- palette)
      assert(TextKernels.stripAccents(s) == refStrip(s), s"input '$s'")
  }

  test("stripAccents strips a supplementary-plane combining mark") {
    // U+1D165 MUSICAL SYMBOL COMBINING STEM is category Mc in plane 1 —
    // a UTF-16-unit iteration would see two surrogates, not a mark
    val s = "a𝅥b"
    assert(TextKernels.stripAccents(s) == refStrip(s))
    assert(refStrip(s) == "ab")
  }

  test("stripAccents fast path returns mark-free input unchanged") {
    for (s <- Seq("plain ascii", "ł ø ß æ", "中 🙂", ""))
      assert(TextKernels.stripAccents(s) == s)
  }

  test("unicodeNorm composes, decomposes, and compatibility-folds") {
    assert(TextKernels.unicodeNorm("é", "NFC") == "é")
    assert(TextKernels.unicodeNorm("é", "NFD") == "é")
    assert(TextKernels.unicodeNorm("é", "NFC") == "é") // already normal
    assert(TextKernels.unicodeNorm("ﬁ", "NFKC") == "fi") // ligature folds
    assert(TextKernels.unicodeNorm("①", "NFKC") == "1")
    assert(TextKernels.unicodeNorm("①", "NFC") == "①") // canonical keeps it
  }

  test("normalize_match pinned chain over Column and SQL paths") {
    val df = Seq(
      "  Müller-Lüdenscheidt & Söhne, GmbH.  ",
      "JOSÉ  o'brien…(Ĉapek)",
      "ß 中 123",
      "",
      null.asInstanceOf[String]
    ).toDF("x")
    val got = df.select(normalize_match(col("x"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(got(0) == "muller ludenscheidt sohne gmbh")
    assert(got(1) == "jose o brien capek")
    assert(got(2) == "ß 中 123")
    assert(got(3) == "")
    assert(got(4) == null)

    graft.functions.registerAll(spark)
    df.createOrReplaceTempView("norm_in")
    val sqlGot = spark.sql(
      """SELECT normalize_match(x), strip_accents(x),
        |       unicode_norm(x, 'NFC') FROM norm_in""".stripMargin)
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(sqlGot.toSeq == got.toSeq)
  }

  test("unicode_norm rejects a bad form and non-literal SQL form") {
    val e = intercept[IllegalArgumentException] {
      Seq("x").toDF("x").select(unicode_norm(col("x"), "NFX")).collect()
    }
    assert(e.getMessage.contains("NFC/NFD/NFKC/NFKD"))
    graft.functions.registerAll(spark)
    Seq("x").toDF("x").createOrReplaceTempView("norm_badform")
    val e2 = intercept[Exception] {
      spark.sql("SELECT unicode_norm(x, x) FROM norm_badform").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("foldable") ||
      e2.getMessage.contains("literal"), e2.getMessage)
  }

  test("fingerprint_key collapses order/dup/case/accents; ngram variant") {
    import graft.functions.{fingerprint_key, ngram_fingerprint_key}
    val df = Seq(
      "Müller  & Söhne GmbH",
      "gmbh SOHNE muller",          // same fingerprint as above
      "sohne muller gmbh sohne",    // duplicate token collapses
      "ab",                         // shorter than n=3 -> itself
      "",
      null.asInstanceOf[String]
    ).toDF("x")
    val got = df.select(fingerprint_key(col("x")),
        ngram_fingerprint_key(col("x"), 3))
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1)))
    assert(got(0)._1 == "gmbh muller sohne")
    assert(got(1)._1 == "gmbh muller sohne")
    assert(got(2)._1 == "gmbh muller sohne")
    // note: unlike fp, the ngram variant is NOT word-order-invariant —
    // token boundaries contribute different grams after the space strip
    assert(got(3) == ("ab", "ab"))
    assert(got(4) == ("", ""))
    assert(got(5) == (null, null))
    // kernel-level: grams distinct, binary-sorted, concatenated
    assert(graft.strsim.TextKernels.ngramFingerprint("banana", 2)
      == "anbana") // grams {ba, an, na} -> an ba na
    // SQL paths agree
    graft.functions.registerAll(spark)
    df.createOrReplaceTempView("fp_in")
    val sqlGot = spark.sql(
      """SELECT fingerprint_key(x), ngram_fingerprint_key(x, 3)
        |FROM fp_in""".stripMargin)
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1)))
    assert(sqlGot.toSeq == got.toSeq)
  }

  test("chain agrees between kernel-composed and column-composed paths") {
    val rng = new scala.util.Random(53)
    val pool = "aA éÉ́ zZ-ß.…中 "
    def randStr(n: Int): String =
      (0 until n).map(_ => pool(rng.nextInt(pool.length))).mkString
    val inputs = (0 until 300).map(_ => randStr(rng.nextInt(24)))
    val viaColumn = inputs.toDF("x")
      .select(normalize_match(col("x"))).collect().map(_.getString(0))
    val viaKernel = inputs.map { s =>
      TextKernels.stripAccents(
        TextKernels.unicodeNorm(s, "NFC")).toLowerCase
        .replaceAll("[^\\p{L}\\p{Nd}]+", " ").trim
    }
    // Spark's Lower uses UTF8String.toLowerCase — agree on this pool
    assert(viaColumn.toSeq == viaKernel)
  }
}
