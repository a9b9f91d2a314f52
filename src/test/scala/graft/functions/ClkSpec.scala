package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** CLK Bloom-filter PPRL (Schnell-Bachteler-Reiher): the encoder must
  * equal a from-scratch replay of the published construction (padded
  * bigrams, one sha256 each, g double-hashed positions), the packed form
  * must store exactly the bit set, and Dice over packed filters must
  * equal Dice over the sets — the same identities the q_clk_bits /
  * q_clk_dice DuckDB oracles spell in SQL. */
class ClkSpec extends SparkFunSuite {
  import spark.implicits._

  /** Reference replay: set-bit positions of the CLK filter of `s`. */
  private def replay(s: String, m: Int, g: Int): Set[Int] = {
    val p = "_" + s + "_"
    val bigrams = p.sliding(2).toSeq
    bigrams.flatMap { bg =>
      val d = MessageDigest.getInstance("SHA-256").digest(bg.getBytes("UTF-8"))
      def u32(off: Int): Long =
        ((d(off) & 0xFFL) << 24) | ((d(off + 1) & 0xFFL) << 16) |
          ((d(off + 2) & 0xFFL) << 8) | (d(off + 3) & 0xFFL)
      val (h1, h2) = (u32(0), u32(4))
      (0 until g).map(i => ((h1 + i * h2) % m).toInt)
    }.toSet
  }

  private def bitsOf(s: String, m: Int, g: Int): Set[Int] =
    Seq(Tuple1(s)).toDF("s")
      .select(clk_bits(col("s"), m, g).as("b"))
      .head().getSeq[Int](0).toSet

  private def sigOf(s: String, m: Int, g: Int): Seq[Long] =
    Seq(Tuple1(s)).toDF("s")
      .select(clk_sig(col("s"), m, g).as("b"))
      .head().getSeq[Long](0)

  test("clk_bits == published construction (padded bigrams, double hashing)") {
    for (s <- Seq("phillips", "philips", "", "a", "smith jones"))
      assert(bitsOf(s, 512, 4) == replay(s, 512, 4), s"input: '$s'")
    // sorted ascending, distinct
    val raw = Seq(Tuple1("phillips")).toDF("s")
      .select(clk_bits(col("s"), 512, 4)).head().getSeq[Int](0)
    assert(raw == raw.distinct.sorted)
  }

  test("clk_sig packs exactly the clk_bits set") {
    for (s <- Seq("phillips", "", "entity resolution at scale")) {
      val words = sigOf(s, 512, 4)
      assert(words.length == 8)
      val unpacked = (for {
        w <- words.indices
        b <- 0 until 64
        if (words(w) & (1L << b)) != 0L
      } yield w * 64 + b).toSet
      assert(unpacked == bitsOf(s, 512, 4), s"input: '$s'")
    }
  }

  test("bloom_dice == set Dice; identity 1.0; typo similarity ordering") {
    def dice(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b")
        .select(bloom_dice(clk_sig(col("a"), 512, 4),
          clk_sig(col("b"), 512, 4)))
        .head().getDouble(0)
    val (pa, pb) = (bitsOf("phillips", 512, 4), bitsOf("philips", 512, 4))
    val want = 2.0 * (pa & pb).size / (pa.size + pb.size)
    assert(dice("phillips", "philips") == want)
    assert(dice("phillips", "phillips") == 1.0)
    // PPRL point: similarity survives the typo, disjoint names score low
    assert(dice("phillips", "philips") > 0.7)
    assert(dice("phillips", "zzqqvv") < dice("phillips", "philips"))
  }

  test("salted CLK: sha256(salt || bigram), distinct from unkeyed, replayable") {
    def saltedReplay(s: String, salt: String, m: Int, g: Int): Set[Int] = {
      val p = "_" + s + "_"
      p.sliding(2).toSeq.flatMap { bg =>
        val d = MessageDigest.getInstance("SHA-256")
          .digest((salt + bg).getBytes("UTF-8"))
        def u32(off: Int): Long =
          ((d(off) & 0xFFL) << 24) | ((d(off + 1) & 0xFFL) << 16) |
            ((d(off + 2) & 0xFFL) << 8) | (d(off + 3) & 0xFFL)
        (0 until g).map(i => ((u32(0) + i * u32(4)) % m).toInt)
      }.toSet
    }
    def bits(s: String, salt: String): Set[Int] =
      Seq(Tuple1(s)).toDF("s")
        .select(clk_bits(col("s"), 512, 4, salt).as("b"))
        .head().getSeq[Int](0).toSet
    assert(bits("phillips", "k7") == saltedReplay("phillips", "k7", 512, 4))
    // a different salt (or none) re-keys the whole construction
    assert(bits("phillips", "k7") != bits("phillips", ""))
    assert(bits("phillips", "k7") != bits("phillips", "k8"))
    // "" reproduces the unkeyed form
    assert(bits("phillips", "") == replay("phillips", 512, 4))
    // similarity still survives the typo under a shared salt
    val (pa, pb) = (bits("phillips", "k7"), bits("philips", "k7"))
    assert(2.0 * (pa & pb).size / (pa.size + pb.size) > 0.7)
    // SQL path takes the salt as a fourth literal
    registerAll(spark)
    Seq(Tuple1("phillips")).toDF("a").createOrReplaceTempView("clk_salt_t")
    assert(spark.sql("select clk_bits(a, 512, 4, 'k7') from clk_salt_t")
      .head().getSeq[Int](0).toSet == bits("phillips", "k7"))
  }

  test("null propagates; mismatched m fails loudly; bad types rejected") {
    val r = Seq((Option.empty[String], "x")).toDF("a", "b")
      .select(clk_sig(col("a"), 512, 4).as("s")).head()
    assert(r.isNullAt(0))
    val ex = intercept[Exception] {
      Seq(("a", "b")).toDF("a", "b")
        .select(bloom_dice(clk_sig(col("a"), 512, 4), clk_sig(col("b"), 256, 4)))
        .head()
    }
    assert(ex.getMessage.contains("different m") ||
      ex.getCause != null && ex.getCause.getMessage.contains("different m"))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1(1)).toDF("x").select(clk_bits(col("x"), 512, 4)).head()
    }
  }

  test("SQL registration: clk_bits / clk_sig / bloom_dice") {
    registerAll(spark)
    Seq(("phillips", "philips")).toDF("a", "b").createOrReplaceTempView("clk_t")
    val viaSql = spark.sql(
      "select bloom_dice(clk_sig(a, 512, 4), clk_sig(b, 512, 4)) from clk_t")
      .head().getDouble(0)
    val (pa, pb) = (bitsOf("phillips", 512, 4), bitsOf("philips", 512, 4))
    assert(viaSql == 2.0 * (pa & pb).size / (pa.size + pb.size))
    assert(spark.sql("select clk_bits(a, 64, 2) from clk_t").head()
      .getSeq[Int](0).nonEmpty)
  }
}
