package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-preserving record linkage over CLK Bloom filters
  * ([[graft.functions.clk_sig]]): blocking and two-table comparison that
  * never touch the raw identifiers — the linkage unit sees only packed
  * bitsets.
  *
  * Blocking is Hamming-LSH BIT SAMPLING (Durham 2012, the standard CLK
  * blocking scheme): each of `bands` keys concatenates the filter's bits
  * at `bitsPerBand` deterministically sampled positions; two records
  * share a key for band b iff their filters agree on ALL of band b's
  * sampled bits, so near-identical filters (high Dice) collide with high
  * probability in at least one band while the corpus never pays an
  * all-pairs comparison. The positions are plan-time constants (seeded
  * splitmix64), exposed via [[samplePositions]] so a SQL oracle can
  * inline them as literals and re-derive the exact keys. */
object Pprl {

  /** Deterministic sampled bit positions: `bands` bands × `bitsPerBand`
    * DISTINCT positions in [0, m), drawn from splitmix64(seed, band,
    * draw). Distinct within a band (a repeated position would waste a
    * bit of selectivity); bands may overlap — independence across bands
    * is the point of banding, not disjointness. */
  def samplePositions(m: Int, bands: Int, bitsPerBand: Int,
      seed: Long): Array[Array[Int]] = {
    require(bitsPerBand <= m, s"bitsPerBand ($bitsPerBand) must be <= m ($m)")
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.tabulate(bands) { b =>
      val picked = scala.collection.mutable.LinkedHashSet.empty[Int]
      var draw = 0
      while (picked.size < bitsPerBand) {
        picked += (((mix(seed ^ mix(b * 1000003L + draw)) >>> 1) % m).toInt)
        draw += 1
      }
      picked.toArray
    }
  }

  /** Bit p of a packed filter column (array of m/64 longs, bit p stored
    * in word p >> 6 at offset p & 63) — a pure codegen projection. */
  private def bitAt(sig: Column, p: Int): Column =
    shiftright(element_at(sig, p / 64 + 1), p % 64).bitwiseAND(lit(1L))

  /** (id, key) blocking rows from packed CLK filters: key b is
    * "b:" ++ the band's sampled bits as a 0/1 string. One projection +
    * one explode — no shuffle until the caller's candidate join. */
  def blockKeys(encoded: DataFrame, idCol: String, sigCol: String,
      m: Int, bands: Int = 8, bitsPerBand: Int = 16,
      seed: Long = 42L): DataFrame = {
    val pos = samplePositions(m, bands, bitsPerBand, seed)
    val keyCols = pos.zipWithIndex.map { case (ps, b) =>
      concat((lit(s"$b:") +: ps.map(p =>
        bitAt(col(sigCol), p).cast("string"))): _*).as(s"band$b")
    }
    encoded.select(col(idCol).as("id") +: keyCols.toSeq: _*)
      .select(col("id"),
        explode(array((0 until bands).map(b => col(s"band$b")): _*)).as("key"))
  }

  /** Two-table PPRL linkage: encode-side inputs are (id, packed CLK)
    * frames; candidates share at least one sampled-bit band key; each
    * candidate pays ONE popcount Dice; pairs with dice >= theta survive.
    * Output: (id_a, id_b, dice). The comparison never sees an
    * identifier — this is the computation a PPRL linkage unit runs.
    * Hot band keys (e.g. the all-zeros key on sparse filters) are capped
    * observably via `bucketCap`, mirroring every other pair generator's
    * contract; [[droppedKeys]] is the companion. */
  def linkTables(a0: DataFrame, b0: DataFrame, idCol: String, sigCol: String,
      m: Int, theta: Double, bands: Int = 8, bitsPerBand: Int = 16,
      seed: Long = 42L, bucketCap: Int = 10000): DataFrame = {
    // each side's (id, CLK) frame feeds its band-key derivation (itself
    // consumed twice by the sizing + join-back) AND the Dice verification
    // join — callers typically compute the CLK encoding inline, so
    // materialize each side once (per-record-sized frames)
    val a = a0.localCheckpoint(eager = false)
    val b = b0.localCheckpoint(eager = false)
    val ka = blockKeys(a, idCol, sigCol, m, bands, bitsPerBand, seed)
      .localCheckpoint(eager = false)
    val kb = blockKeys(b, idCol, sigCol, m, bands, bitsPerBand, seed)
      .localCheckpoint(eager = false)
    def underCap(keys: DataFrame): DataFrame = {
      val sized = keys.groupBy(col("key")).agg(count(lit(1)).as("n"))
      keys.join(sized.where(col("n") <= bucketCap), "key")
        .select(col("key"), col("id"))
    }
    val cand = underCap(ka).select(col("key"), col("id").as("id_a"))
      .join(underCap(kb).select(col("key"), col("id").as("id_b")), "key")
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(a.select(col(idCol).as("id_a"), col(sigCol).as("__sa")), "id_a")
      .join(b.select(col(idCol).as("id_b"), col(sigCol).as("__sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.bloom_dice(col("__sa"), col("__sb")).as("dice"))
      .where(col("dice") >= theta)
  }

  /** Band keys excluded by `bucketCap` on EITHER side, with their sizes —
    * the never-silent cap companion of [[linkTables]]. */
  def droppedKeys(a: DataFrame, b: DataFrame, idCol: String, sigCol: String,
      m: Int, bands: Int = 8, bitsPerBand: Int = 16, seed: Long = 42L,
      bucketCap: Int = 10000): DataFrame = {
    def over(df: DataFrame, side: String): DataFrame =
      blockKeys(df, idCol, sigCol, m, bands, bitsPerBand, seed)
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
        .where(col("n") > bucketCap)
        .select(lit(side).as("side"), col("key"), col("n"))
    over(a, "a").union(over(b, "b"))
  }
}
