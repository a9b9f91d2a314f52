package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]).
  *
  *  - [[bruteForceTopK]] — exact cosine top-k; the correctness baseline.
  *    Quadratic: right for ≤10^5 vectors or as the per-bucket verifier.
  *  - [[lshTopK]] — banded random-hyperplane LSH: candidates only meet
  *    inside shared (band, signature) buckets, so cost is Σ bucket², not
  *    n². This is the 100 TB-scale path; recall vs brute force is measured
  *    in SimilaritySpec, not assumed.
  *
  * Dot products run through `zip_with`/`aggregate` (codegen'd higher-order
  * functions) as a strict left fold in double — the same fold DuckDB's
  * `list_sum(list_transform(...))` performs, which is what makes the
  * cosine oracle bit-exact.
  */
object Similarity {

  /** Strict left-fold dot product in double (higher-order-function form;
    * kept as the readable reference — the hot path uses [[cosine]]). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity via the fused codegen kernel
    * ([[graft.functions.CosineSim]]): bit-identical to
    * `dot / (norm * norm)` in left-fold doubles, ~20× faster than the
    * interpreted higher-order-function form. */
  def cosine(a: Column, b: Column): Column = graft.functions.cosine_sim(a, b)

  /** Exact top-k neighbors per vector by cosine (ties broken by neighbor
    * id ascending — deterministic). Output: (vec_id, neighbor_id, rank, cos). */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val a = emb.select(col(idCol).as("vec_id"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("vb"))
    val scored = a.join(b, col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"),
        cosine(col("va"), col("vb")).as("cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Deterministic random hyperplanes: `bands` bands × `planesPerBand`
    * planes, components from splitmix64 mapped to [-1, 1). */
  private[operators] def hyperplanes(dim: Int, bands: Int, planesPerBand: Int,
      seed: Long): Array[Array[Array[Double]]] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.tabulate(bands, planesPerBand, dim) { (b, p, d) =>
      val r = mix(seed ^ mix(b * 1000003L + p * 1009L + d))
      (r >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
  }

  /** Banded random-hyperplane LSH top-k. Each vector lands in `bands`
    * buckets keyed by the sign pattern of `planesPerBand` projections;
    * candidates = pairs sharing any bucket; exact cosine ranks them.
    * Single shuffle on the bucket key + window per vec_id. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      dim: Int, bands: Int = 4, planesPerBand: Int = 6,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, bands, planesPerBand, seed)
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    val bandKeys = (0 until bands).map { bnd =>
      val sigBits = (0 until planesPerBand).map { p =>
        val plane = array(planes(bnd)(p).map(lit): _*)
        when(dot(col("v"), plane) > 0, lit(1 << p)).otherwise(lit(0))
      }
      concat(lit(s"$bnd:"), sigBits.reduce(_ + _)).as(s"band$bnd")
    }
    val bucketed = base.select(col("id") +: col("v") +: bandKeys: _*)
      .select(col("id"), col("v"),
        explode(array((0 until bands).map(bnd => col(s"band$bnd")): _*)).as("key"))
    val cand = bucketed.select(col("key"), col("id").as("vec_id"), col("v").as("va"))
      .join(bucketed.select(col("key"), col("id").as("neighbor_id"), col("v").as("vb")), "key")
      .where(col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"), col("va"), col("vb"))
      .distinct()
    val scored = cand.select(col("vec_id"), col("neighbor_id"),
      cosine(col("va"), col("vb")).as("cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos"))
  }
}
