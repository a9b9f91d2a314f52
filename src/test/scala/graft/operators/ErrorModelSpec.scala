package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Deterministic error injection: an independent JVM sha256
  * reimplementation cross-checks every emitted duplicate, degenerate
  * inputs degrade as documented, the four ops all occur, and the output
  * is partition-independent. */
class ErrorModelSpec extends SparkFunSuite {

  import spark.implicits._

  /** Independent reference: same contract, hand-rolled from
    * MessageDigest — shares no code with the operator. */
  private def ref(id: String, text: String, seed: Long,
      rate: Double): Option[(String, String)] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hx = md.digest(s"$id:$seed".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val frac = java.lang.Long.parseLong(hx.substring(0, 8), 16).toDouble /
      4294967296.0
    if (frac >= rate) None
    else {
      val len = text.length
      val opRaw = Integer.parseInt(hx.substring(8, 9), 16) % 4
      val op = if (len == 0) 3 else if (opRaw == 2 && len < 2) 1 else opRaw
      val bound = op match {
        case 3 => len + 1; case 2 => len - 1; case _ => len
      }
      val pos = Integer.parseInt(hx.substring(9, 11), 16) % bound + 1
      val pch = "abcdefghijklmnopqrstuvwxyz".charAt(
        Integer.parseInt(hx.substring(11, 13), 16) % 26)
      val p = pos - 1
      val corrupted = op match {
        case 0 => text.substring(0, p) + text.substring(p + 1)
        case 1 => text.substring(0, p) + pch + text.substring(p + 1)
        case 2 => text.substring(0, p) + text.charAt(p + 1) +
          text.charAt(p) + text.substring(p + 2)
        case _ => text.substring(0, p) + pch + text.substring(p)
      }
      Some((corrupted,
        Seq("delete", "substitute", "transpose", "insert")(op)))
    }
  }

  test("matches the independent sha256 reference on random inputs") {
    val rng = new scala.util.Random(97)
    val alphabet = "abcdefghij XYZ#09"
    val rows = (1 to 400).map { i =>
      val n = rng.nextInt(12) // includes 0 and 1-char strings
      (i.toLong, (0 until n).map(_ => alphabet(rng.nextInt(alphabet.length)))
        .mkString)
    }
    for (seed <- Seq(0L, 7L)) {
      val got = ErrorModel.corruptedDuplicates(
          rows.toDF("id", "txt").repartition(7), "id", "txt",
          dupRate = 0.4, seed = seed)
        .select("orig_id", "corrupted", "op")
        .as[(Long, String, String)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val expected = rows.flatMap { case (id, txt) =>
        ref(id.toString, txt, seed, 0.4).map(id -> _)
      }.toMap
      assert(got == expected, s"seed $seed")
    }
  }

  test("degenerate inputs: empty string inserts, 1-char never transposes") {
    // scan seeds so both degradations are actually exercised
    val hit = (0L to 40L).flatMap { seed =>
      ErrorModel.corruptedDuplicates(
          Seq((1L, ""), (2L, "x")).toDF("id", "txt"), "id", "txt",
          dupRate = 1.0, seed = seed)
        .select("orig_id", "txt", "corrupted", "op")
        .as[(Long, String, String, String)].collect().toSeq
    }
    val empty = hit.filter(_._1 == 1L)
    assert(empty.nonEmpty && empty.forall(r => r._4 == "insert" &&
      r._3.length == 1))
    val single = hit.filter(_._1 == 2L)
    assert(single.nonEmpty && single.forall(_._4 != "transpose"))
    assert(single.exists(_._4 == "substitute"))
  }

  test("all four ops occur; labels line up; dupRate gates the volume") {
    val rows = (1L to 500L).map(i => (i, s"record-$i-payload")).toDF("id", "txt")
    val out = ErrorModel.corruptedDuplicates(rows, "id", "txt",
      dupRate = 0.5, seed = 3L).collect()
    val ops = out.map(_.getString(4)).toSet
    assert(ops == Set("delete", "substitute", "transpose", "insert"))
    assert(out.forall(r => r.getString(1) == r.getLong(0).toString + "_dup"))
    // delete shortens by 1, insert lengthens by 1, the others preserve
    assert(out.forall { r =>
      val d = r.getString(3).length - r.getString(2).length
      r.getString(4) match {
        case "delete" => d == -1
        case "insert" => d == 1
        case _ => d == 0
      }
    })
    assert(out.length > 150 && out.length < 350) // ~0.5 · 500
  }

  test("validations") {
    val df = Seq((1L, "a")).toDF("id", "txt")
    intercept[IllegalArgumentException] {
      ErrorModel.corruptedDuplicates(df, "id", "txt", dupRate = 0.0)
    }
    intercept[IllegalArgumentException] {
      ErrorModel.corruptedDuplicates(df, "nope", "txt", dupRate = 0.5)
    }
  }
}
