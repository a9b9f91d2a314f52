package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class SamplingSpec extends SparkFunSuite {
  import spark.implicits._

  private val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("splitAssign: deterministic, partition-independent, subset-stable") {
    val ids = (1L to 2000L).toDF("id")
    val a = Sampling.splitAssign(ids, "id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // same assignment at a different partitioning
    val b = Sampling.splitAssign(ids.repartition(7), "id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // adding rows NEVER reassigns existing ones (the property randomSplit
    // lacks — its per-partition reseeding reshuffles everything)
    val c = Sampling.splitAssign((1L to 3000L).toDF("id"), "id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.forall { case (k, v) => c(k) == v })
    // fractions approximate the weights (hash-uniform over 2000 ids)
    val n = a.size.toDouble
    val byName = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(byName("train") - 0.8) < 0.05, byName.toString)
    assert(math.abs(byName.getOrElse("val", 0.0) - 0.1) < 0.03)
    assert(math.abs(byName.getOrElse("test", 0.0) - 0.1) < 0.03)
  }

  test("splitAssign rejects weights that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(Seq(1L).toDF("id"), "id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("splitByCluster: cluster members share a split; singletons still split") {
    val ids = (1L to 900L).toDF("id")
    val asg = (1L to 600L).map(i => (i, i % 50)).toDF("id", "component")
    val got = Sampling.splitByCluster(ids, "id", asg, weights)
      .select("id", "split_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // every member of a cluster lands in the same split (leakage-safe)
    (0L until 50L).foreach { c =>
      val members = (1L to 600L).filter(_ % 50 == c).map(got)
      assert(members.distinct.size == 1, s"cluster $c split across ${members.distinct}")
    }
    // unassigned rows are assigned too, deterministically
    assert((601L to 900L).forall(got.contains))
    val again = Sampling.splitByCluster(ids.repartition(7), "id",
      asg.coalesce(1), weights).select("id", "split_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == again)
    // growing the corpus never reassigns existing clusters or singletons
    val grown = Sampling.splitByCluster((1L to 1200L).toDF("id"), "id", asg,
      weights).select("id", "split_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.forall { case (k, v) => grown(k) == v })
    intercept[IllegalArgumentException] {
      Sampling.splitByCluster(ids, "id", asg, Seq("a" -> 0.3, "b" -> 0.3))
    }
  }

  test("stratifiedSample: quota per stratum, deterministic, hash-ordered") {
    val docs = (1L to 500L).map(i => (i, s"lang${i % 3}", s"s${i % 2}"))
      .toDF("id", "lang", "source")
    val got = Sampling.stratifiedSample(docs, "id", Seq("lang", "source"), 10)
    val rows = got.collect()
    // quota respected in every stratum; rank dense from 1
    val byStratum = rows.groupBy(r => (r.getString(1), r.getString(2)))
    assert(byStratum.size == 6)
    byStratum.values.foreach { g =>
      assert(g.length == 10) // every stratum has >= 10 members here
      assert(g.map(_.getInt(3)).sorted.toSeq == (1 to 10))
    }
    // deterministic across partitioning
    val again = Sampling.stratifiedSample(docs.repartition(9), "id",
      Seq("lang", "source"), 10).collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(3))).toSet ==
      again.map(r => (r.getLong(0), r.getInt(3))).toSet)
    // the order is the sha256 order the oracle re-derives
    val sha = (i: Long) => java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$i:42".getBytes("UTF-8")).map(b => f"${b & 0xFF}%02x").mkString
    val stratum00 = (1L to 500L).filter(i => i % 3 == 0 && i % 2 == 0)
      .sortBy(i => (sha(i), i)).take(10)
    val got00 = rows.filter(r => r.getString(1) == "lang0" && r.getString(2) == "s0")
      .sortBy(_.getInt(3)).map(_.getLong(0)).toSeq
    assert(got00 == stratum00)
  }

  test("stratifiedSample plan bounds hot strata before the shuffle (WindowGroupLimit)") {
    val docs = (1L to 500L).map(i => (i, "hot", "hot")).toDF("id", "lang", "source")
    val q = Sampling.stratifiedSample(docs.repartition(4), "id",
      Seq("lang", "source"), 5)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no partial group limit in:\n$plan")
  }

  test("scrubPii masks url, email, ip, phone — and order is pinned") {
    val dirty = "see https://u:1@ex.org/a?b=2 or mail bob.smith+x@corp.co.uk " +
      "call +44 (0) 555-123-9876 from 192.168.10.255 now"
    val got = Seq(Tuple1(dirty)).toDF("t")
      .select(TextAnalysis.scrubPii(col("t"))).head().getString(0)
    assert(got == "see <URL> or mail <EMAIL> call <PHONE> from <IP> now", got)
    // email inside URL stays one <URL> (url pass runs first)
    assert(!got.contains("@"))
    // dotted quad is <IP>, not half a <PHONE> (ip pass precedes phone)
    assert(got.contains("<IP>"))
    // nulls propagate, clean text unchanged
    val r2 = Seq((null.asInstanceOf[String], "clean text stays"))
      .toDF("a", "b")
      .select(TextAnalysis.scrubPii(col("a")), TextAnalysis.scrubPii(col("b")))
      .head()
    assert(r2.isNullAt(0) && r2.getString(1) == "clean text stays")
  }

  test("scrubPii phone rule needs 7+ real digits, not 7+ chars") {
    // non-PII numerics that the old {5,}-char separator run used to eat:
    // year ranges (3-char separator), short versions, 6-digit numbers
    val keep = Seq("from 2020 - 2021 onward", "v1.2 or 24. 12. 31",
      "order 123456 shipped")
    val scrub = (s: String) => Seq(Tuple1(s)).toDF("t")
      .select(TextAnalysis.scrubPii(col("t"))).head().getString(0)
    keep.foreach(s => assert(scrub(s) == s, s"over-scrubbed: $s"))
    // genuine phone shapes (7+ digits, separators ≤ 2 between digits) mask
    assert(scrub("call 555-0123 now") == "call <PHONE> now")
    assert(scrub("tel +1 (555) 012-3456") == "tel <PHONE>")
    assert(scrub("dial 5550199 today") == "dial <PHONE> today")
  }

  test("mixtureSample: per-domain rates, subset stability, rate edges") {
    val df = (1L to 400L).map(i => (i, s"dom${i % 4}")).toDF("id", "dom")
    val rates = Map("dom0" -> 0.0, "dom1" -> 1.0, "dom2" -> 0.5)
    val kept = Sampling.mixtureSample(df, "id", "dom", rates, defaultRate = 0.25)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDom = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!byDom.contains("dom0")) // rate 0 drops all
    assert(byDom("dom1") == 100) // rate 1 keeps all
    val half = byDom.getOrElse("dom2", 0)
    assert(half > 25 && half < 75, s"dom2 kept $half of 100 at rate 0.5")
    val quarter = byDom.getOrElse("dom3", 0) // defaultRate
    assert(quarter > 8 && quarter < 45, s"dom3 kept $quarter of 100 at 0.25")
    // subset stability: the decision for a row never depends on the rest
    val subset = Sampling.mixtureSample(df.where(col("id") <= 100L),
      "id", "dom", rates, defaultRate = 0.25)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(subset == kept.filter(_._1 <= 100L).toSet)
  }
}
