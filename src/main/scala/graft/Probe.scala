package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc cardinality probe for optimization work (additive tooling, like
  * [[BenchExtra]]): counts the intermediate frames of the expensive
  * queries so optimization targets the real explosion, not a guess. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s -> $r")
      r
    }

    args.headOption.getOrElse("edjoin") match {
      case "edjoin" =>
        val docs = spark.read.parquet(s"$sfDir/customer.parquet")
          .where(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").as("id"), col("c_name"))
        val b = docs.select(col("id"), col("c_name").as("s"))
          .where(col("s").isNotNull).withColumn("len", length(col("s")))
        t("records")(b.count())
        // replicate edPrefixRows
        import org.apache.spark.sql.expressions.Window
        val grams = b.where(col("len") >= 2).select(col("id"), col("len"),
            posexplode(expr(s"transform(sequence(1, len - 2 + 1), i -> substring(s, i, 2))")))
          .withColumnRenamed("col", "g")
        t("grams")(grams.count())
        val occ = grams.withColumn("occ",
          row_number().over(Window.partitionBy(col("id"), col("g"))
            .orderBy(col("pos"))) - 1)
        val freq = occ.groupBy(col("g"), col("occ")).agg(count(lit(1)).as("df"))
        val ranked = occ.join(freq, Seq("g", "occ")).withColumn("rnk",
          row_number().over(Window.partitionBy(col("id"))
            .orderBy(col("df"), col("g"), col("occ"))))
        val pre = ranked.where(col("rnk") <= 5)
          .select(col("g"), col("occ"), col("id"), col("len"))
        t("prefix rows")(pre.count())
        val sized = pre.groupBy(col("g"), col("occ")).agg(count(lit(1)).as("n"))
        t("buckets")(sized.count())
        t("bucket dist")(sized.agg(max("n"), expr("percentile(n, 0.99)"),
          sum(col("n") * col("n"))).collect().toSeq)
        val keyed = pre.join(sized, Seq("g", "occ"))
        val good = keyed.where(col("n") <= 200)
        val cold = good.select(col("g"), col("occ"), col("id").as("ia"), col("len").as("la"))
          .join(good.select(col("g"), col("occ"), col("id").as("ib"), col("len").as("lb")),
            Seq("g", "occ"))
          .where(col("ia") < col("ib") && abs(col("la") - col("lb")) <= 2)
        t("cold pairs")(cold.count())
        val hotn = keyed.where(col("n") > 200)
        t("hot rows")(hotn.count())
        t("cold distinct")(cold.select(col("ia"), col("ib")).distinct().count())
      case "containment" =>
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .where(col("doc_id") % 2 === 0)
        val b = docs.select(col("doc_id").as("id"),
          array_sort(array_distinct(graft.operators.TextAnalysis.tokens(col("text")))).as("toks"))
          .withColumn("len", size(col("toks"))).where(col("len") > 0)
        t("records")(b.count())
        t("avg toks")(b.agg(avg("len"), max("len")).collect().toSeq)
        val index = b.select(col("id"), explode(col("toks")).as("tok"))
        t("index rows")(index.count())
        val sized = index.groupBy(col("tok")).agg(count(lit(1)).as("n"))
        t("tokens")(sized.count())
        t("token df dist")(sized.agg(max("n"), expr("percentile(n, 0.99)"),
          sum(col("n") * col("n"))).collect().toSeq)
        val pLen = (col("len") - ceil(col("len") * lit(0.8) - lit(1e-9)) + 1).cast("int")
        val probes = b.select(col("id").as("qid"), col("len"),
            posexplode(slice(col("toks"), lit(1), pLen)))
          .select(col("qid"), col("col").as("tok"))
        t("probe rows (approx — unordered prefix)")(probes.count())
        val cold = index.join(sized.where(col("n") <= 40), "tok")
          .join(probes, "tok").where(col("qid") =!= col("id"))
        t("cold cand rows")(cold.count())
        t("hot tokens")(sized.where(col("n") > 40).count())
        t("hot index rows")(index.join(sized.where(col("n") > 40), "tok").count())
      case "winnow" =>
        val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32)
        val fp = graft.operators.Dedup.winnowFingerprints(
          docs, "doc_id", "text", k = 8, w = 4, hashFamily = "sha256")
        t("fingerprints")(fp.count())
        t("fingerprints again")(fp.count())
        val e = fp.select(col("doc_id").as("id"), col("fp_hash").as("nb"))
          .where(col("id").isNotNull && col("nb").isNotNull).distinct()
          .localCheckpoint(eager = false)
        t("distinct edges")(e.count())
        val deg = e.groupBy(col("id")).agg(count(lit(1)).as("__deg"))
        val sized = e.groupBy(col("nb")).agg(count(lit(1)).as("__n"))
        t("degree>=30 ids")(deg.where(col("__deg") >= 30).count())
        t("bucket dist")(sized.agg(max("__n"), expr("percentile(__n, 0.99)"),
          sum(col("__n") * col("__n"))).collect().toSeq)
        val eligible = e.join(deg.where(col("__deg") >= 30).select(col("id")), "id")
        val keyed = eligible.join(sized, "nb")
        val good = keyed.where(col("__n") <= 1000)
        val cold = good.select(col("nb"), col("id").as("url_a"))
          .join(good.select(col("nb"), col("id").as("url_b")), "nb")
          .where(col("url_a") < col("url_b"))
        t("cold pairs")(cold.count())
        t("grouped")(cold.groupBy(col("url_a"), col("url_b"))
          .agg(count(lit(1)).as("cn")).where(col("cn") >= 30).count())
        // prefix-filter variant: rank each doc's hashes rare-first; prefix
        // size = deg - minCommon + 1; candidates must co-occur in a prefix
        import org.apache.spark.sql.expressions.Window
        val degE = eligible.groupBy(col("id")).agg(count(lit(1)).as("__d"))
        val ranked = eligible.join(sized, "nb").join(degE, "id")
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("id")).orderBy(col("__n"), col("nb"))))
          .where(col("rnk") <= col("__d") - lit(29))
          .select(col("id"), col("nb"))
        t("prefix rows")(ranked.count())
        val sizedP = ranked.groupBy(col("nb")).agg(count(lit(1)).as("__np"))
        t("prefix bucket dist")(sizedP.agg(max("__np"), expr("percentile(__np, 0.99)"),
          sum(col("__np") * col("__np"))).collect().toSeq)
        val candP = ranked.join(sizedP.where(col("__np") <= 1000), "nb")
          .select(col("nb"), col("id").as("ca"))
          .join(ranked.select(col("nb"), col("id").as("cb")), "nb")
          .where(col("ca") < col("cb")).select(col("ca"), col("cb"))
        t("prefix cand rows")(candP.count())
        t("prefix cand distinct")(candP.distinct().count())
      case "snm" =>
        val df = spark.read.parquet(s"$sfDir/part.parquet")
          .where(col("p_partkey") % 2 === 0)
          .select(col("p_partkey").as("id"), col("p_name").as("name"))
        t("records")(df.count())
        val segs = graft.operators.Linkage.adaptiveSortedNeighborhoodPairs(
          df, "id", "name", theta = 0.75)
        t("adaptive pairs")(segs.count())
        t("adaptive pairs again")(segs.count())
        // sub-stage timings
        val ranked = graft.operators.Linkage.globalRanked(df, "id", "name")
        t("globalRanked")(ranked.count())
        val segKeys = graft.operators.Linkage.adaptiveSegmentKeysForProbe(
          df, "id", "name", theta = 0.75)
        t("segment keys")(segKeys.count())
        t("seg size dist")(segKeys.groupBy(col("key")).agg(count(lit(1)).as("n"))
          .agg(count(lit(1)), max("n"), sum(col("n") * col("n"))).collect().toSeq)
        val cp = graft.operators.Linkage.candidatePairs(segKeys)
        t("candidatePairs over segs")(cp.count())
    }
    spark.stop()
  }
}
