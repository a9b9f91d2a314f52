package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round helper bench (guide §1.4): times a NAMED SUBSET of
  * SparkEntry.queries with the same methodology as [[Bench]] (same session
  * config, same `.count()` action, same sf dir), so per-query deltas can be
  * measured in minutes instead of re-running the full 210-query battery.
  * Optionally dumps `.explain("formatted")` per query to a directory.
  *
  * This is ADDITIVE tooling — [[Bench]] is the frozen driver contract and
  * is not touched.
  *
  * Usage:
  *   runMain graft.BenchExtra q_weakest_links q_truss ...
  *   runMain graft.BenchExtra --explain-dir plans/r06 --suffix _before q_truss
  *   runMain graft.BenchExtra --repeat 2 q_truss
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    var explainDir: Option[String] = None
    var suffix = ""
    var repeat = 1
    val confs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--explain-dir" => explainDir = Some(args(i + 1)); i += 2
        case "--suffix" => suffix = args(i + 1); i += 2
        case "--repeat" => repeat = args(i + 1).toInt; i += 2
        case "--conf" => // k=v, set on the session after start
          val Array(k, v) = args(i + 1).split("=", 2); confs += ((k, v)); i += 2
        case "--plan-only" => repeat = 0; i += 1 // dump explains, skip timing
        case q => names += q; i += 1
      }
    }
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
    confs.foreach { case (k, v) => spark.conf.set(k, v) }

    val qs = SparkEntry.queries
    val results = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    for (name <- names) {
      val fn = qs.getOrElse(name, sys.error(s"unknown query: $name"))
      explainDir.foreach { d =>
        new java.io.File(d).mkdirs()
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(s"$d/$name$suffix.txt")
        try w.write(plan) finally w.close()
      }
      val times = (1 to repeat).map { _ =>
        spark.sparkContext.setJobDescription(name)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.setJobDescription(null)
      results(name) = times
      println(f"TIMED $name%-34s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    val js = results.collect { case (k, v) if v.nonEmpty =>
      "\"" + k + "\":" + v.min }.mkString("{", ",", "}")
    println(s"""{"metric":"subset","unit":"sec","queries":$js,"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}
