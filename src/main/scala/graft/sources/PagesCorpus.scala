package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.strsim.StrSimKernels

/** One Common-Crawl-style web page (the north-star input shape,
  * BASELINE.json input_hint: url, warc_ts, html, text, lang). */
case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
    text: String, lang: String)

/** Ground truth, kept separate from pages so the pipeline can't cheat:
  * which underlying entity each url belongs to (-1 = singleton). */
case class PageTruth(url: String, entity_id: Long)

/** Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md §5).
  *
  * Structure: K entities × 1-12 page variants each (host misspellings,
  * www./m. prefixes, tracking params), a Zipfian head of hot entities to
  * exercise skew handling, plus ~20% singleton pages. Every page is a pure
  * function of (seed, index) via splitmix64, so the corpus is byte-identical
  * across runs, partitionings, and cluster sizes — which is what makes the
  * resume-from-checkpoint test and the per-url byte-identical-text invariant
  * (BASELINE.json:15) checkable.
  *
  * Entity base names are drawn from a genealogy-style surname list (the
  * reference's test corpus domain, strsim.rs:383-455) and greedily filtered
  * so distinct entities score composite (JW + Dice) < 1.35 — comfortably
  * below the match threshold — while same-entity variants (≤2 edits) score
  * well above it.
  */
object PagesCorpus {

  // -------------------------------------------------------------- rng
  /** splitmix64: tiny, deterministic, index-addressable rng. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def rand(seed: Long, stream: Long, i: Long): Long =
    mix(mix(seed ^ mix(stream)) ^ mix(i))
  private def pick[T](arr: IndexedSeq[T], r: Long): T =
    arr(((r % arr.length) + arr.length).toInt % arr.length)

  // -------------------------------------------------------------- names
  private val surnamePool: IndexedSeq[String] = Vector(
    "anderson", "ashworth", "blackwood", "bridgewater", "carmichael",
    "chamberlain", "cunningham", "davenport", "eastwood", "fairbanks",
    "fitzgerald", "galbraith", "greenfield", "harrington", "hollingsworth",
    "kingsley", "lancaster", "livingston", "macallister", "middleton",
    "northcott", "oakenshield", "pemberton", "quarrington", "ravenscroft",
    "silverstone", "thornbury", "underwood", "vanderbilt", "wetherby",
    "yarborough", "zimmerman", "abercrombie", "billingsley", "castellano",
    "dunmore", "ellingham", "featherston", "goldsmith", "huntington",
    "ironwood", "jamieson", "kensington", "lockhart", "montgomery",
    "nightingale", "ostrander", "pennington", "rutherford", "stanhope",
    "templeton", "uppington", "vandermeer", "whittaker", "youngblood",
    "archibald", "bellweather", "crowhurst", "dillingham", "everhart",
  )

  /** Greedily keep names whose composite score vs every kept name is < 1.35
    * (deterministic; uses the production kernels). */
  lazy val entityNames: IndexedSeq[String] = {
    val kept = scala.collection.mutable.ArrayBuffer[String]()
    for (cand <- surnamePool) {
      val ok = kept.forall { k =>
        StrSimKernels.jaroWinkler(cand, k) + StrSimKernels.sorensenDice(cand, k) < 1.35
      }
      if (ok) kept += cand
    }
    kept.toIndexedSeq
  }

  private val consonants = "bcdfgklmnprstvz"
  private val vowels = "aeiou"

  /** High-entropy pronounceable name: 5-7 CV syllables (~2.4e9 distinct
    * forms, so name collisions are negligible at any corpus scale we run,
    * and two independent draws are pairwise-distant w.h.p. — random names
    * score composite ≈ 1.0-1.2, far under the match threshold). */
  private def syllableName(seed: Long, stream: Long, id: Long): String = {
    val nSyl = 5 + (math.abs(rand(seed, stream, id)) % 3).toInt
    val sb = new StringBuilder
    var k = 0
    while (k < nSyl) {
      val r = rand(seed, stream * 1000 + k, id)
      sb.append(consonants((math.abs(r) % consonants.length).toInt))
      sb.append(vowels((math.abs(r >> 16) % vowels.length).toInt))
      k += 1
    }
    sb.toString
  }

  private val subdomains = Vector("", "www.", "m.", "en.", "web.")
  private val tlds = Vector("com", "org", "net", "example")
  private val langs = Vector("en", "en", "en", "en", "en", "en", "en", "en",
    "de", "fr", "es", "zh") // skewed, en-heavy (drives the skew fixture)
  private val lexicon = Vector(
    "records", "archive", "family", "history", "estate", "office", "company",
    "group", "society", "heritage", "library", "museum", "press", "journal",
    "papers", "letters", "collection", "foundation", "institute", "trust")

  /** Apply `nEdits` deterministic single-char edits (drop/double/swap). */
  private def editName(name: String, seed: Long, nEdits: Int): String = {
    var s = name
    var e = 0
    while (e < nEdits && s.length > 3) {
      val r = rand(seed, 100 + e, s.length)
      val pos = 1 + (math.abs(r) % (s.length - 2)).toInt
      (math.abs(r >> 8) % 3).toInt match {
        case 0 => s = s.substring(0, pos) + s.substring(pos + 1)          // drop
        case 1 => s = s.substring(0, pos) + s.charAt(pos) + s.substring(pos) // double
        case 2 => s = s.substring(0, pos - 1) + s.charAt(pos) +
          s.charAt(pos - 1) + s.substring(pos + 1)                        // swap
      }
      e += 1
    }
    s
  }

  // -------------------------------------------------------------- layout
  /** Variant count per entity: Zipfian head (hot entities) + 1-12 tail. */
  private def variantCount(entity: Int, seed: Long): Int =
    if (entity < 3) 40 // hot head: skew fixture for salting/AQE
    else 1 + (math.abs(rand(seed, 1, entity)) % 12).toInt

  final case class Layout(seed: Long, nEntities: Int, nSingletons: Int,
      offsets: Array[Int]) {
    val entityPages: Int = offsets(nEntities)
    val totalPages: Int = entityPages + nSingletons
  }

  /** Deterministic corpus layout for ~nPages pages (entity pages + 20%
    * singletons). */
  def layout(nPages: Int, seed: Long): Layout = {
    val targetEntityPages = math.max(1, (nPages * 0.8).toInt)
    val counts = scala.collection.mutable.ArrayBuffer[Int]()
    var total = 0
    var e = 0
    while (total < targetEntityPages) {
      val c = variantCount(e, seed)
      counts += c
      total += c
      e += 1
    }
    val offsets = counts.scanLeft(0)(_ + _).toArray
    Layout(seed, counts.length, math.max(nPages - total, 0), offsets)
  }

  /** Build page #i of the corpus as a pure function of (layout, i). */
  def page(l: Layout, i: Int): (Page, Long) = {
    val isSingleton = i >= l.entityPages
    val (entityId, name, variant) =
      if (isSingleton) {
        val sIdx = i - l.entityPages
        // singleton: high-entropy random name + unique index suffix
        // (distant from entities AND from other singletons — a lookalike
        // singleton would be an irreducible false positive)
        (-1L, syllableName(l.seed, 5, sIdx) + sIdx, 0)
      } else {
        // binary search entity for page index
        var lo = 0
        var hi = l.nEntities - 1
        while (lo < hi) {
          val mid = (lo + hi + 1) >>> 1
          if (l.offsets(mid) <= i) lo = mid else hi = mid - 1
        }
        val ent = lo
        val variant = i - l.offsets(ent)
        // first |entityNames| entities: greedy-filtered surnames (reference
        // flavor, pairwise composite < 1.35); beyond that: syllable names
        val base = if (ent < entityNames.length) entityNames(ent)
          else syllableName(l.seed, 4, ent)
        (ent.toLong, base, variant)
      }

    val r0 = rand(l.seed, 10, i)
    // variant 0 keeps the canonical spelling; others get 1 edit (2 only for
    // long names) so same-entity pairs stay comfortably above θ while
    // distinct entities stay comfortably below it
    val nEdits =
      if (variant == 0) 0
      else if (name.length <= 9) 1
      else 1 + (math.abs(r0) % 2).toInt
    val vname = if (variant == 0) name else editName(name, r0, nEdits)

    val sub = pick(subdomains, rand(l.seed, 11, i))
    val tld = pick(tlds, rand(l.seed, 12, i))
    val params = if (math.abs(rand(l.seed, 13, i)) % 4 == 0)
      s"?utm_source=s${math.abs(r0 % 7)}&ref=r${math.abs(r0 % 13)}" else ""
    val url = s"https://$sub$vname.$tld/page${variant}$params"

    val display = vname.capitalize
    val bodyWords = (0 until 20).map(w =>
      pick(lexicon, rand(l.seed, 20 + w, if (isSingleton) i.toLong else entityId)))
    // per-variant noise word keeps texts distinct across a cluster
    val noise = pick(lexicon, rand(l.seed, 50, i))
    val text = s"$display\n${bodyWords.mkString(" ")} $noise"
    val html = renderHtml(display, text)
    val lang = pick(langs, rand(l.seed, 60, i))
    val ts = new Timestamp(1704067200000L + (math.abs(rand(l.seed, 70, i)) % 31536000000L))
    (Page(url, ts, html, text, lang), entityId)
  }

  /** Deterministic html wrapper. [[extractText]] must invert this
    * byte-identically (BASELINE.json:15 invariant). */
  def renderHtml(title: String, text: String): Array[Byte] = {
    val body = text.split("\n", -1).map(l => s"<p>$l</p>").mkString("\n")
    s"<html><head><title>$title</title></head><body>\n$body\n</body></html>"
      .getBytes("UTF-8")
  }

  /** Inverse of [[renderHtml]]: recover `text` byte-identically. */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, "UTF-8")
    val start = s.indexOf("<body>\n") + 7
    val end = s.lastIndexOf("\n</body>")
    s.substring(start, end).split("\n", -1)
      .map(l => l.stripPrefix("<p>").stripSuffix("</p>")).mkString("\n")
  }

  /** Distributed corpus: pages + ground truth. Pure function of
    * (nPages, seed, parallelism-independent index). */
  def generate(spark: SparkSession, nPages: Int, seed: Long = 42L,
      partitions: Int = 32): (Dataset[Page], Dataset[PageTruth]) = {
    import spark.implicits._
    val l = layout(nPages, seed)
    val pages = spark.range(0, l.totalPages.toLong, 1, partitions)
      .mapPartitions(_.map(i => page(l, i.intValue)._1))
    val truth = spark.range(0, l.totalPages.toLong, 1, partitions)
      .mapPartitions(_.map { i =>
        val (p, ent) = page(l, i.intValue)
        PageTruth(p.url, ent)
      })
    (pages, truth)
  }

  /** All same-entity url pairs (url_a < url_b): the positive labels
    * (FIXTURES.md §6). */
  def labeledMatches(truth: DataFrame): DataFrame = {
    val a = truth.toDF("url_a", "ent")
    val b = truth.toDF("url_b", "ent")
    a.where(col("ent") >= 0).join(b.where(col("ent") >= 0), "ent")
      .where(col("url_a") < col("url_b"))
      .select(col("url_a"), col("url_b"))
  }
}
