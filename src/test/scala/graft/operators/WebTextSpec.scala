package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class WebTextSpec extends SparkFunSuite {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(WebText.normalizeUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq

  test("normalizeUrl: fragments, trackers, ports, www, case") {
    assert(norm(
      "HTTPS://WWW.Ex.COM:443/Path/X?utm_source=a&id=5#frag",
      "http://ex.com:80/p",
      "http://ex.com:8080/p", // non-default port KEPT
      "https://ex.com/p?utm_a=1&utm_b=2&fbclid=z", // all trackers, tidy '?'
      "https://ex.com/p?id=1&gclid=x", // tracker last: trailing '&' tidied
      "https://sub.www.ex.com/", // 'www.' only stripped as the FIRST label
      "not a url #frag", // no scheme head: steps 1-3 only
      "HTTPS://EX.COM/CaseSensitivePath", // path case preserved
      "https://ex.com/p?xgclid=5", // param merely CONTAINING a tracker name
      "https://ex.com/utm_source=x/page", // tracker-shaped PATH segment
      "https://ex.com/s?q=utm_source=test", // tracker-shaped VALUE
      "https://ex.com/p?utm_a=1&utm_b=2", // all-tracker query drops whole
      "https://ex.com/item&gclid=promo/details", // '&' is a PATH sub-delim
      "https://ex.com/p?utm_a=1&x=2?gclid=3&y=4" // '?' inside a VALUE
    ) == Seq(
      "https://ex.com/Path/X?id=5",
      "http://ex.com/p",
      "http://ex.com:8080/p",
      "https://ex.com/p",
      "https://ex.com/p?id=1",
      "https://sub.www.ex.com/",
      "not a url ",
      "https://ex.com/CaseSensitivePath",
      "https://ex.com/p?xgclid=5",
      "https://ex.com/utm_source=x/page",
      "https://ex.com/s?q=utm_source=test",
      "https://ex.com/p",
      "https://ex.com/item&gclid=promo/details", // untouched: no query string
      "https://ex.com/p?x=2?gclid=3&y=4")) // gclid lives in x's value: kept
  }

  test("normalizeUrl strips www chains and is idempotent on real shapes") {
    assert(norm("https://www.www.ex.com/p") == Seq("https://ex.com/p"))
    // idempotence over the q_url_normalize synthesized corpus shapes:
    // normalizing an already-normal url changes nothing
    val messy = Seq(
      "HTTPS://WWW.Host3.EXAMPLE:443/P/10?utm_source=feed&gclid=g10&x=0#sec",
      "http://host5.example:80/p/5?fbclid=f5#top")
    val once = norm(messy: _*)
    assert(norm(once: _*) == once)
  }

  test("hostOf extracts the authority, '' without a scheme head") {
    val got = Seq("https://a.b.c/x?q=1", "ftp://h:21/f", "relative/path")
      .toDF("u").select(WebText.hostOf(col("u"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("a.b.c", "h:21", ""))
  }

  test("hostStats: exact distinct, integer-division dup fraction") {
    val docs = Seq(
      ("h1", "same text"), ("h1", "same text"), ("h1", "other"),
      ("h2", "unique")).toDF("source", "text")
    val rows = WebText.hostStats(docs, "source", "text")
      .orderBy("host").collect()
    assert(rows(0).getString(0) == "h1" && rows(0).getLong(1) == 3
      && rows(0).getLong(2) == 2 && rows(0).getDouble(3) == 1.0 / 3.0)
    assert(rows(1).getString(0) == "h2" && rows(1).getDouble(3) == 0.0)
  }
}
