package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized URL-normalization parity: URLs are ASSEMBLED from known
  * parts (scheme case × host case × default/odd/missing ports × path
  * shapes × shuffled query params × fragments), so the expected
  * canonical form derives from the parts by the documented rules — no
  * parser on the checking side at all. The pool crosses the rules:
  * default ports on the WRONG scheme (http + :443 stays), tracking
  * names without '=' (kept — only name=value is a param), tracking
  * names as VALUES (kept), uppercase tracking names ((?i) applies),
  * empty tracking values, consecutive tracking params (the left-to-right
  * lookbehind pass), mixed-case paths (never lowercased), mid-path
  * slash runs (kept) vs trailing runs (dropped), and root-only paths
  * (http://h/ → http://h).
  */
class UrlFuzzSpec extends SparkSpec {

  private val trackRe = "(?i)^(utm_[a-z0-9_]+|fbclid|gclid|msclkid|ref)=.*$"

  test("normalizeUrl matches the parts-derived canonical form") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val schemes = Seq("http", "HTTP", "https", "HTTPS", "ftp")
    val hosts = Seq("Example.COM", "www.Example.co.uk", "A.b.C.org", "host")
    val ports = Seq(None, Some(80), Some(443), Some(8080))
    val paths = Seq("", "/", "/a", "/A/b", "/a//b", "/a/b/", "/a/b///", "/x/")
    val paramPool = Seq(
      "utm_source=x", "utm_campaign=a1", "UTM_TERM=Z", "gclid=z", "GCLID=q",
      "msclkid=m", "ref=abc", "REF=q", "fbclid=", "ref",
      "id=7", "q=hello", "a=b", "a=ref=x", "keep=utm_source")
    val cases = (0 until 200).map { i =>
      val scheme = schemes(rnd.nextInt(schemes.length))
      val host = hosts(rnd.nextInt(hosts.length))
      val port = ports(rnd.nextInt(ports.length))
      val path = paths(rnd.nextInt(paths.length))
      val params = rnd.shuffle(paramPool).take(rnd.nextInt(5))
      val frag = if (rnd.nextBoolean()) "#Frag" else ""
      val portStr = port.map(":" + _).getOrElse("")
      val query = if (params.isEmpty) "" else "?" + params.mkString("&")
      val raw = s"$scheme://$host$portStr$path$query$frag"
      // expected canonical form, derived from the parts by the rules
      val s = scheme.toLowerCase
      val h = host.toLowerCase
      val p = port match {
        case Some(80) if s == "http" => ""
        case Some(443) if s == "https" => ""
        case Some(x) => s":$x"
        case None => ""
      }
      val kept = params.filterNot(_.matches(trackRe))
      val q = if (kept.isEmpty) "" else "?" + kept.mkString("&")
      val cleanPath = path.reverse.dropWhile(_ == '/').reverse
      (i.toLong, raw, s"$s://$h$p$cleanPath$q")
    }
    val got = cases.map(c => (c._1, c._2)).toDF("id", "url")
      .select(col("id"), Curation.normalizeUrl(col("url")).as("norm"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, raw, want) =>
      assert(got(id) == want, s"case $id '$raw': got '${got(id)}', want '$want'")
    }
  }

  test("hostOf + registeredDomain match label arithmetic over assembled hosts") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val suffixes = Seq("com", "org", "co.uk", "com.au", "io", "co.jp")
    val cases = (0 until 120).map { i =>
      val suffix = suffixes(rnd.nextInt(suffixes.length))
      val nLabels = rnd.nextInt(3) // extra labels left of the registrable one
      val name = ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(4))
      val labels = (0 until nLabels).map(k => s"l$k") :+ name
      val host = labels.mkString(".") + "." + suffix
      val userinfo = if (rnd.nextInt(4) == 0) "user:pw@" else ""
      val port = if (rnd.nextInt(3) == 0) ":8080" else ""
      val url = s"https://$userinfo$host$port/p?a=b#f"
      (i.toLong, url, host, s"$name.$suffix")
    }
    val got = cases.map(c => (c._1, c._2)).toDF("id", "url")
      .select(col("id"), Curation.hostOf(col("url")).as("h"),
        Curation.registeredDomain(Curation.hostOf(col("url"))).as("d"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    cases.foreach { case (id, url, host, dom) =>
      assert(got(id)._1 == host, s"case $id '$url': host '${got(id)._1}' != '$host'")
      assert(got(id)._2 == dom, s"case $id '$url': domain '${got(id)._2}' != '$dom'")
    }
  }
}
