package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL/domain curation operators: normalization rules pinned case by
  * case, eTLD+1 label arithmetic, deterministic per-domain caps with the
  * partial-group-limit plan shape, blocklist equivalence.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeUrl: each rule pinned") {
    val cases = Seq(
      // scheme + host lowercase, path case preserved
      "HTTP://WWW.Example.COM/Path" -> "http://www.example.com/Path",
      // default ports stripped per scheme, non-default kept
      "http://a.com:80/x" -> "http://a.com/x",
      "https://a.com:443/x" -> "https://a.com/x",
      "http://a.com:443/x" -> "http://a.com:443/x",
      "http://a.com:8080/x" -> "http://a.com:8080/x",
      // fragment dropped
      "http://a.com/x#sec-2" -> "http://a.com/x",
      // tracking params dropped, separators tidied, empty query dropped
      "http://a.com/x?utm_source=tw&id=5" -> "http://a.com/x?id=5",
      "http://a.com/x?id=5&utm_campaign=c&gclid=g" -> "http://a.com/x?id=5",
      "http://a.com/x?utm_medium=m" -> "http://a.com/x",
      // trailing slashes stripped (root included)
      "http://a.com/x/" -> "http://a.com/x",
      "http://a.com/" -> "http://a.com",
      // all rules at once
      "HTTPS://A.com:443/p/q/?utm_source=x&k=1#f" -> "https://a.com/p/q?k=1",
      // tracker names are ANCHORED at a separator: the tail of an
      // innocent param ('href' ends in 'ref') and path segments must
      // survive untouched
      "http://a.com/p?href=foo" -> "http://a.com/p?href=foo",
      "http://a.com/a/ref=x?b=1" -> "http://a.com/a/ref=x?b=1",
      "http://a.com/p?ref=abc" -> "http://a.com/p",
      "http://a.com/x?utm_a=1&utm_b=2&id=3" -> "http://a.com/x?id=3")
    val got = cases.map(_._1).toDF("u")
      .select(Curation.normalizeUrl(col("u"))).as[String].collect()
    cases.map(_._2).zip(got).foreach { case (want, is) =>
      assert(is == want, s"expected $want, got $is")
    }
  }

  test("hostOf strips userinfo: credentials cannot bypass blocklists " +
    "or evade domain caps") {
    import spark.implicits._
    val cases = Seq(
      "http://foo@spam.com/x" -> "spam.com",
      "http://user:pw@spam.com/x" -> "spam.com",
      "http://spam.com/x" -> "spam.com",
      // an '@' later in the query is NOT userinfo
      "http://a.com/p?u=a@b" -> "a.com")
    val got = cases.map(_._1).toDF("u")
      .select(Curation.hostOf(col("u"))).as[String].collect()
    cases.map(_._2).zip(got).foreach { case (want, is) =>
      assert(is == want, s"expected $want, got $is")
    }
    // end to end: the blocklist now catches the credentialed variant
    val df = Seq("http://evil@spam.com/x", "http://ok.com/y").toDF("url")
    val kept = Curation.blockDomains(df, "url", Seq("spam.com"))
      .as[String].collect()
    assert(kept.toSeq == Seq("http://ok.com/y"))
  }

  test("registeredDomain: plain and multi-label suffixes, bare hosts") {
    val cases = Seq(
      "www.example.com" -> "example.com",
      "a.b.news.co.uk" -> "news.co.uk",
      "deep.sub.site.com.au" -> "site.com.au",
      "example.org" -> "example.org",
      "localhost" -> "localhost")
    val got = cases.map(_._1).toDF("h")
      .select(Curation.registeredDomain(col("h"))).as[String].collect()
    cases.map(_._2).zip(got).foreach { case (want, is) =>
      assert(is == want, s"expected $want, got $is")
    }
    // hostOf strips scheme and port before the label arithmetic
    val viaUrl = Seq("https://Sub.News.CO.UK:8443/x").toDF("u")
      .select(Curation.registeredDomain(Curation.hostOf(lower(col("u")))))
      .as[String].head()
    assert(viaUrl == "news.co.uk")
  }

  test("domainCap keeps exactly cap rows per domain, deterministically") {
    val df = spark.range(200).select(
      concat(lit("http://site"), col("id") % 7, lit(".com/p/"), col("id")).as("url"),
      col("id"))
    val capped = Curation.domainCap(df, "url", "id", cap = 4)
    val byDomain = capped.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(byDomain.size == 7 && byDomain.values.forall(_ == 4L))
    assert(capped.agg(max(col("domain_rank"))).head().getInt(0) == 4)
    // determinism: same rows on a rerun and under different partitioning
    val again = Curation.domainCap(df.repartition(13), "url", "id", cap = 4)
      .select("id").as[Long].collect().sorted.toSeq
    val first = capped.select("id").as[Long].collect().sorted.toSeq
    assert(first == again)
    // plan shape: partial+final WindowGroupLimit around the one exchange —
    // each input partition ships at most cap rows per domain
    capped.collect()
    val p = capped.queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"expected partial+final WindowGroupLimit:\n$p")
  }

  test("literal and broadcast blocklists agree; corpus side plans no shuffle") {
    val df = spark.range(100).select(
      concat(lit("http://b"), col("id") % 5, lit(".org/d/"), col("id")).as("url"),
      col("id"))
    val lit1 = Curation.blockDomains(df, "url", Seq("b1.org", "B3.org"))
    val table = Seq("b1.org", "B3.org").toDF("bad")
    val anti = Curation.blockDomainsDf(df, "url", table, "bad")
    assert(lit1.select("id").as[Long].collect().sorted.toSeq ==
      anti.select("id").as[Long].collect().sorted.toSeq)
    assert(lit1.count() == 60)
    val p = anti.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"blocklist table must broadcast anti-join:\n$p")
  }
}
