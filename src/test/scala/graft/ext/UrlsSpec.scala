package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Urls]] host/registrable-domain edge cases: scheme case, userinfo,
  * port, trailing root-dot, IDN punycode, IPv4 literals, private-suffix
  * registries, garbage input. The same vectors run through the DuckDB
  * oracle fragment in q_url_domain's CTE — this spec is the Spark half
  * of that equivalence.
  */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def domains(urls: Seq[String]): Seq[Option[String]] =
    urls.toDF("url")
      .select(Urls.registrableDomain(col("url")).as("d"))
      .as[Option[String]].collect().toSeq

  private def hosts(urls: Seq[String]): Seq[Option[String]] =
    urls.toDF("url")
      .select(Urls.host(col("url")).as("h"))
      .as[Option[String]].collect().toSeq

  test("host: strips scheme, userinfo, port, path, query, fragment; lowercases") {
    assert(hosts(Seq(
      "https://www.Example.COM/a/b?x=1#f",
      "http://blog.example.co.uk:8080/path",
      "https://user:pw@sub.example.org/",
      "HTTPS://WWW.EXAMPLE.COM.AU/Q?u=v",
    )) == Seq(
      Some("www.example.com"),
      Some("blog.example.co.uk"),
      Some("sub.example.org"),
      Some("www.example.com.au"),
    ))
  }

  test("host: trailing root-dot stripped, IDN punycode preserved, garbage -> null") {
    assert(hosts(Seq(
      "https://example.com./x",
      "https://xn--bcher-kva.example/x",
      "not a url",
    )) == Seq(
      Some("example.com"),
      Some("xn--bcher-kva.example"),
      None,
    ))
  }

  test("host: repeated trailing dots can never mint a 'com.' pseudo-domain") {
    // java.net.URI (try_parse_url) rejects the empty label outright, so
    // 'example.com..' is null on the Spark side; the \\.+$ strip exists
    // for PARITY with the oracle's regex extractor, which does capture
    // the raw host — both paths must agree the pseudo-domain never forms
    assert(hosts(Seq("https://example.com../x")) == Seq(None))
    assert(domains(Seq("https://example.com../x")) == Seq(None))
  }

  test("registrableDomain: 1-label TLD keeps 2 labels, 2-label suffix keeps 3") {
    assert(domains(Seq(
      "https://www.example.com/a",
      "https://deep.a.b.example.com/x",
      "http://blog.example.co.uk:8080/p",
      "https://news.bbc.co.uk/",
      "https://example.github.io/page",
      "https://sub.site.example.dev/about", // unknown TLD -> PSL `*` fallback
    )) == Seq(
      Some("example.com"),
      Some("example.com"),
      Some("example.co.uk"),
      Some("bbc.co.uk"),
      Some("example.github.io"),
      Some("example.dev"),
    ))
  }

  test("registrableDomain: IPv4 whole, bare suffix/single label returned as-is") {
    assert(domains(Seq(
      "http://192.168.0.7/x",
      "https://github.io/",   // host IS the suffix: no registrable part
      "https://localhost/",
      "not a url",
    )) == Seq(
      Some("192.168.0.7"),
      Some("github.io"),
      Some("localhost"),
      None,
    ))
  }
}
