package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl curation ([EXT]): raw URL →
  * normalized host → registrable domain (eTLD+1 heuristic). This is
  * the first step a real crawl pipeline runs BEFORE any per-domain
  * policy — [[graft.ext.Sampling]] domain caps and corpus-mix ratios
  * key on the registrable domain, not the raw host, or every
  * `img3.cdn.example.com` subdomain becomes its own "domain" and the
  * cap stops meaning anything.
  *
  * Scale posture: both operators are pure per-row projections —
  * codegen'd string ops (parse_url + split + array slicing), zero
  * shuffle at any corpus size. The suffix table is a compile-time
  * string set folded into the expression tree (an `isin` over <100
  * literals), never a join.
  *
  * Public-knowledge basis: the Mozilla Public Suffix List algorithm
  * (publicsuffix.org/list/ — longest matching suffix wins, registrable
  * domain = suffix + one label). The built-in table here is a small
  * representative subset (the full PSL is a data file a deployment
  * would ship alongside); the match depth is bounded at 2-label
  * suffixes, which covers the ccTLD + private-registry shapes in the
  * subset.
  */
object Urls {

  /** 2-label public suffixes (matched before any 1-label TLD): ccTLD
    * second-level registries plus private-registry suffixes where the
    * "site" is one label below (github.io pages, s3 website buckets).
    */
  val TwoLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "co.in", "co.kr",
    "github.io", "gitlab.io", "blogspot.com")

  /** Lower-cased host extracted from a raw URL: scheme, userinfo,
    * port, path, query, and fragment stripped; trailing root-dot
    * removed (`example.com.` ≡ `example.com`). IDN hosts pass through
    * in their punycode (`xn--`) form — labels are opaque bytes here;
    * display-form conversion is a presentation concern. Null/garbage
    * (no `://`, empty host) → null — `try_parse_url`, not `parse_url`:
    * the strict form THROWS on the malformed URLs every real crawl
    * contains, and one bad row must not fail a corpus-wide job.
    */
  def host(url: Column): Column = {
    val h = lower(try_parse_url(url, lit("HOST")))
    // \\.+$: ALL trailing dots — a single-strip would leave
    // 'example.com..' as 'example.com.' and the registrable-domain
    // split would emit the garbage pseudo-domain 'com.'
    val stripped = regexp_replace(h, "\\.+$", "")
    when(stripped === "", lit(null)).otherwise(stripped)
  }

  /** Registrable domain (eTLD+1) of a URL's host:
    *  - IPv4 literal hosts are returned whole (no label semantics);
    *  - a host ENDING IN a 2-label suffix keeps 3 labels
    *    (`news.bbc.co.uk` → `bbc.co.uk`);
    *  - otherwise 2 labels (`a.b.example.com` → `example.com`) — the
    *    unknown-TLD fallback the PSL algorithm prescribes (`*` rule);
    *  - a bare host equal to a suffix (or single-label) has no
    *    registrable part → the host itself, the conservative choice
    *    for grouping (never null-groups real traffic).
    */
  def registrableDomain(url: Column): Column = {
    val h = host(url)
    val labs = split(h, "\\.")
    val n = size(labs)
    val last2 = concat_ws(".", element_at(labs, -2), element_at(labs, -1))
    val last3 = concat_ws(".",
      element_at(labs, -3), element_at(labs, -2), element_at(labs, -1))
    val isIp = h.rlike("^[0-9]{1,3}(\\.[0-9]{1,3}){3}$")
    when(h.isNull, lit(null))
      .when(isIp, h)
      .when(n >= 3 && last2.isin(TwoLabelSuffixes: _*), last3)
      .when(n >= 2, last2)
      .otherwise(h)
  }
}
