package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the dedup key a crawl corpus needs BEFORE
  * any text-level dedup runs: the same page is fetched as
  * `HTTP://WWW.Site.com:80//a//b/?b=2&a=1&utm_source=rss#frag` and
  * `http://site.com/a/b?a=1&b=2`, and URL-level dedup collapsing the
  * two saves the fetch, the extraction, and the shingle pass
  * downstream. Beyond-reference operator in the [[HtmlOps]] ingress
  * family.
  *
  * Canonical form (the standard crawl-dedup normalizations):
  *   - scheme and host lowercased; `www.` prefix dropped;
  *   - default ports removed (`:80` for http, `:443` for https);
  *   - duplicate slashes in the path collapsed, one trailing slash
  *     dropped, empty path becomes `/`;
  *   - fragment dropped;
  *   - tracking params (`utm_*`, `gclid`, `fbclid`, `ref`) removed,
  *     remaining params SORTED (param order is transport noise), the
  *     `?` dropped when nothing survives;
  *   - an unparseable input passes through trimmed, never nulled —
  *     auditable, same contract as the unknown-entity rule in
  *     [[HtmlOps]].
  *
  * Everything is `regexp_extract`/`regexp_replace`/array column
  * arithmetic in the Java-regex/RE2 common subset plus
  * sort/filter/join on the param array — codegen'd, per-row,
  * zero-shuffle at any scale; [[canonicalizeUrlSql]] mirrors the exact
  * computation in DuckDB SQL for the oracle.
  */
object UrlOps {

  /** One regex, five groups: scheme, host, port, path, query (the
    * fragment is matched but never captured). Shared verbatim with
    * the SQL mirror. */
  val urlRe: String =
    "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:]*)(?::([0-9]+))?([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  /** Params dropped from the canonical form (anchored — acts as a
    * full match in both engines). */
  val trackingParamRe: String = "^(utm_[^=]*|gclid|fbclid|ref)(=.*)?$"

  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, urlRe, 1))
    val host = regexp_replace(lower(regexp_extract(u, urlRe, 2)), "^www\\.", "")
    val port = regexp_extract(u, urlRe, 3)
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_replace(
      regexp_replace(regexp_extract(u, urlRe, 4), "/{2,}", "/"), "/$", "")
    val pathPart = when(path === "", lit("/")).otherwise(path)
    val params = filter(split(regexp_extract(u, urlRe, 5), "&"),
      p => p =!= "" && !p.rlike(trackingParamRe))
    val queryPart = when(size(params) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(params), "&")))
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), host, portPart, pathPart, queryPart))
  }

  /** The registrable-site key ([[canonicalizeUrl]]'s host part): the
    * per-domain group-by column for crawl stats and politeness. */
  def urlHost(url: Column): Column =
    regexp_replace(lower(regexp_extract(trim(url), urlRe, 2)), "^www\\.", "")

  private def escSql(s: String): String = s.replace("'", "''")

  /** [[canonicalizeUrl]] in DuckDB SQL over the expression `inner` —
    * the oracle mirror; identical regex bytes, identical arithmetic.
    * Verbose (the parts repeat the extract) — materialize `inner` in
    * a CTE if the input expression is expensive. */
  def canonicalizeUrlSql(inner: String): String = {
    val re = escSql(urlRe)
    val track = escSql(trackingParamRe)
    val u = s"trim($inner)"
    val scheme = s"lower(regexp_extract($u, '$re', 1))"
    val host = s"regexp_replace(lower(regexp_extract($u, '$re', 2)), '^www\\.', '')"
    val port = s"regexp_extract($u, '$re', 3)"
    val portPart =
      s"""CASE WHEN $port = '' OR ($scheme = 'http' AND $port = '80')
         |      OR ($scheme = 'https' AND $port = '443') THEN ''
         |    ELSE ':' || $port END""".stripMargin
    val path =
      s"regexp_replace(regexp_replace(regexp_extract($u, '$re', 4), '/{2,}', '/', 'g'), '/$$', '')"
    val pathPart = s"CASE WHEN $path = '' THEN '/' ELSE $path END"
    val params =
      s"""list_filter(string_split(regexp_extract($u, '$re', 5), '&'),
         |  p -> p <> '' AND NOT regexp_matches(p, '$track'))""".stripMargin
    val queryPart =
      s"""CASE WHEN len($params) = 0 THEN ''
         |    ELSE '?' || array_to_string(list_sort($params), '&') END""".stripMargin
    s"""CASE WHEN $scheme = '' THEN $u
       |     ELSE $scheme || '://' || $host || $portPart || $pathPart || $queryPart
       |END""".stripMargin
  }

  /** [[urlHost]] in DuckDB SQL. */
  def urlHostSql(inner: String): String =
    s"regexp_replace(lower(regexp_extract(trim($inner), '${escSql(urlRe)}', 2)), '^www\\.', '')"
}
