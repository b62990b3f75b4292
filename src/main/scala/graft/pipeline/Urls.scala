package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and URL-level dedup for crawl curation.
  *
  * A web corpus reaches the trainer keyed by URL, and the same page
  * hides behind many spellings: scheme/host case, default ports,
  * fragments, tracking parameters (utm_*, gclid, fbclid…), trailing
  * slashes, and query-parameter order. Canonicalizing before the
  * first dedup pass removes the cheapest duplicate class without
  * touching page text — a URL-string expression pipeline, so at
  * 100 TB it rides the scan with zero shuffle; the dedup that
  * follows is one hash shuffle on the canonical key (the
  * [[Dedup.exactDeduped]] shape, but on a few-hundred-byte key
  * instead of the document body).
  *
  * All rules are pure `functions._` expressions over `parse_url`
  * (codegen-friendly, no UDF):
  *   - scheme and host lowercase; userinfo dropped
  *   - default ports stripped (`:80` for http, `:443` for https)
  *   - fragment dropped
  *   - tracking params dropped (utm_*, gclid, fbclid, msclkid,
  *     mc_eid, igshid, ref, ref_src)
  *   - surviving query params sorted bytewise (param order never
  *     changes the resource)
  *   - trailing slash dropped from non-root paths; empty path → "/"
  */
object Urls {

  /** Query params that never identify the resource. Plain `ref` is
    * deliberately NOT here: on real sites it is resource-identifying
    * as often as it is tracking (a git ref, a docs anchor), and
    * canonicalizing it away would merge genuinely distinct pages —
    * the one mistake a dedup key must never make. `ref_src` (the
    * social-embed referrer) stays. */
  val TrackingParams: Seq[String] = Seq("gclid", "fbclid", "msclkid",
    "mc_eid", "igshid", "ref_src")

  /** Canonical form of `url` (see object doc for the rule list).
    * Null/blank input canonicalizes to null. */
  def canonicalUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(parse_url(u, lit("PROTOCOL")))
    // parse_url's PORT part answers null even for an explicit
    // `:8080` (observed on this Spark), so host and port both come
    // from AUTHORITY: strip userinfo up to '@', split a trailing
    // `:<digits>`
    val auth = parse_url(u, lit("AUTHORITY"))
    // the bracketed alternative keeps an IPv6 literal intact — a bare
    // [^:]+ would stop at the first colon INSIDE the brackets and
    // collide every IPv6 host into "["; the port regex is safe as-is
    // because a bracketed literal never ends in `:digits` without the
    // closing bracket before it
    val host0 = regexp_extract(auth,
      "^(?:[^@]*@)?(\\[[^\\]]+\\]|[^:]+)", 1)
    val host = when(host0 =!= "", lower(host0))
    val port = when(
      regexp_extract(auth, ":([0-9]+)$", 1) =!= "",
      regexp_extract(auth, ":([0-9]+)$", 1))
    val rawPath = parse_url(u, lit("PATH"))
    val query = parse_url(u, lit("QUERY"))
    val keepPort = port.isNotNull &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val portPart = when(keepPort, concat(lit(":"), port)).otherwise(lit(""))
    val path0 = coalesce(rawPath, lit("/"))
    val stripped = regexp_replace(path0, "/$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    // tracking-param filter + bytewise sort over the split query
    val pairs = split(query, "&")
    val trackSet = array(TrackingParams.map(lit): _*)
    val kept = filter(pairs, p => {
      val k = lower(split(p, "=").getItem(0))
      p =!= "" && !k.startsWith("utm_") && !array_contains(trackSet, k)
    })
    val sortedQ = array_join(array_sort(kept), "&")
    val queryPart = when(query.isNotNull && size(kept) > 0,
      concat(lit("?"), sortedQ)).otherwise(lit(""))
    when(u.isNull || u === "" || scheme.isNull || host.isNull,
      lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, path,
        queryPart))
  }

  /** One row per canonical URL with the variant count and a
    * deterministic representative raw spelling (the bytewise-min) —
    * the audit frame a crawl-side dedup reports. One expression pass
    * + one hash aggregate on the canonical key. */
  def urlDedup(df: DataFrame, urlCol: String): DataFrame =
    df.select(canonicalUrl(col(urlCol)).as("canonical_url"),
        col(urlCol).as("__raw"))
      .filter(col("canonical_url").isNotNull)
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_variants"),
        min(col("__raw")).as("sample_raw"))
}
