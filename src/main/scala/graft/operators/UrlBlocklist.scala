package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL domain-blocklist filtering — the C4/CommonCrawl curation stage
  * that drops documents whose source host sits under a blocked domain
  * (trackers, ad farms, known-spam registrable domains). A blocked
  * entry matches the host itself AND every subdomain of it
  * (`example.com` blocks `a.b.example.com`).
  *
  * Shape for 100 TB: the naive predicate is
  * `host = d OR host LIKE '%.' || d` against every blocklist row — an
  * OR-join that plans as a broadcast NESTED LOOP (rows × blocklist
  * comparisons). Instead each host explodes into its ≤ label-count
  * dot-suffixes (`a.b.example.com` → 4 rows) and suffix-matching
  * becomes one broadcast EQUI-join against the blocklist — per-row cost
  * is bounded by the host's label count (single digits), independent of
  * blocklist size, and the join stays a hash join at any scale. The
  * suffix expansion is codegen'd (`split`/`slice`/`array_join` are
  * ordinary expressions, no higher-order lambdas).
  */
object UrlBlocklist {

  /** Dot-suffix rows of `hostCol`: one row per trailing label group.
    * Empty/NULL hosts produce no rows (they can't match a blocklist).
    * The host is normalized first — lowercased (DNS names are
    * case-insensitive, so `EXAMPLE.com` must not evade the list) and
    * stripped of a trailing dot (the FQDN root form `example.com.`
    * names the same host).
    */
  private def suffixRows(df: DataFrame, idCol: String, hostCol: String): DataFrame = {
    val host = regexp_replace(lower(col(hostCol)), "\\.$", "")
    val labels = split(host, "\\.")
    df.select(col(idCol), host.as("__host"), labels.as("__labels"))
      .filter(col("__host").isNotNull && col("__host") =!= "")
      .select(col(idCol), explode(sequence(lit(1), size(col("__labels")))).as("__k"),
        col("__labels"))
      .withColumn("suffix", array_join(slice(col("__labels"), -col("__k"), col("__k")), "."))
      .drop("__labels", "__k")
  }

  /** Mark every row with its blocklist verdict: `blocked` plus
    * `matched_domain` (the lexicographically smallest matching blocked
    * suffix, deterministic; NULL ⇔ allowed). `blocked` must be a tiny
    * dimension (it broadcasts); its one column is the domain,
    * lowercase, no leading dot.
    */
  def mark(df: DataFrame, idCol: String, hostCol: String,
      blocked: DataFrame): DataFrame = {
    val dom = blocked.columns.head
    val hits = suffixRows(df, idCol, hostCol)
      .join(broadcast(blocked.select(lower(col(dom)).as("suffix"))), Seq("suffix"))
      .groupBy(col(idCol))
      .agg(min(col("suffix")).as("matched_domain"))
    df.join(hits, Seq(idCol), "left")
      .withColumn("blocked", col("matched_domain").isNotNull)
  }

  /** Keep only rows whose host is NOT under a blocked domain. */
  def filter(df: DataFrame, idCol: String, hostCol: String,
      blocked: DataFrame): DataFrame =
    mark(df, idCol, hostCol, blocked)
      .filter(!col("blocked"))
      .drop("blocked", "matched_domain")
}
