package graft

import org.apache.spark.sql.functions._
import graft.text.UrlCuration

/** Semantics of the URL/domain curation family (the DuckDB oracle pins
  * exact values; these pin the invariants a reader relies on). */
class UrlCurationSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("url fixture: well-formed, deterministic, with exact duplicates") {
    val urls = UrlCuration.withUrls(spark, dir).select("doc_id", "url").collect()
    assert(urls.nonEmpty)
    val re = "^https?://((www|cdn|api)\\.)?d\\d+\\.(com|org|net|io|co\\.uk)/p/[0-9a-f]{8}$".r
    urls.foreach(r => assert(re.matches(r.getString(1)), s"malformed: ${r.getString(1)}"))
    // deterministic across evaluations
    val again = UrlCuration.withUrls(spark, dir).select("doc_id", "url").collect()
    assert(urls.map(r => (r.getLong(0), r.getString(1))).toSet ===
      again.map(r => (r.getLong(0), r.getString(1))).toSet)
    // the dup mechanism produces genuine exact-URL duplicates
    val distinctUrls = urls.map(_.getString(1)).toSet
    assert(distinctUrls.size < urls.length, "expected some exact-URL duplicates")
    assert(distinctUrls.size > urls.length / 2, "dup rate should stay a minority")
  }

  test("registered-domain extraction strips subdomains, keeps public suffix") {
    val parsed = UrlCuration.parseUrls(spark, dir)
      .select("host", "registered_domain").distinct().collect()
    parsed.foreach { r =>
      val (host, rdom) = (r.getString(0), r.getString(1))
      assert(host.endsWith(rdom), s"$rdom not a suffix of $host")
      val labels = rdom.split('.')
      if (rdom.endsWith(".co.uk")) assert(labels.length === 3, s"co.uk domain $rdom")
      else assert(labels.length === 2, s"domain $rdom")
      assert(!rdom.startsWith("www.") && !rdom.startsWith("cdn.") && !rdom.startsWith("api."))
    }
  }

  test("domain cap binds exactly and keeps the best-priority docs") {
    val r = UrlCuration.domainCap(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (n, kept, dropped) = (row.getAs[Long]("n_docs"),
        row.getAs[Long]("n_kept"), row.getAs[Long]("n_dropped"))
      assert(kept === math.min(n, UrlCuration.DomainCap.toLong))
      assert(dropped === n - kept)
    }
    // at least one domain must actually be capped at this sf or the
    // query degenerates to a count
    assert(r.exists(_.getAs[Long]("n_dropped") > 0L), "cap never bound")
  }

  test("url-exact dedup: survivors = distinct urls, dups consistent with fixture") {
    val r = UrlCuration.urlExactDedup(spark, dir).collect()
    val totDocs = r.map(_.getAs[Long]("n_docs")).sum
    val totUrls = r.map(_.getAs[Long]("n_urls")).sum
    val totDups = r.map(_.getAs[Long]("n_dup_docs")).sum
    assert(totDups === totDocs - totUrls)
    assert(totDups > 0, "fixture must contain exact-URL dups")
    val nDocs = graft.operators.Tables.t(spark, dir, "documents").count()
    assert(totDocs === nDocs)
  }

  test("blocklist funnel partitions the corpus with domain precedence") {
    val rows = UrlCuration.domainBlocklist(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    val nDocs = graft.operators.Tables.t(spark, dir, "documents").count()
    assert(rows.values.sum === nDocs, "verdicts must partition the corpus")
    assert(rows.getOrElse("kept", 0L) > 0L)
    // blocked_domain counts exactly the two listed domains
    val perDom = UrlCuration.parseDomains(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    val expectBlocked = perDom.getOrElse("d6.com", 0L) + perDom.getOrElse("d11.org", 0L)
    assert(rows.getOrElse("blocked_domain", 0L) === expectBlocked)
    // .io domains fall in blocked_tld (none of the two blocked are .io)
    val ioDocs = perDom.collect { case (d, n) if d.endsWith(".io") => n }.sum
    assert(rows.getOrElse("blocked_tld", 0L) === ioDocs)
  }

  test("domain stats: totals consistent with the corpus") {
    val r = UrlCuration.domainStats(spark, dir).collect()
    val totChars = r.map(_.getAs[Long]("total_chars")).sum
    val corpusChars = graft.operators.Tables.t(spark, dir, "documents")
      .agg(sum("n_chars")).collect()(0).getLong(0)
    assert(totChars === corpusChars)
    r.foreach(row => assert(row.getAs[Long]("total_tokens") >= row.getAs[Long]("n_docs")))
  }
}
