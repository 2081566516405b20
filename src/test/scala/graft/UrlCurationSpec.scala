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

  test("canonicalizer replay: every noisy url canonicalizes back to the clean url") {
    val clean = UrlCuration.withUrls(spark, dir).select("doc_id", "url").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val noisy = UrlCuration.withNoisyUrls(spark, dir).select("doc_id", "raw_url").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(noisy.keySet === clean.keySet)
    // plain-Scala canonicalizer — same steps as the operator, no Spark
    def canon(u0: String): String = {
      val u1 = u0.replaceAll("#.*$", "")
      val u2 = u1.replaceAll("utm_[a-z]+=[^&#]*&?", "").replaceAll("[?&]+$", "")
      val scheme = u2.takeWhile(_ != ':')
      val hostport = u2.drop(scheme.length + 3).takeWhile(c => c != '/' && c != '?' && c != '#')
      val defPort = if (scheme == "https") ":443" else ":80"
      val chost = {
        val h = hostport.toLowerCase
        if (h.endsWith(defPort)) h.dropRight(defPort.length) else h
      }
      (scheme + "://" + chost + u2.drop(scheme.length + 3 + hostport.length))
        .replaceAll("/+$", "")
    }
    noisy.foreach { case (id, raw) =>
      assert(canon(raw) === clean(id), s"doc $id: $raw -> ${canon(raw)} != ${clean(id)}")
    }
    // the fixture actually injects noise (most docs get a non-identity variant)
    assert(noisy.count { case (id, raw) => raw != clean(id) } > noisy.size / 2)
  }

  test("canonical dedup: per-domain canonical urls equal exact-dedup's clean urls") {
    val canon = UrlCuration.canonicalDedup(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_raw_urls"),
        r.getAs[Long]("n_canon_urls"), r.getAs[Long]("n_noise_collapsed"))).toMap
    val exact = UrlCuration.urlExactDedup(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_urls"))).toMap
    assert(canon.keySet === exact.keySet)
    canon.foreach { case (dom, (nDocs, nRaw, nCanon, collapsed)) =>
      assert(nDocs === exact(dom)._1, s"$dom docs")
      // canonicalization undoes the noise exactly: canonical granularity
      // == clean-url granularity
      assert(nCanon === exact(dom)._2, s"$dom canonical vs clean urls")
      assert(collapsed === nRaw - nCanon)
      assert(nRaw >= nCanon)
    }
    assert(canon.values.map(_._4).sum > 0L, "noise never collapsed anything")
  }

  test("lang mix replay: integer-quantized entropy and top share") {
    val got = UrlCuration.langMix(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_langs"),
        r.getAs[Long]("h_mbits"), r.getAs[Long]("top_share_pm"))).toMap
    val docs = UrlCuration.parseUrls(spark, dir)
      .select("registered_domain", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byDom = docs.groupBy(_._1)
    assert(got.keySet === byDom.keySet)
    byDom.foreach { case (dom, rows) =>
      val ks = rows.groupBy(_._2).map(_._2.length.toLong).toSeq
      val n = ks.sum
      def bits(k: Long): Long = java.lang.Long.toBinaryString(n * 1048576L / k).length.toLong - 1L
      val hMbits = 1000L * ks.map(k => k * bits(k)).sum / n
      val (gn, gl, gh, gts) = got(dom)
      assert(gn === n); assert(gl === ks.size.toLong)
      assert(gh === hMbits, s"$dom entropy")
      assert(gts === 1000L * ks.max / n)
    }
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
