package graft

import graft.multimodal.Multimodal

/** Multimodal plumbing: the decode pipeline's schema, batch shape and
  * determinism (the codec itself is a documented stub — FakeCodec). */
class MultimodalSpec extends SparkSpec {

  test("decode pipeline: 1 output row per media row, deterministic") {
    val a = Multimodal.decodeAll(spark, sf("sf0.001")).collect().sortBy(_.media_id)
    val b = Multimodal.decodeAll(spark, sf("sf0.001")).collect().sortBy(_.media_id)
    assert(a.length === 500)
    assert(a.toSeq === b.toSeq)
    // stub decode produces plausible dims and checksums depend on content
    assert(a.forall(r => r.width >= 64 && r.width < 512 && r.height >= 64 && r.height < 512))
    assert(a.map(_.checksum).distinct.length > 490)
    // frame counts: only video has > 1
    assert(a.filter(_.kind != "video").forall(_.n_frames == 1))
    assert(a.exists(r => r.kind == "video" && r.n_frames > 1))
  }

  test("resize pipeline emits scale factors for every media row") {
    val r = Multimodal.resizeAll(spark, sf("sf0.001")).collect()
    assert(r.length === 500)
    assert(r.forall(x => x.scale_x > 0 && x.scale_x == 224.0 / x.width))
  }

  test("frame sampling fans out only video media, every k-th frame") {
    val dec = Multimodal.decodeAll(spark, sf("sf0.001")).collect()
      .filter(_.kind == "video").map(d => d.media_id -> d.n_frames).toMap
    val frames = Multimodal.sampleFrames(spark, sf("sf0.001"), every = 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(f => dec.contains(f.media_id)))
    val counts = frames.groupBy(_.media_id).view.mapValues(_.length).toMap
    assert(counts.forall { case (id, n) => n == (dec(id) + 3) / 4 })
    assert(frames.forall(f => f.frame_idx % 4 == 0))
  }

  test("media metadata agrees with decoded byte counts") {
    val meta = Multimodal.mediaMeta(spark, sf("sf0.001")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val dec = Multimodal.decodeAll(spark, sf("sf0.001")).collect()
    assert(dec.forall(d => meta(d.media_id) == d.n_bytes.toLong))
  }

  test("perceptual near-dup recovers every planted pair through the banded path") {
    val df = Multimodal.mediaNearDupPairs(spark, sf("sf0.001"))
    // candidate generation must be an equi-join, never a cross product
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "near-dup plan fell back to a cross product")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // the 8 planted edits (media 0..7 re-appended past max id) must all
    // surface within the Hamming bound — one chunk edit flips ≤ 2 bits
    val base = 500L
    for (i <- 0L until 8L) {
      val hit = rows.find(p => p._1 == i && p._2 == i + base)
      assert(hit.nonEmpty, s"planted pair ($i, ${i + base}) not recovered: ${rows.mkString(",")}")
      assert(hit.get._3 <= 2, s"planted pair flipped more than one chunk: $hit")
    }
  }

  test("real-pixel near-dup: planted image edits recovered, unrelated images far away") {
    val df = Multimodal.realNearDupPairs(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "near-dup plan fell back to a cross product")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // images 12..15 are copies of 0..3 with the top-left pooled cell's
    // red channel lifted — each pair must land within the radius, and
    // NOTHING else may (measured: unrelated pairs sit at Hamming >= 16)
    val want = (0L until 4L).map(k => (k, k + 12L)).toSet
    assert(rows.map(p => (p._1, p._2)).toSet === want,
      s"banded path returned ${rows.mkString(",")}")
    rows.foreach(p => assert(p._3 <= 1, s"planted edit moved the aHash too far: $p"))
    // decoder honesty: recompute one planted pair's pooled aHash from
    // the fixture pixels directly through an independent ImageIO read
    val dir = new java.io.File(Multimodal.realNearDupFixture())
    def bits(f: String): Seq[Boolean] = {
      val img = javax.imageio.ImageIO.read(new java.io.File(dir, f))
      val w: Int = img.getWidth()
      val h: Int = img.getHeight()
      val cs = new Array[Long](64); val cc = new Array[Long](64); var tot = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val l = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)).toLong
        val c = (y * 8) / h * 8 + (x * 8) / w
        cs(c) += l; cc(c) += 1; tot += l
      }
      (0 until 64).map(j => cs(j) * w * h > tot * cc(j))
    }
    val ham = bits("nd_02.png").zip(bits("nd_14.png")).count { case (a, b) => a != b }
    val reported = rows.find(p => p._1 == 2L && p._2 == 14L).get._3
    assert(ham === reported, s"reported hamming $reported != pixel-derived $ham")
  }

  test("real codec arm: ImageIO round-trip reproduces the closed-form sums") {
    val rows = Multimodal.realDecode(spark, sf("sf0.001")).collect()
    assert(rows.length === 12)
    // recompute the expected channel sums from the pixel pattern itself
    // (independent of both the decoder and the DuckDB oracle)
    rows.foreach { r =>
      val k = r.getLong(0).toInt
      val (w, h) = (16 + 3 * k, 16 + (5 * k) % 24)
      assert(r.getLong(1) === w.toLong && r.getLong(2) === h.toLong)
      assert(r.getLong(3) === w.toLong * h)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        sr += (7 * x + 13 * y + 29 * k) % 256
        sg += (3 * x + 11 * y + 17 * k) % 256
        sb += (5 * x + 2 * y + 23 * k) % 256
      }
      assert((r.getLong(4), r.getLong(5), r.getLong(6)) === ((sr, sg, sb)),
        s"channel sums diverge for image $k — codec round-trip not bit-exact")
    }
  }

  test("real-pixel resize: NN thumbnail sums tie against an independent pixel sample") {
    val rows = Multimodal.realResize(spark, sf("sf0.001")).collect()
    assert(rows.length === 12)
    rows.foreach { r =>
      val k = r.getLong(0).toInt
      val (w, h) = (16 + 3 * k, 16 + (5 * k) % 24)
      assert(r.getLong(1) === w.toLong && r.getLong(2) === h.toLong)
      assert(r.getLong(3) === 16L)
      // recompute from the closed-form pattern through the same mapping
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (yy <- 0 until 16; xx <- 0 until 16) {
        val (x, y) = ((xx * w) / 16, (yy * h) / 16)
        sr += (7 * x + 13 * y + 29 * k) % 256
        sg += (3 * x + 11 * y + 17 * k) % 256
        sb += (5 * x + 2 * y + 23 * k) % 256
      }
      assert((r.getLong(4), r.getLong(5), r.getLong(6)) === ((sr, sg, sb)),
        s"thumbnail sums diverge for image $k — decode or NN mapping broken")
    }
  }

  test("real audio arm: WAV round-trip reproduces the closed-form sample sums") {
    val rows = Multimodal.realAudioDecode(spark, sf("sf0.001")).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val k = r.getLong(0).toInt
      val n = 256 + 32 * k
      assert(r.getLong(1) === n.toLong && r.getLong(2) === 8000L)
      var (sa, sq) = (0L, 0L)
      for (i <- 0 until n) {
        val u = (37 * i + 11 * k) % 256
        sa += u; sq += u.toLong * u
      }
      assert((r.getLong(3), r.getLong(4)) === ((sa, sq)),
        s"amplitude sums diverge for clip $k — PCM round-trip not bit-exact")
    }
  }

  test("real multi-frame arm: animated GIF frames round-trip bit-exactly") {
    val rows = Multimodal.realFrameSample(spark, sf("sf0.001")).collect()
    // 6 gifs with 6..10 frames sampled every 2nd: Σ ceil(nf/2) rows
    val wantRows = (0 until 6).map(k => (6 + k % 5 + 1) / 2).sum
    assert(rows.length === wantRows, s"row count ${rows.length} != $wantRows")
    rows.foreach { r =>
      val (k, f) = (r.getLong(0).toInt, r.getLong(1).toInt)
      val (w, h) = (12 + 2 * k, 10 + (3 * k) % 8)
      assert(f % 2 === 0, s"unsampled frame index $f emitted")
      assert(r.getLong(2) === (6 + k % 5).toLong,
        s"decoder saw a different frame count for gif $k: $r")
      assert(r.getLong(3) === w.toLong && r.getLong(4) === h.toLong)
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w)
        sum += (3 * x + 7 * y + 11 * f + 29 * k) % 256
      assert(r.getLong(5) === sum,
        s"frame checksum diverges for gif $k frame $f — palette round-trip not bit-exact")
    }
  }
}
