package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, TextAnalysis}

/** Round-12 wave: the real javax.imageio decode path and the
  * overflow-hardened tf·idf emission, each recomputed independently in
  * plain Scala (the third leg next to the Spark expressions and the
  * DuckDB oracle). */
class Round12WaveSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // --- real image decode ----------------------------------------------------

  test("PNG and BMP encode->decode round-trips are bit-exact per pixel") {
    // one doc_id per format (even = png, odd = bmp), pixels compared
    // against the generator pattern directly — losslessness is the load-
    // bearing property that lets the SQL oracle stand in for a decoder
    for (docId <- Seq(40L, 41L, 404L, 1007L)) {
      val (w, h, fmt) = Multimodal.imageSpec(docId)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodeImage(docId)))
      assert(img.getWidth == w && img.getHeight == h, s"dims for $docId ($fmt)")
      for (y <- 0 until h; x <- 0 until w) {
        val got = img.getRGB(x, y) & 0xffffff
        val want = Multimodal.pixelRgb(docId, x, y)
        assert(got == want,
          f"doc $docId ($fmt) px($x,$y): got $got%06x want $want%06x")
      }
    }
  }

  test("media_decode raster stats match a plain-Scala pattern fold") {
    val got = Multimodal.queries("media_decode")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9))).toMap
    val docIds = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    assert(got.keySet == docIds.toSet)
    for (id <- docIds) {
      val (w, h, fmt) = Multimodal.imageSpec(id)
      var rs = 0L; var gs = 0L; var bs = 0L; var mn = 255L; var mx = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = Multimodal.pixelRgb(id, x, y)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        rs += r; gs += g; bs += b
        mn = math.min(mn, math.min(r, math.min(g, b)).toLong)
        mx = math.max(mx, math.max(r, math.max(g, b)).toLong)
      }
      assert(got(id) == ((fmt, w.toLong, h.toLong, w.toLong * h, rs, gs, bs, mn, mx)),
        s"doc $id: got ${got(id)}")
    }
  }

  /** Pattern-only (no codec) phash recomputation — the third leg. */
  private def patternPhash(id: Long): (Long, Long) = {
    val (w, h, _) = Multimodal.imageSpec(id)
    val bw = w / 6; val bh = h / 10
    val cells = Array.fill(60)(0L)
    for (y <- 0 until bh * 10; x <- 0 until bw * 6) {
      val p = Multimodal.pixelRgb(id, x, y)
      cells((y / bh) * 6 + (x / bw)) +=
        299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
    }
    val total = cells.sum
    val hash = cells.zipWithIndex.foldLeft(0L) { case (a, (c, i)) =>
      if (c * 60 > total) a | (1L << i) else a
    }
    (hash, java.lang.Long.bitCount(hash).toLong)
  }

  test("media_phash equals the pattern-only recomputation (decode leg exact)") {
    val got = Multimodal.queries("media_phash")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, (hash, ones)) =>
      assert((hash, ones) == patternPhash(id), s"doc $id")
      assert(hash >= 0L, s"doc $id: hash must stay a positive 60-bit long")
    }
  }

  test("media_phash_nn equals brute-force Hamming search over the phashes") {
    val hashes = Multimodal.queries("media_phash")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = hashes.keys.filter(_ < 10).map { p =>
      val best = hashes.toSeq.filter(_._1 != p)
        .map { case (id, h) =>
          (java.lang.Long.bitCount(hashes(p) ^ h).toLong, id) }.min
      p -> ((best._2, best._1))
    }.toMap
    val got = Multimodal.queries("media_phash_nn")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("media_resize_exec block means equal the pattern fold (one doc per format)") {
    val rows = Multimodal.queries("media_resize_exec")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    for (id <- Seq(6L, 7L)) {
      val (w, h, _) = Multimodal.imageSpec(id)
      val bw = w / 4; val bh = h / 4
      for (by <- 0 until 4; bx <- 0 until 4) {
        var rs = 0L; var gs = 0L; var bs = 0L
        for (y <- by * bh until (by + 1) * bh; x <- bx * bw until (bx + 1) * bw) {
          val p = Multimodal.pixelRgb(id, x, y)
          rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
        }
        val n = bw.toLong * bh
        assert(rows((id, bx.toLong, by.toLong)) == ((n, rs / n, gs / n, bs / n)),
          s"doc $id block ($bx,$by)")
      }
    }
  }

  // --- overflow-hardened tf·idf ----------------------------------------------

  test("text_doc_keywords scores match a BigInt recomputation (string-emitted)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // mirror of CrossHash.tokensSpark: split on ' ', drop empties
    def toks(t: String): Seq[String] = t.split(' ').filter(_.nonEmpty).toSeq
    val docTf = docs.flatMap { case (id, lang, text) =>
      toks(text).groupBy(identity).map { case (tok, xs) =>
        ((id, lang, tok), xs.size.toLong) }
    }.toMap
    val df = docTf.keys.groupBy(k => (k._2, k._3)).view.mapValues(_.size.toLong).toMap
    val nDocs = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    // exact BigInt tf·idf, then per-doc top-3 by (score desc, tok asc)
    val expected = docTf.toSeq.map { case ((id, lang, tok), tf) =>
      val idf = BigInt(nDocs(lang)) * 1000000 / df((lang, tok))
      (id, tok, BigInt(tf) * idf)
    }.groupBy(_._1).flatMap { case (id, scored) =>
      scored.sortBy(s => (-s._3, s._2)).take(3).zipWithIndex
        .map { case ((_, tok, sc), i) => (id, i + 1L, tok) -> sc.toString }
    }
    val rows = TextAnalysis.queries("text_doc_keywords")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)) -> r.getString(5))
      .toMap
    graft.operators.CacheScope.releaseAll()
    assert(rows.size == expected.size, s"${rows.size} vs ${expected.size}")
    assert(rows == expected)
  }

  test("text_tfidf_top_terms emits the exact BigInt product as a digit string") {
    val rows = TextAnalysis.queries("text_tfidf_top_terms")(spark, sf).collect()
    graft.operators.CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tf = r.getLong(2); val df = r.getLong(3)
      val tfidf = BigInt(r.getString(4))
      // product structure: tfidf = tf * idf with idf = tfidf / tf exactly
      assert(tfidf % tf == 0, s"row $r: score not a tf multiple")
      assert(tfidf / tf > 0 && df >= 1)
      // digit-string emission: no sign, no decimal point, no padding
      assert(r.getString(4).matches("[0-9]+"), s"non-digit emission: ${r.getString(4)}")
    }
  }
}
