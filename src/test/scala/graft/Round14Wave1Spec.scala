package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Tight in-JVM bounds behind the round-14 lossy-tier additions. The
  * ORACLE's contract is the wide conformance band (Tol = 8 levels; dup
  * threshold 8 bits); these pin what THIS JVM actually produces — a
  * much tighter envelope whose regression would flag a codec change long
  * before the banded oracle went red — plus bitstream proofs that each
  * declared encoder mode really was encoded in that mode. */
class Round14Wave1Spec extends AnyFunSuite {

  private val sampleIds: Seq[Long] = (0L to 60L) ++ Seq(143L, 286L, 429L)

  test("variant bitstreams prove their mode: SOF marker and luma sampling " +
      "byte per variant, dims exact, decode deterministic, bands 0") {
    for (id <- sampleIds; variant <- Multimodal.JpegVariants) {
      val payload = Multimodal.encodeJpegVariant(id, variant)
      val a = Multimodal.decodeJpegVariant(id, variant, payload)
      val b = Multimodal.decodeJpegVariant(id, variant, payload)
      assert(a == b, s"doc $id $variant decode not deterministic")
      val (expMarker, expSamp) = variant match {
        case "baseline" => (192L, 34L)    // SOF0, 4:2:0
        case "progressive" => (194L, 34L) // SOF2, 4:2:0
        case "chroma444" => (192L, 17L)   // SOF0, forced 1x1
      }
      assert(a.sof_marker == expMarker && a.y_samp == expSamp,
        s"doc $id $variant: marker=${a.sof_marker} samp=${a.y_samp}")
      assert(a.width == Multimodal.jpegSpec(id)._1 &&
        a.height == Multimodal.jpegSpec(id)._2)
      assert(a.r_band == 0 && a.g_band == 0 && a.b_band == 0,
        s"doc $id $variant outside the declared tolerance: $a")
    }
  }

  test("in-JVM mean error stays within 2 levels for every variant (4x " +
      "headroom under the declared Tol=8 band)") {
    val TightTol = 2L
    for (id <- sampleIds; variant <- Multimodal.JpegVariants) {
      val payload = Multimodal.encodeJpegVariant(id, variant)
      val (_, _, h, w, _, _) = Multimodal.parseSofExt(payload)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      var rs = 0L; var gs = 0L; var bs = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
      }
      val n = w.toLong * h
      var tr = 0L; var tg = 0L; var tb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = Multimodal.jpegRgb(id, x, y)
        tr += (p >> 16) & 0xff; tg += (p >> 8) & 0xff; tb += p & 0xff
      }
      assert(math.abs(rs - tr) <= TightTol * n, s"doc $id $variant r drift")
      assert(math.abs(gs - tg) <= TightTol * n, s"doc $id $variant g drift")
      assert(math.abs(bs - tb) <= TightTol * n, s"doc $id $variant b drift")
    }
  }

  test("phash drift across one recompression generation: true hash equals " +
      "an independent recomputation; in-JVM hamming drift <= 3 of 60 bits") {
    for (id <- sampleIds) {
      // independent truth: cell sums via a Map fold (different code path
      // than the array kernel), bits assembled as a Set
      val (w, h) = Multimodal.jpegSpec(id)
      val bw = w / 6; val bh = h / 10
      val cells = scala.collection.mutable.Map[Int, BigInt]().withDefaultValue(BigInt(0))
      var total = BigInt(0)
      for (y <- 0 until bh * 10; x <- 0 until bw * 6) {
        val p = Multimodal.jpegRgb(id, x, y)
        val luma = BigInt(299) * ((p >> 16) & 0xff) +
          BigInt(587) * ((p >> 8) & 0xff) + BigInt(114) * (p & 0xff)
        cells((y / bh) * 6 + (x / bw)) += luma
        total += luma
      }
      val expected = (0 until 60).filter(i => cells(i) * 60 > total)
        .map(i => 1L << i).foldLeft(0L)(_ | _)
      assert(Multimodal.jpegPhashTrue(id) == expected,
        s"doc $id phash_true mismatch vs independent recomputation")

      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodeJpeg(id)))
      val lossy = Multimodal.jpegPhashOfRaster(img)
      val drift = java.lang.Long.bitCount(lossy ^ expected)
      assert(drift <= 3, s"doc $id phash drift $drift bits exceeds the " +
        "in-JVM envelope (declared band is 8)")
    }
  }
}
