package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The JPEG tier's in-JVM contract, pinned much tighter than the banded
  * oracle: the oracle only declares mean error < JpegTolLevels (= 8); the
  * JDK decoder on the wrap-free gradient actually lands within 2 levels.
  * Plus the decoder-independent facts: SOF header parse agrees with both
  * the generator spec and the decoder, and the round-trip is
  * deterministic in-JVM. */
class Round13Wave2Spec extends AnyFunSuite {

  private val sampleIds = (0L until 60L) ++ Seq(997L, 12345L, 999999L)

  test("SOF header parse is bitstream-exact: dims equal the generator " +
      "spec, 8-bit precision, 3 components") {
    sampleIds.foreach { id =>
      val (w, h) = Multimodal.jpegSpec(id)
      val (precision, sofH, sofW, nComp) = Multimodal.parseSof(Multimodal.encodeJpeg(id))
      assert((sofW, sofH) == ((w, h)), s"doc $id header dims")
      assert(precision == 8 && nComp == 3, s"doc $id: p=$precision c=$nComp")
    }
  }

  test("in-JVM decode error on the gradient stays within 2 levels per " +
      "channel mean — 4x headroom under the oracle's band tolerance") {
    sampleIds.foreach { id =>
      val (w, h) = Multimodal.jpegSpec(id)
      val img = ImageIO.read(new ByteArrayInputStream(Multimodal.encodeJpeg(id)))
      var rs = 0L; var gs = 0L; var bs = 0L
      var trs = 0L; var tgs = 0L; var tbs = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
        val t = Multimodal.jpegRgb(id, x, y)
        trs += (t >> 16) & 0xff; tgs += (t >> 8) & 0xff; tbs += t & 0xff
      }
      val n = w.toLong * h
      for ((dec, tru, c) <- Seq((rs, trs, "r"), (gs, tgs, "g"), (bs, tbs, "b")))
        assert(math.abs(dec - tru) <= 2 * n,
          s"doc $id channel $c mean error ${math.abs(dec - tru).toDouble / n}")
    }
  }

  test("decode kernel is deterministic in-JVM and all bands are 0") {
    sampleIds.foreach { id =>
      val payload = Multimodal.encodeJpeg(id)
      val a = Multimodal.decodeJpeg(id, payload)
      val b = Multimodal.decodeJpeg(id, payload)
      assert(a == b, s"doc $id decode not deterministic")
      assert(a.r_band == 0 && a.g_band == 0 && a.b_band == 0,
        s"doc $id outside the declared tolerance: $a")
      assert(a.width == Multimodal.jpegSpec(id)._1 &&
        a.height == Multimodal.jpegSpec(id)._2)
    }
  }

  test("corrupt payloads fail loudly, not with fabricated stats") {
    intercept[IllegalArgumentException](
      Multimodal.parseSof(Array[Byte](1, 2, 3, 4)))
    val truncated = Multimodal.encodeJpeg(7L).take(30)
    intercept[Exception](Multimodal.decodeJpeg(7L, truncated))
  }
}
