package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.server.grpc.Pb

/** Property tests for the hand-rolled protobuf wire codec: every value the
  * factstore-v1 messages can carry must round-trip writer -> parse. (Raw
  * ScalaCheck generators from fixed seeds — no scalatestplus bridge.) */
class PbSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("varint int64 round-trips across the full range (incl. negatives)") {
    val edge = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 127L, 128L,
      300L, (1L << 32) - 1, 1L << 32)
    (edge ++ samples(Gen.long, 200)).foreach { v =>
      val bytes = Pb.encode(_.int64Always(1, v))
      assert(Pb.varint(Pb.parse(bytes), 1) == v, s"v=$v")
    }
  }

  test("proto3 implicit presence: zero scalars and empty strings are omitted") {
    assert(Pb.encode(_.int64(1, 0L)).isEmpty)
    assert(Pb.encode(_.string(1, "")).isEmpty)
    // explicit-presence variants always write (oneof/optional members)
    assert(Pb.encode(_.int64Always(1, 0L)).nonEmpty)
    assert(Pb.encode(_.stringAlways(1, "")).nonEmpty)
    assert(Pb.strOpt(Pb.parse(Pb.encode(_.stringAlways(1, ""))), 1).contains(""))
  }

  test("strings round-trip including multi-byte UTF-8") {
    val fixed = Seq("héllo wörld", "日本語テキスト", "emoji 😀 tail", "tab\tand\nnewline")
    (fixed ++ samples(Gen.asciiPrintableStr, 100)).foreach { s =>
      val bytes = Pb.encode(_.stringAlways(3, s))
      assert(Pb.str(Pb.parse(bytes), 3) == s, s"s=$s")
    }
  }

  test("string maps round-trip (sorted, deterministic bytes)") {
    val gen = Gen.mapOf(Gen.zip(
      Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.alphaNumStr))
    samples(gen, 100).foreach { m =>
      val bytes = Pb.encode(_.stringMap(4, m))
      assert(Pb.stringMapOf(Pb.parse(bytes), 4) == m)
      assert(java.util.Arrays.equals(bytes, Pb.encode(_.stringMap(4, m))),
        "map bytes must be deterministic")
    }
  }

  test("nested messages and repeated fields round-trip") {
    val bytes = Pb.encode { w =>
      w.msg(1, { inner => inner.string(1, "a"); inner.int64(2, 7L) })
      w.string(2, "x"); w.string(2, "y"); w.string(2, "z") // repeated
    }
    val m = Pb.parse(bytes)
    val inner = Pb.msgOpt(m, 1).get
    assert(Pb.str(inner, 1) == "a" && Pb.varint(inner, 2) == 7L)
    assert(m(2).map(f => new String(f.bytes, "UTF-8")) == Vector("x", "y", "z"))
  }

  test("google.protobuf.Timestamp round-trips at nanosecond precision") {
    val gen = Gen.zip(Gen.chooseNum(0L, 4102444800L), Gen.chooseNum(0, 999999999))
    samples(gen, 100).foreach { case (sec, nanos) =>
      val i = java.time.Instant.ofEpochSecond(sec, nanos.toLong)
      val bytes = Pb.encode(w => Pb.writeTimestamp(w, i))
      assert(Pb.readTimestamp(Pb.parse(bytes)) == i)
    }
  }

  test("unknown fields and wire types are skipped, not fatal") {
    // craft: field 9 fixed64 (wire type 1), field 10 fixed32 (wire type 5),
    // then a normal field 1 varint — reader must still see field 1
    val out = new java.io.ByteArrayOutputStream()
    out.write((9 << 3) | 1); (0 until 8).foreach(_ => out.write(0xAB))
    out.write((10 << 3) | 5); (0 until 4).foreach(_ => out.write(0xCD))
    out.write((1 << 3) | 0); out.write(42)
    assert(Pb.varint(Pb.parse(out.toByteArray), 1) == 42L)
  }
}
