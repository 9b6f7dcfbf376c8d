package graft.server.grpc

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal protobuf (proto3) wire-format codec — writer + field-indexed
  * reader — implementing the public encoding spec (varints, tag = field<<3 |
  * wire-type, length-delimited nesting). protobuf-java is not available in
  * this environment (offline resolver), and the handful of message shapes in
  * factstore-v1.proto doesn't justify a generator: messages are encoded
  * explicitly against their field numbers in [[GrpcCodec]].
  *
  * Only wire types 0 (varint) and 2 (length-delimited) are produced — the
  * factstore schema uses no fixed32/64 fields — but the reader skips them
  * correctly for forward compatibility.
  */
object Pb {

  // --- writer ----------------------------------------------------------------

  final class Writer {
    private val out = new ByteArrayOutputStream()

    private def varintRaw(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    private def key(fn: Int, wt: Int): Unit = varintRaw((fn.toLong << 3) | wt)

    /** proto3 implicit-presence scalar: zero is not written. */
    def int64(fn: Int, v: Long): Writer = { if (v != 0L) { key(fn, 0); varintRaw(v) }; this }
    def int32(fn: Int, v: Int): Writer = int64(fn, v.toLong)
    /** Explicit-presence scalar (oneof member / `optional`): always written. */
    def int64Always(fn: Int, v: Long): Writer = { key(fn, 0); varintRaw(v); this }

    def bytes(fn: Int, b: Array[Byte]): Writer =
      { if (b.nonEmpty) bytesAlways(fn, b); this }
    def bytesAlways(fn: Int, b: Array[Byte]): Writer = {
      key(fn, 2); varintRaw(b.length.toLong); out.write(b); this
    }
    def string(fn: Int, s: String): Writer = bytes(fn, s.getBytes(UTF_8))
    def stringAlways(fn: Int, s: String): Writer = bytesAlways(fn, s.getBytes(UTF_8))

    /** Embedded message — always written (message presence is explicit). */
    def msg(fn: Int, body: Writer => Unit): Writer = {
      val w = new Writer; body(w); bytesAlways(fn, w.toBytes)
    }

    /** map<string,string>: one entry-message per pair (key=1, value=2).
      * Sorted for deterministic bytes (protobuf map order is unspecified). */
    def stringMap(fn: Int, m: Map[String, String]): Writer = {
      m.toSeq.sortBy(_._1).foreach { case (k, v) =>
        msg(fn, w => { w.string(1, k); w.stringAlways(2, v) })
      }
      this
    }

    def toBytes: Array[Byte] = out.toByteArray
  }

  def encode(body: Writer => Unit): Array[Byte] = { val w = new Writer; body(w); w.toBytes }

  // --- reader ----------------------------------------------------------------

  /** One decoded field occurrence: varint value or delimited bytes. */
  final case class PField(wire: Int, varint: Long, bytes: Array[Byte])

  /** Decode a message body into field-number -> occurrences (in order). */
  def parse(b: Array[Byte]): Map[Int, Vector[PField]] = {
    var i = 0
    var acc = Map.empty[Int, Vector[PField]]
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      var more = true
      while (more) {
        val x = b(i) & 0xff; i += 1
        v |= (x & 0x7fL) << shift; shift += 7
        more = (x & 0x80) != 0
      }
      v
    }
    while (i < b.length) {
      val tag = readVarint()
      val fn = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      val f = wt match {
        case 0 => PField(0, readVarint(), Array.emptyByteArray)
        case 1 => val v = java.util.Arrays.copyOfRange(b, i, i + 8); i += 8; PField(1, 0L, v)
        case 2 =>
          val len = readVarint().toInt
          val v = java.util.Arrays.copyOfRange(b, i, i + len); i += len
          PField(2, 0L, v)
        case 5 => val v = java.util.Arrays.copyOfRange(b, i, i + 4); i += 4; PField(5, 0L, v)
        case other => throw new IllegalArgumentException(s"unsupported wire type $other")
      }
      acc = acc.updated(fn, acc.getOrElse(fn, Vector.empty) :+ f)
    }
    acc
  }

  type Fields = Map[Int, Vector[PField]]

  def str(m: Fields, fn: Int, default: String = ""): String =
    m.get(fn).flatMap(_.lastOption).map(f => new String(f.bytes, UTF_8)).getOrElse(default)
  def strOpt(m: Fields, fn: Int): Option[String] =
    m.get(fn).flatMap(_.lastOption).map(f => new String(f.bytes, UTF_8))
  def bytesOf(m: Fields, fn: Int): Array[Byte] =
    m.get(fn).flatMap(_.lastOption).map(_.bytes).getOrElse(Array.emptyByteArray)
  def varint(m: Fields, fn: Int, default: Long = 0L): Long =
    m.get(fn).flatMap(_.lastOption).map(_.varint).getOrElse(default)
  def varintOpt(m: Fields, fn: Int): Option[Long] =
    m.get(fn).flatMap(_.lastOption).map(_.varint)
  def msgOpt(m: Fields, fn: Int): Option[Fields] =
    m.get(fn).flatMap(_.lastOption).map(f => parse(f.bytes))
  def msgs(m: Fields, fn: Int): Vector[Fields] =
    m.getOrElse(fn, Vector.empty).map(f => parse(f.bytes))
  def has(m: Fields, fn: Int): Boolean = m.contains(fn)

  def stringMapOf(m: Fields, fn: Int): Map[String, String] =
    msgs(m, fn).map(e => str(e, 1) -> str(e, 2)).toMap

  // --- google.protobuf.Timestamp {int64 seconds = 1; int32 nanos = 2} --------

  def writeTimestamp(w: Writer, i: java.time.Instant): Unit = {
    w.int64(1, i.getEpochSecond)
    w.int32(2, i.getNano)
  }
  def readTimestamp(m: Fields): java.time.Instant =
    java.time.Instant.ofEpochSecond(varint(m, 1), varint(m, 2))
}
