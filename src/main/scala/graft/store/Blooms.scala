package graft.store

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.util.sketch.BloomFilter

import graft.core.{TagQuery, TagQueryItem}

/** Per-file Bloom filters over the indexed attributes of a fact — the
  * Spark-style replacement for the reference's tag/type/subject secondary
  * indexes (fdb/FdbFactStore.kt:80-91). Every commit record and checkpoint
  * bucket carries a bloom of its rows' `t:type`, `s:subject` and `g:k=v`
  * entries; limit-1 existence probes (TagQueryBased conditions,
  * ExpectedLastFact) consult the bloom before touching data, so a probe
  * for an absent tag answers from metadata alone regardless of store size.
  * False positives only cost a scan of that one file. */
object Blooms {

  def typeEntry(t: String): String = s"t:$t"
  def subjectEntry(s: String): String = s"s:$s"
  def tagEntry(k: String, v: String): String = s"g:$k=$v"

  def entriesOf(factType: String, subject: String, tags: Map[String, String]): Seq[String] =
    typeEntry(factType) +: subjectEntry(subject) +: tags.map { case (k, v) => tagEntry(k, v) }.toSeq

  /** Bloom capacity for an expected entry count: floored (tiny commits) and
    * capped (runaway guard at ~45 MB of bits). Sizing MUST track the data —
    * a bloom saturated by a multi-M-row bulk commit admits everything, and
    * every conditional-append probe then degrades to a full scan under the
    * append lock (measured: 7 s probe p90 on a 5M-fact store with the old
    * fixed 500k capacity vs ms-scale with sized blooms). At ~9 bits/entry
    * the metadata overhead is < 1% of data size. */
  def capacityFor(expectedEntries: Long): Long =
    math.min(math.max(expectedEntries, 64L), 50000000L)

  /** Build a bloom from entry strings (3% fpp, sized by capacityFor). */
  def build(expectedEntries: Long)(insert: BloomFilter => Unit): Array[Byte] = {
    val bf = BloomFilter.create(capacityFor(expectedEntries), 0.03)
    insert(bf)
    serialize(bf)
  }

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** Deserialized-filter cache. A compacted bucket's bloom is multiple MB
    * (capacityFor(4M entries) ≈ 3.6 MB of bits); re-materializing it from
    * bytes on EVERY conditional-append probe was measurable at 5M facts.
    * Keyed by the byte array itself: checkpoint metadata is cached per seq
    * (FactLog.ckptCache), so the same array instance recurs across probes;
    * weak keys let vacuumed checkpoints drop their filters with the bytes.
    * (Java array equality IS identity, which is exactly the key we want.) */
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Array[Byte], BloomFilter]())

  def cached(bytes: Array[Byte]): BloomFilter =
    cache.computeIfAbsent(bytes, deserialize(_))

  def mightContainAll(bloom: Array[Byte], entries: Seq[String]): Boolean = {
    val bf = cached(bloom)
    entries.forall(bf.mightContainString)
  }

  /** Could this file contain a fact matching the query? (None bloom =
    * unknown = candidate.) */
  def mightMatchQuery(bloom: Option[Array[Byte]], q: TagQuery): Boolean =
    bloom match {
      case None => true
      case Some(b) =>
        val bf = cached(b)
        q.items.exists {
          case TagQueryItem.TagOnly(tags) =>
            tags.forall { case (k, v) => bf.mightContainString(tagEntry(k, v)) }
          case TagQueryItem.TagType(types, tags) =>
            types.exists(t => bf.mightContainString(typeEntry(t))) &&
              tags.forall { case (k, v) => bf.mightContainString(tagEntry(k, v)) }
        }
    }

  def mightContainSubject(bloom: Option[Array[Byte]], subject: String): Boolean =
    bloom.forall(b => cached(b).mightContainString(subjectEntry(subject)))
}
