package graft.operators

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.functions.CrossHash

/** Value-level oracle for the Tokenize operators: chunk geometry, content
  * hashes, and BPE pair counts are all recomputed independently in-test
  * (code-point-exact, no Spark), so the operators are pinned against a
  * second implementation rather than just the DuckDB rendering.
  */
class TokenizeSpec extends AnyFunSpec with Matchers {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Code-point-safe mirror of SQL substring(s, start1, len) (both engines
    * substring by code point, Scala String is UTF-16). */
  private def cpSubstring(s: String, start1: Int, len: Int): String = {
    val cps = s.codePoints().toArray
    val from = math.min(math.max(start1 - 1, 0), cps.length)
    val to = math.min(from + len, cps.length)
    new String(cps, from, to - from)
  }

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  private def polyHash(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % CrossHash.P)

  private def tokens(s: String): Seq[String] =
    s.split(" ", -1).toSeq.filter(_.nonEmpty)

  describe("doc_chunks") {
    it("emits exactly the 256/192 window geometry with exact hashes") {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .selectExpr("doc_id", "text").as[(Long, String)].collect()

      val expected = docs.flatMap { case (id, text) =>
        val len = cpLen(text)
        val nChunks = (math.max(len, 1) - 1) / Tokenize.Stride + 1
        (0 until nChunks).map { i =>
          val start = i * Tokenize.Stride + 1
          val chunk = cpSubstring(text, start, Tokenize.ChunkChars)
          (id, len.toLong, i.toLong, start.toLong,
            cpLen(chunk).toLong, tokens(chunk).size.toLong, polyHash(chunk))
        }
      }.sortBy(r => (r._1, r._3))

      val got = Tokenize.queries("doc_chunks")(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq

      got should have size expected.length.toLong
      got shouldBe expected.toSeq
    }

    it("covers every document: last chunk reaches the end, overlap is 64") {
      val rows = Tokenize.queries("doc_chunks")(spark, sf)
        .selectExpr("doc_id", "doc_len", "chunk_idx", "start_pos", "chunk_len")
        .as[(Long, Long, Long, Long, Long)].collect()
      rows.groupBy(_._1).foreach { case (_, cs) =>
        val last = cs.maxBy(_._3)
        (last._4 + last._5 - 1) shouldBe last._2 // end of last chunk == doc_len
        cs.foreach { c => // every chunk runs to window size or the doc end
          c._4 shouldBe c._3 * Tokenize.Stride + 1
          c._5 shouldBe math.min(Tokenize.ChunkChars.toLong, c._2 - c._4 + 1)
        }
      }
    }
  }

  describe("bpe_pair_stats") {
    it("matches a brute-force vocabulary pair count") {
      val texts = spark.read.parquet(s"$sf/documents.parquet")
        .select("text").as[String].collect()

      val vocab = texts.flatMap(tokens).groupBy(identity).map { case (t, g) => t -> g.length.toLong }
      val pairStats = collection.mutable.Map.empty[String, (Long, Set[String])]
      for ((tok, freq) <- vocab if cpLen(tok) >= 2) {
        val cps = tok.codePoints().toArray
        for (i <- 0 until cps.length - 1) {
          val pair = new String(cps, i, 2)
          val (n, ts) = pairStats.getOrElse(pair, (0L, Set.empty[String]))
          pairStats(pair) = (n + freq, ts + tok)
        }
      }
      val expected = pairStats.toSeq
        .map { case (p, (n, ts)) => (p, n, ts.size.toLong) }
        .sortBy { case (p, n, _) => (-n, p) }
        .take(20)

      val got = Tokenize.queries("bpe_pair_stats")(spark, sf)
        .as[(String, Long, Long)].collect().toSeq

      got shouldBe expected
    }
  }

  describe("bpe_train_merges") {
    it("matches an independent Scala BPE trainer (argmax + greedy apply) round for round") {
      val texts = spark.read.parquet(s"$sf/documents.parquet")
        .select("text").as[String].collect()
      var vocab: Map[Vector[String], Long] = texts.flatMap(tokens)
        .groupBy(identity).map { case (t, g) =>
          t.split("").filter(_.nonEmpty).toVector -> g.length.toLong
        }

      def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2 // greedy left-to-right, non-overlapping
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }

      val expected = (1 to Tokenize.BpeRounds).map { r =>
        val before = vocab.map { case (s2, f) => s2.size * f }.sum
        val pairCounts = vocab.toSeq.flatMap { case (s2, f) =>
          s2.zip(s2.drop(1)).map(p => (p, f))
        }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
        val ((a, b), wt) = pairCounts.toSeq
          .sortBy { case ((a0, b0), w) => (-w, a0, b0) }.head
        vocab = vocab.toSeq
          .map { case (s2, f) => (applyMerge(s2, a, b), f) }
          .groupBy(_._1).map { case (s2, xs) => (s2, xs.map(_._2).sum) }
        val after = vocab.map { case (s2, f) => s2.size * f }.sum
        (r.toLong, a, b, a + b, wt, before, after)
      }

      val got = Tokenize.queries("bpe_train_merges")(spark, sf)
        .as[(Long, String, String, String, Long, Long, Long)].collect().toSeq
      got shouldBe expected
      // compression must be monotone: each round strictly reduces symbols
      got.foreach { r => r._7 should be < r._6 }
    }
  }

  describe("bpe_encode_census") {
    it("matches an independent train-then-encode per-language census") {
      val rows = spark.read.parquet(s"$sf/documents.parquet")
        .selectExpr("lang", "text").as[(String, String)].collect()

      def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }

      // train the merge list on the GLOBAL vocabulary (same reference
      // trainer as the bpe_train_merges spec)
      var vocab: Map[Vector[String], Long] = rows.flatMap(r => tokens(r._2))
        .groupBy(identity).map { case (t, g) =>
          t.split("").filter(_.nonEmpty).toVector -> g.length.toLong
        }
      val merges = (1 to Tokenize.BpeRounds).map { _ =>
        val pairCounts = vocab.toSeq.flatMap { case (s2, f) =>
          s2.zip(s2.drop(1)).map(p => (p, f))
        }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
        val ((a, b), _) = pairCounts.toSeq
          .sortBy { case ((a0, b0), w) => (-w, a0, b0) }.head
        vocab = vocab.toSeq
          .map { case (s2, f) => (applyMerge(s2, a, b), f) }
          .groupBy(_._1).map { case (s2, xs) => (s2, xs.map(_._2).sum) }
        (a, b)
      }

      def encodedLen(tok: String): Long =
        merges.foldLeft(tok.split("").filter(_.nonEmpty).toVector) {
          case (s2, (a, b)) => applyMerge(s2, a, b)
        }.size.toLong

      val census = rows.flatMap { case (lang, text) => tokens(text).map((lang, _)) }
        .groupBy(identity).map { case ((lang, tok), g) => (lang, tok, g.size.toLong) }
      val expected = census.groupBy(_._1).toSeq.map { case (lang, ts) =>
        val before = ts.map(t => t._3 * cpLen(t._2)).sum
        val after = ts.map(t => t._3 * encodedLen(t._2)).sum
        (lang, ts.map(_._3).sum, ts.size.toLong, before, after,
          after * 10000 / before)
      }.sortBy(_._1)

      val got = Tokenize.queries("bpe_encode_census")(spark, sf)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
      // the learned merges must actually compress every language slice
      got.foreach { r => r._5 should be < r._4 }
    }
  }

  describe("tokenizer_fertility") {
    it("matches an independent train-then-encode census bucketed by word length") {
      val rows = spark.read.parquet(s"$sf/documents.parquet")
        .selectExpr("lang", "text").as[(String, String)].collect()

      def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }

      var vocab: Map[Vector[String], Long] = rows.flatMap(r => tokens(r._2))
        .groupBy(identity).map { case (t, g) =>
          t.split("").filter(_.nonEmpty).toVector -> g.length.toLong
        }
      val merges = (1 to Tokenize.BpeRounds).map { _ =>
        val pairCounts = vocab.toSeq.flatMap { case (s2, f) =>
          s2.zip(s2.drop(1)).map(p => (p, f))
        }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
        val ((a, b), _) = pairCounts.toSeq
          .sortBy { case ((a0, b0), w) => (-w, a0, b0) }.head
        vocab = vocab.toSeq
          .map { case (s2, f) => (applyMerge(s2, a, b), f) }
          .groupBy(_._1).map { case (s2, xs) => (s2, xs.map(_._2).sum) }
        (a, b)
      }
      def encodedLen(tok: String): Long =
        merges.foldLeft(tok.split("").filter(_.nonEmpty).toVector) {
          case (s2, (a, b)) => applyMerge(s2, a, b)
        }.size.toLong

      val census = rows.flatMap { case (lang, text) => tokens(text).map((lang, _)) }
        .groupBy(identity).map { case ((lang, tok), g) => (lang, tok, g.size.toLong) }
      val expected = census
        .groupBy(t => (t._1, math.min(cpLen(t._2).toLong, 10L))).toSeq
        .map { case ((lang, wl), ts) =>
          val nOcc = ts.map(_._3).sum
          val tokOcc = ts.map(t => t._3 * encodedLen(t._2)).sum
          val charOcc = ts.map(t => t._3 * cpLen(t._2)).sum
          (lang, wl, ts.size.toLong, nOcc,
            tokOcc * 10000 / nOcc, charOcc * 10000 / tokOcc)
        }.sortBy(r => (r._1, r._2))

      val got = Tokenize.queries("tokenizer_fertility")(spark, sf)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
      // ≥1 BPE token per word and ≥1 char per BPE token, in every slice
      got.foreach { r => r._5 should be >= 10000L; r._6 should be >= 10000L }
    }
  }
}
