package graft.operators

import java.nio.file.Files

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Value-level checks for the round-11 operator wave: the semantic-dedup
  * decision census, cross-source shingle containment, and deterministic
  * k-fold balance. Each is verified against either a hand-built fixture
  * whose answer is known by construction or an independent in-test
  * recomputation from a sibling query — the DuckDB hash gate covers
  * cross-engine agreement separately. */
class Round11WaveSpec extends AnyFunSpec with Matchers {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  describe("dedup_decision_stats") {
    it("is the exact census of dedup_embedding_clusters plus the corpus size") {
      val clusters = Dedup.queries("dedup_embedding_clusters")(spark, sf)
        .select("vec_id", "cluster_id").collect()
      val nFlagged = clusters.length.toLong
      val nClusters = clusters.map(_.getLong(1)).distinct.length.toLong
      val nVectors = spark.read.parquet(s"$sf/embeddings.parquet").count()
      val got = Dedup.queries("dedup_decision_stats")(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long)].head()
      got shouldBe ((nVectors, nFlagged, nClusters,
        nVectors - nFlagged + nClusters,
        nFlagged * 10000 / nVectors, (nFlagged - nClusters) * 10000 / nVectors))
      CacheScope.releaseAll()
    }
  }

  describe("dedup_decision_stats on a corpus with no near-dups") {
    it("returns the zero census instead of crashing on the empty pair graph") {
      // near-orthogonal one-hot vectors: no pair reaches cosine 0.4, so
      // the CC input is EMPTY — the census must still answer (the oracle's
      // recursive closure yields zero rows there too)
      val dim = 64
      val vecs = (0L until 12L).map { i =>
        (i, Array.tabulate(dim)(j => if (j == i) 1.0f else 0.0f), (i % 3).toInt)
      }
      val dir = Files.createTempDirectory("ortho-fixture").toFile
      dir.deleteOnExit()
      vecs.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite")
        .parquet(new java.io.File(dir, "embeddings.parquet").toString)
      val got = Dedup.queries("dedup_decision_stats")(spark, dir.toString)
        .as[(Long, Long, Long, Long, Long, Long)].head()
      got shouldBe ((12L, 0L, 0L, 12L, 0L, 0L))
      CacheScope.releaseAll()
    }
  }

  describe("source_shingle_overlap") {
    it("reports directional containment on a fixture known by construction") {
      // word-3-gram shingles: docs A and B share both shingles of the
      // 4-token text (containment 10000 bp each way); C shares exactly the
      // first shingle with A/B (5000 bp each way, both have 2 shingles)
      val text = "alpha beta gamma delta"
      val textC = "alpha beta gamma epsilon"
      val docs = Seq(
        (1L, text, "en", "srcA", text.length.toLong),
        (2L, text, "en", "srcB", text.length.toLong),
        (3L, textC, "en", "srcC", textC.length.toLong))
      val dir = Files.createTempDirectory("overlap-fixture").toFile
      dir.deleteOnExit()
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite")
        .parquet(new java.io.File(dir, "documents.parquet").toString)
      val got = Curation.queries("source_shingle_overlap")(spark, dir.toString)
        .as[(String, String, Long, Long, Long)].collect().toSeq
      got shouldBe Seq(
        ("srcA", "srcB", 2L, 10000L, 10000L),
        ("srcA", "srcC", 1L, 5000L, 5000L),
        ("srcB", "srcC", 1L, 5000L, 5000L))
    }
  }

  describe("sample_kfold") {
    it("assigns every doc to exactly one fold and balance shares sum to ~1 per lang") {
      val got = TrainingPipeline.queries("sample_kfold")(spark, sf)
        .as[(Long, String, Long, Long, Long)].collect().toSeq
      val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
      got.map(_._3).sum shouldBe nDocs
      got.map(_._1).distinct.sorted shouldBe got.map(_._1).distinct.sorted.intersect(Seq(0L, 1L, 2L, 3L, 4L))
      // per-lang fold shares sum to 10000 minus at most 4 floor losses
      got.groupBy(_._2).foreach { case (lang, rows) =>
        val s = rows.map(_._5).sum
        assert(s > 10000 - 5 * rows.size && s <= 10000, s"$lang shares sum $s")
      }
      // deterministic: a second run is identical
      val again = TrainingPipeline.queries("sample_kfold")(spark, sf)
        .as[(Long, String, Long, Long, Long)].collect().toSeq
      again shouldBe got
    }
  }
}
