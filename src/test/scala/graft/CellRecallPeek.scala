package graft
// throwaway experiment: recall of cell-blocked near-dup candidates vs
// assignment depth k, using the PRODUCTION coarse codebook at sf0.1
object CellRecallPeek {
  def main(args: Array[String]): Unit = {
    val s = SparkTestSession.spark
    graft.functions.VectorFunctions.register(s)
    val d = "/root/testdata/sf0.1"
    val e = s.read.parquet(s"$d/embeddings.parquet")
    val nVec = e.count()
    val kCells = graft.operators.Similarity.blockingCellCount(nVec)
    val cb = graft.operators.Similarity.coarseForK(d, e, kCells)
    val cvs = cb.cvs(0); val n2s = cb.n2s(0); val codes = cb.codes(0)
    val dim = cb.subDim
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
      .sortBy(_._1)
    println(s"[peek] n=${vecs.length} cells=${codes.length} dim=$dim")
    def dot(a: Array[Double], off: Int, b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += cvs(off + i) * b(i); i += 1 }; s
    }
    // best-k cells per vector under the shifted score n2(c) - 2<x,c>
    val ranked = vecs.map { case (_, v) =>
      codes.indices.map(j => (n2s(j) - 2 * dot(cvs, j * dim, v), codes(j)))
        .sortBy(identity).map(_._2).toArray
    }
    // truth: all-pairs cosine >= 0.4
    val norms = vecs.map { case (_, v) => math.sqrt(v.map(x => x * x).sum) }
    def vdot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0; while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val truth = (for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
      if vdot(vecs(i)._2, vecs(j)._2) / (norms(i) * norms(j)) >= 0.4
    } yield (i, j)).toSet
    println(s"[peek] truth pairs: ${truth.size}")
    for (k <- 2 to 6) {
      val sets = ranked.map(_.take(k).toSet)
      val caught = truth.count { case (i, j) => (sets(i) & sets(j)).nonEmpty }
      // candidate volume = pairs sharing any cell
      val byCell = scala.collection.mutable.Map[Int, Int]().withDefaultValue(0)
      sets.foreach(_.foreach(c => byCell(c) += 1))
      val cand = byCell.values.map(n => n.toLong * (n - 1) / 2).sum
      println(f"[peek] k=$k recall=${caught.toDouble / truth.size}%.3f candidates<=$cand")
    }
    s.stop()
  }
}
