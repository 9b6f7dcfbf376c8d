package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mining

/** Round-12 wave 14 pin: supplier HHI recomputed from the emitted shares'
  * own definition in plain Scala. */
class Round12Wave14Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("supplier_hhi equals a plain-Scala BigInt recomputation") {
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nat = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_suppkey",
        "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
          "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) AS DECIMAL(28,8)) * " +
          "CAST(100000000 AS DECIMAL(9,0)) AS BIGINT) AS r8")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val perSupp = li.groupBy(_._1).map { case (sk, v) =>
      (nat(sup(sk)), sk) -> v.map(x => BigInt(x._2)).sum
    }
    val expected = perSupp.groupBy(_._1._1).map { case (nation, m) =>
      val natRev = m.values.sum
      val shares = m.values.map(r => (r * 10000 / natRev).toLong).toSeq
      (nation, m.size.toLong, shares.max,
        shares.map(s => s * s).sum / 10000)
    }.toSet
    val got = Mining.queries("supplier_hhi")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, s"got $got\nexpected $expected")
    // HHI is a valid concentration: between 10^8/n-ish floor and 10^4
    got.foreach { case (_, n, top, hhi) =>
      assert(hhi >= 0 && hhi <= 10000 && top <= 10000 && n >= 1)
    }
  }
}
