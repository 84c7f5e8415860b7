package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90% of the left) plus a long tail, some keys unmatched
  private lazy val left = ((1 to 900).map(i => (7L, s"l$i"))
    ++ (1 to 100).map(i => (i.toLong % 13, s"t$i")))
    .toDF("k", "lv")
  private lazy val right = Seq(7L -> "hot", 1L -> "one", 2L -> "two", 99L -> "none")
    .toDF("k", "rv")

  private def sorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("saltedJoin equals the plain join for every supported join type") {
    Seq("inner", "left", "left_semi", "left_anti").foreach { jt =>
      assert(sorted(Skew.saltedJoin(left, right, "k", 8, jt))
        == sorted(left.join(right, Seq("k"), jt)), s"join type $jt")
    }
  }

  test("saltedJoin scatters the hot key across sub-keys, right/full rejected") {
    val salted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(8L)).cast("int"))
    val spread = salted.filter(col("k") === 7L).select("_salt").distinct().count()
    assert(spread >= 6, s"hot key only landed on $spread of 8 sub-keys")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(left, right, "k", 8, "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(left, right, "k", 8, "full_outer")
    }
  }

  test("saltedJoin is retry-deterministic: identical output across runs") {
    val a = sorted(Skew.saltedJoin(left.repartition(7), right, "k", 8))
    val b = sorted(Skew.saltedJoin(left.repartition(3), right, "k", 8))
    assert(a == b)
  }
}
