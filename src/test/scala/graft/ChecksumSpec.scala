package graft

import org.apache.spark.sql.functions._
import graft.functions.Checksum

/** Checksum invariants: the fingerprint is a pure function of the row
  * MULTISET — row order, partitioning, and cluster layout must not
  * change it; any single-row change must. */
class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "a", Some(10.0)), (2L, "b", None), (3L, "a", Some(-3.5)),
    (4L, "c", Some(0.0)), (5L, "b", Some(10.0))
  ).toDF("id", "k", "v")

  private def cols = Seq(col("id"), col("k"),
    floor(col("v") * 100).cast("long"))

  test("checksum is order- and partition-invariant") {
    val base = Checksum.tableChecksum(df, cols).head()
    for (reshaped <- Seq(df.repartition(7), df.orderBy(desc("id")),
                         df.repartition(1), df.coalesce(1))) {
      assert(Checksum.tableChecksum(reshaped, cols).head() == base)
    }
  }

  test("any single-row change moves the checksum") {
    val base = Checksum.tableChecksum(df, cols).head()
    val mutated = df.withColumn("v",
      when(col("id") === 3L, lit(-3.51)).otherwise(col("v")))
    val dropped = df.filter(col("id") =!= 3L)
    assert(Checksum.tableChecksum(mutated, cols).head() != base)
    assert(Checksum.tableChecksum(dropped, cols).head() != base)
  }

  test("NULL is distinct from empty string and from the separator") {
    def ck(rows: Seq[(String, Option[String])]) =
      Checksum.tableChecksum(rows.toDF("a", "b"),
        Seq(col("a"), col("b"))).head()
    assert(ck(Seq(("x", None))) != ck(Seq(("x", Some("")))))
    // shifted fields must not cancel: ("ab", "c") vs ("a", "bc")
    assert(ck(Seq(("ab", Some("c")))) != ck(Seq(("a", Some("bc")))))
  }

  test("grouped checksum sums to the table checksum's row count") {
    val g = Checksum.groupedChecksum(df, col("k"), "k", cols)
    assert(g.agg(sum("n_rows")).head().getLong(0) == df.count())
    assert(g.count() == 3)
  }

  test("compareChecksums statuses: match, mismatch, only_left") {
    val left = Checksum.groupedChecksum(df, col("k"), "k", cols)
    // right: drop one row of k=a (mismatch) and all of k=c (only_left)
    val right = Checksum.groupedChecksum(
      df.filter(col("id") =!= 3L && col("k") =!= "c"), col("k"), "k", cols)
    val statuses = Checksum.compareChecksums(left, right, "k")
      .select("k", "status").as[(String, String)].collect().toMap
    assert(statuses == Map("a" -> "mismatch", "b" -> "match", "c" -> "only_left"))
  }
}
