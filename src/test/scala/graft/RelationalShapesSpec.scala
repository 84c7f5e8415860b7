package graft

import graft.operators.Relational

/** Constructed-input semantics for TPC-H join shapes whose correctness
  * gate is otherwise the DuckDB oracle over the SF fixtures — these pin
  * the EDGE semantics the fixtures may not exercise.
  */
class RelationalShapesSpec extends SparkSpec {
  import spark.implicits._

  test("soleLateSuppliers: only the sole late shipper on a multi-supplier order counts") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (10L, ts("1996-01-01"), "F"), // two suppliers, one late -> counts
      (20L, ts("1996-01-01"), "F"), // two suppliers, BOTH late -> excluded
      (30L, ts("1996-01-01"), "F"), // single supplier late -> excluded
      (40L, ts("1996-01-01"), "O")) // not finalized -> excluded
      .toDF("o_orderkey", "o_orderdate", "o_orderstatus")
    val li = Seq(
      (10L, 1L, ts("1996-06-01")), (10L, 1L, ts("1996-07-01")), // supp 1 late twice
      (10L, 2L, ts("1996-01-15")),                              // supp 2 on time
      (20L, 1L, ts("1996-06-01")), (20L, 2L, ts("1996-06-01")),
      (30L, 1L, ts("1996-06-01")),
      (40L, 1L, ts("1996-06-01")), (40L, 2L, ts("1996-01-15")))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supp = Seq((1L, "Supp#1"), (2L, "Supp#2")).toDF("s_suppkey", "s_name")
    val out = Relational.soleLateSuppliers(orders, li, supp, 60, 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // order 10 only: supplier 1 with numwait = its 2 late lines
    assert(out == Map("Supp#1" -> 2L), s"got $out")
  }

  test("soleLateSuppliers: on-time lines of the sole late supplier do not count") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq((10L, ts("1996-01-01"), "F"))
      .toDF("o_orderkey", "o_orderdate", "o_orderstatus")
    // supplier 1: one late line + one on-time line -> numwait counts
    // ONLY the late row granularity (the correlated l1 count)
    val li = Seq(
      (10L, 1L, ts("1996-06-01")), (10L, 1L, ts("1996-01-10")),
      (10L, 2L, ts("1996-01-15")))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supp = Seq((1L, "Supp#1"), (2L, "Supp#2")).toDF("s_suppkey", "s_name")
    val out = Relational.soleLateSuppliers(orders, li, supp, 60, 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("Supp#1" -> 1L), s"got $out")
  }

  test("nationTradeRank: hand-computed two-step fixed-point ranks on a 3-node graph") {
    import org.apache.spark.sql.functions._
    // Edges (src supplier-nation -> dst customer-nation, revenue):
    // A->B 1.00, A->C 3.00, B->C 2.00, C->A 5.00
    // ppm: A->B 250000, A->C 750000, B->C 1000000, C->A 1000000
    // iter1: A 1000000, B 362500, C 1637500
    // iter2: A 1541875, B 362500, C 1095625   (hand-computed)
    val nation = Seq((0L, "A"), (1L, "B"), (2L, "C"))
      .toDF("n_nationkey", "n_name")
    val supplier = Seq((0L, 0L), (1L, 1L), (2L, 2L))
      .toDF("s_suppkey", "s_nationkey")
    val customer = Seq((10L, 0L), (11L, 1L), (12L, 2L))
      .toDF("c_custkey", "c_nationkey")
    val orders = Seq((1L, 11L), (2L, 12L), (3L, 12L), (4L, 10L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      (1L, 0L, 1.00), (2L, 0L, 3.00), (3L, 1L, 2.00), (4L, 2L, 5.00))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice")
    val out = Relational
      .nationTradeRank(lineitem, orders, customer, supplier, nation, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("A" -> 1541875L, "B" -> 362500L, "C" -> 1095625L),
      s"got $out")
  }

  test("customerSpendQuartiles: explicit tile formula, ties broken by custkey") {
    import org.apache.spark.sql.functions._
    // 8 customers, spends 10..80 -> 2 per quartile with exact bounds;
    // customers 5 and 6 tie on spend (50) -> rank order by custkey
    val cust = (1L to 8L).map(i => (i, s"c$i")).toDF("c_custkey", "c_name")
    val ord = Seq(
      (1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0),
      (5L, 50.0), (6L, 50.0), (7L, 70.0), (8L, 80.0))
      .zipWithIndex.map { case ((ck, amt), i) => (i.toLong, ck, amt) }
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val out = Relational.customerSpendQuartiles(cust, ord, 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((2L, 30.0, 10.0, 20.0)), s"got $out")
    assert(out(2L) == ((2L, 70.0, 30.0, 40.0)), s"got $out")
    assert(out(3L) == ((2L, 100.0, 50.0, 50.0)), s"got $out") // the tie pair
    assert(out(4L) == ((2L, 150.0, 70.0, 80.0)), s"got $out")
  }

  test("fulfillmentLatency: last-shipment latency, interpolated percentiles") {
    import org.apache.spark.sql.functions._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (1L, "2024-01-01", "HIGH"), (2L, "2024-01-01", "HIGH"),
      (3L, "2024-01-01", "HIGH"), (4L, "2024-01-01", "LOW"))
      .map { case (k, d, p) => (k, ts(d), p) }
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    // order 1 ships twice: latency = LAST shipment (3d, not 1d)
    val li = Seq((1L, "2024-01-02"), (1L, "2024-01-04"), (2L, "2024-01-02"),
      (3L, "2024-01-03"), (4L, "2024-01-06"))
      .map { case (k, d) => (k, ts(d)) }
      .toDF("l_orderkey", "l_shipdate")
    val out = Relational.fulfillmentLatency(orders, li).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))).toMap
    // HIGH latencies [1,2,3]: p50 = 2, p90 = 2 + ((n-1)*0.9 - 1)*(3-2)
    // = 2.8000000000000003 (the exact IEEE value both engines emit)
    assert(out("HIGH") == ((2.0, 2.8000000000000003, 3.0, 3L)), s"got $out")
    assert(out("LOW") == ((5.0, 5.0, 5.0, 1L)), s"got $out")
  }

  test("excessShareSuppliers: strict majority share, window + nation filters") {
    import org.apache.spark.sql.functions._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s + " 00:00:00")
    val part = Seq((1L, "red widget"), (2L, "red bolt"), (3L, "blue widget"))
      .toDF("p_partkey", "p_name")
    val supplier = Seq((10L, "s10", 0L), (11L, "s11", 0L), (12L, "s12", 1L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nation = Seq((0L, "N0"), (1L, "N1")).toDF("n_nationkey", "n_name")
    val li = Seq(
      // part 1: s10 ships 60 of 100 -> flagged; s11 40 -> not
      (1L, 10L, 60.0, "1995-03-01"), (1L, 11L, 40.0, "1995-04-01"),
      // part 2: exact 50/50 split -> strict > flags nobody
      (2L, 10L, 50.0, "1995-05-01"), (2L, 11L, 50.0, "1995-06-01"),
      // part 3 is blue: s11 would dominate but the part filter drops it
      (3L, 11L, 99.0, "1995-07-01"),
      // s12 dominates part 1 OUTSIDE the window -> ignored; and s12
      // is in N1 anyway
      (1L, 12L, 999.0, "1996-02-01"))
      .map { case (p, s, q, d) => (p, s, q, ts(d)) }
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    val out = Relational.excessShareSuppliers(li, part, supplier, nation,
        "red", "1995-01-01", "1996-01-01", "N0")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((10L, "s10")), s"got $out")
  }

  test("skyline2d equals the quadratic dominance filter; duplicates survive; partition-invariant") {
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(42)
    val base = (1 to 200).map(i =>
      (i.toLong, rng.nextInt(20).toLong, rng.nextInt(20).toLong))
    // planted: a duplicated frontier point + a same-price dominated row
    val pts = base ++ Seq((901L, 0L, 30L), (902L, 0L, 30L), (903L, 0L, 29L))
    val df = pts.toDF("id", "price", "sz")
    def run(d: org.apache.spark.sql.DataFrame) =
      Relational.skyline2d(d, "id", col("price"), col("sz"), "price", "sz")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val out = run(df.repartition(7))
    val brute = pts.filter { case (_, p, s) =>
      !pts.exists { case (_, p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s) } }.toSet
    assert(out == brute, s"got ${out.size} vs brute ${brute.size}")
    assert(out((901L, 0L, 30L)) && out((902L, 0L, 30L)))
    assert(!out.exists(_._1 == 903L))
    assert(run(df.repartition(1)) == out && run(df.repartition(31)) == out)
  }
}
