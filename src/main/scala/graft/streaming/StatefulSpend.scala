package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-vendor running spend state (SURVEY §2.9's stateful extension):
  * a `flatMapGroupsWithState` operator maintaining, per vendor, the
  * lifetime transaction count and decimal-exact cents total across
  * micro-batches — the streaming form of the reference's monotone
  * transaction-count bookkeeping (transformer.py:55-65), as durable
  * operator state instead of a warehouse probe.
  *
  * State is cents (Long), not Double: exact accumulation, no FP drift
  * across checkpoints. Emits one updated row per vendor per batch.
  */
object StatefulSpend {

  final case class VendorState(nTxns: Long, totalCents: Long)
  final case class VendorUpdate(vendor: String, n_txns: Long, total_spent: Double)

  def updateVendor(
      vendor: String,
      rows: Iterator[(String, Double)],
      state: GroupState[VendorState]): Iterator[VendorUpdate] = {
    val prior = state.getOption.getOrElse(VendorState(0L, 0L))
    var n = prior.nTxns
    var cents = prior.totalCents
    rows.foreach { case (_, amount) =>
      n += 1
      cents += math.round(amount * 100.0)
    }
    val next = VendorState(n, cents)
    state.update(next)
    Iterator.single(VendorUpdate(vendor, n, cents / 100.0))
  }

  /** Wire the stateful op over a transactions stream (columns vendor,
    * amount). Update-mode output: latest running totals per vendor. */
  def runningVendorSpend(tx: DataFrame): Dataset[VendorUpdate] = {
    val spark = tx.sparkSession
    import spark.implicits._
    tx.select("vendor", "amount").as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(updateVendor)
  }
}
