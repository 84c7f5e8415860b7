package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Exact multi-percentile as a native `TypedImperativeAggregate` — the
  * engine's own implementation of the full custom-aggregate lifecycle
  * (per-partition update, binary-serialized partial buffers, merge,
  * final eval), the same machinery Spark's built-in `percentile` rides.
  *
  * Semantics are EXACTLY the built-in's (mirrors the semantics of the
  * reference's Snowflake-side percentile queries the same way the
  * built-in does): values collect per group; at eval they sort and each
  * requested percentage p interpolates at continuous position
  * p·(n−1) between the two straddling order statistics with
  * (hi−pos)·v_lo + (pos−lo)·v_hi — the formula of Spark's
  * `Percentile.getPercentile`, bit-for-bit, which is also what makes
  * the DuckDB `quantile_cont` oracle hash-match. NULL inputs are
  * skipped; an empty group evaluates to NULL.
  *
  * Scale contract: exact percentiles hold every group value in the
  * aggregation buffer by nature — O(group size) memory, the inherent
  * cost of exactness (the built-in pays the same). The buffer
  * serializes as packed little-endian doubles between partial and
  * final aggregation. For groups that exceed executor memory the
  * approx_percentile sketch toggle (q_approx_percentiles) is the
  * documented scale path.
  */
case class ExactPercentiles(
    child: Expression,
    percentages: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Double]] {

  require(percentages.nonEmpty && percentages.forall(p => p >= 0.0 && p <= 1.0),
    s"percentages must be in [0, 1], got $percentages")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"exact_percentiles requires a DOUBLE argument, got ${child.dataType.simpleString}")

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "exact_percentiles"

  override def createAggregationBuffer(): ArrayBuffer[Double] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[Double], input: InternalRow): ArrayBuffer[Double] = {
    val v = child.eval(input)
    if (v != null) buf += v.asInstanceOf[Double]
    buf
  }

  override def merge(buf: ArrayBuffer[Double], other: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    buf ++= other
    buf
  }

  override def eval(buf: ArrayBuffer[Double]): Any = {
    if (buf.isEmpty) return null
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    new GenericArrayData(percentages.map(interpolate(sorted, _)).toArray)
  }

  /** Continuous-percentile interpolation, operand order identical to
    * Spark's built-in (so results are bit-identical, not just close). */
  private def interpolate(sorted: Array[Double], p: Double): Double = {
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else (hi - pos) * sorted(lo) + (pos - lo) * sorted(hi)
  }

  override def serialize(buf: ArrayBuffer[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new ArrayBuffer[Double](bytes.length / 8)
    while (bb.remaining() >= 8) out += bb.getDouble()
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactPercentiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactPercentiles =
    copy(inputAggBufferOffset = newOffset)
}

object ExactPercentiles {
  /** Column form: `exact_percentiles(col, Seq(0.25, 0.5, 0.75))` yields
    * ARRAY<DOUBLE> of the exact continuous percentiles. */
  def exact_percentiles(c: Column, ps: Seq[Double]): Column =
    GraftSqlBridge.column(
      ExactPercentiles(GraftSqlBridge.expression(c), ps).toAggregateExpression())

  /** SQL builder: `exact_percentiles(x, array(0.25, 0.5, 0.75))` — the
    * percentage array must be a literal (the aggregate's shape is fixed
    * at plan time). The analyzer wraps the returned AggregateFunction
    * in its AggregateExpression during resolution, as for built-ins. */
  def forSql(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      "exact_percentiles(col, array(p, ...)) takes exactly two arguments")
    val arr = exprs(1)
    require(arr.foldable && arr.dataType.isInstanceOf[ArrayType],
      "percentages must be a literal array")
    val et = arr.dataType.asInstanceOf[ArrayType].elementType
    val data = arr.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val ps = (0 until data.numElements()).map { i =>
      et match {
        case DoubleType => data.getDouble(i)
        case t: org.apache.spark.sql.types.DecimalType =>
          data.getDecimal(i, t.precision, t.scale).toDouble
        case org.apache.spark.sql.types.FloatType => data.getFloat(i).toDouble
        case org.apache.spark.sql.types.IntegerType => data.getInt(i).toDouble
        case org.apache.spark.sql.types.LongType => data.getLong(i).toDouble
        case other => throw new IllegalArgumentException(
          s"unsupported percentage element type $other")
      }
    }
    ExactPercentiles(exprs.head, ps)
  }

  /** Register `exact_percentiles` for SQL use in an existing session
    * (session-extensions form lives in GraftExtensions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "exact_percentiles", forSql, "built-in")
}
