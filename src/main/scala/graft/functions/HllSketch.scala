package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

import graft.operators.Relational

/** `hll_sketch(h)` — HyperLogLog distinct-count as a NATIVE Catalyst
  * AGGREGATE (TypedImperativeAggregate), the production form of q40's
  * relational spelling: one `groupBy(key).agg(hll_sketch(h))` instead
  * of the two-aggregation register/estimate pipeline, composable with
  * any other aggregate in the same pass.
  *
  * The buffer IS the sketch: a fixed [[Relational.HllM]]-byte register
  * array (rho ≤ 27 fits a byte). `update` folds one pre-hashed 32-bit
  * value (the q29/q40 md5-derived BIGINT — hashing stays an explicit,
  * cross-engine-reproducible expression); `merge` is bytewise max —
  * the sketch-union algebra, exercised on every partial/final
  * aggregation boundary; `serialize` ships the raw 64 bytes per group
  * per task, the fixed-size shuffle row HLL exists for. `eval` runs
  * q40's INTEGER-ONLY estimate (scaled harmonic sum, [[Relational.HllC]]
  * division, driver-built [[Relational.HllLinTable]] for the
  * small-range branch) and returns the (v_empty, s_scaled, hll_est)
  * struct — bit-identical to the relational plan and to the DuckDB
  * oracle, which FunctionsSpec and the q44 gate entry both pin.
  *
  * Null inputs are skipped (count-distinct convention: NULL is not a
  * value). The estimate is arrival- and partition-order independent
  * because max is commutative/associative — the property the q44 spec
  * checks by aggregating the same corpus under different partition
  * counts. */
case class HllSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val m = Relational.HllM
  private val wb = Relational.HllWBits

  /** Integral input contract, ANALYSIS-checked: a string/array/float
    * input fails with a named error at plan time, not a mid-job
    * executor ClassCastException. */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_sketch requires an integral 32-bit-hash input, got " +
        other.simpleString)
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Number].longValue()
      // loud contract check: the sketch is defined over a 32-bit hash
      // space (see the q40 scaladoc's range-ceiling note). A negative
      // or 64-bit input (e.g. xxhash64) would silently alias registers
      // through the idx truncation — a wrong estimate with no error is
      // the one failure mode a sketch must not have.
      if (h < 0L || h >= (1L << 32))
        throw new IllegalArgumentException(
          s"hll_sketch: input $h outside [0, 2^32) — feed a 32-bit " +
            "hash (e.g. conv(substring(md5(x), 1, 8), 16, 10))")
      val idx = (h >>> wb).toInt
      val w = h & ((1L << wb) - 1)
      val rho =
        if (w == 0) wb + 1
        else (wb + 1) - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(idx)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var sScaled = 0L
    var vEmpty = 0
    var i = 0
    while (i < m) {
      val r = buf(i)
      if (r == 0) vEmpty += 1
      sScaled += (1L << (wb + 1 - r))
      i += 1
    }
    val eRaw = Relational.HllC / sScaled
    val est =
      if (vEmpty > 0 && eRaw <= Relational.HllLinThresh)
        Relational.HllLinTable(vEmpty - 1)
      else eRaw
    InternalRow(vEmpty, sScaled, est)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  // clone: the incoming array may alias row-buffer storage Spark
  // reuses across rows; the aggregation buffer must own its bytes
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def dataType: DataType = StructType(Seq(
    StructField("v_empty", IntegerType, nullable = false),
    StructField("s_scaled", LongType, nullable = false),
    StructField("hll_est", LongType, nullable = false)))

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "hll_sketch"
}
