package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter set membership as engine primitives (Spark 4 keeps its
  * own `bloom_filter_agg`/`might_contain` internal to the runtime-filter
  * optimizer rule, so an engine-level blocklist needs its own pair):
  * a mergeable build aggregate and a codegen'd probe expression.
  *
  * Determinism: the filter's bit array depends only on the key set —
  * inserts are idempotent and merge is bitwise OR, so build order and
  * partitioning don't matter; probes are then pure per-row functions.
  */
object BloomFunctions {

  /** Mergeable bloom build over xxhash64-keyed longs: map-side partial
    * filters OR-merged — the distributed build a 10^9-row blocklist
    * needs (the raw keys never centralize; only fixed-size bit arrays
    * move).
    */
  final class BloomAgg(expectedItems: Long, fpp: Double)
      extends Aggregator[Long, BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
    override def reduce(b: BloomFilter, k: Long): BloomFilter = {
      b.putLong(k); b
    }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b); a
    }
    override def finish(b: BloomFilter): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      b.writeTo(out)
      out.toByteArray
    }
    override def bufferEncoder: Encoder[BloomFilter] =
      Encoders.javaSerialization[BloomFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build a bloom over `xxhash64(keyCol)` and return its serialized
    * form to the driver — ONE fixed-size scalar row, the same pattern
    * Spark's scalar subqueries (and its own runtime bloom filters) use
    * to move a small aggregate result into a sibling plan. Not a
    * per-row collect.
    */
  def buildBloom(keys: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    import keys.sparkSession.implicits._
    keys.select(xxhash64(col(keyCol)).as("k")).as[Long]
      .select(new BloomAgg(math.max(1L, expectedItems), fpp).toColumn)
      .head()
  }

  /** Probe column: true if `key` MIGHT be in the serialized filter
    * (false = definitely absent — the side a filter can act on).
    */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    GraftBridge.column(BloomMightContain(
      GraftBridge.expression(xxhash64(key)), bloomBytes))
}

/** Codegen'd bloom probe: the serialized filter ships with the
  * expression tree and is deserialized ONCE per executor instance
  * (transient lazy), not per row — the generated code calls back into
  * the expression object held in the codegen references array.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  def mightContainLong(k: Long): Boolean = filter.mightContainLong(k)

  override def nullSafeEval(input: Any): Any =
    mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bloomProbe", this,
        classOf[BloomMightContain].getName)
      s"${ev.value} = $ref.mightContainLong($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
