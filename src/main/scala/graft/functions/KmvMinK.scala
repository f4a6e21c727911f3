package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native KMV aggregate: the `k` lexicographically smallest DISTINCT
  * string values of the child expression, as an ascending `array<string>`.
  *
  * This is the extension-ladder rung the KMV sketch build actually wants
  * at 100 TB (builder brief: compose built-ins → custom Expression /
  * aggregate → custom plan). The declarative form — `distinct` + a
  * per-key `row_number` window ≤ k — must SHUFFLE EVERY DISTINCT HASH to
  * its key's partition and sort the key's whole hash population before
  * the filter drops all but k rows. As a `TypedImperativeAggregate` the
  * same result partial-aggregates: every map task keeps at most k hashes
  * per key in a bounded tree, the shuffle carries ≤ k·|keys| rows per
  * partition, and merge is the same insert-and-trim. The buffer is
  * bounded at k entries BY CONSTRUCTION (insert, then drop the max),
  * so memory per (task, key) is k·32 hex chars regardless of data
  * volume — the property that makes the sketch build cheaper than the
  * exact-distinct pass it approximates.
  *
  * Determinism: a sorted set of strings has one canonical content and the
  * output is its ascending iteration — bit-identical across partitionings
  * and engines (the DuckDB oracle replays it as row_number ≤ k over md5
  * hex, which compares identically). Inserting an element ≥ the current
  * k-th minimum is a no-op, so update/merge order cannot matter.
  */
case class KmvMinK(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[String]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_mink expects (string, k >= 1), got ${child.dataType.simpleString}, k=$k")

  override def createAggregationBuffer(): mutable.TreeSet[String] =
    mutable.TreeSet.empty[String]

  private def add(buf: mutable.TreeSet[String], s: String): Unit = {
    // Insert-then-trim keeps the buffer ≤ k and makes late large values
    // no-ops; TreeSet dedups re-seen hashes for free.
    buf += s
    if (buf.size > k) buf -= buf.last
  }

  override def update(buf: mutable.TreeSet[String],
                      input: InternalRow): mutable.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: mutable.TreeSet[String],
                     other: mutable.TreeSet[String]): mutable.TreeSet[String] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[String]): Any =
    new GenericArrayData(buf.iterator.map(UTF8String.fromString).toArray)

  // Hashes are md5 hex (no '\n' possible); newline-join is an injective,
  // order-preserving codec for the sorted set.
  override def serialize(buf: mutable.TreeSet[String]): Array[Byte] =
    buf.mkString("\n").getBytes(StandardCharsets.UTF_8)

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[String] = {
    val s = new String(bytes, StandardCharsets.UTF_8)
    val buf = mutable.TreeSet.empty[String]
    if (s.nonEmpty) s.split('\n').foreach(buf += _)
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kmv_mink"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMinK =
    copy(child = newChildren.head)
}
