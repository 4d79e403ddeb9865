package graft.schemer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The schema-witness fold as a NATIVE Catalyst aggregate (SURVEY §2.1-O3's
 * `infer_hive_type` as `TypedImperativeAggregate`): the aggregation buffer
 * is the [[Witness]] JVM object itself, mutated in place per row; the
 * compact [[WitnessCodec]] binary form is produced only where a buffer
 * genuinely crosses a boundary (shuffle of partial aggregates, spill,
 * streaming state). The earlier `functions.udaf` + Kryo form re-encoded the
 * buffer on every partial merge; this one plans as ObjectHashAggregate with
 * map-side combine, so at 100 TB the shuffle carries one few-hundred-byte
 * witness per (group × partition).
 *
 * `renderDefs = false` renders the unified Hive TYPE of the group's JSON
 * documents (reference `out`, /root/reference/Schemer.scala:65-97);
 * `renderDefs = true` renders the column-definition block (reference
 * `definition`, Schemer.scala:99-105, ERROR on non-object rows).
 */
case class HiveWitnessAgg(
    child: Expression,
    renderDefs: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Witness] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Witness = Witness.bottom

  override def update(buffer: Witness, input: InternalRow): Witness = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val line = v.asInstanceOf[UTF8String].toString
      if (line.isEmpty) buffer else Witness.merge(buffer, Witness.ofJson(line))
    }
  }

  override def merge(buffer: Witness, input: Witness): Witness =
    Witness.merge(buffer, input)

  override def eval(buffer: Witness): Any =
    UTF8String.fromString(
      if (renderDefs) HiveRender.definition(buffer) else HiveRender.renderType(buffer))

  override def serialize(buffer: Witness): Array[Byte] = WitnessCodec.write(buffer)
  override def deserialize(storage: Array[Byte]): Witness = WitnessCodec.read(storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): HiveWitnessAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HiveWitnessAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HiveWitnessAgg =
    copy(child = newChild)

  override def dataType: DataType = StringType
  override def nullable: Boolean = false // bottom renders as the ??? marker
  override def prettyName: String =
    if (renderDefs) "infer_column_defs" else "infer_hive_type"
}
