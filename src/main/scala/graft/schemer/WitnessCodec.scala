package graft.schemer

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/**
 * Compact hand-rolled binary codec for the [[Witness]] ADT — the shuffle
 * format of the native aggregate ([[HiveWitnessAgg]]).
 *
 * One tag byte per node, `writeUTF` for field names, and exact
 * `BigDecimal.toString` round-trips for numeric bounds (the Java spec
 * guarantees `new BigDecimal(d.toString)` reproduces value AND scale, which
 * the renderer's precision arithmetic depends on). A typical wide-document
 * witness serializes to a few hundred bytes — only these bytes cross the
 * wire at the partial/final aggregation boundary, never row data.
 */
object WitnessCodec {

  def write(w: Witness): Array[Byte] = {
    val bos = new ByteArrayOutputStream(256)
    val out = new DataOutputStream(bos)
    writeW(w, out)
    out.flush()
    bos.toByteArray
  }

  def read(bytes: Array[Byte]): Witness =
    readW(new DataInputStream(new ByteArrayInputStream(bytes)))

  private def writeW(w: Witness, out: DataOutputStream): Unit = w match {
    case WNull => out.writeByte(0)
    case WBool => out.writeByte(1)
    case WStr(n) =>
      out.writeByte(2); out.writeInt(n)
    case n: WNum =>
      out.writeByte(3)
      out.writeUTF(n.min.underlying.toString)
      out.writeUTF(n.max.underlying.toString)
      out.writeInt(n.maxScale)
    case WArr(e) =>
      out.writeByte(4); writeW(e, out)
    case WObj(fields) =>
      out.writeByte(5)
      out.writeInt(fields.size)
      fields.foreach { case (k, v) => out.writeUTF(k); writeW(v, out) }
    case WMap(v) =>
      out.writeByte(6); writeW(v, out)
    case WTs(n, d) =>
      out.writeByte(7); out.writeInt(n); out.writeBoolean(d)
  }

  private def readW(in: DataInputStream): Witness = in.readByte() match {
    case 0 => WNull
    case 1 => WBool
    case 2 => WStr(in.readInt())
    case 3 =>
      val min = BigDecimal(new java.math.BigDecimal(in.readUTF()))
      val max = BigDecimal(new java.math.BigDecimal(in.readUTF()))
      WNum(min, max, in.readInt())
    case 4 => WArr(readW(in))
    case 5 =>
      val n = in.readInt()
      WObj(Vector.fill(n)(in.readUTF() -> readW(in)))
    case 6 => WMap(readW(in))
    case 7 => WTs(in.readInt(), in.readBoolean())
    case other => throw new IllegalStateException(s"corrupt witness tag: $other")
  }
}
