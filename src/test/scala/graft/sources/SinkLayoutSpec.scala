package graft.sources

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The z-order layout contract: the Morton key really interleaves, and the
 *  files it lays down are 2-D boxes — bounded in BOTH dimensions at once,
 *  which is the whole data-skipping point. */
class SinkLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Reference interleave in plain Scala, bit by bit. */
  private def morton(x: Long, y: Long): Long =
    (0 until 8).foldLeft(0L)((z, i) =>
      z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))

  test("zKey equals the bit-by-bit Morton interleave on the full 8-bit grid") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val pairs = for (x <- 0L until 256L by 17L; y <- 0L until 256L by 13L) yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), Sinks.zKey(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (((x, y), z) <- got) assert(z == morton(x, y), s"($x,$y)")
    // corners pin the bit assignment: x in even bits, y in odd
    assert(morton(255, 0) == 0x5555L && morton(0, 255) == 0xAAAAL)
  }

  test("compaction rewrites the 64-file layout into at most 4 files, same rows") {
    val root = Sinks.compactRoot(spark, dir)
    def parquets(sub: String) = new java.io.File(s"$root/$sub").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquets("small") == 64, "premise: the fragmented layout is 64-way")
    assert(parquets("compacted") <= 4, "compaction must reach the target file count")
    val a = spark.read.parquet(s"$root/small").count()
    val b = spark.read.parquet(s"$root/compacted").count()
    assert(a == b && a > 0, "compaction must preserve every row")
  }

  test("every z-ordered file covers a bounded slice of BOTH dimensions") {
    import org.apache.spark.sql.functions._
    val path = Sinks.zorderPath(spark, dir)
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length >= 8, s"expected >=8 range partitions, got ${files.length}")
    val g = spark.read.parquet(path)
      .agg(min("user_id"), max("user_id"), min("hr"), max("hr")).head()
    val (ru, rh) = (math.max(g.getLong(1) - g.getLong(0), 1L),
      math.max(g.getLong(3) - g.getLong(2), 1L))
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("user_id"), max("user_id"), min("hr"), max("hr")).head()
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    // a z-prefix range bounds both dims ~simultaneously; range-partition
    // boundaries cut mid-prefix, so allow the boundary files to spill —
    // but most files must be a half-range box in BOTH dimensions. A
    // single-column sort layout fails this: its files span ~all of the
    // other dimension.
    val boxed = spans.count { case (su, sh) => su * 2 <= ru && sh * 2 <= rh }
    assert(boxed * 4 >= files.length * 3,
      s"only $boxed/${files.length} files are half-range boxes: " +
        spans.map { case (a, b) => s"($a/$ru,$b/$rh)" }.mkString(" "))
  }
}
