package graft

/** Serializes the bench result as ONE compact JSON line that is guaranteed to
 * fit a bounded stdout tail capture.
 *
 * The driver records only the LAST 2000 characters of the sbt run's stdout and
 * regex-parses the JSON line out of that tail; sbt then appends its own
 * `[success] Total time: …` banner (~80 chars) AFTER our line. Rounds 1-3 all
 * lost the head of the line to that truncation (`"parsed": null` in every
 * BENCH_r*.json). So the line must stay under ~1850 chars no matter how many
 * queries the suite grows to. Strategy, in order, until it fits:
 *   1. values at 2 decimals (trailing zeros stripped), numeric `sf`;
 *   2. values at 1 decimal;
 *   3. keep only the slowest queries and say how many were omitted
 *      (`"omitted":N`) — the full-resolution map always goes to
 *      bench_result.json regardless.
 */
object BenchFormat {

  /** Max chars for the printed line: the 2000-char tail must hold
   *  `"[info] " + line + "\n" + <sbt success banner ~75 chars> + "\n"`,
   *  i.e. line ≤ ~1918; 1900 keeps a small margin for banner variation. */
  val Budget = 1900

  def fmt(v: Double, decimals: Int): String = {
    // compact modes (<=2 decimals) drop to 1 decimal once values hit 10s;
    // the full-resolution file form keeps its precision everywhere
    val scale = if (decimals <= 2 && v >= 9.995) 1 else decimals
    BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.stripTrailingZeros.toPlainString
  }

  /** `"sf":0.1` when the dir encodes a scale factor, else the quoted dir. */
  private def sfJson(sfDir: String): String =
    "sf([0-9.]*[0-9])/?$".r.findFirstMatchIn(sfDir).map(_.group(1))
      .getOrElse("\"" + sfDir + "\"")

  /** `"calib":N` — the host-speed probe (fixed CPU+shuffle work, timed at
   *  bench start), so cross-host comparisons of scaled runs are
   *  machine-attributable instead of hand-calibrated (r10 did the 1.30×
   *  host-drift analysis by hand; this field makes it data). Placed before
   *  the queries map so it always survives the budget truncation. */
  private def calibJson(calib: Option[Double]): String =
    calib.map(c => s""","calib":${fmt(c, 2)}""").getOrElse("")

  private def build(total: Double, qs: Seq[(String, Double)], sfDir: String,
                    decimals: Int, omitted: Int, errJson: String,
                    calib: Option[Double]): String = {
    val body = qs.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v, decimals) }
      .mkString("{", ",", "}")
    val omit = if (omitted > 0) s""","omitted":$omitted""" else ""
    s"""{"metric":"total","value":${fmt(total, decimals)},"unit":"sec"${calibJson(calib)},"queries":$body$omit$errJson,"sf":${sfJson(sfDir)}}"""
  }

  /** `"errors":N` (+ failed names, budget permitting) — a crashed query must
   *  never read as a fast query in the tail the driver captures. */
  private def errJson(errNames: Seq[String], withNames: Boolean): String =
    if (errNames.isEmpty) ""
    else if (withNames)
      s""","errors":${errNames.size},"failed":${errNames.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    else s""","errors":${errNames.size}"""

  def line(total: Double, queries: Seq[(String, Double)], sfDir: String,
           errNames: Seq[String] = Nil, calib: Option[Double] = None): String = {
    val errFull = errJson(errNames, withNames = true)
    val errCount = errJson(errNames, withNames = false)
    val two = build(total, queries, sfDir, 2, 0, errFull, calib)
    if (two.length <= Budget) return two
    val one = build(total, queries, sfDir, 1, 0, errFull, calib)
    if (one.length <= Budget) return one
    val oneCnt = build(total, queries, sfDir, 1, 0, errCount, calib)
    if (oneCnt.length <= Budget) return oneCnt
    // Last resort: drop the fastest queries (least informative for a perf
    // grader) until the line fits; the count of dropped entries is explicit.
    // The error COUNT always survives — only the failed-name list is shed.
    val bySlow = queries.sortBy(-_._2)
    var keep = queries.size
    while (keep > 1) {
      keep -= 1
      val l = build(total, bySlow.take(keep), sfDir, 1, queries.size - keep, errCount, calib)
      if (l.length <= Budget) return l
    }
    build(total, bySlow.take(1), sfDir, 1, queries.size - 1, errCount, calib)
  }

  /** Full-resolution form for the bench_result.json side channel. Query
   *  failures (if any) ride along as an `"errors"` map — a failed query's
   *  duration alone would read as a plausible measurement. */
  def fullLine(total: Double, queries: Seq[(String, Double)], sfDir: String,
               errors: Seq[(String, String)] = Nil,
               calib: Option[Double] = None): String = {
    val body = queries.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v, 4) }
      .mkString("{", ",", "}")
    val errs =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
        .mkString(""","errors":{""", ",", "}")
    s"""{"metric":"total","value":${fmt(total, 4)},"unit":"sec"${calibJson(calib)},"queries":$body$errs,"sf":"$sfDir"}"""
  }
}
