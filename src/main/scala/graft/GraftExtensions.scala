package graft

import graft.functions.{AlphaSpaceCountExpr, ArrayCosine, ArrayDot, CharDistinctExpr, CharSumSqExpr, HyperplaneSigExpr, LangIdExpr, MinHashSigExpr, ShingleHashesExpr, SimHash64Expr}
import graft.schemer.{HiveWitnessAgg, WitnessColumnsAgg}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}

/**
 * SQL registration of the engine's native expressions, so a cluster can
 * install the library once and use every function from pure SQL:
 *
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 *   SELECT event_type, infer_hive_type(props) FROM events GROUP BY 1;
 *   SELECT array_cosine(a.embedding, b.embedding) FROM ...;
 * }}}
 *
 * For an already-running session (tests, notebooks), the same catalog can
 * be injected with `org.apache.spark.sql.graft.GraftFunctions.register`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.catalog.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  private def intArg(name: String, e: Expression): Int = e match {
    case IntegerLiteral(v) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got $other")
  }

  /** (name, info, builder) rows for every SQL-exposed native function.
   *  Aggregate builders return the AggregateFunction itself — the analyzer
   *  wraps it into an AggregateExpression during resolution. */
  val catalog: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("infer_hive_type", info("infer_hive_type", classOf[HiveWitnessAgg]),
      (es: Seq[Expression]) => HiveWitnessAgg(es.head, renderDefs = false)),
    ("infer_column_defs", info("infer_column_defs", classOf[HiveWitnessAgg]),
      (es: Seq[Expression]) => HiveWitnessAgg(es.head, renderDefs = true)),
    // optional 2nd arg = map-inference threshold (0/absent = off)
    ("infer_column_types", info("infer_column_types", classOf[WitnessColumnsAgg]),
      (es: Seq[Expression]) => WitnessColumnsAgg(es.head,
        if (es.size > 1) intArg("infer_column_types", es(1)) else 0)),
    ("infer_hive_type_map", info("infer_hive_type_map", classOf[HiveWitnessAgg]),
      (es: Seq[Expression]) => HiveWitnessAgg(es.head, renderDefs = false,
        mapThreshold = intArg("infer_hive_type_map", es(1)))),
    ("array_dot", info("array_dot", classOf[ArrayDot]),
      (es: Seq[Expression]) => ArrayDot(es(0), es(1))),
    ("array_cosine", info("array_cosine", classOf[ArrayCosine]),
      (es: Seq[Expression]) => ArrayCosine(es(0), es(1))),
    ("simhash64", info("simhash64", classOf[SimHash64Expr]),
      (es: Seq[Expression]) => SimHash64Expr(es.head)),
    ("minhash_sig", info("minhash_sig", classOf[MinHashSigExpr]),
      (es: Seq[Expression]) => MinHashSigExpr(es(0), intArg("minhash_sig", es(1)))),
    ("shingle_hashes", info("shingle_hashes", classOf[ShingleHashesExpr]),
      (es: Seq[Expression]) => ShingleHashesExpr(es(0), intArg("shingle_hashes", es(1)))),
    ("lang_id", info("lang_id", classOf[LangIdExpr]),
      (es: Seq[Expression]) => LangIdExpr(es.head, graft.functions.TextFunctions.markers)),
    ("hyperplane_sig", info("hyperplane_sig", classOf[HyperplaneSigExpr]),
      (es: Seq[Expression]) => HyperplaneSigExpr(es(0),
        intArg("hyperplane_sig", es(1)), intArg("hyperplane_sig", es(2)))),
    ("char_sum_sq", info("char_sum_sq", classOf[CharSumSqExpr]),
      (es: Seq[Expression]) => CharSumSqExpr(es.head)),
    ("char_distinct", info("char_distinct", classOf[CharDistinctExpr]),
      (es: Seq[Expression]) => CharDistinctExpr(es.head)),
    ("alpha_space_count", info("alpha_space_count", classOf[AlphaSpaceCountExpr]),
      (es: Seq[Expression]) => AlphaSpaceCountExpr(es.head))
  )
}
