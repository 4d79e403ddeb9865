package graft.schemer

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end golden test on the reference's own example corpus
 *  (`/root/reference/example/users.json`, expected output at
 *  `/root/reference/README.md:24-49`) — modulo the two documented
 *  determinism fixes: first-seen column order (the reference's order is
 *  hash-map order, SURVEY.md §1.2) and the LOAD DATA path. */
class GoldenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val fixture = getClass.getResource("/users.json").getPath

  test("users.json infers the README golden schema") {
    val script = SchemaGen.hiveScript(spark, fixture, "data")
    val expected =
      s"""ADD JAR hive-json-serde-0.2.jar;
         |
         |CREATE TABLE data (
         |\tid TINYINT,
         |\tname VARCHAR(6),
         |\tincome ???,
         |\tcity STRUCT<
         |\t\tname: VARCHAR(9),
         |\t\tarea: DOUBLE
         |\t>,
         |\tchildren ARRAY<
         |\t\tSTRUCT<
         |\t\t\tname: VARCHAR(7),
         |\t\t\ttoy: VARCHAR(10)
         |\t\t>
         |\t>,
         |\tcars ARRAY<
         |\t\t???
         |\t>,
         |\tnum NUMERIC(16, 2),
         |\temployed BOOLEAN
         |) ROW FORMAT SERDE 'org.apache.hadoop.hive.contrib.serde2.JsonSerde';
         |
         |LOAD DATA LOCAL INPATH '$fixture' INTO TABLE data;""".stripMargin
    assert(script == expected)
  }

  test("every type matches the README golden output (order-independent)") {
    val w = SchemaGen.witness(spark, fixture).asInstanceOf[WObj]
    def t(k: String): String = HiveRender.renderType(w.get(k).get)
    assert(t("id") == "TINYINT")
    assert(t("name") == "VARCHAR(6)")
    assert(t("income") == "???")
    assert(t("num") == "NUMERIC(16, 2)")
    assert(t("employed") == "BOOLEAN")
    assert(t("cars") == "ARRAY<\n\t???\n>")
    val city = w.get("city").get.asInstanceOf[WObj]
    assert(HiveRender.renderType(city.get("name").get) == "VARCHAR(9)")
    assert(HiveRender.renderType(city.get("area").get) == "DOUBLE")
    val child = w.get("children").get.asInstanceOf[WArr].elem.asInstanceOf[WObj]
    assert(HiveRender.renderType(child.get("name").get) == "VARCHAR(7)")
    assert(HiveRender.renderType(child.get("toy").get) == "VARCHAR(10)")
  }

  test("RowMismatch golden: array row then object row") {
    import spark.implicits._
    val ds = Seq("""{"names": ["Rok", "Manca"]}""", """{"names": {"first": "Rok"}}""").toDS().coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      InferSchema.inferWitness(ds)
    }
    // root cause carries both rendered schemas, like README.md:90-102
    val msg = e.getCause match { case c: Throwable => c.getMessage; case _ => e.getMessage }
    assert(msg.contains("ARRAY<") && msg.contains("VARCHAR(5)") && msg.contains("STRUCT<"))
  }

  test("InconsistentArray golden: mixed string/struct array") {
    import spark.implicits._
    val ds = Seq("""{"a": ["a", {"b":1}]}""").toDS().coalesce(1)
    assertThrows[org.apache.spark.SparkException](InferSchema.inferWitness(ds))
  }

  test("valid mixed-numeric array is ARRAY<FLOAT> (README.md:75)") {
    import spark.implicits._
    val ds = Seq("""{"a": [1, 12.345]}""").toDS()
    val w = InferSchema.inferWitness(ds).asInstanceOf[WObj]
    assert(HiveRender.renderType(w.get("a").get) == "ARRAY<\n\tFLOAT\n>")
  }
}
