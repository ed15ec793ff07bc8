package graft.etl

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Source/sink format coverage beyond parquet: ORC (columnar
  * alternative), CSV and JSON (interchange), each with schema-explicit
  * reads — inference stays off, matching the reference's
  * inferSchema=false stance (ingest.py:638,648).
  */
class FormatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("formats-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def sample = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")

  test("XML round-trip with explicit schema (Spark 4 built-in source)") {
    val dir = Files.createTempDirectory("graft_xml").toString + "/t"
    val src = sample
    src.write.options(Pipeline.writeOptions("xml")).format("xml").save(dir)
    val back = Pipeline.FileSource(dir, "xml", schema = Some(src.schema)).load(spark)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    val a = src.orderBy("l_orderkey", "l_linenumber").collect().toSeq
    val b = back.orderBy("l_orderkey", "l_linenumber").collect().toSeq
    assert(a == b)
  }

  test("ORC round-trip preserves rows and types") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/t"
    val src = sample
    src.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.agg(sum("l_orderkey")).head.getLong(0) ==
      src.agg(sum("l_orderkey")).head.getLong(0))
  }

  test("CSV round-trip with explicit schema (no inference) and header") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/t"
    val src = sample
    src.write.option("header", "true").csv(dir)
    val back = spark.read
      .option("header", "true")
      .schema(src.schema) // explicit, inferSchema stays off
      .csv(dir)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.agg(sum("l_quantity")).head.getDouble(0) ==
      src.agg(sum("l_quantity")).head.getDouble(0))
  }

  test("JSON lines round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft-json").toString + "/t"
    val src = sample
    src.write.json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    assert(back.count() == src.count())
    assert(back.select("l_returnflag").distinct().count() ==
      src.select("l_returnflag").distinct().count())
  }
}
