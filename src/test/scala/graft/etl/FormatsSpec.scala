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

  test("CSV header probe: empty / quoted-header / misaligned sources fail loudly") {
    def writeCsv(lines: String*): String = {
      val dir = Files.createTempDirectory("graft-csvprobe")
      Files.write(dir.resolve("part-0.csv"),
        lines.mkString("\n").getBytes("UTF-8"))
      dir.toString
    }
    // happy path: header-probed all-string schema, verbatim values
    val ok = Pipeline.FileSource(writeCsv("id,name", "1,ann", "02,bo"), "csv")
      .load(spark).orderBy("id").collect()
    assert(ok.map(_.getString(0)).toSeq == Seq("02", "1")) // verbatim strings
    // empty source: explicit error, not NoSuchElementException
    val eEmpty = intercept[IllegalArgumentException] {
      Pipeline.FileSource(writeCsv(), "csv").load(spark)
    }
    assert(eEmpty.getMessage.contains("no rows"))
    // quoted header could embed the delimiter -> refuse, don't misalign
    val eQuoted = intercept[IllegalArgumentException] {
      Pipeline.FileSource(writeCsv("\"last, first\",id", "x,1"), "csv").load(spark)
    }
    assert(eQuoted.getMessage.contains("quoted header"))
    // first data row with fewer fields than the header -> refuse
    val eShort = intercept[IllegalArgumentException] {
      Pipeline.FileSource(writeCsv("a,b,c", "1,2"), "csv").load(spark)
    }
    assert(eShort.getMessage.contains("header/data mismatch"))
    // a quoted data row with embedded commas splits into MORE raw
    // parts than the header has columns — allowed by the >= guard
    val quotedData = Pipeline.FileSource(
      writeCsv("id,name", "1,\"smith, j\""), "csv").load(spark).collect()
    assert(quotedData.head.getString(1) == "smith, j")
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
