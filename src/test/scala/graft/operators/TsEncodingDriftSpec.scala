package graft.operators

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageTypeParser}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.Types
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Guards against testdata schema drift on `events.ts` (the round-8 red
  * round): the driver has shipped BOTH `INT64 TIMESTAMP(NANOS)` and
  * `timestamp[us]` encodings across regenerations. `EventFinders.events`
  * must normalize either to the nanos-LongType contract, bit-identically,
  * so the next regeneration is a no-op instead of 19 erroring queries.
  */
class TsEncodingDriftSpec extends AnyFunSpec with Matchers {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // Six rows with micro-exact timestamps straddling the fs_time_range bounds.
  private val rows: Seq[(Long, Long, Long, String, Double, String)] = Seq(
    (1L, 1704412799999999L, 7L, "click", 1.5, "{\"k\": 10}"),
    (2L, 1704412800000000L, 7L, "view", 2.0, "{\"k\": 55}"),
    (3L, 1704499200123456L, 8L, "click", 0.25, "{\"k\": 99}"),
    (4L, 1704671999999999L, 9L, "error", -1.0, "{\"k\": 3}"),
    (5L, 1704672000000000L, 7L, "view", 3.75, "{\"k\": 42}"),
    (6L, 1704758400000001L, 10L, "purchase", 10.0, "{\"k\": 77}")
  )

  /** events.parquet written as INT64 TIMESTAMP(NANOS) — parquet-hadoop
    * directly, since Spark cannot write nano timestamps. */
  private def writeNanosFixture(dir: java.io.File): Unit = {
    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS)).named("ts")
      .required(PrimitiveTypeName.INT64).named("user_id")
      .required(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(PrimitiveTypeName.DOUBLE).named("value")
      .required(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val out = new Path(new java.io.File(dir, "events.parquet").toString)
    val writer = ExampleParquetWriter.builder(out).withConf(conf).build()
    val f = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, tsUs, uid, typ, v, props) =>
      writer.write(f.newGroup()
        .append("event_id", id)
        .append("ts", tsUs * 1000L) // nanos
        .append("user_id", uid)
        .append("event_type", typ)
        .append("value", v)
        .append("props", props))
    } finally writer.close()
  }

  /** events.parquet written by Spark with `ts` in the given SQL timestamp
    * type ("timestamp" → isAdjustedToUTC=true; "timestamp_ntz" → naive
    * timestamp[us], the driver's current encoding). */
  private def writeMicrosFixture(dir: java.io.File, sqlType: String): Unit =
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros($"ts_us").cast(sqlType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode("overwrite").parquet(new java.io.File(dir, "events.parquet").toString)

  private def mkFixture(write: java.io.File => Unit): String = {
    val dir = Files.createTempDirectory("ts-drift").toFile
    dir.deleteOnExit()
    write(dir)
    dir.toString
  }

  private lazy val nanosDir = mkFixture(writeNanosFixture)
  private lazy val ntzDir = mkFixture(writeMicrosFixture(_, "timestamp_ntz"))
  private lazy val utcDir = mkFixture(writeMicrosFixture(_, "timestamp"))

  private def envelope(dir: String): Seq[(Long, Long)] =
    EventFinders.queries("fs_tag_query")(spark, dir) // exercises the full envelope
      .select($"event_id", $"ts_us").as[(Long, Long)].collect().toSeq.sorted

  it("normalizes all three physical ts encodings to the same nanos LongType") {
    for (dir <- Seq(nanosDir, ntzDir, utcDir)) {
      val df = EventFinders.events(spark, dir)
      df.schema("ts").dataType shouldBe LongType
      val got = df.select($"event_id", $"ts").as[(Long, Long)].collect().sorted
      got shouldBe rows.map(r => (r._1, r._2 * 1000L)).sorted.toArray
    }
  }

  it("produces identical ts_us envelopes through every encoding") {
    val expected = envelope(nanosDir)
    envelope(ntzDir) shouldBe expected
    envelope(utcDir) shouldBe expected
    expected should not be empty
  }

  it("time-range semantics (half-open bounds) are encoding-independent") {
    def range(dir: String): Seq[Long] =
      EventFinders.queries("fs_time_range")(spark, dir)
        .select($"event_id").as[Long].collect().toSeq
    // [2024-01-05T00:00:00Z, 2024-01-08T00:00:00Z): rows 2,3,4 in; 1,5,6 out.
    range(nanosDir) shouldBe Seq(2L, 3L, 4L)
    range(ntzDir) shouldBe Seq(2L, 3L, 4L)
    range(utcDir) shouldBe Seq(2L, 3L, 4L)
  }
}
