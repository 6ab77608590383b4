package graft.sources

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.v2.{WarehouseBatchWrite, WarehouseCommitMessage, WarehouseSink, WarehouseWriterFactory}

class WarehouseSinkSpec extends SparkSpec {
  private val fmt = "graft.sources.v2.WarehouseSink"

  private def tmpDir(): String =
    Files.createTempDirectory("whsink").toString

  test("append write round-trips rows through JSON lines") {
    import spark.implicits._
    val dir = tmpDir()
    val df = Seq(
      ("AAPL", "2025-10-05", 255.5, 1000L),
      ("MSFT", "2025-10-05", 420.25, 2000L),
      ("GO\"O\nG", "2025-10-06", 199.0, 3000L) // escaping survives
    ).toDF("symbol", "date", "close", "volume")
      .withColumn("date", to_date($"date"))
    df.write.format(fmt).option("path", dir).mode("append").save()

    val back = spark.read
      .schema("symbol STRING, date DATE, close DOUBLE, volume BIGINT")
      .json(s"$dir/part-*.json")
    assert(back.count() == 3)
    assert(back.as[(String, java.sql.Date, Double, Long)].collect().toSet ==
      df.as[(String, java.sql.Date, Double, Long)].collect().toSet)
    // staging swept, commit marker present
    assert(!new File(dir, "_staging").exists())
    assert(new File(dir).listFiles().exists(_.getName.startsWith("_committed-")))
  }

  test("overwrite truncates previously committed files; append stacks") {
    import spark.implicits._
    val dir = tmpDir()
    def write(sym: String, mode: String): Unit =
      Seq((sym, 1.0)).toDF("symbol", "close")
        .write.format(fmt).option("path", dir).mode(mode).save()
    write("A", "append")
    write("B", "append")
    val schema = "symbol STRING, close DOUBLE"
    assert(spark.read.schema(schema).json(s"$dir/part-*.json").count() == 2)
    write("C", "overwrite")
    val after = spark.read.schema(schema).json(s"$dir/part-*.json")
    assert(after.select("symbol").as[String].collect().toSeq == Seq("C"))
  }

  test("losing task attempts are swept; only committed attempts land") {
    val dir = tmpDir()
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    val write = new WarehouseBatchWrite(dir, schema, "q-test-1", truncate = false)
    val factory = write.createBatchWriterFactory(null)
      .asInstanceOf[WarehouseWriterFactory]
    def internalRow(k: String, v: Long) =
      org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(k), v)
    // two attempts of partition 0 (a retry/speculation race): both stage,
    // only attempt 7's commit message is delivered
    val loser = factory.createWriter(0, taskId = 3)
    loser.write(internalRow("stale", 1L))
    val loserMsg = loser.commit()
    val winner = factory.createWriter(0, taskId = 7)
    winner.write(internalRow("fresh", 2L))
    val winnerMsg = winner.commit()
    write.commit(Array(winnerMsg))
    val files = new File(dir).listFiles().filter(_.getName.startsWith("part-"))
    assert(files.length == 1, files.mkString(","))
    val content = new String(Files.readAllBytes(files.head.toPath))
    assert(content.contains("fresh") && !content.contains("stale"))
    assert(!new File(dir, "_staging").exists()) // loser's file swept
    assert(loserMsg.asInstanceOf[WarehouseCommitMessage].partitionId == 0)
  }

  test("re-delivered driver commit of the same queryId is a no-op") {
    val dir = tmpDir()
    val schema = StructType(Seq(StructField("k", StringType)))
    def freshWrite() = new WarehouseBatchWrite(dir, schema, "q-idem", truncate = false)
    def stageAndMessage(w: WarehouseBatchWrite, tid: Long) = {
      val f = w.createBatchWriterFactory(null).asInstanceOf[WarehouseWriterFactory]
      val writer = f.createWriter(0, tid)
      writer.write(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString("once")))
      writer.commit()
    }
    val w1 = freshWrite()
    val m1 = stageAndMessage(w1, 1)
    w1.commit(Array(m1))
    // a re-delivered commit for the SAME logical write stages new attempt
    // files but must not land them (marker short-circuits)
    val w2 = freshWrite()
    stageAndMessage(w2, 2)
    val m2dup = stageAndMessage(w2, 3)
    w2.commit(Array(m2dup))
    val files = new File(dir).listFiles().filter(_.getName.startsWith("part-"))
    assert(files.length == 1, files.mkString(","))
    assert(!new File(dir, "_staging").exists())
  }
}
