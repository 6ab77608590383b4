package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: dissect the q267 serve-identity flake (round-16 session). */
object DebugQ267 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.ManifestTable
    import graft.operators.Similarity
    val emb = graft.Tables.embeddings(spark, d)
    val idxRoot = graft.queries.NorthStar.ivfAppendDir(d)
    val memDir = s"$idxRoot/members"
    val centDir = s"$idxRoot/centroids"
    val cellsDf = ManifestTable.read(spark, centDir)._2
    val cents = Similarity.centroidsOf(cellsDf)
    println("centroids: " + cents.map(_._1).mkString(","))
    val members = ManifestTable.read(spark, memDir)._2
    val rebuilt = Similarity.assignWithVec(emb, cents).localCheckpoint(true)
    println("members n=" + members.count() + " rebuilt n=" + rebuilt.count())
    println("members cid hist: " + members.groupBy("cid").count()
      .orderBy(col("cid")).collect().mkString(" "))
    println("rebuilt cid hist: " + rebuilt.groupBy("cid").count()
      .orderBy(col("cid")).collect().mkString(" "))
    def serve(idx: org.apache.spark.sql.DataFrame) = Similarity.ivfTopKWith(
      cellsDf.select(col("cid").as("label"), col("c").as("centroid")),
      idx.withColumnRenamed("cid", "label"), 0L, 10)
    println("serve(members):")
    serve(members).collect().foreach(println)
    println("serve(rebuilt):")
    serve(rebuilt).collect().foreach(println)
    // dissect the probe: query row + probed cells per arm
    def probe(idx: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val e2 = idx.withColumnRenamed("cid", "label")
      val q = e2.filter(col("vec_id") === 0L)
        .select(expr("transform(embedding, x -> cast(x as double))")
          .as("qv"))
        .withColumn("qnrm", sqrt(Similarity.dot(col("qv"), col("qv"))))
      println(s"$tag qrow: " + q.collect().map(r =>
        (r.getSeq[Double](0).take(4).mkString(","), r.getDouble(1)))
        .mkString(" | "))
      val cells = cellsDf.select(col("cid").as("label"),
        col("c").as("centroid"))
      val probed = cells.crossJoin(broadcast(q))
        .select(col("label"),
          (Similarity.dot(col("centroid"), col("qv")) /
            (sqrt(Similarity.dot(col("centroid"), col("centroid")))
              * col("qnrm"))).as("ccos"))
        .orderBy(col("ccos").desc, col("label"))
      println(s"$tag probed: " + probed.collect().take(5).mkString(" "))
    }
    probe(members, "members")
    probe(rebuilt, "rebuilt")
    // candidate scan: which half of the store does the serve-side join see?
    val probedCells = Seq(8L, 7L, 2L)
    val e2 = members.withColumnRenamed("cid", "label")
    val candRaw = e2.filter(col("vec_id") =!= 0L)
      .filter(col("label").isin(probedCells: _*))
    println("cand via isin: n=" + candRaw.count() + " odd=" +
      candRaw.filter(pmod(col("vec_id"), lit(2L)) === 1L).count())
    val probedDf = cellsDf.select(col("cid").as("label"))
      .filter(col("label").isin(probedCells: _*))
    val candFan = graft.operators.Par
      .fanOut(e2.filter(col("vec_id") =!= 0L))
      .join(broadcast(probedDf), "label")
    println("cand via fanOut+join: n=" + candFan.count() + " odd=" +
      candFan.filter(pmod(col("vec_id"), lit(2L)) === 1L).count())
    val candNoFan = e2.filter(col("vec_id") =!= 0L)
      .join(broadcast(probedDf), "label")
    println("cand no fanOut: n=" + candNoFan.count() + " odd=" +
      candNoFan.filter(pmod(col("vec_id"), lit(2L)) === 1L).count())
    spark.stop()
  }
}
