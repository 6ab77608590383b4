package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main: stage-by-stage timings of the heavy dedup /
  * similarity pipelines at a given SF dir. Not part of the driver contract.
  *
  *   sbt "runMain graft.tools.Profile /root/testdata/sf0.1"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = graft.Tables.documents(spark, sfDir)
    docs.count()

    // --- jaccardPairs decomposition -----------------------------------
    val da = time("shingleArrays materialize") {
      val x = graft.operators.Dedup.shingleArrays(docs).persist()
      x.count()
      x
    }
    println("  shingle rows: " + da.agg(sum(col("n_sh"))).head.getLong(0))
    val threshold = 0.8
    val prefix = da.select(col("doc_id"), explode(slice(col("arr"), lit(1),
      (col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1).cast("int")))
      .as("shingle"))
    val sh = da.select(col("doc_id"), explode(col("arr")).as("shingle"))
    time("prefix explode count")(println("  prefix rows: " + prefix.count()))
    time("full explode count")(println("  full rows: " + sh.count()))
    val cand = prefix.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
    time("candidates join (no distinct)")(println("  cand rows: " + cand.count()))
    val candD = cand.distinct()
    time("candidates distinct")(println("  cand distinct: " + candD.count()))
    val candP = candD.persist()
    candP.count()
    time("verifyPairs") {
      val sizes = da.select(col("doc_id"), col("n_sh"))
      val kept = candP
        .join(broadcast(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("pa"))), "doc_a")
        .join(broadcast(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("pb"))), "doc_b")
        .filter(least(col("pa"), col("pb")) >= lit(threshold) * greatest(col("pa"), col("pb")))
        .select(col("doc_a"), col("doc_b"))
      val v = kept
        .join(da.select(col("doc_id").as("doc_a"), col("arr").as("arr_a"), col("n_sh").as("na")), "doc_a")
        .join(da.select(col("doc_id").as("doc_b"), col("arr").as("arr_b"), col("n_sh").as("nb")), "doc_b")
        .withColumn("c", size(array_intersect(col("arr_a"), col("arr_b"))))
        .withColumn("jaccard", col("c") / (col("na") + col("nb") - col("c")))
        .filter(col("jaccard") >= threshold)
      println("  verified pairs: " + v.count())
    }
    // --- A/B: df-ascending (AllPairs) prefix vs plain slice prefix ----
    time("df-ordered prefix candidates") {
      import org.apache.spark.sql.expressions.Window
      val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("dfreq"))
      val pfx = sh.join(dfreq, "shingle")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("dfreq"), col("shingle"))))
        .join(da.select(col("doc_id"), col("n_sh")), "doc_id")
        .filter(col("rn") <=
          (col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1).cast("int"))
        .select(col("doc_id"), col("shingle"))
      val cand2 = pfx.as("a")
        .join(sh.hint("SHUFFLE_HASH").as("b"),
          col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") =!= col("b.doc_id"))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        .distinct()
      println("  df-prefix cand distinct: " + cand2.count())
    }
    time("jaccardPairs end-to-end") {
      println("  pairs: " + graft.operators.Dedup.jaccardPairs(docs, 0.8).count())
    }
    time("ccComponents end-to-end") {
      println("  rows: " + graft.queries.NorthStar.ccComponents(spark, sfDir).count())
    }
    // split the q64 cost: pairs (above) vs the iterative label loop alone
    val pairsCk = graft.operators.Dedup.jaccardPairs(docs, 0.8)
    pairsCk.count()
    time("ccComponents loop only (pairs precomputed)") {
      println("  rows: " + graft.operators.Dedup.connectedComponents(pairsCk).count())
    }
    time("corpusFunnel end-to-end") {
      println("  rows: " + graft.queries.NorthStar.corpusFunnel(spark, sfDir).count())
    }
    time("cosinePairs end-to-end") {
      println("  rows: " + graft.queries.NorthStar.cosinePairs(spark, sfDir).count())
    }
    time("annTopK end-to-end") {
      println("  rows: " + graft.queries.NorthStar.annTopK(spark, sfDir).count())
    }
    time("minhashLsh end-to-end") {
      println("  rows: " + graft.queries.NorthStar.minhashLsh(spark, sfDir).count())
    }
    spark.stop()
  }
}
