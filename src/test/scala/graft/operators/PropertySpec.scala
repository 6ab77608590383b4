package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

import graft.SparkSpec

/** Property-based invariants (SURVEY.md §5.2 item 3), run by sbt's native
  * ScalaCheck framework. Row sets are small — the properties target
  * algebraic laws, not volume. */
object PropertySpec extends Properties("graft.operators") {
  private lazy val spark = SparkSpec.session

  private val kvRows = Gen.listOfN(12,
    Gen.zip(Gen.chooseNum(1L, 6L), Gen.alphaLowerStr.map(_.take(4))))

  property("upsertIgnore idempotent + key-complete") =
    Prop.forAllNoShrink(kvRows, kvRows) { (existingRows, incomingRows) =>
      import spark.implicits._
      val existing = existingRows.toDF("k", "v").dropDuplicates("k")
      val incoming = incomingRows.toDF("k", "v")
      val once = Upsert.upsertIgnore(incoming, existing, Seq("k"))
      val twice = Upsert.upsertIgnore(incoming, once, Seq("k"))
      val onceKeys = once.select("k").as[Long].collect().sorted.toSeq
      val unionKeys = (existingRows.map(_._1) ++ incomingRows.map(_._1))
        .distinct.sorted
      (twice.count() == once.count()) && (onceKeys == unionKeys)
    }

  property("union commutative up to row order") =
    Prop.forAllNoShrink(kvRows, kvRows) { (a, b) =>
      import spark.implicits._
      val da = a.toDF("k", "v")
      val db = b.toDF("k", "v")
      val ab = da.union(db).collect().map(_.toString).sorted.toSeq
      val ba = db.union(da).collect().map(_.toString).sorted.toSeq
      ab == ba
    }

  private val texts = Gen.listOfN(5, Gen.nonEmptyListOf(
    Gen.oneOf("alpha", "beta", "gamma", "delta")).map(_.mkString(" ")))

  property("explode(split) round-trips token multisets") =
    Prop.forAllNoShrink(texts) { rows =>
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val got = df
        .select($"id", explode(split($"text", " ")).as("tok"))
        .groupBy($"id").agg(collect_list($"tok").as("toks"))
        .as[(Long, Seq[String])].collect()
        .map { case (id, ts) => id -> ts.sorted }.toMap
      val want = rows.zipWithIndex
        .map { case (t, i) => i.toLong -> t.split(" ").sorted.toSeq }.toMap
      got == want
    }
}
