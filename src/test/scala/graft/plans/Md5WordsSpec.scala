package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Md5Words]] contract: word j of the digest == the built-in chain
  * conv(substring(md5(s), 8j+1, 8), 16, 10) — the equivalence that
  * lets the DuckDB oracle replay bootstrap draws against the plain
  * hex form while the engine skips the hex render/parse. */
class Md5WordsSpec extends SparkSpec {

  test("words == conv(substring(md5, 8j+1, 8), 16, 10) for all four " +
      "words over varied inputs, codegen and interpreted") {
    import spark.implicits._
    val df = spark.range(2000)
      .select(concat($"id".cast("string"), lit(":"),
        ($"id" % 7).cast("string")).as("s"))
    val got = df.select($"s",
        posexplode(HashExpressions.md5_words($"s")).as(Seq("j", "w")))
      .withColumn("ref",
        conv(substring(md5($"s"), $"j".cast("int") * 8 + 1, lit(8)),
          16, 10).cast("long"))
    assert(got.count() == 8000)
    assert(got.filter($"w" =!= $"ref" || $"w".isNull).count() == 0)
    // interpreted path (nullSafeEval) agrees with codegen
    val s = "4711:3"
    val interp = Md5WordsUtil.words(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    val viaSql = df.sparkSession.sql(
      s"""SELECT cast(conv(substring(md5('$s'), 1, 8), 16, 10) as bigint),
         |  cast(conv(substring(md5('$s'), 9, 8), 16, 10) as bigint),
         |  cast(conv(substring(md5('$s'), 17, 8), 16, 10) as bigint),
         |  cast(conv(substring(md5('$s'), 25, 8), 16, 10) as bigint)
         |""".stripMargin).head()
    assert((0 to 3).forall(j => interp.getLong(j) == viaSql.getLong(j)))
    // null in → null out
    val n = Seq[Option[String]](None).toDF("s")
      .select(HashExpressions.md5_words($"s").as("w"))
    assert(n.filter($"w".isNull).count() == 1)
  }
}
