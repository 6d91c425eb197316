package graft.functions

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark
import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("withLangGuess rejects frames already carrying __lg_ columns") {
    val df = Seq(("the cat", 1L)).toDF("text", "__lg_ws")
    val e = intercept[IllegalArgumentException] {
      withLangGuess(df, "text", "lang")
    }
    assert(e.getMessage.contains("__lg_"))
  }

  test("native WordShingles is byte-identical to the composed HOF form") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("alpha", "beta", "g", "delta-x", "12", "a.b", "ümlaut")
    val random = (1 to 60).map(_ =>
      Seq.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .mkString(if (rnd.nextBoolean()) " " else "  "))
    val edges = Seq("", " ", "   ", "one", "one two", "one two three",
      "  leading", "trailing  ", "tab\tsep", "line\nbreak", "a \t b \n c",
      "exactly three words")
    for (k <- Seq(1, 2, 3, 5)) {
      val df = (random ++ edges).toDF("text").select(
        shingles(col("text"), k).as("native"),
        shinglesComposed(col("text"), k).as("composed"))
      val rows = df.as[(Seq[String], Seq[String])].collect()
      rows.zip(random ++ edges).foreach { case ((n, c), t) =>
        assert(n == c, s"k=$k text='${t.take(40)}'")
      }
    }
  }
}
