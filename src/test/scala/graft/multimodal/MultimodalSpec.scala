package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("blob table carries payload bytes + typed metadata") {
    val docs = Tables.load(spark, GraftTestSpark.sfDir, "documents")
    val blobs = Multimodal.toBlobTable(docs, "doc_id", "text")
    assert(blobs.schema.fieldNames.toSeq === Seq("id", "payload", "mime", "n_bytes"))
    val r = blobs.filter(col("id") === 0).first()
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8").startsWith("the fast"))
    assert(r.getAs[Long]("n_bytes") === r.getAs[Array[Byte]]("payload").length.toLong)
  }

  test("feature extraction is distributed, deterministic, and complete") {
    val docs = Tables.load(spark, GraftTestSpark.sfDir, "documents")
    val feats = Multimodal.featureTable(spark, docs).cache()
    assert(feats.count() === docs.count())
    val a = feats.orderBy("id").limit(5).collect().toSeq
    val b = Multimodal.featureTable(spark, docs.repartition(7)).orderBy("id").limit(5).collect().toSeq
    assert(a.toString === b.toString) // partitioning must not change features
    val r = feats.filter(col("id") === 0).first()
    assert(r.getAs[Double]("mean_byte") > 0)
    assert(r.getAs[String]("head_hex").length === 8)
    assert(r.getAs[Int]("frames_sampled") === 4)
  }

  test("frame sampling offsets are even and bounded") {
    assert(Multimodal.sampleOffsets(100, 4) === Seq(0, 25, 50, 75))
    assert(Multimodal.sampleOffsets(3, 4).forall(_ < 3))
    assert(Multimodal.sampleOffsets(0, 4) === Seq.empty)
  }
}
