package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}
import graft.functions.VectorFunctions.cosine

/** Product quantization: encode/ADC invariants and recall vs the exact
  * cosine baseline (e_cosine_topk's shape). Exactness of the ADC pipeline
  * itself is byte-checked by the e_pq_topk DuckDB oracle; this spec pins
  * the APPROXIMATION quality and the two-stage rerank contract that the
  * oracle cannot express.
  */
class ProductQuantizerSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.load(spark, GraftTestSpark.sfDir, "embeddings")
    .select(col("vec_id"), col("embedding")).cache()

  private val cfg = ProductQuantizer.Config()

  private def exactTopK(queryId: Long, k: Int): Seq[Long] = {
    val q = emb.filter(col("vec_id") === queryId).select(col("embedding").as("qv"))
    emb.filter(col("vec_id") =!= queryId).crossJoin(broadcast(q))
      .select(col("vec_id"),
        graft.operators.RelationalOps.round6(cosine(col("embedding"), col("qv"))).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(k)
      .select(col("vec_id")).as[Long].collect().toSeq
  }

  test("native SubspaceKernel ≡ composed fold, bit-for-bit (both modes, every j)") {
    // the oracle-safety contract for the fused kernel: identical doubles,
    // not just identical rounded scores (the r5 CosineSimilarity rule)
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("va"))
      .crossJoin(emb.limit(3).select(col("embedding").as("vb")))
      .crossJoin(spark.range(cfg.m.toLong).select(col("id").cast("int").as("j")))
    val checked = pairs.select(
        graft.expressions.SubspaceKernel.l2(col("va"), col("vb"), col("j"), cfg.subDim).as("nl2"),
        ProductQuantizer.subL2Composed(col("va"), col("vb"), col("j"), cfg.subDim).as("cl2"),
        graft.expressions.SubspaceKernel.dot(col("va"), col("vb"), col("j"), cfg.subDim).as("nd"),
        ProductQuantizer.subDotComposed(col("va"), col("vb"), col("j"), cfg.subDim).as("cd"))
      .filter(col("nl2") =!= col("cl2") || col("nd") =!= col("cd"))
      .count()
    assert(checked === 0, "native kernel must equal the composed fold bit-for-bit")
  }

  test("encode emits exactly m codes per vector, all from the seed set") {
    val codes = ProductQuantizer.encode(emb, "vec_id", "embedding", cfg)
    val n = emb.count()
    assert(codes.count() === n * cfg.m)
    val perVec = codes.groupBy(col("vec_id")).agg(count(lit(1)).as("c"))
      .filter(col("c") =!= cfg.m).count()
    assert(perVec === 0)
    val codeIds = codes.select(col("code_id")).distinct().as[Long].collect().toSet
    assert(codeIds.size <= cfg.nCodes)
  }

  test("rerank recall@10 beats plain ADC recall and clears the floor") {
    val k = 10
    val exact = exactTopK(0L, k).toSet
    val plain = ProductQuantizer.pqTopK(emb, "vec_id", "embedding", 0L, k, cfg)
      .select(col("vec_id")).as[Long].collect().toSet
    val reranked = ProductQuantizer
      .pqTopKReranked(emb, "vec_id", "embedding", 0L, k, shortlist = 128, cfg)
      .select(col("vec_id")).as[Long].collect().toSet
    val rPlain = (plain & exact).size.toDouble / k
    val rRerank = (reranked & exact).size.toDouble / k
    info(f"recall@10: plain ADC $rPlain%.2f, shortlist-128 rerank $rRerank%.2f")
    assert(rRerank >= rPlain,
      "exact rerank of the ADC shortlist must not lose recall vs plain ADC")
    assert(rRerank >= 0.5,
      f"rerank recall@10 $rRerank%.2f below floor — codebooks degenerate?")
  }

  test("ivf-pq results live in the probed cells and recall clears the floor") {
    val k = 10
    val ivfpq = ProductQuantizer.ivfPqTopK(emb, "vec_id", "embedding", 0L, k)
      .select("vec_id").as[Long].collect().toSet
    assert(ivfpq.size === k)
    // subset contract: every result sits in one of the query's 4 nearest cells
    val cells = SemDedup.assignCells(emb, "vec_id", "embedding", 16)
      .select(col("vec_id").cast("long"), col("cell_id")).as[(Long, Long)]
      .collect().toMap
    val probed = {
      val qCell = Set(cells(0L)) // the query's own cell is its nearest
      ivfpq.map(cells).diff(qCell)
    }
    assert(probed.size <= 3, s"results span >4 cells: ${ivfpq.map(cells)}")
    // recall floor vs the exact baseline: pruning + ADC quantization may
    // drop true neighbors, but on sf0.001 it must keep a useful fraction
    val exact = exactTopK(0L, k).toSet
    val recall = (ivfpq & exact).size.toDouble / k
    assert(recall >= 0.3, s"ivf-pq recall=$recall")
  }

  test("rerank scores ARE the exact cosines, ranked densely") {
    val got = ProductQuantizer
      .pqTopKReranked(emb, "vec_id", "embedding", 0L, 5, shortlist = 64, cfg)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got.map(_._3) === (1L to got.size.toLong))
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
    val exactScores = emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        graft.operators.RelationalOps.round6(cosine(col("embedding"), col("qv"))).as("s"))
      .as[(Long, Double)].collect().toMap
    got.foreach { case (id, s, _) =>
      assert(s === exactScores(id), s"rerank score for $id must be the exact cosine")
    }
    // descending with id tiebreak
    assert(got.map(r => (-r._2, r._1)) === got.map(r => (-r._2, r._1)).sorted)
  }

  test("a larger shortlist never hurts recall (monotone contract)") {
    val k = 10
    val exact = exactTopK(0L, k).toSet
    val r = Seq(32, 128, 512).map { s =>
      val ids = ProductQuantizer
        .pqTopKReranked(emb, "vec_id", "embedding", 0L, k, shortlist = s, cfg)
        .select(col("vec_id")).as[Long].collect().toSet
      (ids & exact).size
    }
    assert(r === r.sorted, s"recall must be monotone in shortlist size, got $r")
  }
}
