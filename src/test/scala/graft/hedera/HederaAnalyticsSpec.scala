package graft.hedera

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Analytics over the golden fixture rows (the queries the warehouse
  * serves): type decode via the 21-row broadcast dimension, transfer
  * explodes, net-flow rollups.
  */
class HederaAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private lazy val txns = {
    val raw = spark.read.text(getClass.getResource("/golden/transactions.jsonl").getPath)
    TransactionTransform.parse(raw)._1.cache()
  }

  test("type decode joins the seeded dimension (broadcast)") {
    val decoded = HederaAnalytics.withTypeName(spark, txns)
    val names = decoded.select("transactionTypeName").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSet
    assert(names === Set("CRYPTOUPDATEACCOUNT", "CRYPTOTRANSFER", "CRYPTODELETE",
      "CRYPTOCREATEACCOUNT", "FILEAPPEND", "FILECREATE"))
    val plan = decoded.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dimension join must broadcast")
  }

  test("daily type rollup aggregates fees") {
    val roll = HederaAnalytics.dailyTypeRollup(spark, txns)
    assert(roll.count() === 6) // six types, all on 2019-10-11
    val fees = roll.agg(sum("total_fee")).first().getLong(0)
    assert(fees === 923664L + 582570L + 35690537L + 40678442L + 557662870L + 648420149L)
  }

  test("transfer explode flattens all accountAmounts") {
    val flat = HederaAnalytics.explodedTransfers(txns)
    assert(flat.count() === 3 + 7 + 7 + 5 + 3 + 3)
    // each transaction's transfers net to zero (conservation)
    val nets = flat.groupBy("consensusTimestamp").agg(sum("amount").as("net"))
      .filter(col("net") =!= 0)
    assert(nets.count() === 0)
  }

  test("account net flow conserves and splits credit/debit") {
    val flow = HederaAnalytics.accountNetFlow(txns)
    val total = flow.agg(sum("net_amount")).first().getLong(0)
    assert(total === 0L)
    val node3 = flow.filter(col("accountNum") === 3).first()
    assert(node3.getAs[Long]("credited") > 0)
    assert(node3.getAs[Long]("debited") === 0L)
  }

  test("entity activity covers rows with entity set") {
    val act = HederaAnalytics.entityActivity(txns)
    assert(act.count() === 4) // 5 rows have entity, two share 111155
    assert(act.filter(col("entityNum") === 111155).first().getAs[Long]("n_txns") === 2)
  }
}
