package graft.hedera

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Golden-file test of the ingest transform, following the reference's own
  * test design (TransactionJsonToTableRowTest.java:36-62): the 6 fixture
  * transactions (src/test/resources/golden/transactions.jsonl, copied from
  * hedera-etl-bigquery/src/test/resources/data/TransactionJsonToTableRowTest/
  * transactions.txt) must parse with schema-unknown fields dropped and
  * quoted/unquoted int64s both accepted; malformed JSON must land in the
  * errors output, not throw.
  */
class TransactionTransformSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private lazy val fixturePath =
    getClass.getResource("/golden/transactions.jsonl").getPath

  private lazy val parsed = {
    val raw = spark.read.text(fixturePath)
    TransactionTransform.parse(raw)
  }

  test("all six golden rows parse, none error") {
    val (typed, bad) = parsed
    assert(typed.count() === 6)
    assert(bad.count() === 0)
  }

  test("schema matches the canonical table schema") {
    val (typed, _) = parsed
    assert(typed.schema === TransactionSchema.table)
  }

  test("nanosecond key survives; truncated timestamp floors to micros") {
    val (typed, _) = parsed
    val row = typed.filter(col("consensusTimestamp") === 1570802944412586000L)
      .select(col("consensusTimestamp"),
        unix_micros(col("consensusTimestampTruncated")).as("us"),
        date_format(col("day"), "yyyy-MM-dd").as("day"))
      .first()
    assert(row.getLong(0) === 1570802944412586000L)
    assert(row.getLong(1) === 1570802944412586L) // floor(ns/1000)
    assert(row.getString(2) === "2019-10-11")
  }

  test("quoted int64s parse (transactionFee, validDuration)") {
    val (typed, _) = parsed
    val row = typed.filter(col("consensusTimestamp") === 1570802944412586000L)
      .select(col("transaction.body.transactionFee"),
        col("transaction.body.transactionValidDuration.seconds"),
        col("transaction.body.memo")).first()
    assert(row.getLong(0) === 500000000L)
    assert(row.getLong(1) === 30L)
    assert(row.getString(2) === "Update Account")
  }

  test("repeated records: 7-element transferList + nonFeeTransfers") {
    val (typed, _) = parsed
    val row = typed.filter(col("consensusTimestamp") === 1570800807612881001L)
      .select(size(col("transactionRecord.transferList.accountAmounts")),
        size(col("nonFeeTransfers")),
        col("transactionRecord.transferList.accountAmounts")(0).getField("amount"))
      .first()
    assert(row.getInt(0) === 7)
    assert(row.getInt(1) === 2)
    assert(row.getLong(2) === -580042L)
  }

  test("optional entity struct: present and absent") {
    val (typed, _) = parsed
    assert(typed.filter(col("entity").isNull).count() === 1) // line 2 has no entity
    val e = typed.filter(col("consensusTimestamp") === 1570802944412586000L)
      .select(col("entity.entityNum")).first()
    assert(e.getLong(0) === 111165L)
  }

  test("BYTES fields decode from base64 to binary") {
    val (typed, _) = parsed
    val hash = typed.filter(col("consensusTimestamp") === 1570802944412586000L)
      .select(col("transactionRecord.transactionHash")).first().getAs[Array[Byte]](0)
    assert(hash.length === 48) // 64 base64 chars -> 48 bytes
  }

  test("receipt status + file contents land (FILECREATE row)") {
    val (typed, _) = parsed
    val row = typed.filter(col("transactionType") === 17)
      .select(col("transactionRecord.receipt.status"),
        length(col("transaction.body.fileCreate.contents"))).first()
    assert(row.getString(0) === "SUCCESS")
    assert(row.getInt(1) > 1000)
  }

  test("malformed JSON goes to errors, not an exception") {
    import spark.implicits._
    val raw = Seq(
      """{"consensusTimestamp":1,"transactionType":14}""",
      """{"consensusTimestamp": 157080""", // truncated (reference error case)
      """not json at all""",
      """{"transactionType":14}""" // missing key
    ).toDF("value")
    val (typed, bad) = TransactionTransform.parse(raw)
    assert(typed.count() === 1)
    assert(bad.count() === 3)
    assert(bad.columns.toSeq === Seq("tableRow", "errors"))
  }

  test("error rows distinguish malformed / missing-key / cast-failure causes") {
    // BigQueryErrorsSink.java:67-90 parity: the dead letter carries the
    // actual per-row failure, not one generic message.
    import spark.implicits._
    val raw = Seq(
      """not json at all""",                                  // malformed
      """{"transactionType":14}""",                           // missing key
      """{"consensusTimestamp":"not-a-number"}""",            // cast failure
      """{"consensusTimestamp":"9","transactionType":14}"""   // quoted ok → typed
    ).toDF("value")
    val (typed, bad) = TransactionTransform.parse(raw)
    assert(typed.count() === 1)
    val errs = bad.select("tableRow", "errors").as[(String, String)].collect().toMap
    assert(errs("not json at all").contains("Unable to parse transaction json"))
    assert(errs("""{"transactionType":14}""")
      .contains("Missing required field: consensusTimestamp"))
    assert(errs("""{"consensusTimestamp":"not-a-number"}""")
      .contains("Invalid int64 for consensusTimestamp: not-a-number"))
    // the payload is a valid JSON array of {reason, message}
    errs.values.foreach { e =>
      assert(e.startsWith("""[{"reason":"invalid""""), e)
    }
  }

  test("a row corrupt only under the full schema still dead-letters") {
    // scalar where the schema expects a nested struct: the key parses fine,
    // so a reduced-schema error check would misclassify this row as ok and
    // drop it from BOTH tables
    import spark.implicits._
    val raw = Seq("""{"consensusTimestamp":5,"transaction":"not-a-struct"}""").toDF("value")
    val (typed, bad) = TransactionTransform.parse(raw)
    val nTyped = typed.count()
    val nBad = bad.count()
    assert(nTyped + nBad === 1, "the row must land in exactly one table")
    assert(nTyped === 0, "full-schema corruption must reject the row")
  }

  test("ingest batch never drops a row: fact + errors partition the input") {
    import spark.implicits._
    val base = GraftTestSpark.tmpDir("ingest-partition")
    Seq(
      """{"consensusTimestamp":1,"transactionType":14}""",
      """{"consensusTimestamp":2,"transaction":"not-a-struct"}""", // full-schema corrupt
      """not json"""
    ).toDF("value").coalesce(1).write.text(s"$base/in")
    val table = new TransactionsTable(spark, s"$base/t")
    val errors = new ErrorsTable(spark, s"$base/e")
    val (ok, nBad) = new IngestPipeline(spark, table, errors).ingestBatch(s"$base/in")
    assert(ok + nBad === 3)
    assert(table.read().count() === ok)
    assert(errors.read().count() === nBad, "every rejected row must be dead-lettered")
  }

  test("a cast-failing key never lands a null-identity row in the fact table") {
    import spark.implicits._
    val raw = Seq("""{"consensusTimestamp":"oops","transactionType":3}""").toDF("value")
    val (typed, bad) = TransactionTransform.parse(raw)
    assert(typed.count() === 0)
    assert(bad.count() === 1)
  }
}
