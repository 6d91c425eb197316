package graft.hedera

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The T of the ETL: raw JSON line → typed nested row + derived columns,
  * with a dead-letter split. Mirrors the semantics of the reference's
  * TransactionJsonToTableRow (hedera-etl-bigquery/src/main/java/com/hedera/
  * etl/TransactionJsonToTableRow.java:52-66) + BigQueryErrorsSink error rows
  * (BigQueryErrorsSink.java:67-90):
  *
  *  - int64s arrive both quoted and unquoted (the protobuf-JSON convention —
  *    see the reference fixture transactions.txt): parse with a string-leaf
  *    image of the schema, then cast leaf-by-leaf (`castToSchema`), which
  *    accepts both forms exactly as BigQuery ingest does.
  *  - unknown fields (sigMap, exchangeRate, generateRecord, …) are silently
  *    dropped (`ignoreUnknownValues` parity, PubSubToBigQueryPipeline.java:46)
  *    — from_json keeps only schema fields.
  *  - BYTES fields are base64 → `unbase64` to BinaryType.
  *  - derived: consensusTimestampTruncated = µs-floor of the ns long
  *    (TransactionJsonToTableRow.java:57-58); day = its DATE (the write
  *    partition column); dedupe flag = null.
  *  - malformed JSON / missing key → errors DataFrame {tableRow, errors}
  *    (errors-schema.json parity), never dropped.
  */
object TransactionTransform {

  /** Leaf-stringified image of a schema (structure kept, scalars → string):
    * the lenient parse target. */
  def stringified(dt: DataType): DataType = dt match {
    case StructType(fields) =>
      StructType(fields.map(f => f.copy(dataType = stringified(f.dataType))))
    case ArrayType(elem, n) => ArrayType(stringified(elem), n)
    case _ => StringType
  }

  /** Recursive cast from the stringified parse to the target schema. Null
    * structs stay null (a bare `struct(children)` would resurrect them as
    * structs-of-nulls). */
  def castToSchema(c: Column, dt: DataType): Column = dt match {
    case StructType(fields) =>
      when(c.isNull, lit(null).cast(dt)).otherwise(
        struct(fields.map(f => castToSchema(c.getField(f.name), f.dataType).as(f.name)): _*))
    case ArrayType(elem, _) => transform(c, x => castToSchema(x, elem))
    case BinaryType => unbase64(c)
    case _ => c.cast(dt)
  }

  private val parsedSchema: StructType =
    stringified(TransactionSchema.payload).asInstanceOf[StructType]
      .add("_corrupt", StringType)

  /** Lenient parse stage: raw `value` + parsed struct `j`. Callers that
    * consume both the typed and error branches should cache THIS frame so
    * the (expensive) from_json runs once, not once per branch. */
  def parseRaw(raw: DataFrame): DataFrame =
    raw.select(
      col("value"),
      from_json(col("value"), parsedSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")).as("j"))

  private def okPredicate =
    col("j").isNotNull && col("j._corrupt").isNull && col("j.consensusTimestamp").isNotNull

  /** Typed branch of a parsed frame. */
  def typedRows(parsed: DataFrame): DataFrame =
    parsed.filter(okPredicate)
      .select(castToSchema(col("j").dropFields("_corrupt"), TransactionSchema.payload).as("t"))
      .select(col("t.*"))
      .withColumn("consensusTimestampTruncated",
        timestamp_micros(expr("consensusTimestamp div 1000")))
      .withColumn("dedupe", lit(null).cast(LongType))
      .withColumn("day", to_date(col("consensusTimestampTruncated")))
      .select(TransactionSchema.table.fieldNames.map(col): _*)

  /** Dead-letter branch of a parsed frame (errors-schema.json shape). */
  def errorRows(parsed: DataFrame): DataFrame =
    parsed.filter(!okPredicate)
      .select(col("value").as("tableRow"),
        lit("""[{"reason":"invalid","message":"Unable to parse transaction json"}]""").as("errors"))

  /** Raw lines (`value` string column) → (typed rows, error rows). */
  def parse(raw: DataFrame): (DataFrame, DataFrame) = {
    val parsed = parseRaw(raw)
    (typedRows(parsed), errorRows(parsed))
  }
}
