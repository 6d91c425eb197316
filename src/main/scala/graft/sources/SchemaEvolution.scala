package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types._

/** Physical-schema drift normalization for the warehouse tables.
  *
  * A table that lives for years accretes physical-schema drift: writers
  * upgrade, int32 ids widen to int64, a timestamp's parquet logical type
  * flips between NANOS / MICROS / NTZ, new columns appear. The round-6
  * incident is the motivating case: the events table's `ts` silently
  * changed physical type across a testdata regeneration and every
  * long-math time query went wrong AT ONCE — the failure mode this layer
  * exists to turn into either (a) an invisible, lossless normalization or
  * (b) one loud, named error at the scan.
  *
  * Policy (per canonical column):
  *  - exact type match → pass through;
  *  - lossless widening (int8/16/32 → int64-or-int32 targets wide enough,
  *    float32 → float64, int ≤32-bit → float64, date/NTZ-timestamp →
  *    session-UTC timestamp) → cast silently (values are provably
  *    preserved; the session timezone is pinned UTC by GraftSession so
  *    NTZ→LTZ is epoch-exact);
  *  - LOSSY or incompatible drift (int64 → int32, double → float, string
  *    where a number is expected, …) → throw with table.column + found +
  *    expected. Silent value drift is the one unrecoverable failure for a
  *    correctness-gated engine: results would change while every job
  *    still "succeeds". A deliberate canonical-type upgrade is a one-line
  *    change HERE, reviewed, not an accident at the scan;
  *  - missing canonical column → throw (same reasoning);
  *  - EXTRA physical columns → preserved, appended after the canonical
  *    ones (additive producer evolution must never break consumers).
  *
  * At 100 TB this runs per-scan as pure projection arithmetic — the casts
  * are codegen'd column expressions; pushdown/pruning still reach the
  * parquet scan below them (asserted by PlanShapeSpec's pushdown checks,
  * which run through Tables.load).
  */
object SchemaEvolution {

  /** Canonical logical schema per table — what every operator in the
    * engine is written against. Reference: hedera-etl pins its BigQuery
    * schema the same way (transactions.json schema file) and lets the
    * load job fail loudly on drift rather than coerce. */
  val canonical: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    // events.ts: canonical ns-long (the identity/ordering key — see
    // Tables.normalizeEventTime's scaladoc); handled by tsNs below.
    "events" -> Seq("event_id" -> LongType, "ts" -> LongType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  def normalize(table: String, df: DataFrame): DataFrame =
    canonical.get(table) match {
      case None => df // unknown table: no contract to enforce
      case Some(cols) =>
        val physical = df.schema.fields.map(f => f.name -> f.dataType).toMap
        val canonNames = cols.map(_._1).toSet
        val projected: Seq[Column] = cols.map { case (name, want) =>
          physical.get(name) match {
            case None => fail(table, name, "MISSING", want)
            case Some(have) =>
              coerce(table, name, col(name), have, want).as(name)
          }
        }
        val extras = df.schema.fields.collect {
          case f if !canonNames(f.name) => col(f.name)
        }.toSeq
        df.select(projected ++ extras: _*)
    }

  /** Per-column rules that go beyond generic widening — declared NEXT TO
    * the canonical schema they belong to, not as special cases inside the
    * shared cast engine. A new ns-long event-time column (another table,
    * a second timestamp) gets its own one-line entry here.
    *
    * events.ts: the generator has shipped the event time as TIMESTAMP
    * NANOS (read as a ns long via nanosAsLong), TIMESTAMP MICROS, and
    * TIMESTAMP NTZ across regenerations; all normalize to the canonical
    * ns long. The NTZ→LTZ hop is epoch-exact under the pinned-UTC
    * session. */
  private val columnRules: Map[(String, String), PartialFunction[DataType, Column => Column]] =
    Map(
      ("events", "ts") -> {
        case TimestampNTZType => c => unix_micros(c.cast(TimestampType)) * 1000L
        case TimestampType => c => unix_micros(c) * 1000L
      })

  /** Lossless-or-loud cast from the physical `have` to canonical `want`. */
  private def coerce(table: String, name: String, c: Column,
      have: DataType, want: DataType): Column =
    if (have == want) c
    else columnRules.get((table, name)).flatMap(_.lift(have)) match {
      case Some(rule) => rule(c)
      case None => (have, want) match {
        // Scalar widenings (provably lossless — see losslessWiden).
        case (h, w) if losslessWiden(h, w) => c.cast(w)
        // Array element drift: same widening policy elementwise (the
        // nullable flag alone never rejects — parquet writers disagree
        // on it freely).
        case (ArrayType(he, _), ArrayType(we, _))
            if he == we || losslessWiden(he, we) => c.cast(ArrayType(we))
        case _ => fail(table, name, have.simpleString, want)
      }
    }

  /** Widening casts whose value preservation is provable: integral
    * size-up, float32→float64, ≤32-bit integral→float64 (double holds all
    * int32 exactly), and calendar type-ups under the pinned-UTC session. */
  private def intBytes(t: DataType): Option[Int] = t match {
    case ByteType => Some(1)
    case ShortType => Some(2)
    case IntegerType => Some(4)
    case LongType => Some(8)
    case _ => None
  }

  private def losslessWiden(have: DataType, want: DataType): Boolean =
    (have, want) match {
      case (FloatType, DoubleType) => true
      case (h, DoubleType) if intBytes(h).exists(_ <= 4) => true
      case (TimestampNTZType, TimestampType) => true
      case (DateType, TimestampType) => true
      case (h, w) =>
        (intBytes(h), intBytes(w)) match {
          case (Some(hb), Some(wb)) => hb <= wb
          case _ => false
        }
    }

  private def fail(table: String, name: String, have: String,
      want: DataType): Nothing =
    throw new IllegalStateException(
      s"schema drift on $table.$name: physical type $have cannot be " +
        s"losslessly normalized to canonical ${want.simpleString}. " +
        "If the producer schema legitimately changed, upgrade " +
        "SchemaEvolution.canonical deliberately (one reviewed line), " +
        "never coerce lossily at the scan.")
}
