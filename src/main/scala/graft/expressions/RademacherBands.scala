package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** ENGINE-PORTABLE random-hyperplane LSH band keys — the oracle-carrying
  * twin of [[HyperplaneBands]] (same role the portable simhash family plays
  * for the production simhash kernel: the production path keeps its tuned
  * Gaussian planes and stays rows-only; this twin is replayable in ANY
  * engine, so the whole banding pipeline gets a full DuckDB oracle).
  *
  * Portability comes from two substitutions, each exactness-preserving:
  *
  *  1. '''Rademacher (±1) planes from a cross-engine hash''' instead of
  *     Gaussian planes from an internal PRNG: sign(b,j,i) = +1 iff the
  *     60-bit md5 hash (`portableHash60`) of `"plane:b:j:i"` is even.
  *     Sign-random-projection theory is indifferent to the component
  *     distribution (Rademacher and Gaussian give the same collision
  *     probability 1 − θ/π in expectation — Achlioptas 2001 sparse
  *     projections), and any engine with md5 regenerates identical planes:
  *     DuckDB as `('0x' || substr(md5(s), 1, 15))::BIGINT % 2`.
  *  2. '''Integer-quantized dot products''': each vector component is
  *     quantized once to `floor(x·10⁶ + 0.5)` as a long (the round6 image —
  *     both engines compute the identical double then the identical floor),
  *     so every per-bit dot is a ±sum of LONGS — exact in any engine and
  *     any accumulation order. No float-accumulation-order caveat survives:
  *     a band key can never differ by a last-bit sign flip.
  *
  * Key packing matches [[HyperplaneBands]]: band index in the high 16 bits,
  * sign bits below — different bands never collide in one join key.
  */
case class RademacherBands(child: Expression, dim: Int, bands: Int, bitsPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(bitsPerBand >= 1 && bitsPerBand <= 48,
    "bitsPerBand must be in [1,48]: the band index is packed into the high 16 bits")
  require(bands >= 1 && dim >= 1, "bands and dim must be positive")

  // Declared input type so analysis inserts the implicit element cast for
  // an array<double> argument (or fails loudly) — a blind getFloat walk
  // over 8-byte slots would otherwise produce well-formed garbage keys.
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // signs(b*bitsPerBand + j)(i) ∈ {+1, -1}, regenerated identically on every
  // executor from the md5 preimage — nothing is shipped.
  @transient private lazy val signs: Array[Array[Long]] = {
    val md = MessageDigest.getInstance("MD5")
    def hash60(s: String): Long = {
      md.reset()
      val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
      // first 15 hex chars = high 60 bits of the digest
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h >>> 4 // 64 bits read, keep the leading 60 (15 hex chars)
    }
    Array.tabulate(bands * bitsPerBand) { bj =>
      val b = bj / bitsPerBand
      val j = bj % bitsPerBand
      Array.tabulate(dim) { i =>
        if ((hash60(s"plane:$b:$j:$i") & 1L) == 0L) 1L else -1L
      }
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    // quantize once per row: the round6 image as a long
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = math.floor(v.getFloat(i).toDouble * 1000000.0 + 0.5).toLong
      i += 1
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < bitsPerBand) {
        val sgn = signs(b * bitsPerBand + j)
        var dot = 0L
        var k = 0
        while (k < n) { dot += q(k) * sgn(k); k += 1 }
        if (dot >= 0) key |= (1L << j)
        j += 1
      }
      keys(b) = (b.toLong << 48) | key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RademacherBands {
  def apply(vec: Column, dim: Int, bands: Int, bitsPerBand: Int): Column =
    ExpressionUtils.column(
      RademacherBands(ExpressionUtils.expression(vec), dim, bands, bitsPerBand))

  /** The DuckDB image of the plane signs: a `planes(b, j, i, sgn)` CTE body
    * for the given geometry — kept HERE so the Scala plane derivation and
    * its SQL replay can never drift apart. `i` is 0-based in the hash
    * preimage (matching the array walk above); the caller's SQL indexes
    * DuckDB lists 1-based, so it joins on `i + 1`. */
  def planesSql(dim: Int, bands: Int, bitsPerBand: Int): String =
    s"""SELECT b, j, i,
       |    CASE WHEN ('0x' || substr(md5('plane:' || b || ':' || j || ':' || i), 1, 15))::BIGINT % 2 = 0
       |         THEN 1 ELSE -1 END AS sgn
       |  FROM generate_series(0, ${bands - 1}) AS gb(b),
       |       generate_series(0, ${bitsPerBand - 1}) AS gj(j),
       |       generate_series(0, ${dim - 1}) AS gi(i)""".stripMargin
}
