package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared machinery for 64-bit fingerprint near-dup joins (SimHash over
  * text, average-hash over images, any future 64-bit sketch).
  *
  * The join is BANDED: the fingerprint's four 16-bit chunks are the LSH
  * bands — any equal chunk makes a candidate pair, then the exact Hamming
  * filter keeps real matches. By pigeonhole, any pair within Hamming 3
  * shares at least one intact chunk, so recall is exact for `maxHamming`
  * ≤ 3 (modulo the skew cap below). The shuffle carries (id, chunk) keys
  * only — never payloads — and a per-bucket cap bounds the worst-case
  * join fan-out: a chunk value shared by > `maxBucket` rows is boilerplate
  * (near-constant images, template text) and would contribute O(n²) pairs,
  * exactly the skew guard the MinHash and shingle joins use.
  */
object Fingerprints {

  /** Near-dup pairs among 64-bit fingerprints: band on the four 16-bit
    * chunks, cap hot buckets, exact `bit_count(xor)` filter. Output:
    * (a_id, b_id, hamming), a_id < b_id.
    */
  def hammingPairs64(sigs: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int, maxBucket: Int): DataFrame = {
    val banded = sigs.select(col(idCol).as("_id"), col(sigCol).as("_sig"),
      explode(array((0 until 4).map(b =>
        concat_ws(":", lit(b), conv(shiftright(col(sigCol), b * 16)
          .bitwiseAND(lit(0xFFFFL)), 10, 16))): _*)).as("band_key"))
    val bounded = banded.withColumn("bucket_n",
      count(lit(1)).over(Window.partitionBy(col("band_key"))))
      .filter(col("bucket_n") <= maxBucket)
    bounded.as("x").join(bounded.as("y"),
        col("x.band_key") === col("y.band_key") && col("x._id") < col("y._id"))
      .select(col("x._id").as("a_id"), col("y._id").as("b_id"),
        col("x._sig").as("sig_a"), col("y._sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }
}
