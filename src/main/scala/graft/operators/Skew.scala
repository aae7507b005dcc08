package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join split handles sort-merge
  * skew at runtime; explicit salting is the static alternative when a
  * hot key would overwhelm a single task (the classic 100 TB failure
  * mode: one customer/doc bucket holds 1% of the data).
  */
object Skew {

  /** Equi-join `fact` (skewed side) with `dim` on `key`, splitting
    * each fact key across `saltBuckets` reducers: fact rows get a
    * deterministic per-row salt, dim rows are replicated once per
    * bucket. Result equals fact.join(dim, key) exactly.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, saltBuckets: Int): DataFrame = {
    val factCols = fact.columns.map(col)
    // per-row deterministic salt (hash of the whole row, not the key —
    // same-key rows spread across buckets)
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(struct(factCols.toIndexedSeq: _*)), lit(saltBuckets)).cast("int"))
    val replicated = dim
      .withColumn("_salt", explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
