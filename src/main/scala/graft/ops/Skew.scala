package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins on heavy-hitter keys.
  *
  * When one join key carries a disproportionate share of rows, a
  * shuffled join lands that key on a single reducer. Salting splits
  * each hot key into `salts` sub-keys: the big (skewed) side gets a
  * deterministic salt derived from a high-cardinality column, the
  * small side is replicated once per salt, and the join runs on
  * (key, salt) — spreading each hot key over `salts` reducers.
  *
  * AQE's skew-join splitting handles many cases automatically; use
  * explicit salting when the skew is known and extreme (power-law
  * keys at 100 TB), or when the engine's thresholds don't trigger.
  */
object Skew {

  /** Join `big` to `small` on `key`, salted `salts` ways. `saltSource`
    * must be a high-cardinality deterministic column of `big` (e.g. a
    * row id) so the salt spreads rows evenly and results stay
    * reproducible. `small` is replicated `salts` times — keep it
    * dimension-sized.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, salts: Int): DataFrame = {
    // pmod by 0 is null in non-ANSI mode → every row silently dropped
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltedBig = big.withColumn("_salt", pmod(xxhash64(saltSource), lit(salts)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    // shuffle_hash hint: the whole point is distributing the hot keys
    // across reducers, so keep it a shuffled join even when the small
    // side would qualify for broadcast
    saltedBig.join(saltedSmall.hint("shuffle_hash"), Seq(key, "_salt")).drop("_salt")
  }
}
