package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution has hot keys (the
  * 100 TB problem AQE's skew-split doesn't cover: broadcast-ineligible
  * right sides joined on a power-law key).
  *
  * Salting splits each hot left key across `salts` sub-keys and replicates
  * the right side once per salt — shuffle parallelism on a hot key goes
  * from 1 task to `salts` tasks at the cost of |right| × salts replication.
  * The salt is a deterministic hash of the whole left row, so plans stay
  * reproducible run-to-run (no rand()).
  */
object Skew {

  def saltedJoin(big: DataFrame, dim: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(salts)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
