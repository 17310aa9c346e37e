package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join partitions by the join key, so one hot key (a
  * boilerplate event type, a null-ish default id) lands its entire row
  * set in ONE task — the classic straggler at 100 TB. Salting spreads
  * it: the probe side gets a deterministic salt in [0, r) derived from
  * a high-cardinality column, the build side is replicated r times
  * (once per salt value), and the join key becomes (key, salt). Each
  * probe row matches exactly the build replica carrying its salt, so
  * the result is row-identical to the plain join while the hot key's
  * rows spread across r partitions.
  *
  * Complements AQE's skew-join splitting (which only kicks in above
  * size thresholds and only for sort-merge joins): salting is explicit,
  * deterministic, and works for any join the planner picks. Cost: the
  * build side is shuffled r× — use for small-dim⋈huge-fact shapes
  * where the dim is too big to broadcast but cheap to replicate.
  */
object SkewJoin {

  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltFromCol: String, r: Int): DataFrame = {
    require(r > 0, s"salt fan-out must be positive, got $r")
    require(!probe.columns.contains("__salt") && !build.columns.contains("__salt"),
      "inputs already carry a __salt column; drop or rename it first")
    val salted = probe.withColumn("__salt",
      pmod(hash(col(saltFromCol)), lit(r)))
    val replicated = build.withColumn("__salt",
      explode(array((0 until r).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
