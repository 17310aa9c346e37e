package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style MERGE (upsert + delete) by rewrite — the warehouse
  * primitive plain-parquet deployments implement as a join-and-rewrite
  * (what MERGE INTO compiles to in table formats): apply a changeset to
  * a base table in ONE declarative plan.
  *
  *  - matched key, no delete flag → the update row replaces the base row
  *  - matched key, delete flag    → the key disappears
  *  - unmatched update key        → insert
  *  - untouched base key          → kept as-is
  *
  * Scale shape: a single anti-join of base against the changeset keys
  * (shuffle or broadcast by AQE based on changeset size — changesets
  * are typically tiny next to the base) plus a union with the non-
  * delete changeset rows. No row-by-row driver logic; at 100 TB the
  * rewrite scopes to affected partitions via partition pruning when
  * the base is date/key-partitioned.
  */
object Merge {

  /** `deleteFlag`: optional boolean column in `updates` marking keys to
    * remove; it is consumed (dropped from the output). */
  def merge(base: DataFrame, updates: DataFrame, key: String,
            deleteFlag: Option[String] = None): DataFrame = {
    val survivors = base.join(
      updates.select(col(key)).distinct(), Seq(key), "left_anti")
    val upserts = deleteFlag match {
      case Some(f) => updates.filter(!col(f)).drop(f)
      case None => updates
    }
    survivors.unionByName(upserts)
  }
}
