package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Session-aware Hadoop configuration lookup (round-8 advisor item):
  * a bare `new Configuration()` silently drops every non-default
  * filesystem setting the session carries (object-store credentials,
  * endpoints, timeouts), which makes remote backup roots unreadable in
  * exactly the deployments that need them. Driver-side code must see
  * the session's `hadoopConfiguration`; executor-side code that cannot
  * (no active session in a bare task JVM) gets the default — the
  * paths that matter at cluster scale ([[BackupSink]]'s task writers,
  * [[graft.operators.Backup.fsck]]'s verdict tasks) carry an explicit
  * `SerializableConfiguration` instead of calling this.
  */
object HadoopConfs {
  def active(): Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
}
