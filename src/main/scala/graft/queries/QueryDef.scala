package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark plan builder plus (when SQL-expressible)
  * an ANSI-SQL oracle the driver runs in DuckDB over the same parquet
  * tables. Column names MUST match between the two — the driver sorts
  * columns by name before hashing values.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, Some(oracle))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None)

  /** Scratch dir per (user, process, query, sf): stable within one JVM
    * so repeated writes (mode=overwrite) reuse the same path instead of
    * leaking a dir per run, but keyed by user + PID so two concurrent
    * runs — or two users on a shared machine — never overwrite each
    * other's scratch or collide on directory ownership. A shutdown hook
    * removes the per-process tree on JVM exit. */
  private lazy val processToken: String = {
    val user = sys.props.getOrElse("user.name", "anon")
    val pid = ProcessHandle.current().pid()
    val root = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_scratch_${user}_$pid")
    sys.addShutdownHook(graft.util.Fs.deleteRecursively(root))
    s"${user}_$pid"
  }

  def scratchDir(name: String, sfDir: String): String = {
    val sf = new java.io.File(sfDir).getName
    val root = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_scratch_$processToken")
    root.mkdirs()
    s"$root/${name}_$sf"
  }
}
