package graft

import org.apache.spark.sql.SparkSession

/** pid-scoped bench/artifact scratch under a fixed base dir: a fresh
  * random temp dir per run would leave an sf-scale artifact copy
  * behind every invocation until /tmp fills, while one shared fixed
  * dir would let two concurrent processes wipe each other's state
  * mid-run. Layout is `<tmpdir>/<base>/<pid>/<tag>`; dead siblings
  * (pids no longer alive) are swept on `fresh`, so leftovers are
  * bounded by live runs. `fresh` wipes ONLY this pid's `tag` subdir —
  * two faces of the same process (e.g. s15's match index and s16's
  * phrase index) never destroy each other's artifact.
  */
private[graft] object PidScratch {
  def path(base: String, tag: String): String =
    s"${System.getProperty("java.io.tmpdir")}/$base/" +
      s"${ProcessHandle.current().pid()}/$tag"

  /** Sweep dead siblings, wipe this pid's `tag` dir, return it.
    * The sweep deletes ONLY directories whose name parses as a pid
    * AND whose pid is dead: a non-numeric entry under the base was
    * not created by PidScratch (a foreign dir on a shared tmpdir
    * host), and deleting unowned data on a name collision is worse
    * than leaking it — so foreign entries are ignored, spec-pinned
    * (r16 verdict item 8). */
  def fresh(s: SparkSession, base: String, tag: String): String = {
    val root = new org.apache.hadoop.fs.Path(
      s"${System.getProperty("java.io.tmpdir")}/$base")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(root))
      fs.listStatus(root).foreach { st =>
        scala.util.Try(st.getPath.getName.toLong).toOption.foreach { p =>
          val alive = ProcessHandle.of(p).map[Boolean](_.isAlive).orElse(false)
          if (!alive) fs.delete(st.getPath, true)
        }
      }
    val mine = path(base, tag)
    fs.delete(new org.apache.hadoop.fs.Path(mine), true)
    mine
  }
}
