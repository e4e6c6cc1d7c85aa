package graft

/** Pins the PidScratch sweep contract (r16 verdict item 8): on a
  * shared-tmpdir host, a FOREIGN directory under the scratch base —
  * one whose name does not parse as a pid, so PidScratch did not
  * create it — must be ignored by the dead-sibling sweep, never
  * deleted; numeric dead-pid siblings ARE swept; and `fresh` wipes
  * only this pid's own tag subdir. */
class PidScratchSpec extends SparkSpec {

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def p(s: String) = new org.apache.hadoop.fs.Path(s)

  test("fresh sweeps dead-pid siblings, ignores foreign non-pid dirs, " +
      "wipes only its own tag") {
    val base = s"pidscratch-spec-${ProcessHandle.current().pid()}"
    val root = s"${System.getProperty("java.io.tmpdir")}/$base"
    // a foreign dir (non-numeric name) with a marker file inside
    fs.mkdirs(p(s"$root/not-a-pid"))
    fs.createNewFile(p(s"$root/not-a-pid/keep.txt"))
    // a dead sibling: max pid on linux is < 2^22, so this pid cannot
    // be alive
    fs.mkdirs(p(s"$root/99999999"))
    // this pid's own OTHER tag must survive a fresh("tagA")
    val mine = ProcessHandle.current().pid()
    fs.mkdirs(p(s"$root/$mine/tagB"))
    fs.createNewFile(p(s"$root/$mine/tagB/artifact"))
    // pre-existing content under the requested tag must be wiped
    fs.mkdirs(p(s"$root/$mine/tagA/stale"))

    val got = PidScratch.fresh(spark, base, "tagA")
    assert(got == s"$root/$mine/tagA")
    assert(fs.exists(p(s"$root/not-a-pid/keep.txt")),
      "foreign non-pid dir must never be swept")
    assert(!fs.exists(p(s"$root/99999999")), "dead-pid sibling is swept")
    assert(fs.exists(p(s"$root/$mine/tagB/artifact")),
      "sibling tag of the live pid survives")
    assert(!fs.exists(p(s"$root/$mine/tagA/stale")),
      "the requested tag dir is wiped")
    fs.delete(p(root), true)
  }
}
