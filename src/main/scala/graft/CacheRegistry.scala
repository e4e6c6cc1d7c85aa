package graft

import org.apache.spark.sql.Dataset

/** Session-lifetime cache registry. Operators here cache small derived
  * frames (value-counts state, routed corpora, candidate sets) whose
  * pins are correct for a driver-per-run world but would accumulate in
  * a long-lived session running stats queries repeatedly. Every
  * library-internal `.cache()` goes through `register`, and a host
  * application calls `unpersistAll()` at its own query-face boundary.
  *
  * References are STRONG and cleared only by `unpersistAll()`:
  * Spark's CacheManager itself retains the cached plan regardless of
  * whether the Dataset wrapper is reachable, so a weak registry would
  * let wrapper GC silently orphan pinned cache entries — the exact
  * leak this class exists to prevent. The registry is tiny (one entry
  * per library-internal cache call, deduplicated by the Dataset's
  * analyzed plan), so holding the wrappers costs nothing next to the
  * cached data they pin.
  */
object CacheRegistry {

  private val refs = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Cache `ds` and track it for a later bulk unpersist. Re-registering
    * a Dataset with the same analyzed plan (operators register
    * per-call locals for the same cached stats frame) keeps one entry,
    * so the registry stays bounded under repeated query-face calls. */
  def register[T](ds: Dataset[T]): Dataset[T] = {
    ds.cache()
    synchronized {
      if (!refs.exists(r => (r.sparkSession eq ds.sparkSession) &&
          r.queryExecution.analyzed.sameResult(ds.queryExecution.analyzed)))
        refs += ds
    }
    ds
  }

  /** Unpersist every registered Dataset (blocking, so the memory is
    * actually free when this returns) and clear the registry. Returns
    * how many were unpersisted. */
  def unpersistAll(): Int = synchronized {
    val n = refs.size
    refs.foreach(_.unpersist(blocking = true))
    refs.clear()
    n
  }

  /** Registered count (for tests/monitoring). */
  def registeredCount: Int = synchronized { refs.size }
}
