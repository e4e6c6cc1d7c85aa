package graft

import org.apache.spark.sql.Dataset

/** Session-lifetime cache registry. Operators here cache small derived
  * frames (value-counts state, routed corpora, candidate sets) whose
  * pins are correct for a driver-per-run world but would accumulate in
  * a long-lived session running stats queries repeatedly. Every
  * library-internal `.cache()` goes through `register`, and a host
  * application calls `unpersistAll()` at its own query-face boundary.
  *
  * Weak references: the registry must not be the thing that keeps an
  * otherwise-dropped Dataset (and its InMemoryRelation) reachable.
  */
object CacheRegistry {

  private val refs =
    scala.collection.mutable.ArrayBuffer.empty[java.lang.ref.WeakReference[Dataset[_]]]

  /** Cache `ds` and track it for a later bulk unpersist. */
  def register[T](ds: Dataset[T]): Dataset[T] = {
    ds.cache()
    synchronized { refs += new java.lang.ref.WeakReference(ds) }
    ds
  }

  /** Unpersist every still-reachable registered Dataset (blocking, so
    * the memory is actually free when this returns) and clear the
    * registry. Returns how many were unpersisted. */
  def unpersistAll(): Int = synchronized {
    val live = refs.flatMap(r => Option(r.get()))
    live.foreach(_.unpersist(blocking = true))
    refs.clear()
    live.size
  }

  /** Registered-and-still-reachable count (for tests/monitoring). */
  def registeredCount: Int = synchronized { refs.count(_.get() != null) }
}
