package graft.operators

/** Overlap INDEPENDENT Spark actions (optimization-guide §2.6): actions
  * run sequentially only because driver code calls them sequentially, so
  * a store function that must materialize several independent outputs
  * (postings + doclen + stats, assigned + centroids) can submit them
  * from separate threads and let the scheduler back-fill each job's task
  * tail with the other job's tasks. Correctness preconditions are the
  * caller's: the thunks must share no mutable state and any common input
  * must already be pinned ([[Pins.pin]]) so concurrent consumers read one
  * materialization instead of racing to recompute it.
  *
  * Threads are plain and short-lived (one per thunk, bounded by the
  * call-site arity — never data-sized); the first failure rethrows after
  * all thunks settle, so a failed write cannot be masked by a completed
  * sibling.
  */
object Par {
  def run(thunks: (() => Unit)*): Unit = {
    require(thunks.nonEmpty, "at least one action")
    if (thunks.size == 1) { thunks.head(); return }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = thunks.map { t =>
      val th = new Thread(() => try t() catch { case e: Throwable => errs.add(e) })
      th.setDaemon(true)
      th.start()
      th
    }
    ts.foreach(_.join())
    val it = errs.iterator()
    if (it.hasNext) throw it.next()
  }
}
