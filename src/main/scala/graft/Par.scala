package graft

/** Overlap INDEPENDENT driver actions (guide §2.6): Spark runs any
  * number of jobs concurrently inside one application — actions are
  * only sequential because driver code calls them sequentially, and a
  * sequential chain leaves the cluster idle through every job's
  * straggler tail. Callers own the independence argument (disjoint
  * tables/dirs, no read-your-own-concurrent-write); keep pools tiny —
  * 2–3 in flight fills the tail without fighting for executors.
  *
  * Failure contract: every launched action SETTLES before the first
  * failure is rethrown — abandoning a mid-flight table write to race a
  * caller's retry would break the package-wide single-writer contract.
  */
object Par {

  def par2[A, B](fa: () => A, fb: () => B): (A, B) = {
    val rs = all(Seq(() => fa(), () => fb()))
    (rs(0).asInstanceOf[A], rs(1).asInstanceOf[B])
  }

  def par3(fs: (() => Unit)*): Unit = {
    all(fs.map(f => () => f(): Any))
    ()
  }

  private def all(fs: Seq[() => Any]): Seq[Any] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(fs.size)
    try {
      val futures = fs.map(f => pool.submit(
        new java.util.concurrent.Callable[Any] { def call(): Any = f() }))
      // collect every outcome before throwing, so no task is abandoned
      val outcomes = futures.map(f => scala.util.Try(f.get()))
      outcomes.collectFirst {
        case scala.util.Failure(e: java.util.concurrent.ExecutionException) =>
          throw e.getCause
        case scala.util.Failure(e) => throw e
      }
      outcomes.map(_.get)
    } finally pool.shutdown()
  }
}
