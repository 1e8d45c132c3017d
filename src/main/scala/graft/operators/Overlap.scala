package graft.operators

import org.apache.spark.sql.SparkSession

/** Driver-side overlap of INDEPENDENT Spark actions: actions are only
  * sequential because driver code calls them sequentially — Spark's
  * scheduler happily runs several jobs at once inside one application,
  * and FIFO scheduling back-fills the tail of one job with the next
  * job's tasks. The maintenance fan-outs this serves (one lifecycle
  * call issuing several writes/reads against DISJOINT directories) are
  * dominated by per-action fixed cost at bench scale (job launch,
  * write commit, metadata reads), so overlapping them cuts the wall to
  * the longest chain without changing any stored byte. At 100 TB the
  * same overlap hides the commit/metadata latency of the small
  * relations behind the one genuinely large job.
  *
  * Failure contract: [[join]]/[[all]] SETTLE every task (no write is
  * still in flight when the caller sees the error) and rethrow the
  * FIRST failure in declaration order — the same exception a
  * sequential fan-out would have surfaced, so marker-gated retry
  * semantics are unchanged: a failure mid-fan-out leaves a subset of
  * layouts applied, and the retry completes the rest (exactly the
  * partial-failure contract the coordinator specs pin).
  *
  * Thread notes: tasks bind the caller's SparkSession as the active
  * session (session thread-locals do not cross pool threads); job
  * descriptions/groups are thread-local and intentionally not
  * propagated (cosmetic only on these paths). The pool is unbounded
  * (cached) because tasks may themselves fan out — nested submits must
  * never deadlock — and daemon so it cannot pin a JVM exit.
  */
private[graft] object Overlap {

  private lazy val pool =
    java.util.concurrent.Executors.newCachedThreadPool(
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger(0)
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-overlap-${n.getAndIncrement()}")
          t.setDaemon(true)
          t
        }
      })

  /** Submit `body` for concurrent execution against `spark`. */
  def future[A](spark: SparkSession)(body: => A)
      : java.util.concurrent.Future[A] =
    pool.submit(new java.util.concurrent.Callable[A] {
      def call(): A = {
        SparkSession.setActiveSession(spark)
        // cached-pool threads inherit the SPAWNING thread's local
        // properties (InheritableThreadLocal) at creation and keep
        // them for the thread's lifetime — a stale job group or SQL
        // execution id would mis-attribute unrelated overlapped jobs
        // in the UI and mis-scope a future cancelJobGroup. Clear them
        // at task entry.
        spark.sparkContext.clearJobGroup()
        spark.sparkContext.setLocalProperty("spark.sql.execution.id", null)
        body
      }
    })

  /** Await one task, unwrapping the executor's ExecutionException so
    * callers (and the specs intercepting fence errors) see the
    * original failure type. */
  def await[A](f: java.util.concurrent.Future[A]): A =
    try f.get()
    catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    }

  /** Await a task purely to SETTLE it (error paths: a failure is being
    * propagated already and no background write may still be mutating
    * a layout when the caller handles it); its own failure, if any, is
    * swallowed — the primary error wins. */
  def settle(f: java.util.concurrent.Future[_]): Unit =
    try f.get() catch {
      case _: InterruptedException =>
        // a driver interrupt must not be swallowed on the error path —
        // re-assert the flag so the caller's interruption semantics
        // survive the settle
        Thread.currentThread().interrupt()
      case _: Throwable => ()
    }

  /** Run the thunks concurrently, settle ALL, return their results in
    * declaration order — or rethrow the first failure. */
  def join[A](spark: SparkSession)(thunks: Seq[() => A]): Seq[A] = {
    val fs = thunks.map(t => future(spark)(t()))
    val settled = fs.map(f =>
      try Right(f.get())
      catch {
        case e: java.util.concurrent.ExecutionException =>
          Left(e.getCause)
        case e: Throwable => Left(e)
      })
    settled.collectFirst { case Left(e) => e }.foreach(e => throw e)
    settled.collect { case Right(a) => a }
  }

  /** [[join]] for side-effecting fan-outs. */
  def all(spark: SparkSession)(thunks: (() => Unit)*): Unit = {
    join(spark)(thunks)
    ()
  }
}
