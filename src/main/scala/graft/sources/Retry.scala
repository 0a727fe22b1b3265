package graft.sources

/**
 * Bounded exponential-backoff retry for transient I/O failures — the
 * engine's analogue of the reference's RetryUtil.executeWithRetry that
 * wraps every JDBC connect/probe (reference: common/.../util/RetryUtil
 * .java:1-208, used at plugin-rdbms-util/.../util/DBUtil.java:319,633).
 *
 * Object methods only (no captured state), so the closures built from them
 * serialize cleanly to executors — each Spark partition's connection
 * attempt retries independently.
 */
object Retry {

  /** Exceptions worth retrying: transient connectivity (SQL recoverable /
    * transient classes, plain IO) — never config errors like an unknown
    * driver (SQLException subclass SQLNonTransientException minus the
    * connection branch) or interrupts. */
  def transient(t: Throwable): Boolean = t match {
    case _: InterruptedException => false
    case _: java.sql.SQLNonTransientConnectionException => true
    case _: java.sql.SQLNonTransientException => false
    case _: java.sql.SQLException => true
    case _: java.io.IOException => true
    case _ => false
  }

  /**
   * Run `body`, retrying up to `maxAttempts` total tries on exceptions
   * matching `retryOn`, sleeping `baseDelayMs * 2^attempt` between tries
   * (the reference's exponential mode). The LAST failure is rethrown with
   * earlier ones attached as suppressed, so a log shows the whole history.
   */
  def withRetry[A](maxAttempts: Int = 3, baseDelayMs: Long = 100L,
      retryOn: Throwable => Boolean = transient)(body: => A): A = {
    require(maxAttempts >= 1, "need at least one attempt")
    var prior = List.empty[Throwable]
    var attempt = 0
    while (true) {
      try return body
      catch {
        case t: Throwable if attempt < maxAttempts - 1 && retryOn(t) =>
          prior ::= t
          attempt += 1
          Thread.sleep(baseDelayMs * (1L << (attempt - 1)))
        case t: Throwable =>
          prior.foreach(t.addSuppressed)
          throw t
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
