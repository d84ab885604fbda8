package graft

import org.apache.spark.sql.SparkSession

/** O3/O4 orchestration operators (reference `main.go:52-56`,
  * `appcontext/context.go:12-24`): a run-scoped timeout that cancels every
  * Spark job the run started, and a context-carried structured logger.
  */

/** Contextual logger (O4): the reference threads an `slog.Logger` through
  * `context.Context` (`appcontext/context.go:12-24`) so every layer logs
  * with the run's context. The Spark-side twin is a small immutable value
  * carried through call parameters: `withField` derives a child context,
  * and every line renders `key=value` pairs — same shape slog's default
  * handler prints. The sink is injectable so specs can capture lines and
  * the default goes to the driver's slf4j log.
  */
final case class LogCtx(
    fields: Seq[(String, String)] = Nil,
    sink: String => Unit = LogCtx.slf4j) {

  def withField(key: String, value: String): LogCtx =
    copy(fields = fields :+ (key -> value))

  def info(msg: String): Unit = emit("INFO", msg)
  def warn(msg: String): Unit = emit("WARN", msg)
  def error(msg: String): Unit = emit("ERROR", msg)

  private def emit(level: String, msg: String): Unit = {
    val ctx = fields.map { case (k, v) => s"$k=$v" }.mkString(" ")
    sink(if (ctx.isEmpty) s"$level $msg" else s"$level $msg $ctx")
  }
}

object LogCtx {
  private lazy val logger = org.slf4j.LoggerFactory.getLogger("graft")
  val slf4j: String => Unit = line => logger.info(line)
  val default: LogCtx = LogCtx()
}

/** Global run timeout (O3): the reference wraps the whole CLI run in a
  * `context.WithTimeout` (30 s default, `main.go:52-56`,
  * `loadConfig.go:16,81`) and every Mongo call aborts when it expires. The
  * Spark-native equivalent of "cancel everything this run started" is a
  * job GROUP: all jobs submitted inside `withTimeout` share a group id,
  * and the watchdog cancels the group (interrupting executors) at the
  * deadline.
  *
  * DIVERGENCE, deliberate: the reference hard-defaults to 30 s; a Spark
  * batch sized for a multi-minute cluster run would be killed mid-write by
  * that default, so here the timeout is opt-in (`RUN_TIMEOUT_SECONDS` env
  * in the CLI) — the operator semantics (deadline ⇒ cancel the run's jobs
  * ⇒ error out) are what's ported, not the constant.
  */
object RunGuard {

  final class RunTimeoutException(msg: String, cause: Throwable)
      extends RuntimeException(msg, cause)

  def withTimeout[T](spark: SparkSession, seconds: Long, label: String)(body: => T): T = {
    require(seconds > 0, "timeout must be positive")
    val sc = spark.sparkContext
    val group = s"graft-$label-${java.util.UUID.randomUUID()}"
    sc.setJobGroup(group, s"$label (timeout ${seconds}s)", interruptOnCancel = true)
    val timer = new java.util.Timer("graft-run-timeout", true)
    @volatile var fired = false
    val task = new java.util.TimerTask {
      override def run(): Unit = { fired = true; sc.cancelJobGroup(group) }
    }
    timer.schedule(task, seconds * 1000L)
    try {
      val result = body
      // a body that swallowed the cancellation must still fail the run —
      // a half-cancelled ingest reporting success would be worse than the
      // hang the timeout guards against
      if (fired) throw new RunTimeoutException(s"$label exceeded ${seconds}s", null)
      result
    } catch {
      case e: RunTimeoutException => throw e
      case e: Throwable if fired =>
        throw new RunTimeoutException(s"$label exceeded ${seconds}s", e)
    } finally {
      task.cancel()
      timer.cancel()
      sc.clearJobGroup()
    }
  }
}
