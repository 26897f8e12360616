package graft.sql

import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledFuture, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Serving guardrails — the reference broker's runaway-query
  * protection re-expressed on Spark's own primitives:
  *
  *   - **Timeout enforcement**: each query runs inside a Spark job
  *     group (`sparkContext.setJobGroup(..., interruptOnCancel=true)`)
  *     and a deadline timer calls `cancelJobGroup` at the effective
  *     timeout — the per-query `timeoutMs` SET option when present,
  *     else the broker default (`CommonConstants.Broker
  *     .DEFAULT_BROKER_TIMEOUT_MS` = 10 000 in the reference). The
  *     failure classifies as `EXECUTION_TIMEOUT` = 250
  *     (`QueryErrorCode.java:48-53`).
  *   - **Cancellation**: `DELETE /query/{id}` (broker-assigned
  *     requestId) and `DELETE /query/{id}?client=true` (the
  *     `clientQueryId` query option) cancel a running query's job
  *     group mid-flight — `BaseBrokerRequestHandler.java:402`
  *     (`cancelQuery`) / `:414` (`cancelQueryByClientId`). The
  *     failure classifies as `QUERY_CANCELLATION` = 503.
  *   - **Running-query inventory**: `GET /queries` returns
  *     requestId → query text, `PinotClientRequest.getRunningQueries`.
  *   - **Scan budget**: a SparkListener accumulates every tracked job
  *     group's task-level `recordsRead`; crossing the
  *     `maxScannedRows` budget cancels the group and classifies as
  *     `QUERY_SCAN_LIMIT_EXCEEDED` = 246 (the reference's scan-based
  *     killing strategies, `QueryKillingStrategy.java:48`). This
  *     STOPS the scan — at the 100 TB operating point an unindexed
  *     regex over a near-unique column dies after `budget` rows, not
  *     after the table.
  *
  * One guard instance serves one SparkSession; the listener registers
  * lazily on first guarded run and consults the shared registry, so
  * idle guards cost nothing per task.
  */
final class QueryGuard(spark: SparkSession,
    val brokerTimeoutMs: Long = QueryGuard.DefaultBrokerTimeoutMs) {

  final class Running(val requestId: Long, val clientQueryId: Option[String],
      val groupId: String, val query: String) {
    val deadlineHit = new AtomicBoolean(false)
    val userCancelled = new AtomicBoolean(false)
    val scanExceeded = new AtomicBoolean(false)
    val recordsRead = new AtomicLong(0L)
    @volatile var scanBudget: Long = Long.MaxValue
    // stage ids belonging to this group's jobs (listener-maintained)
    val stageIds: java.util.Set[Integer] = ConcurrentHashMap.newKeySet[Integer]()
  }

  private val running = new ConcurrentHashMap[Long, Running]()
  // groupId -> Running, for the listener's stage/task attribution
  private val byGroup = new ConcurrentHashMap[String, Running]()

  private lazy val listener: SparkListener = {
    val l = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        val gid = Option(jobStart.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
        gid.flatMap(g => Option(byGroup.get(g))).foreach { r =>
          jobStart.stageIds.foreach(sid => r.stageIds.add(sid))
        }
      }
      override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
        // attribute by stage id — cheap set probes against only the
        // currently-running guarded groups
        byGroup.values.asScala.foreach { r =>
          if (r.stageIds.contains(taskEnd.stageId) &&
              taskEnd.taskMetrics != null) {
            val n = r.recordsRead.addAndGet(
              taskEnd.taskMetrics.inputMetrics.recordsRead)
            if (n > r.scanBudget &&
                r.scanExceeded.compareAndSet(false, true))
              spark.sparkContext.cancelJobGroupAndFutureJobs(r.groupId)
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    l
  }

  /** Run `body` under the guard. `timeoutMs <= 0` means "no explicit
    * option" → the broker default applies (the reference's
    * `BaseSingleStageBrokerRequestHandler.java:2234-2250` resolution
    * order, minus table-config overrides graft doesn't model). */
  def guarded[T](requestId: Long, query: String,
      timeoutMs: Long = 0L, clientQueryId: Option[String] = None,
      maxScannedRows: Long = 0L)(body: => T): T = {
    val effective = if (timeoutMs > 0) timeoutMs else brokerTimeoutMs
    // the group id carries a process-unique suffix, NOT just the
    // requestId: cancelJobGroupAndFutureJobs poisons a group name
    // forever, and two guards (or re-used request ids) must never
    // share one. Cancellation surfaces key on requestId/clientQueryId
    // via the registry, so the group name is internal.
    val r = new Running(requestId, clientQueryId,
      s"graft-query-$requestId-${QueryGuard.groupSeq.incrementAndGet()}",
      query)
    if (maxScannedRows > 0) r.scanBudget = maxScannedRows
    running.put(requestId, r)
    byGroup.put(r.groupId, r)
    if (maxScannedRows > 0) listener // force listener registration
    val sc = spark.sparkContext
    // cancelJobGroupAndFutureJobs, not cancelJobGroup: the deadline
    // (or a user cancel) can land while the query is still PLANNING —
    // no job is active yet, and a plain cancel would be a no-op that
    // lets the jobs submitted moments later run to completion. The
    // AndFutureJobs variant marks the (unique, per-request) group so
    // later submissions die on arrival.
    val deadline: ScheduledFuture[_] = QueryGuard.timer.schedule(
      new Runnable {
        override def run(): Unit = {
          r.deadlineHit.set(true)
          try sc.cancelJobGroupAndFutureJobs(r.groupId)
          catch { case _: Throwable => () }
        }
      }, effective, TimeUnit.MILLISECONDS)
    sc.setJobGroup(r.groupId,
      s"graft query $requestId" +
        clientQueryId.map(c => s" (client $c)").getOrElse(""),
      interruptOnCancel = true)
    try {
      // a body that completes despite a deadline race returns its
      // result — the guard frees the pool, it doesn't discard answers
      body
    } catch {
      case e: Throwable =>
        classify(r, e)
        throw e
    } finally {
      deadline.cancel(false)
      sc.clearJobGroup()
      running.remove(requestId)
      byGroup.remove(r.groupId)
    }
  }

  /** Rethrow `cause` re-classified when a guard tripped; no-op when
    * the body succeeded inside its budgets. */
  private def classify(r: Running, cause: Throwable): Unit = {
    if (r.userCancelled.get)
      throw new QueryGuard.QueryCancelledException(
        s"Query ${r.requestId} cancelled" +
          r.clientQueryId.map(c => s" (client id $c)").getOrElse(""), cause)
    if (r.scanExceeded.get)
      throw new QueryGuard.ScanLimitExceededException(
        s"Query ${r.requestId} exceeded the scan budget of " +
          s"${r.scanBudget} rows (read ${r.recordsRead.get})", cause)
    if (r.deadlineHit.get)
      throw new QueryGuard.ExecutionTimeoutException(
        s"Query ${r.requestId} timed out", cause)
  }

  /** Cancel by broker requestId (`isClient=false`) or by the client's
    * own `clientQueryId` option (`isClient=true`). True when a
    * running query was found and its job group cancelled. */
  def cancel(id: String, isClient: Boolean): Boolean = {
    val target =
      if (isClient) running.values.asScala.find(_.clientQueryId.contains(id))
      else id.toLongOption.flatMap(l => Option(running.get(l)))
    target match {
      case Some(r) =>
        if (r.userCancelled.compareAndSet(false, true))
          try spark.sparkContext.cancelJobGroupAndFutureJobs(r.groupId)
          catch { case _: Throwable => () }
        true
      case None => false
    }
  }

  /** Broker-assigned id → query text for every in-flight query. */
  def runningQueries: Map[Long, String] =
    running.asScala.map { case (k, v) => (k.toLong, v.query) }.toMap
}

object QueryGuard {
  /** `CommonConstants.Broker.DEFAULT_BROKER_TIMEOUT_MS` (10 s). */
  val DefaultBrokerTimeoutMs = 10000L

  private[sql] val groupSeq = new AtomicLong(0L)

  // one daemon timer thread serves every guard instance
  private[sql] val timer = Executors.newSingleThreadScheduledExecutor(
    (r: Runnable) => {
      val t = new Thread(r, "graft-query-deadlines")
      t.setDaemon(true)
      t
    })

  final class ExecutionTimeoutException(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)
  final class QueryCancelledException(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)
  final class ScanLimitExceededException(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)
  final class ResponseSizeExceededException(msg: String)
    extends RuntimeException(msg)
}
