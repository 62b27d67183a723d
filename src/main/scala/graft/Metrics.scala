package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import scala.jdk.CollectionConverters._

/** One queryable map of engine observability metrics (SURVEY.md §5).
  *
  * Two producer paths feed it:
  *
  *  - **Executor-side** counters ride the query plan as `observe()`
  *    aggregates (`CollectMetrics` — the same mechanism Spark's own
  *    streaming listeners use): candidate-pair counts and salted-bucket
  *    maxima from the dedup candidate machinery. They cost one partial
  *    aggregate on an intermediate that was being scanned anyway, never
  *    an extra job, and they CANNOT change row output — a cluster
  *    operator reads them from the same run that produced the data.
  *    Each call site stamps a fresh `name#seq` so two operators (or two
  *    invocations) in one query never collide on the observe-name
  *    uniqueness rule; the harvest strips the suffix and keeps the last
  *    value per logical name.
  *  - **Driver-side** facts (e.g. `d6.rounds`, the star-contraction
  *    round count) are `set()` directly by iterative operators.
  *
  * Harvesting requires [[enable]] on the session (GraftSession.local does
  * this); without a listener the observe aggregates still compute but go
  * unread. The store is JVM-global and last-write-wins per logical name —
  * per-query isolation would need the names threaded through every
  * operator signature, which is not worth it for an observability surface
  * (the values are diagnostics, never operator output).
  */
object Metrics {

  private val store = new ConcurrentHashMap[String, Map[String, Any]]()
  private val seq = new AtomicLong(0)
  // sessions that already carry the harvest listener (identity-keyed)
  private val enabled =
    java.util.Collections.newSetFromMap(
      new ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** A unique `observe()` name carrying logical prefix `name` — observe
    * names must be unique within a query execution, and one query can
    * contain many instrumented operators.
    */
  private[graft] def observeName(name: String): String =
    s"$name#${seq.incrementAndGet()}"

  /** Register the harvest listener on `spark` (idempotent). */
  def enable(spark: SparkSession): Unit =
    if (enabled.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        private def harvest(qe: QueryExecution): Unit =
          qe.observedMetrics.foreach { case (raw, row) =>
            val name = raw.split('#').head
            store.put(name,
              row.schema.fieldNames.iterator.zip(row.toSeq.iterator).toMap)
          }
        override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
          harvest(qe)
        override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit =
          harvest(qe)
      })
    }

  /** Driver-side producer (iterative operators record loop facts). */
  def set(name: String, fields: (String, Any)*): Unit =
    store.put(name, fields.toMap)

  def get(name: String): Option[Map[String, Any]] = Option(store.get(name))

  /** Numeric field accessor (observe aggregates surface as Long/Int). */
  def scalar(name: String, field: String): Option[Long] =
    get(name).flatMap(_.get(field)).collect {
      case l: Long => l
      case i: Int  => i.toLong
    }

  def snapshot: Map[String, Map[String, Any]] = store.asScala.toMap

  def clear(): Unit = store.clear()
}
