package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One collected advisory version arriving on the stream. */
final case class AdvisoryVersionEvent(
    avid: String,
    unique_content_id: String,
    date_collected: Timestamp)

/** Per-avid latest pointer kept in the state store. */
final case class LatestPointer(unique_content_id: String,
    date_collected: Timestamp)

/** Emitted change event (ChangeLog, models.py:1530-1717 shape). */
final case class AdvisoryChangeEvent(
    avid: String,
    action_type: String, // import | update
    unique_content_id: String,
    action_time: Timestamp)

/** Stateful incremental maintenance of the per-advisory latest pointer —
  * the streaming form of `withContentIdAndLatest` (W2) + `changeLog` (T5).
  *
  * Batch mode recomputes is_latest with a window over all versions; on a
  * stream the same semantics become a `flatMapGroupsWithState` keyed by
  * avid holding ONE LatestPointer per advisory: the first version emits
  * an `import` event, every strictly newer (date_collected, content_id)
  * emits `update`, and stale or duplicate arrivals emit nothing. State is
  * bounded by the advisory count (one small pointer per avid), not the
  * stream length — the 100 TB path is the stream, not the state store.
  */
object AdvisoryStreaming {

  private def newer(e: AdvisoryVersionEvent, st: LatestPointer): Boolean = {
    val c = java.lang.Long.compare(e.date_collected.getTime,
      st.date_collected.getTime)
    c > 0 || (c == 0 && e.unique_content_id > st.unique_content_id)
  }

  def latestChanges(spark: SparkSession,
      events: Dataset[AdvisoryVersionEvent]): Dataset[AdvisoryChangeEvent] = {
    import spark.implicits._
    events.groupByKey(_.avid)
      .flatMapGroupsWithState[LatestPointer, AdvisoryChangeEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (avid: String, it: Iterator[AdvisoryVersionEvent],
         state: GroupState[LatestPointer]) =>
          // order within the micro-batch so multi-version batches behave
          // exactly like the batch window's (date_collected, content_id)
          val sorted = it.toSeq.sortBy(e =>
            (e.date_collected.getTime, e.unique_content_id))
          var cur = state.getOption
          val out = Seq.newBuilder[AdvisoryChangeEvent]
          sorted.foreach { e =>
            cur match {
              case None =>
                cur = Some(LatestPointer(e.unique_content_id, e.date_collected))
                out += AdvisoryChangeEvent(avid, "import",
                  e.unique_content_id, e.date_collected)
              case Some(st) if newer(e, st) =>
                cur = Some(LatestPointer(e.unique_content_id, e.date_collected))
                out += AdvisoryChangeEvent(avid, "update",
                  e.unique_content_id, e.date_collected)
              case _ => () // stale re-delivery or exact duplicate
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
