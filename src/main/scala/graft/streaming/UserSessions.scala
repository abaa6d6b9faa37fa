package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key custom state via mapGroupsWithState — the KeyValueGroupedDataset
  * extension point for stateful semantics the built-in window/agg operators
  * can't express. Tracks a running per-user profile (event count, first/last
  * seen, last type) across micro-batches; checkpointed state survives
  * restarts, storage is O(active users).
  *
  * Works identically over a batch frame (state starts empty, one "batch")
  * — which is how the unit oracle checks it — and over a stream, where the
  * same update function folds every micro-batch into the checkpointed
  * state.
  */
object UserSessions {

  final case class UserEvent(userId: String, etype: String, atMicros: Long)
  final case class UserProfile(
      userId: String, nEvents: Long, firstSeenMicros: Long,
      lastSeenMicros: Long, lastType: String)

  private def update(
      key: String, rows: Iterator[UserEvent],
      state: GroupState[UserProfile]): UserProfile = {
    var p = state.getOption.getOrElse(
      UserProfile(key, 0L, Long.MaxValue, Long.MinValue, null))
    // fold in event-time order so lastType is deterministic
    rows.toSeq.sortBy(e => (e.atMicros, e.etype)).foreach { e =>
      p = UserProfile(key, p.nEvents + 1,
        math.min(p.firstSeenMicros, e.atMicros),
        math.max(p.lastSeenMicros, e.atMicros),
        if (e.atMicros >= p.lastSeenMicros) e.etype else p.lastType)
    }
    state.update(p)
    p
  }

  private def asEvents(view: DataFrame): Dataset[UserEvent] = {
    implicit val enc = Encoders.product[UserEvent]
    view.select(
      col("attributes").getItem("xuserid").as("userId"),
      col("type").as("etype"),
      unix_micros(col("time")).as("atMicros"))
      .filter(col("userId").isNotNull)
      .as[UserEvent]
  }

  /** Batch form: profiles from one pass (state starts empty). */
  def profiles(view: DataFrame): Dataset[UserProfile] = {
    implicit val pEnc = Encoders.product[UserProfile]
    implicit val kEnc = Encoders.STRING
    asEvents(view).groupByKey(_.userId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  /** Streaming form: same update function over a bus, emitting the updated
    * profile per user per micro-batch.
    */
  def profilesStream(view: DataFrame): Dataset[UserProfile] = {
    implicit val pEnc = Encoders.product[UserProfile]
    implicit val kEnc = Encoders.STRING
    asEvents(view).groupByKey(_.userId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  val outputMode: OutputMode = OutputMode.Update()
}
