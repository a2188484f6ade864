package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state via `mapGroupsWithState` /
  * `flatMapGroupsWithState` — the Spark primitive SURVEY §2.4 maps the
  * reference's per-(consumer, stream) `ConsumerInfo` state onto
  * (`stream_reader.rs:113-122`): state lives in the query's state
  * store, checkpointed with the stream, partitioned by key across
  * executors. State growth is the user's contract — pass a timeout for
  * unbounded key spaces (SURVEY §7.5.6). */
object Stateful {

  case class KeyedCount(key: Long, n: Long, sum: Double)

  private implicit val stateEnc: Encoder[(Long, Double)] =
    Encoders.product[(Long, Double)]
  private implicit val outEnc: Encoder[KeyedCount] = Encoders.product[KeyedCount]
  private implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Running (count, sum) per key, updated every micro-batch — the
    * canonical `mapGroupsWithState` shape: read state, fold the batch's
    * records for the key, write state back, emit the running value. */
  def runningCounts(records: Dataset[(Long, Double)],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[KeyedCount] =
    records.groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), KeyedCount](timeout) {
        (key: Long, it: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0
          var sum = s0
          it.foreach { case (_, v) => n += 1; sum += v }
          state.update((n, sum))
          KeyedCount(key, n, sum)
      }

  /** The output mode `mapGroupsWithState` requires. */
  val RequiredOutputMode: OutputMode = OutputMode.Update()
}
