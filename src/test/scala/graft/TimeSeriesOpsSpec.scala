package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{RangeJoin, Sessionize}

/** Edge semantics of the time-series operators on literal frames. */
class TimeSeriesOpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bandedPairs: inclusive lower bound, exclusive upper, key-scoped") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 02:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 01:00:00")), // == t - range -> kept
      (101L, 10L, ts("2024-01-01 01:30:00")), // inside -> kept
      (102L, 10L, ts("2024-01-01 02:00:00")), // == t -> excluded
      (103L, 10L, ts("2024-01-01 00:59:59")), // below range -> excluded
      (104L, 99L, ts("2024-01-01 01:30:00"))) // other key -> excluded
      .toDF("id", "k", "t")
    val got = RangeJoin.bandedPairs(left, right, "k", "k", "t", "t", 3600L)
      .select(col("r_id")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(100L, 101L))
  }

  test("bandedPairs handles pre-epoch timestamps (exact integer bucketing)") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts("1969-12-31 23:30:00"))).toDF("id", "k", "t")
    val right = Seq(
      (100L, 1L, ts("1969-12-31 23:00:00")),
      (101L, 1L, ts("1969-12-31 22:29:00")))
      .toDF("id", "k", "t")
    val got = RangeJoin.bandedPairs(left, right, "k", "k", "t", "t", 3600L)
      .select(col("r_id")).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(100L))
  }

  test("forward as-of join picks the earliest right row at/after left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 5L, ts("2024-01-01 02:00:00")),
      (2L, 5L, ts("2024-01-01 09:00:00"))) // after all rights -> no match
      .toDF("id", "k", "t")
    val right = Seq(
      (5L, ts("2024-01-01 01:00:00"), "past"),
      (5L, ts("2024-01-01 02:00:00"), "now"),   // == t -> inclusive match
      (5L, ts("2024-01-01 03:00:00"), "later"))
      .toDF("k", "t", "payload")
    val got = graft.operators.AsOfJoin.forward(left, right,
      "k", "k", "t", "t", Seq("payload"), "payload")
      .orderBy("id").collect()
    assert(got(0).getString(3) === "now")
    assert(got(1).isNullAt(3))
  }

  test("sessionize: gap boundary is inclusive (gap == limit stays in session)") {
    import spark.implicits._
    val df = Seq(
      (1L, 7L, ts("2024-01-01 00:00:00")),
      (2L, 7L, ts("2024-01-01 00:30:00")), // exactly 1800s later -> same
      (3L, 7L, ts("2024-01-01 01:00:01")), // 1801s later -> new session
      (4L, 8L, ts("2024-01-01 00:00:00"))) // other key -> own numbering
      .toDF("event_id", "user_id", "ts")
    val got = Sessionize.byGap(df, "user_id", "ts", 1800L, "event_id")
      .select(col("event_id"), col("session_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) === 1 && got(2L) === 1)
    assert(got(3L) === 2)
    assert(got(4L) === 1)
  }
}
