package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.KalmanFilter
import graft.graph.GraphStore
import graft.streaming.EventStreams

class FunctionStreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("column-expression Kalman fold matches the pure-Scala reference exactly") {
    import spark.implicits._
    val series = Seq(1.0, 2.0, 1.5, 3.0, 2.5, 2.0, 4.0)
    val expected = KalmanFilter.filterSeriesScala(series, 0.01, 1.0)
    val got = Seq(series).toDF("zs")
      .select(KalmanFilter.filterSeriesCol(col("zs"), 0.01, 1.0).as("x"))
      .collect()(0).getDouble(0)
    assert(math.abs(got - expected) < 1e-12, s"$got vs $expected")
  }

  test("kalman estimate converges toward a constant signal") {
    val const = Seq.fill(50)(5.0)
    assert(math.abs(KalmanFilter.filterSeriesScala(const, 0.01, 1.0) - 5.0) < 1e-9)
  }

  test("real Structured Streaming run matches the batch tumbling aggregation") {
    val streamed = EventStreams.streamingTumbling(spark, sf, "stream_test_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = EventStreams.tumbling(Tables.events(spark, sf))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("graph store: create/merge/delete maintain snapshot isolation and stats") {
    import spark.implicits._
    val g = GraphQueries.graph(spark, sf)
    val store = new GraphStore(g)
    val before = store.snapshot
    val beforeCount = before.nodes.count()

    val newNodes = spark.range(1, 11)
      .select(concat(lit("Test:"), col("id")).as("id"),
        array(lit("Test")).as("labels"), col("id").as("key"),
        concat(lit("t"), col("id")).as("name"),
        lit(1.0).as("acctbal"), lit(null).cast("string").as("mktsegment"),
        expr("map()").cast("map<string,string>").as("properties"))
    val s1 = store.createNodes(newNodes)
    assert(s1.nodesCreated == 10)
    assert(store.snapshot.nodes.count() == beforeCount + 10)
    // old snapshot unchanged (isolation)
    assert(before.nodes.count() == beforeCount)

    // creating the same ids again violates the unique constraint
    intercept[IllegalArgumentException](store.createNodes(newNodes))
    // merge is idempotent
    assert(store.mergeNodes(newNodes).nodesCreated == 0)

    val s3 = store.deleteNodes(newNodes.select("id"), detach = true)
    assert(s3.nodesDeleted == 10)
    assert(store.snapshot.nodes.count() == beforeCount)
  }

  test("temporal pattern detector: daily/burst concentration + velocity trends") {
    import graft.streaming.TemporalPatterns
    val sp = spark
    import sp.implicits._
    // user 1: 30 accesses, all at 09:xx across 30 days — strong daily
    // pattern, peak hour 9. user 2: uniform across hours, no pattern.
    // user 3: 12 accesses within the last minute of the data — burst.
    val daily9 = (0 until 30).map(d => (1L, f"2024-01-${d + 1}%02d 09:15:00"))
    val uniform = (0 until 24).map(h => (2L, f"2024-01-15 $h%02d:00:00"))
    val burst = (0 until 12).map(i => (3L, f"2024-01-30 23:59:${i + 10}%02d"))
    val ev = (daily9 ++ uniform ++ burst)
      .toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val pats = TemporalPatterns.detect(ev)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3))).toSet
    assert(pats.contains((1L, "daily", 9)))
    assert(pats.contains((3L, "burst", -1)))
    assert(!pats.exists { case (u, p, _) => u == 2L && p == "daily" })

    // trends: grower 1→20 events/day, decayer 20→1, flat stays flat
    val grow = for (d <- 0 until 20; i <- 0 until (d + 1)) yield (10L, f"2024-01-${d + 1}%02d 08:${i}%02d:00")
    val decay = for (d <- 0 until 20; i <- 0 until (20 - d)) yield (11L, f"2024-01-${d + 1}%02d 08:${i}%02d:00")
    val flat = for (d <- 0 until 20; i <- 0 until 5) yield (12L, f"2024-01-${d + 1}%02d 08:${i}%02d:00")
    val ev2 = (grow ++ decay ++ flat)
      .toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val trends = TemporalPatterns.trends(ev2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(trends.get(10L).contains("growing"), trends.toString)
    assert(trends.get(11L).contains("decaying"), trends.toString)
    assert(!trends.contains(12L), trends.toString)
  }

  test("streaming pattern detector matches batch daily/weekly rows exactly") {
    import graft.streaming.TemporalPatterns
    val batch = TemporalPatterns.detect(Tables.events(spark, sf))
      .filter(col("pattern").isin("daily", "weekly"))
      .collect().map(_.toSeq.toSeq).toSet
    val streamed = TemporalPatterns.detectStreaming(spark, sf, "tmp_pat_spec")
      .filter(col("pattern").isin("daily", "weekly"))
      .collect().map(_.toSeq.toSeq).toSet
    // daily/weekly are now-independent: GroupState histograms must land on
    // the identical confidence doubles as the one-pass batch aggregation
    assert(batch == streamed,
      s"batch-only: ${batch.diff(streamed).take(3)}, stream-only: ${streamed.diff(batch).take(3)}")
  }
}
