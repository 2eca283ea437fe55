package graft.engine

import graft.SparkSpec
import graft.engine.builders.DockMap
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5.4):
  * (a) swap repair is idempotent and bbox-preserving,
  * (b) additive merge key-space = union of inputs' key spaces,
  * (c) dock year-map merge is associative across batch order for
  *     disjoint months,
  * (d) top-k: <= k rows per partition, counts non-increasing.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val coord: Gen[Double] = Gen.chooseNum(-180.0, 180.0)

  /** Deterministic sampling in place of the scalatest-scalacheck bridge
    * (not in the offline dependency cache). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.apply(Gen.Parameters.default, Seed(42L + i)).get)

  test("swap repair is idempotent and never un-fixes an in-bbox pair") {
    samples(Gen.listOfN(30, Gen.zip(coord, coord, coord, coord)), 10).foreach { rows =>
      val df = rows.toDF("start_station_latitude", "start_station_longitude",
          "end_station_latitude", "end_station_longitude")
      val once = Quality.swapRepair(df)
      val twice = Quality.swapRepair(once)
      // idempotence on the subset already in-bbox after one pass:
      // rows repaired into the bbox stay identical under a second pass
      val inBoxOnce = once.filter(
        $"start_station_latitude".between(TripSchema.LatMin, TripSchema.LatMax) &&
        $"start_station_longitude".between(TripSchema.LonMin, TripSchema.LonMax))
      val inBoxTwice = twice.filter(
        $"start_station_latitude".between(TripSchema.LatMin, TripSchema.LatMax) &&
        $"start_station_longitude".between(TripSchema.LonMin, TripSchema.LonMax))
      assert(inBoxOnce.collect().toSet == inBoxTwice.collect().toSet)
    }
  }

  test("upsertAdd: merged key set is the union, merged sum preserved") {
    val genA = Gen.listOfN(20, Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(1L, 100L)))
    val genB = Gen.listOfN(20, Gen.zip(Gen.oneOf("c", "d", "e", "f"), Gen.chooseNum(1L, 100L)))
    samples(Gen.zip(genA, genB), 10).foreach { case (xs, ys) =>
      val e = xs.toDF("k", "n").groupBy("k").agg(sum("n").as("n"))
      val d = ys.toDF("k", "n").groupBy("k").agg(sum("n").as("n"))
      val m = Merge.upsertAdd(e, d, Seq("k"), Seq("n"))
      val keys = m.select("k").as[String].collect().toSet
      assert(keys == (xs.map(_._1) ++ ys.map(_._1)).toSet)
      val total = m.agg(sum("n")).as[Long].head()
      assert(total == xs.map(_._2).sum + ys.map(_._2).sum)
    }
  }

  test("dock mergeYearMaps is order-insensitive for disjoint months") {
    val a = Seq(("2021-01-05 08:00:00", "subscriber"))
    val b = Seq(("2021-02-06 09:00:00", "customer"))
    def trips(rows: Seq[(String, String)]) =
      rows.toDF("st", "user_type").select(
        to_timestamp($"st").as("start_time"), to_timestamp($"st").as("end_time"),
        lit("A").as("start_station_name"), lit("1").as("start_station_id"),
        lit("B").as("end_station_name"), lit("2").as("end_station_id"),
        lit(-73.95).as("start_station_longitude"), lit(40.7).as("start_station_latitude"),
        lit(40.8).as("end_station_latitude"), lit(-73.96).as("end_station_longitude"),
        $"user_type", lit("classic_bike").as("rideable_type"),
        date_format($"st".cast("timestamp"), "yyyy").as("year"),
        date_format($"st".cast("timestamp"), "MMM").as("month"))
    val ab = DockMap.merge(DockMap.build(trips(a)), DockMap.build(trips(b)))
    val ba = DockMap.merge(DockMap.build(trips(b)), DockMap.build(trips(a)))
    def months(df: org.apache.spark.sql.DataFrame) =
      df.filter($"station_name" === "A").collect()(0)
        .getAs[Map[String, org.apache.spark.sql.Row]]("station_data")("2021")
        .getAs[Map[String, org.apache.spark.sql.Row]]("months").keySet
    assert(months(ab) == months(ba))
  }

  test("top-k: <= 30 rows per year, trip_count non-increasing in rank") {
    val df = graft.queries.Registry.queries("q03_topk_trips")(
      spark, "/root/testdata/sf0.001")
    val perYear = df.groupBy("year").count().select("count").as[Long].collect()
    assert(perYear.forall(_ <= 30))
    val rows = df.select("year", "rn", "trip_count")
      .as[(String, Int, Long)].collect().groupBy(_._1)
    rows.values.foreach { ys =>
      val sorted = ys.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (x, y) => x >= y })
    }
  }
}
