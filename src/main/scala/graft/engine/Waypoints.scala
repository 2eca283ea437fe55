package graft.engine

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** F10-F12 + F14: trip route shapes — haversine distance, waypoint
  * densification, seconds-of-day timestamps
  * (`update_tripsmap.py:100-221`).
  *
  * The external Mapbox Directions call (`update_tripsmap.py:121-155`)
  * sits behind [[RouteProvider]]; the zero-egress build uses
  * [[StraightLineRoutes]], a deterministic straight segment between the
  * endpoints, so goldens are defined over the stub (SURVEY.md §7.3).
  *
  * Runs as a Scala UDF over the <= 30-per-year top-trip rows — a tiny
  * input by construction (W1's rank filter), so UDF cost is irrelevant
  * and the enrichment stays fully distributed (no driver collect).
  */
object Waypoints {

  /** (lon, lat) points, reference's coordinate order. */
  type Shape = Seq[(Double, Double)]

  trait RouteProvider extends Serializable {
    /** Route geometry from (fromLon, fromLat) to (toLon, toLat). */
    def route(fromLon: Double, fromLat: Double, toLon: Double, toLat: Double): Shape
  }

  /** Deterministic stand-in for the Mapbox cycling route. */
  object StraightLineRoutes extends RouteProvider {
    def route(fromLon: Double, fromLat: Double, toLon: Double, toLat: Double): Shape =
      Seq((fromLon, fromLat), (toLon, toLat))
  }

  /** Haversine km. The reference uses geopy geodesic
    * (`update_tripsmap.py:158-163`); haversine agrees within ~0.5% at
    * sub-km scales — inside the densification thresholds' tolerance. */
  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val r = 6371.0088
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * r * math.asin(math.sqrt(a))
  }

  private def round5(x: Double): Double =
    BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  /** `divide_points` (`update_tripsmap.py:166-173`): n linearly spaced
    * points from (lon1,lat1) to (lon2,lat2) inclusive, rounded to 5 dp
    * (numpy round = half-even, matched here). */
  def dividePoints(lat1: Double, lon1: Double, lat2: Double, lon2: Double,
                   n: Int): Shape = {
    (0 until n).map { i =>
      val t = if (n == 1) 0.0 else i.toDouble / (n - 1)
      (round5(lon1 + t * (lon2 - lon1)), round5(lat1 + t * (lat2 - lat1)))
    }
  }

  /** `extend_shape` (`update_tripsmap.py:176-203`). Preserves the
    * reference quirk of passing (lon, lat) into the distance function's
    * (lat, lon) parameters — distances are computed over swapped
    * coordinates, and the 0.2/0.37 km thresholds apply to that value. */
  def extendShape(shape: Shape): Shape = {
    if (shape.size < 2) return shape.map { case (lon, lat) => (round5(lon), round5(lat)) }
    val out = Seq.newBuilder[(Double, Double)]
    shape.sliding(2).foreach { case Seq((lon1, lat1), (lon2, lat2)) =>
      val d = haversineKm(lon1, lat1, lon2, lat2) // swapped, as in reference
      if (d > 0.2 && d < 0.37) out ++= dividePoints(lat1, lon1, lat2, lon2, 2)
      else if (d > 0.37) out ++= dividePoints(lat1, lon1, lat2, lon2, 4)
      else out += ((lon1, lat1))
    }
    out += shape.last
    out.result().map { case (lon, lat) => (round5(lon), round5(lat)) }
  }

  final case class Waypoint(timestamp: Double, coordinates: Seq[Double])

  /** `get_trip_times` (`update_tripsmap.py:205-221`): i-th densified
    * point stamped with seconds-of-day of start_time + i hours. */
  def tripTimes(shape: Shape, startTime: java.sql.Timestamp): Seq[Waypoint] = {
    val extended = extendShape(shape)
    val ldt = startTime.toLocalDateTime
    extended.zipWithIndex.map { case ((lon, lat), i) =>
      val t = ldt.plusHours(i.toLong)
      val secs = t.getHour * 3600 + t.getMinute * 60 + t.getSecond +
        t.getNano / 1e9
      Waypoint(secs, Seq(lon, lat))
    }
  }

  /** Column-level entry: waypoints(fromLat, fromLon, toLat, toLon,
    * startTime) -> array<struct<timestamp:double, coordinates:array<double>>> */
  def waypointsUdf(provider: RouteProvider = StraightLineRoutes) =
    udf((fromLat: Double, fromLon: Double, toLat: Double, toLon: Double,
         startTime: java.sql.Timestamp) =>
      // reference-typed params are not auto-null-skipped by Spark; a
      // null start_time (possible on caller-supplied frames) must yield
      // null, not an executor NPE
      if (startTime == null) null
      else tripTimes(provider.route(fromLon, fromLat, toLon, toLat), startTime))
}
