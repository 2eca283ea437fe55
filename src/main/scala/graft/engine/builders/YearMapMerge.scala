package graft.engine.builders

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` form of the dock-map deep merge — the UDAF surface
  * of SURVEY §2.10 / §7.3.
  *
  * Merges many per-batch `station_data` maps
  * (`Map[year -> (year_starts, year_ends, Map[month -> (total, starts,
  * ends)])]`) into one, with the same semantics as
  * [[DockMap.mergeYearMaps]]: later year entries overwrite
  * year_starts/year_ends and union months (later months win). Useful
  * when a station's partial profiles arrive as many rows (e.g. one per
  * loaded archive) and must be folded in a single groupBy — the
  * expression form only merges two columns at a time.
  *
  * Note the reduce order inside a partition follows row order; the
  * operation is commutative for the disjoint-period batches the
  * pipeline produces (PropertySpec pins this).
  */
object YearMapMerge {

  type Months = Map[String, (Long, Long, Long)] // total, starts, ends
  type YearStats = (Long, Long, Months)         // year_starts, year_ends, months
  type YearMap = Map[String, YearStats]

  def mergeTwo(a: YearMap, b: YearMap): YearMap = {
    (a.keySet ++ b.keySet).map { y =>
      val merged = (a.get(y), b.get(y)) match {
        case (Some(old), Some(nw)) => (nw._1, nw._2, old._3 ++ nw._3)
        case (old, nw) => nw.orElse(old).get
      }
      y -> merged
    }.toMap
  }

  val aggregator: Aggregator[YearMap, YearMap, YearMap] =
    new Aggregator[YearMap, YearMap, YearMap] {
      def zero: YearMap = Map.empty
      def reduce(buf: YearMap, row: YearMap): YearMap = mergeTwo(buf, row)
      def merge(b1: YearMap, b2: YearMap): YearMap = mergeTwo(b1, b2)
      def finish(r: YearMap): YearMap = r
      def bufferEncoder: Encoder[YearMap] = Encoders.kryo[YearMap]
      def outputEncoder: Encoder[YearMap] = Encoders.kryo[YearMap]
    }
}
