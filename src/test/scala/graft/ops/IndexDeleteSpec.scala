package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The IVF-PQ index DELETE verb (q135): tombstone marks, serve-side
  * exclusion, physical purge — and the contracts that make it safe:
  * idempotent re-delete, serve equality across the purge, repeated
  * delete/purge cycles, and no cached copy left by the purge. */
class IndexDeleteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = graft.engine.Tables(
    spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val cfg = Pq.PqConfig(m = 8, ksub = 16,
    bitsPerCode = 7, dim = 64)

  test("tombstoned serve == purged serve, deleted ids never returned, " +
    "re-delete idempotent, tombstones cleared by purge, second cycle " +
    "works") {
    val wh = tmpDir("idxdel")
    Pq.buildIvfPqIndex(e, cfg, cellSize = 64, wh, "idx", nBuckets = 4)
    val (cents, kCells) = IvfIndex.sampleQuantizerDf(e, 64)
    val cb = Pq.sampleCodebooks(e, cfg)
    def serve(idx: org.apache.spark.sql.DataFrame) =
      Pq.ivfPqServe(idx, e, cents, kCells, cb, cfg, nProbe = 4,
        nQueries = 10, k = 5, shortlist = 30)
        .orderBy("query_id", "rank").collect().toSeq

    val dels = e.filter(col("vec_id") % 5 === 2).select("vec_id")
    val delIds = dels.as[Long].collect().toSet
    Pq.deleteFromIndex(wh, "idx", dels)
    // idempotent: deleting the same ids again changes nothing
    Pq.deleteFromIndex(wh, "idx", dels.limit(3))

    val before = serve(Pq.liveIndex(spark, wh, "idx"))
    assert(before.nonEmpty)
    assert(before.forall(r => !delIds(r.getAs[Long]("vec_id"))),
      "a tombstoned id was served")

    val nBefore = spark.table(
      graft.engine.TableStore.bucketedName(spark, wh, "idx")).count()
    // the shared test session may carry other suites' cache entries —
    // clear first so the post-purge emptiness assert sees only what
    // THIS purge would have left behind
    spark.catalog.clearCache()
    val ct = Pq.purgeDeletes(spark, wh, "idx", nBuckets = 4)
    assert(spark.sharedState.cacheManager.isEmpty,
      "purge left a cached copy of the index")
    val nAfter = spark.table(ct).count()
    assert(nAfter === nBefore - delIds.size,
      s"purge should drop exactly the tombstoned rows: $nBefore -> $nAfter")
    // tombstone table cleared: the live view IS the table now
    assert(Pq.indexTombstones(spark, wh, "idx").count() === 0L)
    val after = serve(spark.table(ct))
    assert(after === before,
      "purge changed answers - it may only change layout")

    // second cycle over the purged index
    val dels2 = e.filter(col("vec_id") % 5 === 4).select("vec_id")
    val delIds2 = dels2.as[Long].collect().toSet
    Pq.deleteFromIndex(wh, "idx", dels2)
    val round2 = serve(Pq.liveIndex(spark, wh, "idx"))
    assert(round2.forall(r => !delIds(r.getAs[Long]("vec_id")) &&
      !delIds2(r.getAs[Long]("vec_id"))))
    val ct2 = Pq.purgeDeletes(spark, wh, "idx", nBuckets = 4)
    assert(serve(spark.table(ct2)) === round2)
  }
}
