package graft.engine

import graft.SparkSpec
import graft.ops.{Packing, Sharding}

/** The JSONL delivery sink: round-trip fidelity, sharded layout with
  * physical in-shard line order, and overwrite semantics. */
class JsonlSinkSpec extends SparkSpec {
  import spark.implicits._

  test("unsharded: every row round-trips as one JSON line; a rewrite " +
    "atomically replaces the delivery") {
    val wh = tmpDir("jsonl-wh")
    val df = Seq((1L, "alpha", 2.5), (2L, "beta \"quoted\"", -1.0),
      (3L, null.asInstanceOf[String], 0.0)).toDF("id", "text", "score")
    TableStore.writeJsonl(df, wh, "Delivery", orderBy = Seq("id"))
    val back = spark.read.json(s"$wh/Delivery")
    assert(back.count() == 3)
    val got = back.orderBy("id").collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        if (r.isNullAt(r.fieldIndex("text"))) null
        else r.getString(r.fieldIndex("text"))))
    // to_json/toJSON drop null fields per line; read.json re-nulls them
    assert(got.toSeq == Seq((1L, "alpha"), (2L, "beta \"quoted\""),
      (3L, null)))
    // temp-and-swap overwrite: the new delivery fully replaces the old
    TableStore.writeJsonl(df.filter($"id" =!= 2L), wh, "Delivery",
      orderBy = Seq("id"))
    assert(spark.read.json(s"$wh/Delivery").count() == 2)
  }

  test("sharded delivery: shard=k dirs; each shard's PHYSICAL line " +
    "order is shard_pos ascending (the trainer resume contract)") {
    val wh = tmpDir("jsonl-shard-wh")
    val docs = (0L until 200L).map(i => (i, ("tok " * 40).trim))
      .toDF("doc_id", "text")
    val shards = Sharding.epochShards(
      Packing.packChunks(docs, 64L).select("chunk_id").distinct(),
      nShards = 4, epoch = 1)
    TableStore.writeJsonl(shards, wh, "Shards", shardBy = Some("shard"),
      orderBy = Seq("shard_pos"))
    val expect = shards.collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(0)))
      .groupBy(_._1)
      .map { case (s, rs) => s -> rs.sortBy(_._2).map(_._3).toSeq }
    val root = new java.io.File(s"$wh/Shards")
    val dirs = root.listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(dirs.map(_.getName).toSet ==
      expect.keySet.map(s => s"shard=$s"))
    dirs.foreach { dir =>
      val s = dir.getName.stripPrefix("shard=").toLong
      val lines = dir.listFiles().filter(_.getName.startsWith("part-"))
        .sortBy(_.getName)
        .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
      // parse chunk_id + shard_pos from each JSON line, in FILE order
      val posRe = """"shard_pos":(\d+)""".r
      val idRe = """"chunk_id":(\d+)""".r
      val parsed = lines.map { l =>
        (idRe.findFirstMatchIn(l).get.group(1).toLong,
          posRe.findFirstMatchIn(l).get.group(1).toLong)
      }
      assert(parsed.map(_._2).toSeq ==
        parsed.indices.map(_.toLong).toSeq,
        s"shard $s lines not in shard_pos order")
      assert(parsed.map(_._1).toSeq == expect(s),
        s"shard $s content mismatch")
    }
  }

  test("the REAL q83 epoch shards at sf0.01 deliver end-to-end: " +
    "read-back of the JSONL files equals the q83 frame, in physical " +
    "(shard, shard_pos) order — the trainer resume contract") {
    val wh = tmpDir("jsonl-q83-wh")
    // exactly the q83 pipeline: pack sf0.01 documents at context 512,
    // distinct chunk ids, epoch-1 shuffle into 8 shards
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
    val q83 = Sharding.epochShards(
      Packing.packChunks(docs, 512L).select("chunk_id").distinct(),
      nShards = 8, epoch = 1)
    TableStore.writeJsonl(q83, wh, "Epoch1", shardBy = Some("shard"),
      orderBy = Seq("shard_pos"))
    val expect = q83.collect()
      .map(r => (r.getLong(r.fieldIndex("shard")),
        r.getLong(r.fieldIndex("shard_pos")),
        r.getLong(r.fieldIndex("chunk_id"))))
      .groupBy(_._1)
      .map { case (s, rs) => s -> rs.sortBy(_._2).map(_._3).toSeq }
    assert(expect.nonEmpty && expect.values.map(_.size).sum > 20,
      "sf0.01 should pack into a non-trivial chunk count (53 measured)")
    val root = new java.io.File(s"$wh/Epoch1")
    val dirs = root.listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(dirs.map(_.getName).toSet ==
      expect.keySet.map(s => s"shard=$s"),
      "every shard the frame assigns must exist as a delivery dir")
    val posRe = """"shard_pos":(\d+)""".r
    val idRe = """"chunk_id":(\d+)""".r
    dirs.foreach { dir =>
      val s = dir.getName.stripPrefix("shard=").toLong
      val parsed = dir.listFiles().filter(_.getName.startsWith("part-"))
        .sortBy(_.getName)
        .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
        .map { l =>
          (idRe.findFirstMatchIn(l).get.group(1).toLong,
            posRe.findFirstMatchIn(l).get.group(1).toLong)
        }
      // dense physical order: line i IS shard_pos i — a trainer can
      // resume from (shard, line offset) with no index structure
      assert(parsed.map(_._2).toSeq ==
        parsed.indices.map(_.toLong).toSeq,
        s"shard $s lines not in dense shard_pos order")
      assert(parsed.map(_._1).toSeq == expect(s),
        s"shard $s chunk sequence differs from the q83 frame")
    }
  }
}
