package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Tile, TileSink}

/** Tile PNG sink — layout, conventions, resume, and crash-debris semantics
  * (apps/gdalalg_raster_tile.cpp GenerateTile :667-680, GetFileY :1485).
  * The full E2E (write → delete subset → resume → round-trip checksums →
  * metadata.json) is the u04 oracle gate; this spec pins the corners the
  * gate doesn't reach. */
class TileSinkSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def mkTiles(z: Int): Seq[Tile] =
    for { x <- 0 until (1 << z); y <- 0 until (1 << z) }
      yield Tile(z, x, y, 0, 8, 8,
        Array.tabulate(64)(i => ((i * 31 + x * 7 + y * 3) % 256).toDouble))

  test("xyz layout writes z/x/y.png; tms flips y (GetFileY)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("ts_xyz").toString
    TileSink.writeTiles(spark.createDataset(mkTiles(1)), out).collect()
    assert(new java.io.File(s"$out/1/0/1.png").isFile)
    val outT = java.nio.file.Files.createTempDirectory("ts_tms").toString
    TileSink.writeTiles(spark.createDataset(mkTiles(1)), outT, convention = "tms").collect()
    // tile y=0 lands in file y=2^z-1-0=1 and vice versa
    assert(new java.io.File(s"$outT/1/0/1.png").isFile)
    // readTiles undoes the flip: logical tile sets identical across conventions
    val xyz = TileSink.readTiles(spark, out).collect().map(t => (t.z, t.x, t.y)).sorted
    val tms = TileSink.readTiles(spark, outT, convention = "tms").collect()
      .map(t => (t.z, t.x, t.y)).sorted
    assert(xyz.toSeq === tms.toSeq)
  }

  test("resume skips existing files and does not rewrite them") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("ts_resume").toString
    val ds = spark.createDataset(mkTiles(1))
    TileSink.writeTiles(ds, out).collect()
    val f = new java.io.File(s"$out/1/1/1.png")
    val mtime0 = f.lastModified()
    Thread.sleep(20)
    val again = TileSink.writeTiles(ds, out, resume = true).collect()
    assert(again.forall(!_.getBoolean(4)), "resume over a complete set writes nothing")
    assert(f.lastModified() === mtime0, "existing file must not be touched")
    // non-resume mode overwrites idempotently
    val full = TileSink.writeTiles(ds, out).collect()
    assert(full.forall(_.getBoolean(4)))
  }

  test("crash debris (*.inprogress) is neither resumed over nor read back") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("ts_crash").toString
    val ds = spark.createDataset(mkTiles(1))
    TileSink.writeTiles(ds, out).collect()
    // simulate a kill mid-write of tile (1,0,0): half-written tmp, final gone
    new java.io.File(s"$out/1/0/0.png").delete()
    val debris = new java.io.FileOutputStream(s"$out/1/0/0.png.inprogress")
    debris.write(Array[Byte](1, 2, 3)); debris.close()
    val again = TileSink.writeTiles(ds, out, resume = true).collect()
    val rewritten = again.filter(_.getBoolean(4)).map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(rewritten.toSeq === Seq((1, 0, 0)), "only the killed tile regenerates")
    // the regenerated file decodes to the source pixels
    val t = TileSink.readTiles(spark, out).collect().find(t => t.x == 0 && t.y == 0).get
    assert(t.pixels.toSeq === mkTiles(1).find(t => t.x == 0 && t.y == 0).get.pixels.toSeq)
  }

  test("streaming tile sink: foreachBatch + per-file resume is restart-idempotent") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("ts_sin").toString
    val out = java.nio.file.Files.createTempDirectory("ts_sout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ts_sck").toString
    // stage two batches of tiles as parquet files appearing over time
    val batch1 = mkTiles(1).take(2)
    val batch2 = mkTiles(1).drop(2)
    spark.createDataset(batch1).write.parquet(s"$in/b1.parquet")
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(spark.createDataset(mkTiles(1)).toDF.schema)
        .parquet(s"$in/*") // each staged batch is its own parquet dir
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          TileSink.writeTiles(df.as[Tile], out, resume = true).collect(): Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(new java.io.File(s"$out/1/0/0.png").isFile)
    val mtime0 = new java.io.File(s"$out/1/0/0.png").lastModified()
    Thread.sleep(20)
    // second file arrives; restart resumes from the checkpoint and the
    // per-file resume skips the batch-1 tiles
    spark.createDataset(batch2).write.mode("append").parquet(s"$in/b2.parquet")
    runOnce()
    val all = TileSink.readTiles(spark, out).collect()
    assert(all.length === 4, all.map(t => (t.x, t.y)).mkString(","))
    assert(new java.io.File(s"$out/1/0/0.png").lastModified() === mtime0,
      "batch-1 tiles must not be rewritten on restart")
  }

  test("jpeg format: .jpg extension, bounded lossy round-trip, png coexists") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("ts_jpg").toString
    // smooth gradient — JPEG's DCT reproduces it within a few counts
    val smooth = for { x <- 0 until 2; y <- 0 until 2 }
      yield Tile(1, x, y, 0, 16, 16,
        Array.tabulate(256)(i => ((i % 16) * 4 + (i / 16) * 4 + x * 3 + y * 5).toDouble))
    val w = TileSink.writeTiles(spark.createDataset(smooth), out, format = "jpeg").collect()
    assert(w.forall(_.getString(3).endsWith(".jpg")))
    assert(new java.io.File(s"$out/1/0/1.jpg").isFile)
    val back = TileSink.readTiles(spark, out, format = "jpeg").collect()
    assert(back.length === 4)
    for (t <- back) {
      val src = smooth.find(s0 => s0.x == t.x && s0.y == t.y).get.pixels
      val err = t.pixels.indices.map(i => math.abs(t.pixels(i) - src(i))).max
      assert(err <= 16.0, s"jpeg round-trip err $err at (${t.x},${t.y})")
    }
    // a png written into the same tree is invisible to the jpg reader
    TileSink.writeTiles(spark.createDataset(Seq(smooth.head.copy(z = 0, x = 0, y = 0))), out).collect()
    assert(TileSink.readTiles(spark, out, format = "jpeg").collect().length === 4)
    assert(TileSink.readTiles(spark, out).collect().length === 1)
    // unknown format refuses loudly
    val ex = intercept[org.apache.spark.SparkException] {
      TileSink.writeTiles(spark.createDataset(smooth), out, format = "tiffx").collect()
    }
    assert(ex.getMessage.contains("tiffx") || ex.getCause != null)
  }

  test("pixel clamp: non-finite -> 0, out-of-range clamped to [0,255]") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("ts_clamp").toString
    val px = Array(Double.NaN, -5.0, 300.0, 254.6) ++ Array.fill(60)(7.0)
    TileSink.writeTiles(spark.createDataset(Seq(Tile(0, 0, 0, 0, 8, 8, px))), out).collect()
    val back = TileSink.readTiles(spark, out).collect().head.pixels
    assert(back.take(4).toSeq === Seq(0.0, 0.0, 255.0, 255.0))
  }
}
