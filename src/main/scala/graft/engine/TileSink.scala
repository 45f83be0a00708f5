package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.hadoop.fs.Path

/** Tile-pyramid image sink: encode tiles as real PNG files in the
  * `outDir/z/x/y.png` layout, with per-file resume and the web-viewer
  * metadata descriptor.
  *
  * Reference: `gdal raster tile` — GenerateTile writes each tile to
  * `<out>/<z>/<x>/<fileY>.<ext>` and `--resume` stat-and-skips existing
  * files (/root/reference/apps/gdalalg_raster_tile.cpp:667-680); the
  * TMS/XYZ y-flip is GetFileY (:1485); the leaflet/openlayers descriptor
  * variables are GenerateLeaflet (:2176-2216).
  *
  * Spark shape: encoding + writing runs inside the tile tasks — each tile's
  * file write is independent and idempotent (tmp-file + rename, so a killed
  * run never leaves a half-written y.png that resume would skip), so the
  * sink needs no coordination, no driver bottleneck, and no shuffle beyond
  * whatever produced the tiles. Resume is the reference's own semantics —
  * one existence stat per tile inside the task (same filesystem RPC the
  * native tool pays per file). At 100 TB the file-per-tile layout is the
  * product contract (web map servers read z/x/y.png directly), so the
  * per-file IO is irreducible; tasks stream tiles one at a time and hold
  * only one encoded PNG in memory.
  */
object TileSink {

  /** Gray-8 PNG encode + write every tile of `tiles`; returns one row per
    * tile: (z, x, y, path, written, bytes). With `resume=true`, tiles whose
    * file already exists are skipped (`written=false`, the reference's
    * "Generate only missing files"). Pixels are clamped to [0,255] with the
    * GDAL Byte rounding (+0.5 floor). `convention` is "xyz" (default) or
    * "tms" (y flipped, GetFileY). The returned DataFrame is lazy; the
    * writes happen when it is evaluated and are idempotent, so multiple
    * actions over it are safe. */
  /** File extension for a tile format (the reference writes "jpg" for
    * JPEG, gdalalg_raster_tile.cpp:2566). */
  def extOf(format: String): String = format.toLowerCase match {
    case "jpeg" | "jpg" => "jpg"
    case f => f
  }

  def writeTiles(tiles: Dataset[Tile], outDir: String,
                 convention: String = "xyz", resume: Boolean = false,
                 format: String = "png"): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val tms = convention.equalsIgnoreCase("tms")
    val ext = extOf(format)
    tiles.mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      it.map { t =>
        val fileY = if (tms) (1 << t.z) - 1 - t.y else t.y
        val rel = s"${t.z}/${t.x}/$fileY.$ext"
        val path = new Path(s"$outDir/$rel")
        val fs = path.getFileSystem(conf)
        if (resume && fs.exists(path)) (t.z, t.x, t.y, rel, false, 0L)
        else {
          val bytes = Multimodal.grayEncode(format, t.w, t.h) { (x, y) =>
            val d = t.pixels(y * t.w + x)
            if (!java.lang.Double.isFinite(d)) 0
            else math.max(0, math.min(255, math.floor(d + 0.5).toInt))
          }
          // tmp + rename: a kill mid-write can only leave *.inprogress
          // debris, never a truncated y.png that resume would then skip
          val tmp = new Path(s"$outDir/$rel.inprogress")
          val os = fs.create(tmp, true)
          try os.write(bytes) finally os.close()
          if (fs.exists(path) && !fs.delete(path, false))
            throw new java.io.IOException(s"tile sink: cannot replace $path")
          // a failed rename must NOT report written=true — resume would then
          // skip a tile whose bytes may belong to a concurrent attempt
          if (!fs.rename(tmp, path))
            throw new java.io.IOException(s"tile sink: rename $tmp -> $path failed")
          (t.z, t.x, t.y, rel, true, bytes.length.toLong)
        }
      }
    }.toDF("z", "x", "y", "path", "written", "bytes")
  }

  /** Read a z/x/y.png tree back into tiles (ImageIO gray decode). The
    * distributed inverse of [[writeTiles]] — used by the u04 gate to prove
    * the files on disk round-trip to the exact source pixels. */
  def readTiles(spark: SparkSession, outDir: String,
                convention: String = "xyz", format: String = "png"): Dataset[Tile] = {
    import spark.implicits._
    val tms = convention.equalsIgnoreCase("tms")
    val ext = extOf(format)
    spark.read.format("binaryFile").load(s"$outDir/*/*/*.$ext")
      .select("path", "content")
      .as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        val parts = p.split('/')
        val z = parts(parts.length - 3).toInt
        val x = parts(parts.length - 2).toInt
        val fileY = parts(parts.length - 1).stripSuffix(s".$ext").toInt
        val y = if (tms) (1 << z) - 1 - fileY else fileY
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        val (w, h) = (img.getWidth, img.getHeight)
        val px = new Array[Double](w * h)
        val raster = img.getRaster
        var j = 0
        while (j < h) {
          var i = 0
          while (i < w) { px(j * w + i) = raster.getSample(i, j, 0).toDouble; i += 1 }
          j += 1
        }
        Tile(z, x, y, 0, w, h, px)
      }
  }

  /** Write `metadata.json` next to the tiles — the same variable set the
    * reference substitutes into its leaflet/openlayers templates
    * (GenerateLeaflet, gdalalg_raster_tile.cpp:2176: title, S/W/N/E bounds,
    * min/max zoom, tile size, format, tms flag), as a machine-readable
    * descriptor. One driver-side small-file write. */
  def writeMetadata(spark: SparkSession, outDir: String, title: String,
                    west: Double, south: Double, east: Double, north: Double,
                    minZoom: Int, maxZoom: Int, tileSize: Int,
                    convention: String = "xyz", copyright: String = "",
                    format: String = "png"): Unit = {
    val ext = extOf(format)
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val json =
      s"""{
         |  "title": "${esc(title)}",
         |  "copyright": "${esc(copyright)}",
         |  "west": $west,
         |  "south": $south,
         |  "east": $east,
         |  "north": $north,
         |  "minzoom": $minZoom,
         |  "maxzoom": $maxZoom,
         |  "tile_size": $tileSize,
         |  "tileformat": "$ext",
         |  "tms": ${if (convention.equalsIgnoreCase("tms")) 1 else 0},
         |  "tiles": "{z}/{x}/{y}.$ext"
         |}
         |""".stripMargin
    val path = new Path(s"$outDir/metadata.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(path, true)
    try os.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
  }
}
