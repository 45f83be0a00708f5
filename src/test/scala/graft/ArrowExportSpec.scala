package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.ArrowExport

/** Arrow IPC export (ogrlayerarrow.cpp GetArrowStream analog): per-partition
  * streams round-trip every supported type including nulls. */
class ArrowExportSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("all core types + nulls round-trip through IPC bytes") {
    import spark.implicits._
    val df = spark.sql("""
      SELECT * FROM VALUES
        (1L, 7, CAST(1.5 AS DOUBLE), CAST(2.5 AS FLOAT), 'alpha', true,
         X'DEADBEEF', DATE'2024-03-01', TIMESTAMP'2024-03-01 12:34:56.789'),
        (2L, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
        (3L, -42, CAST(-0.25 AS DOUBLE), CAST(9.0 AS FLOAT), 'β-utf8', false,
         X'00FF', DATE'1969-12-31', TIMESTAMP'1969-12-31 23:59:59')
      AS t(id, i, d, f, s, b, bin, dt, ts)""").repartition(2)
    val streams = ArrowExport.toIpcStreams(df, batchRows = 2).collect()
    assert(streams.nonEmpty && streams.length <= 2)
    val all = streams.map(s => ArrowExport.readIpc(s._2))
    assert(all.map(_._1).sum === 3L)
    val ids = all.flatMap(_._2("id")).map(_.asInstanceOf[Long]).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
    // null propagation: the id=2 row is null in every other column
    val byId = all.flatMap { case (_, cols) =>
      cols("id").indices.map(r => cols("id")(r) -> cols.map { case (k, v) => k -> v(r) })
    }.toMap
    val row2 = byId(2L)
    for (c <- Seq("i", "d", "f", "s", "b", "bin", "dt", "ts"))
      assert(row2(c) == null, s"column $c")
    val row1 = byId(1L)
    assert(row1("s") === "alpha" && row1("i") === 7 && row1("d") === 1.5)
    assert(row1("bin") === Seq[Byte](0xDE.toByte, 0xAD.toByte, 0xBE.toByte, 0xEF.toByte))
    val row3 = byId(3L)
    assert(row3("s") === "β-utf8" && row3("b") === false)
  }

  test("multi-batch stream: batchRows smaller than partition size") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v").coalesce(1)
    val Array((_, bytes)) = ArrowExport.toIpcStreams(df, batchRows = 64).collect()
    val (n, cols) = ArrowExport.readIpc(bytes)
    assert(n === 1000L)
    assert(cols("k").map(_.asInstanceOf[Long]).sum === (0L until 1000L).sum)
  }
}
