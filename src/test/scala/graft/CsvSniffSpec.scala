package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sql.CsvSniff

/** OGR CSV AUTODETECT_TYPE semantics (ogrcsvlayer.cpp:881-1215 +
  * CPLGetValueType, cpl_string.cpp:2937). */
class CsvSniffSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def seqType(vals: Seq[String]): String = {
    var s = 0
    vals.foreach { v => s = CsvSniff.step(s, CsvSniff.classify(v)) }
    CsvSniff.typeName(s)
  }

  test("CPLGetValueType port: the reference's documented examples") {
    def t(v: String) = CsvSniff.cplValueType(v)
    // doubles: "+25.e+3", "-25.e-3", "25.e3", "25e3", " 25e3 "
    Seq("+25.e+3", "-25.e-3", "25.e3", "25e3", " 25e3 ").foreach(v => assert(t(v) === 2, v))
    // not doubles: "25e 3", "25e.3", "-2-5e3", "2-5e3", "25.25.3", "-3d", "d1"
    Seq("25e 3", "25e.3", "-2-5e3", "2-5e3", "25.25.3", "-3d", "d1").foreach(v => assert(t(v) === 0, v))
    // leading zero rule; int vs real
    assert(t("0123") === 0); assert(t("0") === 1); assert(t("0.5") === 2)
    assert(t("42") === 1); assert(t("-42") === 1)
    // giant exponent evaluating to infinity → string
    assert(t("1e4000") === 0); assert(t("1e300") === 2)
  }

  test("classification: int32 split, inf/nan words, dates, booleans") {
    import CsvSniff._
    assert(classify("5") === CInt)
    assert(classify("4000000000") === CInt64)
    assert(classify("99999999999999999999999") === CInt64)
    assert(classify("1.5") === CReal)
    assert(classify("inf") === CReal); assert(classify("NaN") === CReal)
    assert(classify("2023-01-02") === CDate)
    assert(classify("2023/01/02") === CDate)
    assert(classify("12:34") === CTime); assert(classify("12:34:56.75") === CTime)
    assert(classify("2023-01-02 03:04:05") === CDateTime)
    assert(classify("2023-01-02T03:04:05Z") === CDateTime)
    assert(classify("2023-13-02") === CStr) // month out of range
    assert(classify("25:00") === CStr)      // hour out of range
    Seq("t", "TRUE", "y", "Yes", "on", "f", "False", "n", "NO", "off")
      .foreach(v => assert(classify(v) === CBool, v))
    assert(classify("") === CEmpty)
    assert(classify("abc") === CStr)
  }

  test("sequential promotion lattice") {
    assert(seqType(Seq("1", "2", "3")) === "Integer")
    assert(seqType(Seq("1", "4000000000")) === "Integer64")
    assert(seqType(Seq("1", "2.5")) === "Real")
    assert(seqType(Seq("4000000000", "2.5")) === "Real")
    assert(seqType(Seq("2.5", "1", "4000000000")) === "Real")
    assert(seqType(Seq("2023-01-02", "2023-01-03")) === "Date")
    assert(seqType(Seq("2023-01-02", "2023-01-02 03:04:05")) === "DateTime")
    assert(seqType(Seq("12:34", "11:00")) === "Time")
    assert(seqType(Seq("12:34", "2023-01-02")) === "String")
    assert(seqType(Seq("1", "abc")) === "String")
    assert(seqType(Seq("", "")) === "String") // never set
    assert(seqType(Seq("t", "no", "TRUE")) === "Integer(Boolean)")
  }

  test("the order-dependent boolean corners, branch-for-branch") {
    // first value boolean word: numeric follow-ups leave the flag intact
    assert(seqType(Seq("t", "5")) === "Integer(Boolean)")
    // reverse order finalizes String with the flag never set
    assert(seqType(Seq("5", "t")) === "String")
    // a non-boolean string clears the flag and finalizes
    assert(seqType(Seq("t", "x", "t")) === "String")
    // finalized-String fields stop updating (":988 continue")
    assert(seqType(Seq("x", "t", "t", "t")) === "String")
    // boolean then date-like: string branch clears the flag
    assert(seqType(Seq("t", "2023-01-02")) === "String")
    // boolean then inf: numeric path, flag survives
    assert(seqType(Seq("t", "inf")) === "Integer(Boolean)")
  }

  test("distributed sniff is order-faithful at any parallelism") {
    import spark.implicits._
    val n = 1000
    val rows = (0 until n).map { i =>
      val bThenI = if (i == 0) "t" else i.toString
      val iThenB = if (i == 0) "5" else if (i == 1) "t" else i.toString
      (i.toLong, i.toString, if (i == 7) "4000000000" else i.toString,
        if (i % 2 == 0) "1.5" else i.toString,
        f"2023-01-${1 + i % 28}%02d",
        if (i == 5) "2023-01-02 03:04:05" else f"2023-01-${1 + i % 28}%02d",
        f"12:${i % 60}%02d", bThenI, iThenB, "", "abc" + i)
    }
    val df = rows.toDF("doc_id", "c_int", "c_int64", "c_real", "c_date",
      "c_dt", "c_time", "c_bool_int", "c_int_bool", "c_empty", "c_str")
      .repartition(7) // scramble, sniff must restore order
    val got = CsvSniff.sniff(df, "doc_id",
      Seq("c_int", "c_int64", "c_real", "c_date", "c_dt", "c_time",
        "c_bool_int", "c_int_bool", "c_empty", "c_str")).toMap
    assert(got("c_int") === "Integer")
    assert(got("c_int64") === "Integer64")
    assert(got("c_real") === "Real")
    assert(got("c_date") === "Date")
    assert(got("c_dt") === "DateTime")
    assert(got("c_time") === "Time")
    assert(got("c_bool_int") === "Integer(Boolean)") // the order quirk, distributed
    assert(got("c_int_bool") === "String")
    assert(got("c_empty") === "String")
    assert(got("c_str") === "String")
  }
}
