package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Multimodal

/** Indexed frame container: pack/sample round trip, offset-only access,
  * refuse-loudly on malformed containers. */
class VideoSampleSpec extends AnyFunSuite {

  private def frame(tag: Int): Array[Byte] = Array.fill(4 + tag)(tag.toByte)

  test("pack/sample round trip: every step-th frame, bytes identical") {
    val frames = (0 until 7).map(frame)
    val v = Multimodal.packFrames(frames)
    val s2 = Multimodal.sampleFrames(v, 2)
    assert(s2.map(_._1) == Seq(0, 2, 4, 6))
    for ((i, b) <- s2) assert(b.sameElements(frames(i)))
    val s1 = Multimodal.sampleFrames(v, 1)
    assert(s1.length == 7)
    val s9 = Multimodal.sampleFrames(v, 9)
    assert(s9.map(_._1) == Seq(0))
  }

  test("empty container samples to nothing; zero-length frames survive") {
    assert(Multimodal.sampleFrames(Multimodal.packFrames(Seq.empty), 2).isEmpty)
    val v = Multimodal.packFrames(Seq(Array.empty[Byte], frame(3)))
    val s = Multimodal.sampleFrames(v, 1)
    assert(s(0)._2.isEmpty && s(1)._2.sameElements(frame(3)))
  }

  test("malformed containers refuse loudly") {
    intercept[IllegalArgumentException](Multimodal.sampleFrames(Array[Byte](1, 2), 1))
    val v = Multimodal.packFrames(Seq(frame(1)))
    val badMagic = v.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Multimodal.sampleFrames(badMagic, 1))
    intercept[IllegalArgumentException](Multimodal.sampleFrames(v, 0))
    // frame count exceeding the payload
    val badCount = v.clone()
    java.nio.ByteBuffer.wrap(badCount).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, 1000000)
    intercept[IllegalArgumentException](Multimodal.sampleFrames(badCount, 1))
  }
}
