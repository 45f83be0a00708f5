package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Multimodal

/** PCM WAV encode/parse round trip and refuse-loudly behavior. */
class AudioStatsSpec extends AnyFunSuite {

  test("encode/parse round trip recovers header fields and exact stats") {
    val samples = Array[Short](0, 100, -200, 300, 0, -1)
    val st = Multimodal.wavStats(Multimodal.pcmWav(samples, 44100))
    assert(st.sampleRate == 44100 && st.channels == 1 && st.nSamples == 6)
    assert(st.peak == 300)
    assert(st.sumSq == 100L * 100 + 200L * 200 + 300L * 300 + 1L)
    // sign(0) is non-negative: crossings at 100→-200, -200→300, 0→-1
    assert(st.zeroCross == 3)
  }

  test("empty clip: zero everything") {
    val st = Multimodal.wavStats(Multimodal.pcmWav(Array.empty[Short], 8000))
    assert(st.nSamples == 0 && st.peak == 0 && st.sumSq == 0L && st.zeroCross == 0)
  }

  test("malformed payloads refuse loudly") {
    intercept[IllegalArgumentException](Multimodal.wavStats(Array[Byte](1, 2, 3)))
    val good = Multimodal.pcmWav(Array[Short](1, 2), 8000)
    val badTag = good.clone(); badTag(0) = 'X'
    intercept[IllegalArgumentException](Multimodal.wavStats(badTag))
    val truncated = good.dropRight(2)
    intercept[IllegalArgumentException](Multimodal.wavStats(truncated))
    // a PNG payload is not audio
    val png = Multimodal.grayPng(16, 16)((x, y) => (x + y) % 256)
    intercept[IllegalArgumentException](Multimodal.wavStats(png))
  }

  test("Short.MinValue peak does not overflow abs") {
    val st = Multimodal.wavStats(Multimodal.pcmWav(Array[Short](Short.MinValue), 8000))
    assert(st.peak == 32768)
    assert(st.sumSq == 32768L * 32768L)
  }
}
