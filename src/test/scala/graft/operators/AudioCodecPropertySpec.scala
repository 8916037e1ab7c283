package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based pinning of the WAV codec pair: for arbitrary int16
  * sample streams (silence, clipping extremes, random noise, short
  * clips), [[Multimodal.encodePcmWav]] → [[Multimodal.decodeAudio]] must
  * reproduce duration / RMS / zero-crossing rate computed directly from
  * the raw samples — WAV PCM is lossless and the decoder's /32768
  * normalization is the generator's, so the match is exact to double
  * arithmetic. Raw scalacheck with fixed seeds (no Spark needed — the
  * kernel is partition-local by design). */
class AudioCodecPropertySpec extends AnyFunSuite {

  private val sampleGen: Gen[Short] = Gen.frequency(
    (6, Gen.choose(Short.MinValue, Short.MaxValue)),
    (1, Gen.const(0.toShort)),
    (1, Gen.oneOf(Short.MinValue, Short.MaxValue)))

  private def clip(seed: Long): (Int, Array[Short]) = {
    val g = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      n <- Gen.choose(1, 4000)
      samples <- Gen.listOfN(n, sampleGen)
    } yield (rate, samples.toArray)
    g.apply(Gen.Parameters.default, Seed(seed)).get
  }

  test("encode → decode reproduces duration, RMS and ZCR exactly") {
    (1L to 40L).foreach { seed =>
      val (rate, samples) = clip(seed)
      val wav = Multimodal.encodePcmWav(rate, samples)
      val decoded = Multimodal.decodeAudio(wav, dim = 8)
      assert(decoded.isDefined, s"seed $seed: decode failed")
      val (gotRate, ch, durMs, rms, zcr, feats) = decoded.get
      assert(gotRate == rate && ch == 1)
      assert(durMs == math.round(samples.length * 1000.0 / rate),
        s"seed $seed: duration")
      val mono = samples.map(_ / 32768.0)
      val expRms = math.sqrt(mono.map(x => x * x).sum / mono.length)
      assert(rms == expRms, s"seed $seed: rms $rms != $expRms")
      val flips =
        if (mono.length < 2) 0
        else mono.sliding(2).count(p => (p(1) > 0) != (p(0) > 0))
      val expZcr = if (mono.length > 1) flips.toDouble / (mono.length - 1) else 0.0
      assert(zcr == expZcr, s"seed $seed: zcr $zcr != $expZcr")
      assert(feats.length == 8 && feats.forall(f => f >= -0.5f && f <= 0.5f))
    }
  }

  test("truncated and corrupted WAV bytes never throw, only decline") {
    val (rate, samples) = clip(99L)
    val wav = Multimodal.encodePcmWav(rate, samples)
    (0 until wav.length by math.max(1, wav.length / 23)).foreach { cut =>
      Multimodal.decodeAudio(wav.take(cut), dim = 8) // must not throw
    }
    val corrupted = wav.clone()
    corrupted(20) = 77 // bogus audio format code
    Multimodal.decodeAudio(corrupted, dim = 8) // must not throw
  }
}
