package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the media codec: round-trip exactness over arbitrary
  * geometries/payloads (fixed fixtures live in PipelineOperatorsSpec; this
  * sweeps the padding/odd-dimension/degenerate space), and corrupt-input
  * totality — every truncation of a valid file must fail CLEANLY (require)
  * or parse (a prefix can embed a shorter valid structure), never throw an
  * out-of-bounds error from the pixel/sample scan. */
class MediaCodecPropertiesSpec extends AnyFunSuite {

  /** Deterministic property driver (same pattern as ModelPropertiesSpec —
    * no scalatest-scalacheck bridge in the offline dep set). */
  def forAllSeeded[A](gen: Gen[A], runs: Int = 60)(body: A => Unit): Unit =
    (0 until runs).foreach { i =>
      val a = gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"generator failed for seed $i"))
      try body(a)
      catch { case e: Throwable => fail(s"seed $i: ${e.getMessage}", e) }
    }

  private val bmpGen = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 40)
    seed <- Gen.choose(0, 1 << 20)
  } yield (w, h, seed)

  test("BMP round-trip: exact mean for arbitrary dims (padding, odd widths)") {
    forAllSeeded(bmpGen) { case (w, h, seed) =>
      val px = (x: Int, y: Int) => (x * 31 + y * 17 + seed) % 256
      val (dw, dh, ch, mean) = MediaCodec.decode(MediaCodec.encodeBmp(w, h, px))
      assert((dw, dh, ch) == (w, h, 3))
      val exact = (for (y <- 0 until h; x <- 0 until w) yield px(x, y)).sum
      assert(math.abs(mean - exact.toDouble / (w * h) / 255.0) < 1e-12,
        s"mean mismatch at ${w}x$h seed=$seed")
    }
  }

  test("BMP pixel-matrix decode: exact values in image coordinates (flip honored)") {
    forAllSeeded(bmpGen) { case (w, h, seed) =>
      val px = (x: Int, y: Int) => (x * 31 + y * 17 + seed) % 256
      val (dw, dh, got) = MediaCodec.decodeBmpPixels(MediaCodec.encodeBmp(w, h, px))
      assert((dw, dh) == (w, h))
      for (y <- 0 until h; x <- 0 until w)
        assert(got(y * w + x) == px(x, y), s"pixel ($x,$y) at ${w}x$h seed=$seed")
    }
  }

  private val resizeGen = for {
    t <- bmpGen
    ow <- Gen.choose(1, 50)
    oh <- Gen.choose(1, 50)
  } yield (t, ow, oh)

  test("nearest-neighbor resize: floor mapping exact; same-size resize is identity") {
    forAllSeeded(resizeGen) { case ((w, h, seed), ow, oh) =>
      val src = Array.tabulate(w * h)(i => (i * 13 + seed) % 256)
      val out = MediaCodec.resizeNearest(w, h, src, ow, oh)
      for (y <- 0 until oh; x <- 0 until ow)
        assert(out(y * ow + x) == src((y * h / oh) * w + (x * w / ow)))
      assert(MediaCodec.resizeNearest(w, h, src, w, h).toSeq == src.toSeq,
        "identity resize must return the source matrix")
    }
  }

  private val wavGen = for {
    n <- Gen.choose(1, 500)
    chans <- Gen.choose(1, 2)
    rate <- Gen.oneOf(8000, 16000, 44100)
    seed <- Gen.choose(0, 1 << 20)
  } yield (n, chans, rate, seed)

  test("WAV round-trip: exact frame count and mean amplitude") {
    forAllSeeded(wavGen) { case (n, chans, rate, seed) =>
      val samples = Array.tabulate(n * chans)(i =>
        ((i * 7919 + seed) % 65536 - 32768).toShort)
      val (frames, _, dch, amp) =
        MediaCodec.decode(MediaCodec.encodeWav(samples, rate, chans))
      assert((frames, dch) == (n, chans))
      val exact = samples.map(s => math.abs(s.toInt)).map(_.toLong).sum
      assert(math.abs(amp - exact.toDouble / samples.length / 32768.0) < 1e-12)
    }
  }

  test("WAV sample decode: raw PCM values round-trip exactly") {
    forAllSeeded(wavGen) { case (n, chans, rate, seed) =>
      val samples = Array.tabulate(n * chans)(i =>
        ((i * 7919 + seed) % 65536 - 32768).toShort)
      val got = MediaCodec.decodeWavSamples(
        MediaCodec.encodeWav(samples, rate, chans))
      assert(got.toSeq == samples.toSeq)
    }
  }

  private val videoGen = for {
    nf <- Gen.choose(0, 6)
    t <- bmpGen
  } yield (nf, t)

  test("GVID round-trip: frame payloads exact; every truncation fails cleanly, never AIOOBE") {
    forAllSeeded(videoGen) { case (nf, (w, h, seed)) =>
      val frames = (0 until nf).map(f =>
        MediaCodec.encodeBmp(w, h, (x, y) => (x + y + f + seed) % 256))
      val enc = MediaCodec.encodeVideo(frames)
      val dec = MediaCodec.decodeVideo(enc)
      assert(dec.length == nf)
      dec.zip(frames).foreach { case (d, f) => assert(d.toSeq == f.toSeq) }
      (0 until enc.length by math.max(1, enc.length / 23)).foreach { cut =>
        try MediaCodec.decodeVideo(enc.take(cut))
        catch {
          case _: IllegalArgumentException => // clean require failure
          case e: Throwable => fail(s"cut=$cut threw ${e.getClass}", e)
        }
      }
    }
  }

  test("every truncation of a valid BMP/WAV fails cleanly or parses — never AIOOBE") {
    val bmp = MediaCodec.encodeBmp(5, 4, (x, y) => (x + y) % 256)
    val wav = MediaCodec.encodeWav(Array[Short](5, -9, 300), 8000, 1)
    for (file <- Seq(bmp, wav); cut <- 0 until file.length) {
      try MediaCodec.decode(file.take(cut))
      catch {
        case _: IllegalArgumentException => () // require(...) — diagnosable
        case e: Throwable =>
          fail(s"truncation at $cut of ${file.length} escaped the guards: $e")
      }
    }
  }
}
