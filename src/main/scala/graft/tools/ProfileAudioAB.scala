package graft.tools

import graft.ext.Multimodal

/** Pure-JVM A/B: does `javax.sound` WAV encoding scale across
  * threads, or does AudioSystem serialize concurrent encodes? The
  * audio queries regressed ~+0.7 s when the codec spread landed
  * while the ImageIO family improved — this isolates the codec from
  * Spark entirely. Measurement only.
  */
object ProfileAudioAB {
  private def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"   ${(System.nanoTime() - t0) / 1e9}%8.2fs  $label")
    r
  }

  private def encodeRange(lo: Long, hi: Long): Long = {
    var i = lo
    var acc = 0L
    while (i < hi) {
      acc += Multimodal.AudioFixture.wav(
        Multimodal.AudioFixture.samples(i, false)).length
      i += 1
    }
    acc
  }

  private def decodeRange(lo: Long, hi: Long): Long = {
    var i = lo
    var acc = 0L
    while (i < hi) {
      val w = Multimodal.AudioFixture.wav(
        Multimodal.AudioFixture.samples(i, false))
      acc += graft.ext.Multimodal.AudioHash.energyHash64(w).getOrElse(0L)
      i += 1
    }
    acc
  }

  def main(args: Array[String]): Unit = {
    val n = 5000L
    // warmup
    encodeRange(0, 200); decodeRange(0, 200)
    t("serial encode 5000") { encodeRange(0, n) }
    t("32-thread encode 5000") {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      val futs = (0 until 32).map { k =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = encodeRange(n * k / 32, n * (k + 1) / 32)
        })
      }
      futs.foreach(_.get()); pool.shutdown()
    }
    t("serial encode+decode 5000") { decodeRange(0, n) }
    t("32-thread encode+decode 5000") {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      val futs = (0 until 32).map { k =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = decodeRange(n * k / 32, n * (k + 1) / 32)
        })
      }
      futs.foreach(_.get()); pool.shutdown()
    }
    t("serial encode 5000 (again)") { encodeRange(0, n) }
  }
}
