package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import graft.ext.MultimodalOps

/** Image-decode FLOOR micro-probe: times `MultimodalOps.dhashImage`
  * alone — render → (decode + hash) with the payloads pre-rendered
  * in memory — on a plain 32-thread pool, no Spark. Separates the
  * codec's per-image floor from pipeline overhead so a future q206
  * regression bisects cleanly: if the pipeline number moves but this
  * floor doesn't, the regression is plan/caching-side; if the floor
  * moves, it's the codec path (ImageIO cache flag, SPI order — the
  * r13 executor fixes this probe exercises end to end).
  *
  * Three payload classes: the 9×8 BMP gate fixture (per-CALL codec
  * overhead — q206's exact payload class), and 256×192 BMP/PNG
  * (per-PIXEL cost + a compressed codec).
  *
  * Usage: runMain graft.MediaFloorProbe [nTiny] [nLarge] [threads]
  * Prints one JSON line.
  */
object MediaFloorProbe {

  private def renderLarge(bits: Long, fmt: String): Array[Byte] = {
    val (w, h) = (256, 192)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // deterministic per-pixel pattern seeded by `bits`
        val v = (bits ^ (x * 1103515245L + y * 12345L)) & 0xffffff
        img.setRGB(x, y, v.toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Hash `total` payloads (cycling a pre-rendered pool) on `threads`
    * threads; returns (seconds, xor-checksum). */
  private def time(pool: Array[Array[Byte]], total: Int, threads: Int): (Double, Long) = {
    val idx = new AtomicInteger(0)
    val sink = new AtomicLong(0L)
    val t0 = System.nanoTime()
    val ts = (1 to threads).map { _ =>
      val t = new Thread(() => {
        var acc = 0L
        var i = idx.getAndIncrement()
        while (i < total) {
          acc ^= MultimodalOps.dhashImage(pool(i % pool.length)).getOrElse(0L)
          i = idx.getAndIncrement()
        }
        sink.addAndGet(acc)
      })
      t.start(); t
    }
    ts.foreach(_.join())
    ((System.nanoTime() - t0) / 1e9, sink.get())
  }

  def main(args: Array[String]): Unit = {
    val nTiny = args.lift(0).map(_.toInt).getOrElse(1000000)
    val nLarge = args.lift(1).map(_.toInt).getOrElse(100000)
    val threads = args.lift(2).map(_.toInt).getOrElse(32)
    val poolN = 4096
    def mix(i: Int): Long = i.toLong * 0x9e3779b97f4a7c15L
    val tiny = Array.tabulate(poolN)(i => MultimodalOps.renderPatternImage(mix(i)))
    val bmp = Array.tabulate(256)(i => renderLarge(mix(i), "bmp"))
    val png = Array.tabulate(256)(i => renderLarge(mix(i), "png"))
    // warmup: JIT + ImageIO SPI resolution (the r13 once-per-JVM work)
    time(tiny, 50000, threads); time(bmp, 2000, threads); time(png, 2000, threads)
    val (st, ct) = time(tiny, nTiny, threads)
    val (sb, cb) = time(bmp, nLarge, threads)
    val (sp, cp) = time(png, nLarge, threads)
    println(
      f"""{"metric":"image_decode_floor","threads":$threads,""" +
      f""""tiny_bmp_9x8":{"n":$nTiny,"sec":$st%.2f,"us_per_img":${st / nTiny * 1e6}%.2f,"imgs_per_sec":${nTiny / st}%.0f},""" +
      f""""bmp_256x192":{"n":$nLarge,"sec":$sb%.2f,"us_per_img":${sb / nLarge * 1e6}%.2f,"imgs_per_sec":${nLarge / sb}%.0f},""" +
      f""""png_256x192":{"n":$nLarge,"sec":$sp%.2f,"us_per_img":${sp / nLarge * 1e6}%.2f,"imgs_per_sec":${nLarge / sp}%.0f},""" +
      f""""checksum":${ct ^ cb ^ cp}}""")
  }
}
