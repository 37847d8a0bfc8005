package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image codec on the JDK's built-in `javax.imageio` (PNG/JPEG — no
  * new dependency). Used by [[Multimodal]] for the decode / resize /
  * feature-extract operators: 8-bit grayscale PNG is lossless, so
  * encode→decode round-trips pixels exactly, which is what makes a DuckDB
  * differential oracle possible over a real codec path (the oracle replays
  * the pixel math in SQL; Spark runs it on pixels recovered from actual
  * PNG bytes).
  *
  * Runs partition-local on executors; `BufferedImage`/`ImageIO` need no
  * display (headless-safe).
  */
object ImageCodec {

  // ImageIO's default disk-backed stream cache would create and delete a
  // temp file per encode/decode — pure overhead for in-memory byte arrays
  // on the hot mapPartitions path (and a failure mode if tmpdir is
  // unwritable on an executor). Cache in heap instead.
  ImageIO.setUseCache(false)

  /** Encode a row-major 8-bit grayscale pixel array as a real PNG. */
  def encodeGrayPng(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h, s"pixels ${pixels.length} != ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixels(y * w + x) & 0xff); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    val ok = ImageIO.write(img, "png", out)
    require(ok, "no PNG writer available")
    out.toByteArray
  }

  /** Decode any ImageIO-supported image (PNG/JPEG/BMP/GIF) to
    * (width, height, row-major gray samples 0..255). For color inputs the
    * first band is read — our corpus is single-band gray. */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val px = new Array[Int](w * h)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, px)
  }

  /** 2x2 box-filter downsample with integer-floor means — deterministic
    * and SQL-replayable, unlike Graphics2D interpolation. */
  def downsample2x2(px: Array[Int], w: Int, h: Int): (Int, Int, Array[Int]) = {
    val (rw, rh) = (w / 2, h / 2)
    val out = Array.tabulate(rw * rh) { q =>
      val y = q / rw * 2
      val x = q % rw * 2
      (px(y * w + x) + px(y * w + x + 1) + px((y + 1) * w + x) + px((y + 1) * w + x + 1)) / 4
    }
    (rw, rh, out)
  }
}
