package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}

/** Real multi-frame container codec on the JDK's GIF writer/reader. An
  * 8-bit grayscale frame always fits a GIF's 256-color palette, so
  * encode→decode round-trips every frame's pixels exactly — the same
  * lossless property that lets [[ImageCodec]]'s PNG tier and
  * [[AudioCodec]]'s PCM tier keep full DuckDB differential oracles over
  * real codec paths. Frames are written with `prepareWriteSequence`/
  * `writeToSequence` (a true multi-image container, the still-image
  * analogue of video keyframes) and read back frame-by-frame with an
  * `ImageReader`.
  */
object VideoCodec {

  // In-heap ImageIO streams (no per-call temp files) — see ImageCodec.
  ImageIO.setUseCache(false)

  /** Identity 256-gray palette: frames are written TYPE_BYTE_INDEXED
    * against it so the GIF writer emits the palette verbatim (feeding it
    * TYPE_BYTE_GRAY lets it re-quantize, which is NOT lossless — palette
    * index == gray value is what guarantees exact round-trips). */
  private val grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Encode row-major 8-bit gray frames as one multi-frame GIF. */
  def encodeGifFrames(frames: Seq[Array[Int]], w: Int, h: Int): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    // The JDK GIF writer's default metadata can mark frames interlaced
    // while writing rows sequentially, scrambling decoded row order —
    // disable progressive (interlace) mode explicitly.
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { px =>
        require(px.length == w * h, s"frame ${px.length} != ${w}x$h")
        val img = new BufferedImage(w, h,
          BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, px(y * w + x) & 0xff); x += 1 }
          y += 1
        }
        writer.writeToSequence(new IIOImage(img, null, null), param)
      }
      writer.endWriteSequence()
    } finally {
      ios.close()
      writer.dispose()
    }
    out.toByteArray
  }

  /** Decode every frame of a GIF container to (w, h, gray frames). GIF
    * frames come back palette-indexed, so samples are read through the
    * color model (`getRGB`, gray ⇒ R=G=B) rather than raw raster
    * indices. */
  def decodeGifFrames(bytes: Array[Byte]): (Int, Int, Seq[Array[Int]]) = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      require(n > 0, "no frames in GIF container")
      val first = reader.read(0)
      val (w, h) = (first.getWidth, first.getHeight)
      val frames = (0 until n).map { i =>
        val img = if (i == 0) first else reader.read(i)
        // GIF frames may legally be sub-rectangles of the logical screen;
        // this decoder's contract is uniform full-size frames (what
        // encodeGifFrames writes) — enforce instead of walking off the
        // smaller raster.
        require(img.getWidth == w && img.getHeight == h,
          s"frame $i is ${img.getWidth}x${img.getHeight}, expected ${w}x$h")
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { px(y * w + x) = img.getRGB(x, y) & 0xff; x += 1 }
          y += 1
        }
        px
      }
      (w, h, frames)
    } finally {
      iis.close()
      reader.dispose()
    }
  }
}
