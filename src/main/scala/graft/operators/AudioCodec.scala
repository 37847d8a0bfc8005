package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real audio codec on the JDK's built-in `javax.sound.sampled` (WAV/RIFF
  * containers — no new dependency). Used by [[Multimodal]]'s audio tier:
  * PCM16 WAV is lossless, so encode→decode round-trips samples exactly,
  * which keeps the DuckDB differential oracle available over a real codec
  * path (the oracle replays the sample rule + math in SQL; Spark recovers
  * the samples from actual RIFF containers).
  *
  * Headless-safe; runs partition-local on executors.
  */
object AudioCodec {

  /** Encode signed 16-bit mono PCM samples as a real WAV (RIFF) file via
    * `AudioSystem.write`. */
  def encodePcm16Wav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1,
      /* signed = */ true, /* bigEndian = */ false)
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decode a WAV container back to (sampleRate, mono PCM16 samples) via
    * `AudioSystem.getAudioInputStream` — the JDK parses the RIFF chunk
    * structure; we unpack the PCM frames honoring the container's declared
    * endianness. */
  def decodePcm16Wav(wav: Array[Byte]): (Int, Array[Short]) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
    try {
      val fmt = ais.getFormat
      // Encoding matters too: 16-bit mono UNSIGNED PCM is legal RIFF and
      // would pass a bits/channels-only check, then decode every sample
      // offset by 32768 — reject it loudly instead.
      require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected signed 16-bit mono PCM, got $fmt")
      val raw = ais.readAllBytes()
      val n = raw.length / 2
      val out = new Array[Short](n)
      var i = 0
      if (fmt.isBigEndian) {
        while (i < n) {
          out(i) = (((raw(2 * i) & 0xff) << 8) | (raw(2 * i + 1) & 0xff)).toShort
          i += 1
        }
      } else {
        while (i < n) {
          out(i) = (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort
          i += 1
        }
      }
      (fmt.getSampleRate.toInt, out)
    } finally ais.close()
  }
}
