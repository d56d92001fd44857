package graft.multimodal

/** Pluggable media-decode SPI (verdict r16 item #8).
  *
  * A codec turns an opaque binary payload into `MediaFeatures` plus a
  * 64-bit perceptual fingerprint, or declines (`None`) when the payload
  * is not a container it handles. The m-family operators take a codec
  * instance and never hard-wire a decoder, so a production container
  * swaps in real compressed-audio / video codecs (or a GPU batch
  * decoder) without touching operator code — only the codec instance
  * changes; schema, batch shape, partitioning, and banding stay put.
  *
  * Codecs ship inside executor closures, hence `Serializable`. They must
  * be DETERMINISTIC (same payload → same features + fingerprint) — the
  * dedup family's banding and the spec pins rely on it — and total per
  * payload ONLY within a [[MediaCodec.Chain]] ending in a total codec
  * (the default chain ends in [[MediaCodec.ByteStub]], which always
  * decodes).
  */
trait MediaCodec extends Serializable {

  /** Decode one payload, or `None` if this codec does not handle it. */
  def decode(payload: Array[Byte]): Option[(MediaFeatures, Long)]

  /** Batch form — ONE call per record batch (the mapInPandas/Arrow
    * shape). Override where a real codec amortizes FFI / device setup
    * across the batch; the default maps the scalar decode.
    */
  def decodeBatch(payloads: Array[Array[Byte]]): Array[Option[(MediaFeatures, Long)]] =
    payloads.map(decode)
}

object MediaCodec {

  /** Real image decode: javax.imageio (PNG/JPEG/BMP/GIF), pixel dHash. */
  case object ImageIo extends MediaCodec {
    def decode(payload: Array[Byte]): Option[(MediaFeatures, Long)] =
      Multimodal.decodeImage(payload)
  }

  /** Real WAV/PCM audio decode: javax.sound.sampled, energy-envelope
    * dHash. */
  case object Wav extends MediaCodec {
    def decode(payload: Array[Byte]): Option[(MediaFeatures, Long)] =
      Multimodal.decodeAudio(payload)
  }

  /** TOTAL deterministic byte-derived fallback — the documented stand-in
    * for codecs absent in this container (compressed audio, video).
    * Features from a byte hash, fingerprint from SimHash over byte
    * 4-grams (similarity-preserving over payload bytes).
    */
  case object ByteStub extends MediaCodec {
    def decode(payload: Array[Byte]): Option[(MediaFeatures, Long)] =
      Some((Multimodal.decodeStub(payload), Multimodal.phashStub(payload)))
  }

  /** First-match-wins dispatch over container sniffs. Total iff the last
    * codec is total.
    */
  final case class Chain(codecs: Seq[MediaCodec]) extends MediaCodec {
    require(codecs.nonEmpty, "empty codec chain")
    def decode(payload: Array[Byte]): Option[(MediaFeatures, Long)] = {
      val it = codecs.iterator
      while (it.hasNext) {
        val r = it.next().decode(payload)
        if (r.isDefined) return r
      }
      None
    }

    /** Batch-preserving dispatch: each member codec sees ONE decodeBatch
      * call over the payloads every earlier codec declined — so a
      * batch-amortizing codec (GPU/FFI) keeps its one-call-per-batch
      * shape inside a chain instead of degrading to per-payload calls
      * through the inherited scalar default.
      */
    override def decodeBatch(
        payloads: Array[Array[Byte]]): Array[Option[(MediaFeatures, Long)]] = {
      val out = Array.fill[Option[(MediaFeatures, Long)]](payloads.length)(None)
      var pending: Array[Int] = payloads.indices.toArray
      val it = codecs.iterator
      while (it.hasNext && pending.nonEmpty) {
        val res = it.next().decodeBatch(pending.map(payloads))
        val still = Array.newBuilder[Int]
        var i = 0
        while (i < pending.length) {
          if (res(i).isDefined) out(pending(i)) = res(i)
          else still += pending(i)
          i += 1
        }
        pending = still.result()
      }
      out
    }
  }

  /** The container's default: real image + real WAV decode, byte-stub
    * for everything else. Total.
    */
  val default: MediaCodec = Chain(Seq(ImageIo, Wav, ByteStub))
}
