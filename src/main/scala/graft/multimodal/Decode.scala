package graft.multimodal

/** Stub media decoder for the multimodal column path.
  *
  * The execution container ships no image/audio/video codecs, so the codec
  * call itself is replaced by a deterministic fake derived from the payload
  * bytes. The surrounding contract is the real one a codec-backed
  * implementation would keep:
  *   - `open()` is called once per partition (expensive init amortized);
  *   - `decode` is pure per-record work on the opaque payload;
  *   - output is a flat, typed record suitable for a columnar sink.
  */
final case class MediaMeta(
    doc_id: Long,
    n_bytes: Int,
    format: String,
    width: Int,
    height: Int,
    n_frames: Int,
    checksum: Long)

final class Decode private () {
  /** STUB: a real implementation would call the codec here. */
  def decode(id: Long, payload: Array[Byte]): MediaMeta = {
    var h = 1125899906842597L // deterministic FNV-ish rolling checksum
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    val n = payload.length
    MediaMeta(
      doc_id = id,
      n_bytes = n,
      format = if (n % 3 == 0) "img" else if (n % 3 == 1) "audio" else "video",
      width = (n * 7919) % 1024,
      height = (n * 104729) % 768,
      n_frames = n % 16 + 1,
      checksum = h)
  }
}

object Decode {
  /** Per-partition initialization (a real codec would allocate here). */
  def open(): Decode = new Decode()
}
