package graft.streaming

import java.nio.ByteBuffer
import java.util.Base64

/** Event-id codec — the reference's opaque event handle: base64 over a
  * fixed 16-byte big-endian (eventlogID, offset) pair
  * (/root/reference/server/gateway/proxy/proxy.go:891-905; consumed by
  * vsctl event get --event-id, tool/vsctl/command/event.go:303-355).
  */
object EventId {

  def encode(logId: Long, offset: Long): String = {
    val buf = ByteBuffer.allocate(16)
    buf.putLong(logId)
    buf.putLong(offset)
    Base64.getEncoder.encodeToString(buf.array())
  }

  /** @return (eventlogID, offset)
    * @throws IllegalArgumentException on malformed input (wrong length or
    *         not base64), matching decodeEventID's error path
    */
  def decode(eventId: String): (Long, Long) = {
    val decoded = Base64.getDecoder.decode(eventId)
    require(decoded.length == 16, s"invalid event id: $eventId")
    val buf = ByteBuffer.wrap(decoded)
    (buf.getLong(), buf.getLong())
  }
}
