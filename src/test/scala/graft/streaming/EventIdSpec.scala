package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class EventIdSpec extends AnyFunSuite {
  test("roundtrip and fixed 16-byte layout (proxy.go:891-905)") {
    assert(EventId.decode(EventId.encode(3L, 12345L)) == (3L, 12345L))
    assert(EventId.decode(EventId.encode(0L, 0L)) == (0L, 0L))
    // 16 bytes → 24 base64 chars
    assert(EventId.encode(1L, 2L).length == 24)
    intercept[IllegalArgumentException](EventId.decode("c2hvcnQ=")) // 5 bytes
    intercept[IllegalArgumentException](EventId.decode("not base64!!"))
  }
}
