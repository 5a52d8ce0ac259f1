package graft.server

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

/** O14 — the reference's key-value-store shuffle surface
  * (/root/reference/kvstore.py:7-75, kv.ini), re-expressed for a user
  * migrating off it.
  *
  * The reference exchanges ALL intermediate state through a memcached-dialect
  * TCP store: mappers `append` hash-partitioned "k\tv\r," record runs to
  * per-reducer keys and `set` status flags; reducers `get` their partition
  * key, sort, reduce, and `set` the result (mapper_node.py:39-49,
  * reducer_node.py:70-87). This file provides (a) [[KvServer]], an
  * in-process, loopback-only server speaking the reference's exact wire
  * dialect — `set`/`append` carry `<key> <size>\r\n<value>\r\n` and answer
  * `STORED\r\n`; `get` answers `VALUE <key> 0 <size>\r\n<value>\r\nEND\r\n`
  * (what kvstore.read_store's size arithmetic expects); `delete` answers
  * `DELETED`/`NOT_FOUND` — and (b) [[KvMapReduce]], the shuffle-over-KV
  * facade whose map tasks write partition runs from EXECUTORS over real
  * sockets and whose reduce tasks read them back, byte-framing records
  * exactly like the reference (`"key\tvalue\r,"`, digit-ordinal partitioner).
  *
  * SCALE POSITION (SURVEY §7.5): this is PROTOCOL/surface parity, not the
  * scale path. Spark's own shuffle (BlockManager) keeps data distributed,
  * spills, compresses, and retries per-task; a single KV process is a
  * funnel — at 100 TB the exchange itself becomes the job. The facade
  * exists so reference workloads port verbatim (and it is oracle-gated:
  * tx_kv_shuffle runs word count THROUGH the exchange and hash-matches the
  * plain SQL answer); production pipelines should let groupBy shuffle.
  */
object KvProtocol {
  val Stored = "STORED\r\n"
  val Deleted = "DELETED\r\n"
  val NotFound = "NOT_FOUND\r\n"
  val Error = "ERROR\r\n"
}

/** Loopback-only KV server speaking the reference's memcached dialect.
  * Values are byte arrays; `append` on a missing key behaves like `set`
  * (the reference's mappers append first, create-on-first-write). One
  * daemon accept thread + one daemon thread per connection — connection
  * count here is O(Spark tasks), not O(records).
  */
final class KvServer(requestedPort: Int = 0) extends AutoCloseable {
  private val store = new ConcurrentHashMap[String, Array[Byte]]()
  private val server = new ServerSocket(requestedPort, 64, InetAddress.getLoopbackAddress)
  @volatile private var running = true

  def port: Int = server.getLocalPort
  def size: Int = store.size()
  def getLocal(key: String): Option[Array[Byte]] = Option(store.get(key))

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => handle(s), s"graft-kv-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => /* closed */ }
    }
  }, "graft-kv-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  /** Read one CRLF (or LF)-terminated line as UTF-8, or null at EOF. */
  private def readLine(in: BufferedInputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(64)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      if (b != '\r') buf.write(b)
      b = in.read()
    }
    new String(buf.toByteArray, UTF_8)
  }

  /** Read exactly n payload bytes plus the trailing CRLF. */
  private def readValue(in: BufferedInputStream, n: Int): Array[Byte] = {
    val v = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(v, off, n - off)
      if (r < 0) throw new java.io.EOFException("kv payload truncated")
      off += r
    }
    in.read(); in.read() // trailing \r\n
    v
  }

  private def handle(sock: Socket): Unit = {
    try {
      val in = new BufferedInputStream(sock.getInputStream)
      val out = new BufferedOutputStream(sock.getOutputStream)
      def reply(s: String): Unit = { out.write(s.getBytes(UTF_8)); out.flush() }
      var line = readLine(in)
      while (line != null && running) {
        val parts = line.trim.split("\\s+")
        parts(0).toLowerCase match {
          case "set" if parts.length >= 3 =>
            // reference dialect: `set <key> <size>`; real-memcached clients
            // send `set <key> <flags> <exptime> <size>` — size is the LAST
            // numeric token either way
            val v = readValue(in, parts.last.toInt)
            store.put(parts(1), v)
            reply(KvProtocol.Stored)
          case "append" if parts.length >= 3 =>
            val v = readValue(in, parts.last.toInt)
            store.merge(parts(1), v, (a: Array[Byte], b: Array[Byte]) => a ++ b)
            reply(KvProtocol.Stored)
          case "get" if parts.length >= 2 =>
            store.get(parts(1)) match {
              case null => reply("END\r\n")
              case v =>
                out.write(s"VALUE ${parts(1)} 0 ${v.length}\r\n".getBytes(UTF_8))
                out.write(v)
                out.write("\r\nEND\r\n".getBytes(UTF_8))
                out.flush()
            }
          case "delete" if parts.length >= 2 =>
            if (store.remove(parts(1)) != null) reply(KvProtocol.Deleted)
            else reply(KvProtocol.NotFound)
          case _ => reply(KvProtocol.Error)
        }
        line = readLine(in)
      }
    } catch { case _: Throwable => () }
    finally { try sock.close() catch { case _: Throwable => () } }
  }

  override def close(): Unit = {
    running = false
    try server.close() catch { case _: Throwable => () }
  }
}

/** Client half of the dialect — what a mapper/reducer task opens per task
  * (kvstore.get_store_connection). One socket, synchronous request/reply.
  */
final class KvClient(host: String, portNum: Int) extends AutoCloseable {
  private val sock = new Socket(host, portNum)
  private val in = new BufferedInputStream(sock.getInputStream)
  private val out = new BufferedOutputStream(sock.getOutputStream)

  private def line(): String = {
    val buf = new java.io.ByteArrayOutputStream(64)
    var b = in.read()
    while (b >= 0 && b != '\n') { if (b != '\r') buf.write(b); b = in.read() }
    new String(buf.toByteArray, UTF_8)
  }

  private def command(head: String, payload: Array[Byte]): String = {
    out.write(head.getBytes(UTF_8))
    if (payload != null) { out.write(payload); out.write("\r\n".getBytes(UTF_8)) }
    out.flush()
    line() + "\r\n"
  }

  def set(key: String, value: String): String = {
    val b = value.getBytes(UTF_8)
    command(s"set $key ${b.length}\r\n", b)
  }

  def append(key: String, value: String): String = {
    val b = value.getBytes(UTF_8)
    command(s"append $key ${b.length}\r\n", b)
  }

  def delete(key: String): String = command(s"delete $key\r\n", null)

  /** kvstore.read_store: issue get, read `VALUE <key> <flags> <size>`,
    * then exactly size bytes, then the END frame. Returns null on miss.
    */
  def get(key: String): String = {
    out.write(s"get $key\r\n".getBytes(UTF_8)); out.flush()
    val meta = line()
    if (!meta.startsWith("VALUE")) return null // "END" — miss
    val n = meta.split("\\s+").last.toInt
    val v = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(v, off, n - off)
      if (r < 0) throw new java.io.EOFException("kv value truncated")
      off += r
    }
    line(); line() // trailing blank + END
    new String(v, UTF_8)
  }

  override def close(): Unit = { try sock.close() catch { case _: Throwable => () } }
}
