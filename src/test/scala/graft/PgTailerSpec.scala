package graft

import graft.sources.{PgOutput, PgTailer}
import graft.sources.PgOutput.Wire
import org.scalatest.funsuite.AnyFunSuite

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import scala.collection.mutable

/** Socket tailer vs a SCRIPTED fake Postgres: proves the replication
  * protocol exchange (startup with replication=database, IDENTIFY_SYSTEM,
  * START_REPLICATION, CopyData 'w'/'k' envelopes, standby-status acks at
  * the ENGINE watermark) and the chunk-roll boundary rules — all without a
  * live server, which is exactly what the sandbox requires. The chunks the
  * tailer rolls are decoded with the SAME oracle-gated decoder the engine
  * runs ([[PgOutput.decodeChunk]]), closing the loop: a byte the tailer
  * writes wrongly fails these tests, not production. */
class PgTailerSpec extends AnyFunSuite {

  // ---------------------------------------------------------------------
  // Fake-server toolkit (backend side of the frontend/backend protocol)
  // ---------------------------------------------------------------------

  private def cstr(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8); java.util.Arrays.copyOf(b, b.length + 1)
  }

  private final class Backend(sock: Socket) {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    /** 'r' standby-status LSNs received, in order. */
    val acks = mutable.ArrayBuffer[Long]()
    var startReplicationSql: String = _

    def send(tag: Char, body: Array[Byte]): Unit = {
      out.write(tag); out.writeInt(body.length + 4); out.write(body); out.flush()
    }
    /** Read the (untagged) startup packet; returns its key->value params. */
    def readStartup(): Map[String, String] = {
      val len = in.readInt()
      val body = new Array[Byte](len - 4)
      in.readFully(body)
      val proto = ByteBuffer.wrap(body).getInt
      assert(proto == 196608, s"protocol $proto")
      val params = mutable.Map[String, String]()
      var i = 4
      while (i < body.length && body(i) != 0) {
        val kEnd = body.indexOf(0.toByte, i)
        val vEnd = body.indexOf(0.toByte, kEnd + 1)
        params(new String(body, i, kEnd - i, UTF_8)) =
          new String(body, kEnd + 1, vEnd - kEnd - 1, UTF_8)
        i = vEnd + 1
      }
      params.toMap
    }
    /** Read one tagged frontend message. */
    def read(): (Char, Array[Byte]) = {
      val tag = in.read()
      if (tag < 0) throw new EOFException()
      val len = in.readInt()
      val body = new Array[Byte](len - 4)
      in.readFully(body)
      (tag.toChar, body)
    }
    def authOkReady(): Unit = {
      send('R', ByteBuffer.allocate(4).putInt(0).array())
      send('S', cstr("server_version") ++ cstr("16.3"))
      send('Z', Array('I'.toByte))
    }
    /** Answer IDENTIFY_SYSTEM with the given xlogpos. */
    def identifySystem(xlogpos: String): Unit = {
      val (tag, body) = read()
      assert(tag == 'Q' && new String(body, UTF_8).startsWith("IDENTIFY_SYSTEM"),
        s"expected IDENTIFY_SYSTEM, got $tag ${new String(body, UTF_8)}")
      val colNames = Seq("systemid", "timeline", "xlogpos", "dbname")
      val t = new java.io.ByteArrayOutputStream()
      t.write(Array[Byte](0, colNames.size.toByte))
      colNames.foreach { c =>
        t.write(cstr(c))
        t.write(ByteBuffer.allocate(18).putInt(0).putShort(0).putInt(25)
          .putShort(-1).putInt(-1).putShort(0).array())
      }
      send('T', t.toByteArray)
      val vals = Seq("4711", "1", xlogpos, "testdb")
      val d = new java.io.ByteArrayOutputStream()
      d.write(Array[Byte](0, vals.size.toByte))
      vals.foreach { v =>
        val b = v.getBytes(UTF_8)
        d.write(ByteBuffer.allocate(4).putInt(b.length).array()); d.write(b)
      }
      send('D', d.toByteArray)
      send('C', cstr("IDENTIFY_SYSTEM"))
      send('Z', Array('I'.toByte))
    }
    /** Expect START_REPLICATION, capture its SQL, enter CopyBoth mode. */
    def acceptStartReplication(): Unit = {
      val (tag, body) = read()
      assert(tag == 'Q')
      startReplicationSql = new String(body, 0, body.length - 1, UTF_8)
      assert(startReplicationSql.startsWith("START_REPLICATION"),
        startReplicationSql)
      send('W', ByteBuffer.allocate(3).put(0.toByte).putShort(0).array())
    }
    /** Wrap one pgoutput message in an XLogData CopyData frame. */
    def xlog(walStart: Long, payload: Array[Byte]): Unit = {
      val b = ByteBuffer.allocate(25 + payload.length)
      b.put('w'.toByte).putLong(walStart).putLong(walStart).putLong(0L).put(payload)
      send('d', b.array())
    }
    def keepalive(walEnd: Long, replyRequested: Boolean): Unit = {
      val b = ByteBuffer.allocate(18)
      b.put('k'.toByte).putLong(walEnd).putLong(0L)
        .put(if (replyRequested) 1.toByte else 0.toByte)
      send('d', b.array())
    }
    /** Read frontend messages until a standby-status with the wanted ack
      * arrives (the tailer also sends periodic/initial statuses). */
    def awaitAck(want: Long): Unit = {
      var got = -1L
      while (got != want) read() match {
        case ('d', body) if body(0) == 'r' =>
          got = ByteBuffer.wrap(body, 1, 8).getLong
          acks += got
        case _ => ()
      }
    }
    def close(): Unit = sock.close()
  }

  /** Start a scripted server; returns (port, future-ish thread handle). */
  private def withServer[A](script: Backend => Unit)(body: Int => A): A = {
    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    @volatile var err: Throwable = null
    val t = new Thread(() => {
      try {
        val be = new Backend(server.accept())
        try script(be) finally be.close()
      } catch { case e: Throwable => err = e }
      finally server.close()
    }, "fake-pg")
    t.start()
    try {
      val r = body(server.getLocalPort)
      t.join(30000)
      if (err != null) throw new AssertionError("fake server failed", err)
      r
    } finally { try server.close() catch { case _: Exception => () } }
  }

  private def tmp(): Path = {
    val d = Files.createTempDirectory("graft-tailer")
    d.toFile.deleteOnExit(); d
  }

  private def cfg(port: Int, out: Path, ack: Path,
                  chunkMaxBytes: Int = 1): PgTailer.Config =
    PgTailer.Config(slot = "graft_slot", publication = "graft_pub",
      outDir = out, ackFile = Some(ack), chunkMaxBytes = chunkMaxBytes,
      statusIntervalMs = 200)

  private def runTailer(port: Int, c: PgTailer.Config): PgTailer.SessionResult =
    PgTailer.run(new Socket(java.net.InetAddress.getLoopbackAddress, port), c)

  private val relId = 99
  private val rel = Wire.relation(relId, "public", "t1", Seq(("id", 20), ("v", 25)))
  private def ins(id: Int, v: String) =
    Wire.insert(relId, Seq(Some(id.toString), Some(v)))

  // ---------------------------------------------------------------------

  test("handshake, chunk rolls at txn boundaries, registry prefix, ack = engine watermark") {
    val out = tmp(); val ack = tmp().resolve("ack")
    val lsn1 = 0x200L; val lsn2 = 0x300L
    val result = withServer { be =>
      val params = be.readStartup()
      assert(params("replication") == "database")
      assert(params("user") == "postgres")
      be.authOkReady()
      be.identifySystem("0/10")
      be.acceptStartReplication()
      // no watermark yet -> starts at 0/0 (the server resolves it to the
      // slot's confirmed_flush; starting at the identified xlogpos would
      // skip WAL streamed-but-uncommitted before a reconnect), v2 args
      assert(be.startReplicationSql.contains("SLOT graft_slot"))
      assert(be.startReplicationSql.contains("LOGICAL 0/0"))
      assert(be.startReplicationSql.contains("proto_version '2'"))
      assert(be.startReplicationSql.contains("streaming 'true'"))
      be.awaitAck(0L) // initial status: nothing committed -> 0 = "no info"
      // txn1 then txn2, each a complete Begin..Commit run
      Seq(rel, Wire.begin(lsn1, 7), ins(1, "a"), ins(2, "b"), Wire.commit(lsn1))
        .foreach(be.xlog(lsn1, _))
      Seq(Wire.begin(lsn2, 8), ins(3, "c"), Wire.commit(lsn2))
        .foreach(be.xlog(lsn2, _))
      // engine commits txn1 -> watermark file advances; server requests a
      // reply and must be acked the COMMITTED lsn, not the read position
      Files.write(ack, PgTailer.fmtLsn(lsn1).getBytes(UTF_8))
      be.keepalive(lsn2, replyRequested = true)
      be.awaitAck(lsn1)
      be.close()
    } { port => runTailer(port, cfg(port, out, ack)) }

    assert(result.identifiedLsn == 0x10L)
    assert(result.startLsn == 0L) // never the xlogpos: committed-or-zero
    assert(result.chunksRolled == 2) // chunkMaxBytes=1: roll per safe boundary
    assert(result.lastAckedLsn == lsn1) // NOT lsn2, the read position
    val chunks = Files.list(out).sorted().toArray.map(_.asInstanceOf[Path])
    assert(chunks.map(_.getFileName.toString).toSeq ==
      Seq("chunk-00000000.pgchunk", "chunk-00000001.pgchunk"))
    // chunk 2 must decode STANDALONE: the roller prefixed the registry
    val ev2 = PgOutput.decodeChunk(Files.readAllBytes(chunks(1)), "s1")
    assert(ev2.map(e => (e.lsn, e.seq, e.op, e.source_table)) ==
      Seq((lsn2, 0, "I", "t1")))
    assert(ev2.head.after == Map("id" -> "3", "v" -> "c"))
    val ev1 = PgOutput.decodeChunk(Files.readAllBytes(chunks(0)), "s1")
    assert(ev1.map(_.after("id")) == Seq("1", "2"))
  }

  test("v2 streamed txn never splits across chunks; abort decodes to nothing") {
    val out = tmp(); val ack = tmp().resolve("ack")
    val commitLsn = 0x500L; val midLsn = 0x450L
    withServer { be =>
      be.readStartup(); be.authOkReady(); be.identifySystem("0/10")
      be.acceptStartReplication()
      be.awaitAck(0L) // nothing committed downstream yet
      // stream block opens txn 7; an interleaved COMMITTED txn lands while
      // 7 is in progress; a second stream block completes 7; txn 8 streams
      // then aborts whole. chunkMaxBytes=1 wants to roll constantly — the
      // boundary rule must hold everything in ONE chunk until quiescent.
      Seq(rel,
        Wire.streamStart(7), Wire.streamed(7, ins(10, "x")), Wire.streamStop(),
        Wire.begin(midLsn, 9), ins(20, "mid"), Wire.commit(midLsn),
        Wire.streamStart(7, first = false), Wire.streamed(7, ins(11, "y")),
        Wire.streamStop(), Wire.streamCommit(7, commitLsn),
        Wire.streamStart(8), Wire.streamed(8, ins(30, "dead")),
        Wire.streamStop(), Wire.streamAbort(8, 8))
        .foreach(be.xlog(midLsn, _))
      be.keepalive(commitLsn, replyRequested = true)
      be.awaitAck(0L) // still nothing committed downstream: ack stays 0
      be.close()
    } { port =>
      val r = runTailer(port, cfg(port, out, ack))
      // despite roll-per-message pressure, stream 7 holds the first chunk
      // open through the interleaved txn until its StreamCommit; stream
      // 8's whole-txn abort closes the second
      assert(r.chunksRolled == 2, s"rolled ${r.chunksRolled}")
    }
    val chunks = Files.list(out).sorted().toArray.map(_.asInstanceOf[Path])
    assert(chunks.length == 2)
    val ev = PgOutput.decodeChunk(Files.readAllBytes(chunks(0)), "s1")
    // interleaved txn first (commit order), then streamed txn at commit
    // LSN — one chunk, self-contained
    assert(ev.map(e => (e.lsn, e.seq, e.after("id"))) ==
      Seq((midLsn, 0, "20"), (commitLsn, 0, "10"), (commitLsn, 1, "11")))
    // aborted txn 8 contributes nothing
    assert(PgOutput.decodeChunk(Files.readAllBytes(chunks(1)), "s1").isEmpty)
  }

  test("crash-restart: drops the mid-txn tail, resumes from the acked LSN, never overwrites chunks") {
    val out = tmp(); val ack = tmp().resolve("ack")
    val lsn1 = 0x200L; val lsn2 = 0x300L
    // session 1: one complete txn, then the server dies mid-txn2
    withServer { be =>
      be.readStartup(); be.authOkReady(); be.identifySystem("0/10")
      be.acceptStartReplication()
      be.awaitAck(0L) // nothing committed downstream yet
      Seq(rel, Wire.begin(lsn1, 7), ins(1, "a"), Wire.commit(lsn1),
        Wire.begin(lsn2, 8), ins(2, "torn")) // no commit: crash window
        .foreach(be.xlog(lsn1, _))
      Files.write(ack, PgTailer.fmtLsn(lsn1).getBytes(UTF_8))
      be.keepalive(lsn1, replyRequested = true)
      be.awaitAck(lsn1)
      be.close() // abrupt: connection drops mid-transaction
    } { port =>
      val r = runTailer(port, cfg(port, out, ack))
      assert(r.chunksRolled == 1) // txn1 only; torn tail NOT written
    }
    val afterCrash = Files.list(out).toArray.map(_.asInstanceOf[Path])
    assert(afterCrash.map(_.getFileName.toString).toSeq ==
      Seq("chunk-00000000.pgchunk"))
    // session 2: must START_REPLICATION at the ACKED lsn (server re-sends
    // txn2 whole), and must number new chunks after the existing ones
    withServer { be =>
      be.readStartup(); be.authOkReady(); be.identifySystem("0/400")
      be.acceptStartReplication()
      assert(be.startReplicationSql.contains(s"LOGICAL ${PgTailer.fmtLsn(lsn1)}"),
        be.startReplicationSql)
      be.awaitAck(lsn1)
      Seq(rel, Wire.begin(lsn2, 8), ins(2, "torn"), Wire.commit(lsn2))
        .foreach(be.xlog(lsn2, _))
      be.keepalive(lsn2, replyRequested = true)
      be.awaitAck(lsn1) // engine hasn't committed txn2 yet: ack unchanged
      be.close()
    } { port =>
      val r = runTailer(port, cfg(port, out, ack))
      assert(r.startLsn == lsn1)
      assert(r.chunksRolled == 1)
    }
    val files = Files.list(out).sorted().toArray.map(_.asInstanceOf[Path])
    assert(files.map(_.getFileName.toString).toSeq ==
      Seq("chunk-00000000.pgchunk", "chunk-00000001.pgchunk"))
    val ev = PgOutput.decodeChunk(Files.readAllBytes(files(1)), "s1")
    assert(ev.map(e => (e.lsn, e.op, e.after("id"))) == Seq((lsn2, "I", "2")))
  }

  test("ack-lake reads the newest manifest's lsn-high-watermark") {
    val root = tmp()
    val meta = root.resolve("_meta"); Files.createDirectories(meta)
    def manifest(v: Long, wm: String): Unit =
      Files.write(meta.resolve(f"v$v%020d.json"),
        s"""{"version":$v,"properties":{"commit-epoch":"$v","lsn-high-watermark":"$wm"}}"""
          .getBytes(UTF_8))
    val c = PgTailer.Config(slot = "s", publication = "p",
      outDir = tmp(), ackLake = Some(root))
    manifest(1, "-1") // freshly created table: no commit yet
    assert(PgTailer.committedWatermark(c).isEmpty)
    manifest(2, "512")
    manifest(3, "768")
    assert(PgTailer.committedWatermark(c).contains(768L))
    // torn/unreadable newest manifest: keep last known behavior (None),
    // never throw into the status loop
    Files.write(meta.resolve(f"v${4L}%020d.json"), "{not json".getBytes(UTF_8))
    assert(PgTailer.committedWatermark(c).isEmpty)
  }

  test("lsn text form round-trips") {
    for (l <- Seq(0L, 0x10L, 0xFFFFFFFFL, 0x1_0000_0000L, 0x12AB_CDEF_0123_4567L))
      assert(PgTailer.parseLsn(PgTailer.fmtLsn(l)) == l)
    assert(PgTailer.fmtLsn(0x1_0000_0010L) == "1/10")
    assert(PgTailer.parseLsn("1234") == 1234L) // plain decimal accepted
  }
}
