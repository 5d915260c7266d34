package graft.wal

import java.nio.ByteBuffer

import org.scalatest.funsuite.AnyFunSuite

import PgOutput._

/** Decoder unit tests against hand-built pgoutput frames (layouts per
  * FIXTURES.md §2): every message type, tuple sub-types t/n/u, UPDATE
  * O/K old tuples, DELETE key tuple, and the error paths. */
class PgOutputDecoderSpec extends AnyFunSuite {

  private val rel = RelationMeta(42, "public", "test", Vector(
    RelationColumn("id", 20, -1, 0),
    RelationColumn("name", 1043, -1, 0),
    RelationColumn("tags", 1009, -1, 0)))

  private def dec(d: PgOutputDecoder, bytes: Array[Byte]): Option[Message] =
    d.decode(ByteBuffer.wrap(bytes))

  test("RELATION registers schema from the message body") {
    val d = new PgOutputDecoder
    val msg = dec(d, PgOutputEncoder.relation(rel))
    assert(msg === Some(Relation(rel)))
    assert(d.relations(42).columns.map(_.name) === Seq("id", "name", "tags"))
  }

  test("BEGIN/COMMIT decode to tx markers") {
    val d = new PgOutputDecoder
    assert(dec(d, PgOutputEncoder.begin()) === Some(Begin))
    assert(dec(d, PgOutputEncoder.commit()) === Some(Commit))
  }

  test("INSERT decodes positional tuple with t/n sub-types") {
    val d = new PgOutputDecoder
    dec(d, PgOutputEncoder.relation(rel))
    val msg = dec(d, PgOutputEncoder.insert(42, Seq(Some("7"), None, Some("{a,b}"))))
    val Some(Change('I', m, cells, before)) = msg
    assert(m.table === "test")
    assert(cells === Map("id" -> Some("7"), "name" -> None, "tags" -> Some("{a,b}")))
    assert(before.isEmpty)
  }

  test("UNCHANGED ('u') columns are omitted, not null") {
    val d = new PgOutputDecoder
    dec(d, PgOutputEncoder.relation(rel))
    val msg = dec(d, PgOutputEncoder.insert(42, Seq(Some("7"), Some("x"), Some("ignored")),
      unchanged = Set(2)))
    val Some(Change(_, _, cells, _)) = msg
    assert(cells === Map("id" -> Some("7"), "name" -> Some("x")))
    assert(!cells.contains("tags")) // absent, distinguishable from NULL
  }

  test("UPDATE with 'O' old tuple retains before-image") {
    val d = new PgOutputDecoder
    dec(d, PgOutputEncoder.relation(rel))
    val msg = dec(d, PgOutputEncoder.update(42, Seq(Some("7"), Some("new"), None),
      old = Some(('O', Seq(Some("7"), Some("old"), None)))))
    val Some(Change('U', _, cells, before)) = msg
    assert(cells("name") === Some("new"))
    assert(before === Map("id" -> Some("7"), "name" -> Some("old"), "tags" -> None))
  }

  test("UPDATE with 'K' key tuple and with no old tuple") {
    val d = new PgOutputDecoder
    dec(d, PgOutputEncoder.relation(rel))
    val k = dec(d, PgOutputEncoder.update(42, Seq(Some("8"), Some("v"), None),
      old = Some(('K', Seq(Some("8"), None, None)))))
    val Some(Change('U', _, _, beforeK)) = k
    // K tuples carry NULL ('n') for non-key columns on the wire
    assert(beforeK === Map("id" -> Some("8"), "name" -> None, "tags" -> None))
    val n = dec(d, PgOutputEncoder.update(42, Seq(Some("9"), Some("w"), None)))
    val Some(Change('U', _, cellsN, beforeN)) = n
    assert(cellsN("id") === Some("9") && beforeN.isEmpty)
  }

  test("DELETE decodes the key tuple") {
    val d = new PgOutputDecoder
    dec(d, PgOutputEncoder.relation(rel))
    val msg = dec(d, PgOutputEncoder.delete(42, Seq(Some("7"), None, None)))
    val Some(Change('D', _, cells, _)) = msg
    assert(cells === Map("id" -> Some("7"), "name" -> None, "tags" -> None))
  }

  test("DML before RELATION throws") {
    val d = new PgOutputDecoder
    intercept[IllegalStateException](dec(d, PgOutputEncoder.insert(42, Seq(Some("1")))))
  }

  test("Y (TYPE) and O (ORIGIN) frames decode to typed catalog messages") {
    val d = new PgOutputDecoder
    val Some(TypeMessage(oid, sch, nm)) =
      dec(d, PgOutputEncoder.typeMessage(600001, "public", "mood"))
    assert(oid === 600001 && sch === "public" && nm === "mood")
    val Some(OriginMessage(olsn, oname)) =
      dec(d, PgOutputEncoder.originMessage(0x01000000L, "origin_node_1"))
    assert(olsn === 0x01000000L && oname === "origin_node_1")
  }

  test("logical decoding message ('M') round-trips, binary content intact") {
    val d = new PgOutputDecoder
    val payload = Array[Byte](0, -1, 127, -128, 42) // not valid UTF-8 — bytes must survive
    val Some(LogicalMessage(trans, msgLsn, prefix, content)) =
      dec(d, PgOutputEncoder.logicalMessage("graft.fence", payload, transactional = true, msgLsn = 77L))
    assert(trans && msgLsn === 77L && prefix === "graft.fence")
    assert(content.toSeq === payload.toSeq)
    val Some(LogicalMessage(trans2, _, prefix2, content2)) =
      dec(d, PgOutputEncoder.logicalMessage("tick", Array.emptyByteArray, transactional = false))
    assert(!trans2 && prefix2 === "tick" && content2.isEmpty)
  }

  test("'M' inside a streamed segment carries the v2 xid prefix") {
    val d = new PgOutputDecoder
    dec(d, PgOutputEncoder.streamStart(900))
    val Some(Streamed(900, 901, LogicalMessage(true, _, "mark", _))) =
      dec(d, PgOutputEncoder.streamed(901,
        PgOutputEncoder.logicalMessage("mark", "x".getBytes)))
    dec(d, PgOutputEncoder.streamStop())
  }

  test("TRUNCATE decodes the relation-OID list and option bits") {
    val d = new PgOutputDecoder
    val rel2 = rel.copy(id = 43, table = "test2")
    dec(d, PgOutputEncoder.relation(rel))
    dec(d, PgOutputEncoder.relation(rel2))
    val Some(Truncate(metas, cascade, restart)) =
      dec(d, PgOutputEncoder.truncate(Seq(42, 43), cascade = true))
    assert(metas.map(_.table) === Vector("test", "test2"))
    assert(cascade && !restart)
    val Some(Truncate(_, c2, r2)) =
      dec(d, PgOutputEncoder.truncate(Seq(42), restartIdentity = true))
    assert(!c2 && r2)
  }

  test("TRUNCATE for an unregistered relation throws") {
    val d = new PgOutputDecoder
    intercept[IllegalStateException](dec(d, PgOutputEncoder.truncate(Seq(99))))
  }

  test("proto v2: streamed segments wrap xid-prefixed DML; E resets; c/A decode") {
    val e = PgOutputEncoder
    val d = new PgOutputDecoder
    dec(d, e.relation(rel))
    // S opens a segment for top-level xid 900
    assert(dec(d, e.streamStart(900)) === Some(StreamStart(900, firstSegment = true)))
    // inside: DML carries an Int32 xid prefix (here a subxact, 901)
    val Some(Streamed(900, 901, Change('I', m, cells, _))) =
      dec(d, e.streamed(901, e.insert(42, Seq(Some("1"), Some("x"), None))))
    assert(m.table === "test" && cells("id") === Some("1"))
    // streamed RELATION updates the registry and wraps
    val rel2 = rel.copy(id = 44, table = "test3")
    val Some(Streamed(900, 900, Relation(meta2))) = dec(d, e.streamed(900, e.relation(rel2)))
    assert(meta2.table === "test3" && d.relations.contains(44))
    // streamed TRUNCATE wraps too
    val Some(Streamed(900, 900, Truncate(ms, _, _))) =
      dec(d, e.streamed(900, e.truncate(Seq(42))))
    assert(ms.map(_.table) === Vector("test"))
    // E closes the segment: plain (un-prefixed) v1 framing resumes
    assert(dec(d, e.streamStop()) === Some(StreamStop))
    val Some(Change('I', _, cells2, _)) = dec(d, e.insert(42, Seq(Some("2"), None, None)))
    assert(cells2("id") === Some("2"))
    // stream commit / abort resolve by top-level xid
    assert(dec(d, e.streamCommit(900, 7L, 9L)) === Some(StreamCommit(900, 7L, 9L)))
    assert(dec(d, e.streamAbort(902, 903)) === Some(StreamAbort(902, 903)))
  }

  test("proto v2: second segment of the same tx carries firstSegment=false") {
    val e = PgOutputEncoder
    val d = new PgOutputDecoder
    assert(dec(d, e.streamStart(77)) === Some(StreamStart(77, firstSegment = true)))
    assert(dec(d, e.streamStop()) === Some(StreamStop))
    assert(dec(d, e.streamStart(77, firstSegment = false)) ===
      Some(StreamStart(77, firstSegment = false)))
  }

  test("unknown top-level type byte throws") {
    val d = new PgOutputDecoder
    intercept[IllegalArgumentException](dec(d, Array('Z'.toByte)))
  }

  test("unknown tuple sub-type throws") {
    val d = new PgOutputDecoder
    dec(d, PgOutputEncoder.relation(rel))
    // hand-craft: INSERT with bad sub-type byte 'x'
    val bad = Array('I'.toByte) ++
      ByteBuffer.allocate(4).putInt(42).array() ++ Array('N'.toByte) ++
      ByteBuffer.allocate(2).putShort(1).array() ++ Array('x'.toByte)
    intercept[IllegalArgumentException](dec(d, bad))
  }
}
