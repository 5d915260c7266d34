package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class LivePgBootstrapSpec extends AnyFunSuite {

  test("replication connection properties match the walsender contract") {
    val p = LivePgBootstrap.replicationProperties()
    assert(p("replication") === "database")
    assert(p("preferQueryMode") === "simple")
    assert(p("assumeMinServerVersion") === "11.0")
  }

  test("slot options carry proto version and publication") {
    assert(LivePgBootstrap.slotOptions("pub1") ===
      Map("proto_version" -> "1", "publication_names" -> "pub1"))
  }

  test("bootstrap SQL is idempotency-probed and uses pgoutput") {
    assert(LivePgBootstrap.slotExistsSql("s1").contains("pg_replication_slots"))
    assert(LivePgBootstrap.createSlotSql("s1").contains("'pgoutput'"))
    assert(LivePgBootstrap.publicationExistsSql("p1").contains("pg_publication"))
    assert(LivePgBootstrap.createPublicationSql("p1") ===
      "CREATE PUBLICATION p1 FOR ALL TABLES")
  }

  test("identifiers are validated (no injection through slot/pub names)") {
    intercept[IllegalArgumentException](LivePgBootstrap.createSlotSql("x'; DROP TABLE t;--"))
    intercept[IllegalArgumentException](LivePgBootstrap.createPublicationSql(""))
  }

  test("slot advance validates LSN format") {
    assert(LivePgBootstrap.advanceSlotSql("s", "0/16B3748").contains("pg_replication_slot_advance"))
    intercept[IllegalArgumentException](LivePgBootstrap.advanceSlotSql("s", "nonsense"))
  }

  test("snapshot builders: slot command, snapshot import, select — all validated") {
    assert(LivePgBootstrap.createSlotCommand("s1") ===
      "CREATE_REPLICATION_SLOT s1 LOGICAL pgoutput EXPORT_SNAPSHOT")
    assert(LivePgBootstrap.setSnapshotSql("00000003-0000001B-1") ===
      "SET TRANSACTION SNAPSHOT '00000003-0000001B-1'")
    assert(LivePgBootstrap.snapshotSelectSql("public", "accounts") ===
      "SELECT * FROM public.accounts")
    intercept[IllegalArgumentException](LivePgBootstrap.createSlotCommand("x; DROP"))
    intercept[IllegalArgumentException](LivePgBootstrap.setSnapshotSql("x'; DROP TABLE t;--"))
    intercept[IllegalArgumentException](LivePgBootstrap.snapshotSelectSql("public", "t; --"))
  }

  test("LSN text parsing round-trips the 64-bit form") {
    assert(graft.sources.PgSnapshot.lsnFromText("0/96") === 150L)
    assert(graft.sources.PgSnapshot.lsnFromText("16B3748/FFFFFFFF") ===
      ((0x16B3748L << 32) | 0xFFFFFFFFL))
    intercept[IllegalArgumentException](graft.sources.PgSnapshot.lsnFromText("junk"))
  }
}
