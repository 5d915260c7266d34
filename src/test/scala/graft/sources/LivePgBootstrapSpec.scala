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
    // v2 negotiates streamed in-progress transactions
    assert(LivePgBootstrap.slotOptions("pub1", protoVersion = 2) ===
      Map("proto_version" -> "2", "publication_names" -> "pub1",
        "streaming" -> "on"))
    // v3 additionally negotiates the 2PC stream (PG 15)
    assert(LivePgBootstrap.slotOptions("pub1", protoVersion = 3) ===
      Map("proto_version" -> "3", "publication_names" -> "pub1",
        "streaming" -> "on", "two_phase" -> "true"))
    // logical decoding messages are opt-in at any proto version
    assert(LivePgBootstrap.slotOptions("pub1", messages = true)("messages") === "true")
  }

  test("two-phase slot creation: SQL 4-arg form and walsender option grammar") {
    assert(LivePgBootstrap.createSlotSql("s1", twoPhase = true) ===
      "SELECT pg_create_logical_replication_slot('s1', 'pgoutput', false, true)")
    assert(LivePgBootstrap.createSlotCommand("s1", twoPhase = true) ===
      "CREATE_REPLICATION_SLOT s1 LOGICAL pgoutput (TWO_PHASE, SNAPSHOT 'export')")
    // the legacy forms are unchanged (older servers keep working)
    assert(LivePgBootstrap.createSlotCommand("s1") ===
      "CREATE_REPLICATION_SLOT s1 LOGICAL pgoutput EXPORT_SNAPSHOT")
  }

  test("scoped publications: column lists, row filters, publish ops (PG 15)") {
    import LivePgBootstrap.PubTable
    assert(LivePgBootstrap.createPublicationForTablesSql("p1",
      Seq(PubTable("public", "orders"))) ===
      "CREATE PUBLICATION p1 FOR TABLE public.orders")
    assert(LivePgBootstrap.createPublicationForTablesSql("p1",
      Seq(PubTable("public", "orders", columns = Seq("o_orderkey", "o_totalprice")),
        PubTable("s2", "events", rowFilter = Some("event_type = 'click'"))),
      publishOps = Seq("insert", "update")) ===
      "CREATE PUBLICATION p1 FOR TABLE public.orders (o_orderkey, o_totalprice), " +
        "TABLE s2.events WHERE (event_type = 'click') " +
        "WITH (publish = 'insert, update')")
    assert(LivePgBootstrap.alterPublicationAddTableSql("p1",
      PubTable("public", "nation", rowFilter = Some("n_regionkey < 3"))) ===
      "ALTER PUBLICATION p1 ADD TABLE public.nation WHERE (n_regionkey < 3)")
    // refusals: bad publish op, stacked statement in a filter, bad idents
    intercept[IllegalArgumentException] {
      LivePgBootstrap.createPublicationForTablesSql("p1",
        Seq(PubTable("public", "orders")), publishOps = Seq("upsert"))
    }
    intercept[IllegalArgumentException] {
      LivePgBootstrap.createPublicationForTablesSql("p1",
        Seq(PubTable("public", "orders", rowFilter = Some("1=1; DROP TABLE t"))))
    }
    intercept[IllegalArgumentException] {
      LivePgBootstrap.createPublicationForTablesSql("p1",
        Seq(PubTable("public", "bad-name")))
    }
    intercept[IllegalArgumentException] {
      LivePgBootstrap.createPublicationForTablesSql("p1", Nil)
    }
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
