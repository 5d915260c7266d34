package graft.sources

/** Live-PostgreSQL connection bootstrap for the CDC source — the A1–A3
  * surface of the reference (`PgConnectionFactory.java:22-42`,
  * `CdcEngine.java:163-215`), kept as PURE catalog-SQL builders plus the
  * replication-connection property set. The sandbox has no live
  * PostgreSQL and no JDBC driver on the classpath, so this module owns
  * everything testable (statement text, idempotency predicates, option
  * validation) while the thin socket wiring lives with the deployment:
  *
  * {{{
  * val props = LivePgBootstrap.replicationProperties("11.0")
  * val conn  = DriverManager.getConnection(url, props)        // pgjdbc
  * exec(conn, LivePgBootstrap.slotExistsSql(slot))            // -> bool
  * if (!exists) exec(conn, LivePgBootstrap.createSlotSql(slot))
  * exec(conn, LivePgBootstrap.publicationExistsSql(pub))
  * if (!exists) exec(conn, LivePgBootstrap.createPublicationSql(pub))
  * // then PGConnection.getReplicationAPI ... pgoutput frames feed the
  * // same PgOutputDecoder used by the replay source.
  * }}}
  *
  * The live `MicroBatchStream` differs from `PgCdcReplayStream` only in
  * where frames come from (socket vs file) and in `commit(end)` — which
  * must advance the slot's flushed/applied LSN (the reference's
  * `setFlushedLSN`/`forceUpdateStatus`, `CdcEngine.java:132-137`).
  */
object LivePgBootstrap {

  /** Replication-mode connection properties (reference:
    * `PgConnectionFactory.java:26-36` — walsender mode needs the simple
    * query protocol and a minimum server version). */
  def replicationProperties(minServerVersion: String = "11.0"): Map[String, String] = Map(
    "replication" -> "database",
    "preferQueryMode" -> "simple",
    "assumeMinServerVersion" -> minServerVersion)

  /** pgoutput plugin options for the START_REPLICATION slot stream
    * (reference: `CdcEngine.java:61-65` — which pins proto_version=1).
    * protoVersion >= 2 also enables `streaming 'on'`: large in-progress
    * transactions then arrive as interleaved S..E segments instead of
    * buffering whole on the server (PG 14+). */
  def slotOptions(publication: String, protoVersion: Int = 1): Map[String, String] = Map(
    "proto_version" -> protoVersion.toString,
    "publication_names" -> publication) ++
    (if (protoVersion >= 2) Map("streaming" -> "on") else Map.empty)

  private def requireIdent(s: String): String = {
    require(s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_'),
      s"invalid identifier: '$s'")
    s
  }

  /** Idempotency probe (reference: `CdcEngine.java:166-173`). */
  def slotExistsSql(slot: String): String =
    s"SELECT EXISTS(SELECT 1 FROM pg_replication_slots WHERE slot_name = '${requireIdent(slot)}')"

  /** Logical slot creation with the built-in pgoutput plugin
    * (reference: `CdcEngine.java:175-186`). */
  def createSlotSql(slot: String): String =
    s"SELECT pg_create_logical_replication_slot('${requireIdent(slot)}', 'pgoutput')"

  /** Replication-command form of slot creation (walsender connections
    * only): returns (slot_name, consistent_point, snapshot_name,
    * output_plugin) and EXPORTS the snapshot the slot was created under —
    * the consistency anchor for initial backfill ([[PgSnapshot]]). The
    * snapshot stays importable only while the creating connection lives. */
  def createSlotCommand(slot: String): String =
    s"CREATE_REPLICATION_SLOT ${requireIdent(slot)} LOGICAL pgoutput EXPORT_SNAPSHOT"

  /** Import the slot-creation snapshot into a REPEATABLE READ reader tx:
    * every SELECT then sees exactly the consistent point's state.
    * PostgreSQL snapshot names are hex-and-dash tokens; enforce that so a
    * config-sourced name can't smuggle SQL. */
  def setSnapshotSql(snapshotName: String): String = {
    require(snapshotName.nonEmpty && snapshotName.forall(c =>
      c.isLetterOrDigit || c == '-' || c == '_'), s"invalid snapshot name: '$snapshotName'")
    s"SET TRANSACTION SNAPSHOT '$snapshotName'"
  }

  /** Full-table snapshot read. At 100 TB the same exported snapshot can
    * be imported by MANY parallel reader connections, each with a
    * key-range predicate appended — this builder is the single-connection
    * base form. */
  def snapshotSelectSql(schema: String, table: String): String =
    s"SELECT * FROM ${requireIdent(schema)}.${requireIdent(table)}"

  /** Idempotency probe (reference: `CdcEngine.java:192-199`). */
  def publicationExistsSql(publication: String): String =
    s"SELECT EXISTS(SELECT 1 FROM pg_publication WHERE pubname = '${requireIdent(publication)}')"

  /** FOR ALL TABLES publication (reference: `CdcEngine.java:201-214`). */
  def createPublicationSql(publication: String): String =
    s"CREATE PUBLICATION ${requireIdent(publication)} FOR ALL TABLES"

  /** Slot-advance statement for `MicroBatchStream.commit` on a live
    * source: confirm everything up to and including `lsn` consumed
    * (the replication-protocol ack the reference issues via
    * `setFlushedLSN`; SQL form usable from a maintenance connection). */
  def advanceSlotSql(slot: String, lsn: String): String = {
    require(lsn.matches("[0-9A-Fa-f]+/[0-9A-Fa-f]+"), s"invalid LSN: '$lsn'")
    s"SELECT pg_replication_slot_advance('${requireIdent(slot)}', '$lsn')"
  }
}
