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
    * buffering whole on the server (PG 14+). protoVersion >= 3 also
    * enables `two_phase 'true'` (PG 15+): prepared transactions arrive
    * as the b..P/K and COMMIT/ROLLBACK PREPARED frames the decoder's
    * 2PC tier assembles — the REQUEST side of the r16 decode tier
    * (the slot itself must also be two-phase-enabled, see
    * [[createSlotSql]]/[[createSlotCommand]]). `messages` surfaces
    * `pg_logical_emit_message` payloads as the M frames the decoder
    * already maps to op='M' rows (PG 14+). */
  def slotOptions(publication: String, protoVersion: Int = 1,
                  messages: Boolean = false): Map[String, String] = Map(
    "proto_version" -> protoVersion.toString,
    "publication_names" -> publication) ++
    (if (protoVersion >= 2) Map("streaming" -> "on") else Map.empty) ++
    (if (protoVersion >= 3) Map("two_phase" -> "true") else Map.empty) ++
    (if (messages) Map("messages" -> "true") else Map.empty)

  private def requireIdent(s: String): String = {
    require(s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_'),
      s"invalid identifier: '$s'")
    s
  }

  /** Idempotency probe (reference: `CdcEngine.java:166-173`). */
  def slotExistsSql(slot: String): String =
    s"SELECT EXISTS(SELECT 1 FROM pg_replication_slots WHERE slot_name = '${requireIdent(slot)}')"

  /** Logical slot creation with the built-in pgoutput plugin
    * (reference: `CdcEngine.java:175-186`). `twoPhase` (PG 15+) makes
    * the slot deliver prepared transactions at PREPARE time — required
    * for the proto_version=3 2PC stream (the 4-argument form:
    * temporary=false, two_phase=true). */
  def createSlotSql(slot: String, twoPhase: Boolean = false): String =
    if (twoPhase)
      s"SELECT pg_create_logical_replication_slot('${requireIdent(slot)}', 'pgoutput', false, true)"
    else
      s"SELECT pg_create_logical_replication_slot('${requireIdent(slot)}', 'pgoutput')"

  /** Replication-command form of slot creation (walsender connections
    * only): returns (slot_name, consistent_point, snapshot_name,
    * output_plugin) and EXPORTS the snapshot the slot was created under —
    * the consistency anchor for initial backfill ([[PgSnapshot]]). The
    * snapshot stays importable only while the creating connection lives.
    * With `twoPhase` the PG15 parenthesized option grammar is emitted
    * (TWO_PHASE has no legacy space-separated form). */
  def createSlotCommand(slot: String, twoPhase: Boolean = false): String =
    if (twoPhase)
      s"CREATE_REPLICATION_SLOT ${requireIdent(slot)} LOGICAL pgoutput (TWO_PHASE, SNAPSHOT 'export')"
    else
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

  /** One table in a SCOPED publication (PG 15 features the reference's
    * FOR-ALL-TABLES bootstrap never reaches):
    *  - `columns`: a COLUMN LIST — the server publishes ONLY these,
    *    i.e. column projection pushed to the WAL producer itself (at
    *    100 TB of change volume, the cheapest column pruning there is);
    *  - `rowFilter`: a WHERE expression evaluated by the server per
    *    row — predicate pushdown to the WAL producer. The expression
    *    is operator-supplied DDL TEXT (like any migration script);
    *    statement stacking is refused, identifiers are validated. */
  final case class PubTable(schema: String, table: String,
                            columns: Seq[String] = Nil,
                            rowFilter: Option[String] = None)

  private val PublishOps = Set("insert", "update", "delete", "truncate")

  /** Scoped CREATE PUBLICATION: explicit tables, optional per-table
    * column lists and row filters, optional `publish` operation set
    * (e.g. only inserts for an append-only ingest feed). */
  def createPublicationForTablesSql(publication: String,
                                    tables: Seq[PubTable],
                                    publishOps: Seq[String] = Nil): String = {
    require(tables.nonEmpty, "createPublicationForTablesSql: no tables")
    publishOps.foreach(op => require(PublishOps.contains(op),
      s"invalid publish operation '$op' — one of ${PublishOps.mkString(", ")}"))
    val rendered = tables.map { t =>
      val base = s"${requireIdent(t.schema)}.${requireIdent(t.table)}"
      val cols =
        if (t.columns.isEmpty) ""
        else t.columns.map(requireIdent).mkString(" (", ", ", ")")
      val filt = t.rowFilter.map { f =>
        require(!f.contains(";"),
          s"row filter must be a single expression (no ';'): '$f'")
        s" WHERE ($f)"
      }.getOrElse("")
      s"TABLE $base$cols$filt"
    }.mkString(", ")
    val withOps =
      if (publishOps.isEmpty) ""
      else s" WITH (publish = '${publishOps.mkString(", ")}')"
    s"CREATE PUBLICATION ${requireIdent(publication)} FOR $rendered$withOps"
  }

  /** Widen an existing scoped publication by one table (same column
    * list / row filter forms). */
  def alterPublicationAddTableSql(publication: String, t: PubTable): String = {
    val one = createPublicationForTablesSql("p_probe", Seq(t))
      .stripPrefix("CREATE PUBLICATION p_probe FOR ")
    s"ALTER PUBLICATION ${requireIdent(publication)} ADD $one"
  }

  /** Slot-advance statement for `MicroBatchStream.commit` on a live
    * source: confirm everything up to and including `lsn` consumed
    * (the replication-protocol ack the reference issues via
    * `setFlushedLSN`; SQL form usable from a maintenance connection). */
  def advanceSlotSql(slot: String, lsn: String): String = {
    require(lsn.matches("[0-9A-Fa-f]+/[0-9A-Fa-f]+"), s"invalid LSN: '$lsn'")
    s"SELECT pg_replication_slot_advance('${requireIdent(slot)}', '$lsn')"
  }
}
