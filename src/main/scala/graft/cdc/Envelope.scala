package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.PgFunctions
import graft.wal.PgOutput.RelationMeta

/** The generic change envelope — Spark-native counterpart of the
  * reference's `TableRecord` (`wal/TableRecord.java:7-24`): row-oriented,
  * name-addressed, everything-is-a-string-until-accessed
  * (`wal/TableColumn.java:10-13`).
  *
  * Encoding of the three cell states (SURVEY.md §1.4, A10):
  *  - present text value  -> key in `columns`;
  *  - SQL NULL ('n')      -> name listed in `nulls` (maps with null values
  *    don't round-trip Dataset encoders cleanly; an explicit name list
  *    keeps NULL distinguishable from UNCHANGED);
  *  - UNCHANGED/TOAST ('u') -> absent from both (the reference omits the
  *    column from the record, `PgWalMessageDecoder.java:206-207`).
  */
final case class ChangeRecord(
    op: String, // "I" | "U" | "D" | "T" (truncate) | "R" (snapshot read) | "M" (logical decoding message) | "Y" (type) | "O" (origin)
    lsn: Long,
    txid: Long,
    schema: String,
    table: String,
    columns: Map[String, String],
    nulls: Seq[String],
    before: Map[String, String],
    // Arrival sequence within an equal-LSN frame run (LSNs are
    // non-decreasing but NOT strictly monotone across pgoutput messages).
    // (lsn, seq) totally orders records, which applyChanges needs: a
    // truncate and a post-truncate insert can share a WAL position, and
    // a strictly-lsn watermark would silently drop the insert.
    seq: Long = 0L)

object Envelope {

  val schema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("lsn", LongType, nullable = false),
    StructField("txid", LongType, nullable = false),
    StructField("schema", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("columns", MapType(StringType, StringType, valueContainsNull = false), nullable = false),
    StructField("nulls", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("before", MapType(StringType, StringType, valueContainsNull = false), nullable = false),
    StructField("seq", LongType, nullable = false)))

  /** PG type OID → Spark type for the typed-view projection. Mirrors the
    * reference's accessor surface (`TableColumn.java:15-53`): int4/int8,
    * varchar/text, bool, numeric→Decimal, the four array accessors
    * (numeric[] parses to doubles there, so ArrayType(DoubleType) here);
    * plus timestamp/date/float8, which the reference would leave as
    * strings (SURVEY.md §1.2 "not supported") but a query layer needs. */
  def sparkTypeFor(typeOid: Int, typeMod: Int): DataType = typeOid match {
    case 16 => BooleanType // bool
    case 17 => BinaryType // bytea (hex wire text, PG >= 9.0 default)
    case 21 => ShortType // int2
    case 23 => IntegerType // int4
    case 20 => LongType // int8
    case 700 => FloatType // float4
    case 701 => DoubleType // float8
    case 1700 => // numeric(p,s) from typmod = ((p<<16)|s)+4
      if (typeMod >= 4) {
        val m = typeMod - 4
        DecimalType(math.min((m >> 16) & 0xFFFF, 38), m & 0xFFFF)
      } else DecimalType(38, 18)
    case 25 | 1043 | 1042 => StringType // text, varchar, bpchar
    case 1114 | 1184 => TimestampType // timestamp[tz]
    case 1082 => DateType // date
    case 1007 => ArrayType(IntegerType) // int4[]
    case 1016 => ArrayType(LongType) // int8[]
    case 1231 => ArrayType(DoubleType) // numeric[] (reference: asDoubleArray)
    case 1009 | 1015 => ArrayType(StringType) // text[], varchar[]
    case _ => StringType // unknown: pass through as text
  }

  /** Envelope encoding of a logical decoding message ('M',
    * `pg_logical_emit_message` — dropped by the reference,
    * `PgWalMessageDecoder.java:60-61`): no relation, so schema/table are
    * empty (typed views filter on schema+table and never see them) and
    * the payload rides the `columns` map — content base64'd because it
    * is arbitrary bytes and the map is String→String. [[messages]]
    * decodes the typed view. */
  def messageRecord(lsn: Long, txid: Long, m: graft.wal.PgOutput.LogicalMessage,
                    seq: Long = 0L): ChangeRecord =
    ChangeRecord("M", lsn, txid, "", "",
      Map("prefix" -> m.prefix,
          "content" -> java.util.Base64.getEncoder.encodeToString(m.content),
          "transactional" -> (if (m.transactional) "t" else "f"),
          "message_lsn" -> m.msgLsn.toString),
      Vector.empty, Map.empty, seq)

  /** Typed view of the logical decoding messages in an envelope stream:
    * (lsn, txid, transactional, message_lsn, prefix, content as binary),
    * in stream order. The consumer-side pair of [[messageRecord]]. */
  def messages(envelope: DataFrame): DataFrame =
    envelope.filter(col("op") === "M").select(
      col("lsn"), col("txid"),
      (element_at(col("columns"), "transactional") === "t").as("transactional"),
      element_at(col("columns"), "message_lsn").cast(LongType).as("message_lsn"),
      element_at(col("columns"), "prefix").as("prefix"),
      unbase64(element_at(col("columns"), "content")).as("content"))

  /** Envelope encoding of a TYPE ('Y') frame — user-defined-type catalog
    * metadata, dropped by the reference (`PgWalMessageDecoder.java:
    * 60-61`). No relation, so envelope schema/table stay empty (typed
    * views never see these rows); payload rides `columns`. */
  def typeRecord(lsn: Long, txid: Long, t: graft.wal.PgOutput.TypeMessage,
                 seq: Long = 0L): ChangeRecord =
    ChangeRecord("Y", lsn, txid, "", "",
      Map("type_oid" -> t.typeOid.toString,
          "type_schema" -> t.schema,
          "type_name" -> t.name),
      Vector.empty, Map.empty, seq)

  /** Envelope encoding of an ORIGIN ('O') frame — the cascaded-setup
    * provenance marker, dropped by the reference (same cite). */
  def originRecord(lsn: Long, txid: Long, o: graft.wal.PgOutput.OriginMessage,
                   seq: Long = 0L): ChangeRecord =
    ChangeRecord("O", lsn, txid, "", "",
      Map("origin_lsn" -> o.commitLsn.toString, "origin_name" -> o.name),
      Vector.empty, Map.empty, seq)

  /** Typed view of the TYPE ('Y') catalog announcements in an envelope
    * stream: (lsn, txid, type_oid, type_schema, type_name). This is the
    * OID→name mapping for user-defined-type columns: [[sparkTypeFor]]
    * surfaces an unknown OID's cells as text (PG wire text output — the
    * right lazy representation for enums/domains), and a consumer that
    * wants a stronger typed view joins its RELATION column OIDs against
    * this catalog to decide its own casts. */
  def types(envelope: DataFrame): DataFrame =
    envelope.filter(col("op") === "Y").select(
      col("lsn"), col("txid"),
      element_at(col("columns"), "type_oid").cast(IntegerType).as("type_oid"),
      element_at(col("columns"), "type_schema").as("type_schema"),
      element_at(col("columns"), "type_name").as("type_name"))

  /** Typed view of the ORIGIN ('O') markers: (lsn, txid, origin_lsn,
    * origin_name), in stream order — txid ties the marker to the
    * transaction it tags, which is what a replication-loop guard
    * filters on. */
  def origins(envelope: DataFrame): DataFrame =
    envelope.filter(col("op") === "O").select(
      col("lsn"), col("txid"),
      element_at(col("columns"), "origin_lsn").cast(LongType).as("origin_lsn"),
      element_at(col("columns"), "origin_name").as("origin_name"))

  /** Cell accessor honoring the NULL-vs-UNCHANGED distinction: NULL when
    * the name is in `nulls` OR absent entirely (UNCHANGED surfaces as
    * NULL in the typed view; callers can inspect the envelope if they
    * need TOAST awareness). */
  private def cell(name: String): Column =
    when(array_contains(col("nulls"), name), lit(null).cast(StringType))
      .otherwise(element_at(col("columns"), name))

  /** Typed cast of one cell, with the reference's parse rules:
    * boolean is `"t"` (case-insensitive) and NULL-as-false
    * (`TableColumn.java:31-33`); arrays via the PgArrayLiteral-parity
    * UDFs; scalars via Catalyst casts (strict upgrade over per-access
    * parsing, SURVEY.md §3.3). */
  def typedCell(name: String, t: DataType): Column = {
    val v = cell(name)
    t match {
      case BooleanType => coalesce(lower(v) === "t", lit(false))
      case BinaryType =>
        // bytea: the hex wire format ("\x0a1b…", the server default
        // since 9.0) decodes via codegen'd unhex; the legacy escape
        // format (bytea_output=escape — printable bytes verbatim,
        // doubled backslash, \ooo octal) routes through the
        // from_pg_bytea_escape kernel, which THROWS on a malformed
        // literal rather than silently NULLing data (VERDICT r8 #4).
        when(v.isNull, lit(null).cast(BinaryType))
          .when(v.startsWith("\\x"), unhex(v.substr(lit(3), length(v))))
          .otherwise(PgFunctions.from_pg_bytea_escape(v))
      case ArrayType(LongType, _) => PgFunctions.from_pg_long_array(v)
      case ArrayType(IntegerType, _) => PgFunctions.from_pg_int_array(v)
      case ArrayType(DoubleType, _) => PgFunctions.from_pg_double_array(v)
      case ArrayType(StringType, _) => PgFunctions.from_pg_string_array(v)
      case other => v.cast(other)
    }
  }

  /** Typed view of one relation's changes: filter to the table, project
    * every relation column through its typed cast, keep the envelope
    * metadata columns. Compiled once by Catalyst and codegen'd — replaces
    * the reference's per-access parsing. */
  def typedView(envelope: DataFrame, meta: RelationMeta): DataFrame = {
    val dataCols = meta.columns.map { c =>
      typedCell(c.name, sparkTypeFor(c.typeOid, c.typeMod)).as(c.name)
    }
    // UNCHANGED/TOAST indicator, distinct from NULL: for an UPDATE, a column
    // absent from both `columns` and `nulls` was a 'u' cell — its current
    // value must be preserved by applyChanges, not overwritten with NULL
    // (the reference omits such columns from the record for the same
    // reason, PgWalMessageDecoder.java:206-207).
    val names = array(meta.columns.map(c => lit(c.name)): _*)
    val unchanged = when(col("op") === "U",
      filter(names, n => !map_contains_key(col("columns"), n) && !array_contains(col("nulls"), n)))
      .otherwise(array().cast("array<string>")).as(UnchangedCol)
    // seq rides along when the envelope carries it (decoder-produced
    // streams do; hand-built change sets may not) so applyChanges can
    // order equal-LSN frames.
    val metaCols =
      if (envelope.columns.contains("seq"))
        Seq(col("op"), col("lsn"), col("seq"), col("txid"))
      else Seq(col("op"), col("lsn"), col("txid"))
    envelope
      .filter(col("schema") === meta.schema && col("table") === meta.table)
      .select(metaCols ++ (unchanged +: dataCols): _*)
  }

  /** Name of the typed-view metadata column listing UPDATE columns that
    * were UNCHANGED/TOAST in the WAL record (present in the view as NULL,
    * but to be preserved — not nulled — on merge). */
  val UnchangedCol = "__unchanged"

  /** MERGE-style apply-changes: materialize I/U/D/T into a current-state
    * table keyed by `keys` (the library op the reference leaves to
    * consumers, SURVEY.md §4.3). Semantics:
    *  - a TRUNCATE marker (op 'T', VERDICT r7 #4) wipes the table: every
    *    pre-existing `current` row is dropped and only changes with lsn
    *    STRICTLY AFTER the latest truncate survive to be applied — so a
    *    truncated table serves zero rows and post-truncate inserts
    *    repopulate it. The truncate watermark is a one-row broadcast
    *    aggregate over the (batch-sized) change set — no extra pass over
    *    `current`;
    *  - per key, only the HIGHEST-lsn change wins (whole-batch dedup makes
    *    redelivered/overflow-flushed records idempotent — the reference's
    *    at-least-once duplicate-tolerance, SURVEY.md §7.3.1);
    *  - final op D deletes, I/U upserts;
    *  - an UPDATE column flagged UNCHANGED/TOAST (the typed view's
    *    `__unchanged` list) keeps the current-state value — mirroring the
    *    reference's omit-unchanged-columns contract so TOASTed values are
    *    never nulled out by a merge.
    * One shuffle on the key for the window + one key-partitioned full-outer
    * join against current: at scale, `current` should be bucketed/
    * partitioned by the same keys so the join co-locates. */
  /** An empty current-state table with `meta`'s typed schema — the
    * bootstrap input for [[applyChanges]] on a previously-unseen
    * relation. */
  def emptyFor(spark: org.apache.spark.sql.SparkSession, meta: RelationMeta): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(meta.columns.map(c =>
        StructField(c.name, sparkTypeFor(c.typeOid, c.typeMod)))))

  /** Materialize EVERY relation of a decoded envelope in one call: per
    * relation, [[typedView]] + [[applyChanges]] keyed by its
    * replica-identity columns (RELATION column flag bit 1 — what the
    * publisher actually keys U/D tuples by), falling back to the first
    * column for replica identity DEFAULT on keyless tables. `current`
    * supplies existing state per (schema, table) — the full relation
    * identity, so same-named tables in different schemas never collide
    * (absent tables start empty). Returns (schema, table) ->
    * materialized state. The reference leaves this whole layer to
    * consumers (`CdcConsumer.java:6-12`). */
  def applyAll(envelope: DataFrame, metas: Seq[RelationMeta],
               current: Map[(String, String), DataFrame] = Map.empty): Map[(String, String), DataFrame] =
    metas.map { m =>
      val identity = m.columns.filter(c => (c.flags & 1) != 0).map(_.name)
      val keys = if (identity.nonEmpty) identity else Seq(m.columns.head.name)
      val cur = current.getOrElse((m.schema, m.table), emptyFor(envelope.sparkSession, m))
      (m.schema, m.table) -> applyChanges(cur, typedView(envelope, m), keys)
    }.toMap

  def applyChanges(current: DataFrame, typedChanges: DataFrame, keys: Seq[String]): DataFrame = {
    // (lsn, seq) totally orders the batch: LSNs repeat across consecutive
    // pgoutput frames, and a strictly-lsn truncate watermark would drop a
    // post-truncate insert sharing the truncate frame's WAL position.
    // Hand-built change sets without a seq column order by lsn alone.
    val seqC = if (typedChanges.columns.contains("seq")) col("seq") else lit(0L)
    val pos = struct(col("lsn"), seqC) // structs compare lexicographically
    // truncate watermark: null when the batch carries no 'T' marker —
    // then both filters below are pass-throughs
    val tmax = typedChanges.agg(max(when(col("op") === "T", pos)).as("__tmax"))
    val cur0 = current.crossJoin(broadcast(tmax))
      .filter(col("__tmax").isNull).drop("__tmax")
    val changes = typedChanges.crossJoin(broadcast(tmax))
      .filter(col("op") =!= "T" && (col("__tmax").isNull || pos > col("__tmax")))
      .drop("__tmax")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("lsn").desc, seqC.desc, col("op").desc) // same-lsn tiebreak: D < I < U deterministic
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val hasUnchanged = latest.columns.contains(UnchangedCol)
    val dataCols = current.columns.toSeq
    val nonKey = dataCols.filterNot(keys.contains)
    val cur = cur0.select(
      keys.map(col) ++ nonKey.map(c => col(c).as(s"__cur_$c")) :+ lit(true).as("__in_cur"): _*)
    val joined = cur.join(latest, keys, "full_outer")
      .filter(col("op").isNull || col("op") =!= "D") // untouched current rows pass through; final D drops
    val outCols = dataCols.map { c =>
      if (keys.contains(c)) col(c) // USING-join key columns are side-coalesced
      else {
        val newV =
          if (hasUnchanged)
            when(array_contains(col(UnchangedCol), c) && col("__in_cur"), col(s"__cur_$c"))
              .otherwise(col(c))
          else col(c)
        when(col("op").isNull, col(s"__cur_$c")).otherwise(newV).as(c)
      }
    }
    joined.select(outCols: _*)
  }
}
