package graft.cdc

import java.nio.file.Files
import java.util.UUID

import graft.SparkSpec
import graft.sources.ReplayDecode
import graft.wal.{FrameFile, PgOutput, PgOutputEncoder}

/** Property-style round-trip over the reference's full type surface
  * (ports the `Field` generator table, `IntegrationTest.java:61-115` /
  * FIXTURES.md §1): typed value -> PG text literal -> pgoutput frame ->
  * decode -> typed view -> value equality; plus a NULL row per column
  * (isNull semantics; boolean NULL -> false per `TableColumn.java:31-33`). */
class TypedRoundTripSpec extends SparkSpec {

  import PgOutput._

  private val rel = RelationMeta(7, "public", "test", Vector(
    RelationColumn("id", 20, -1, 0), // bigserial
    RelationColumn("string", 1043, -1, 0), // character varying
    RelationColumn("int", 23, -1, 0), // int
    RelationColumn("bigint", 20, -1, 0), // bigint
    RelationColumn("bool", 16, -1, 0), // boolean
    RelationColumn("int_array", 1007, -1, 0), // int[]
    RelationColumn("long_array", 1016, -1, 0), // bigint[]
    RelationColumn("double_array", 1231, -1, 0), // numeric[]
    RelationColumn("string_array", 1009, -1, 0), // text[]
    RelationColumn("bigdecimal", 1700, ((12 << 16) | 12) + 4, 0))) // numeric(12,12)

  private case class Sample(
      id: Long, s: String, i: Int, l: Long, b: Boolean,
      ia: List[Int], la: List[Long], da: List[Double], sa: List[String],
      bd: java.math.BigDecimal)

  private def gen(rnd: scala.util.Random, id: Long): Sample = Sample(
    id = id,
    s = UUID.randomUUID().toString.take(8) + rnd.nextInt(1000000),
    i = rnd.nextInt(1000000),
    l = rnd.nextInt(1000000).toLong,
    b = rnd.nextBoolean(),
    ia = List.fill(2)(rnd.nextInt(1000)),
    la = List.fill(2)(rnd.nextInt(1000000).toLong),
    da = List.fill(2)(math.round(rnd.nextDouble() * 1e6) / 1e4),
    sa = List.fill(2)("v" + rnd.nextInt(100000)),
    bd = new java.math.BigDecimal(rnd.nextDouble())
      .setScale(12, java.math.RoundingMode.HALF_UP))

  private def literal(v: Sample): Seq[Option[String]] = Seq(
    Some(v.id.toString), Some(v.s), Some(v.i.toString), Some(v.l.toString),
    Some(if (v.b) "t" else "f"),
    Some(v.ia.mkString("{", ",", "}")), Some(v.la.mkString("{", ",", "}")),
    Some(v.da.mkString("{", ",", "}")), Some(v.sa.mkString("{", ",", "}")),
    Some(v.bd.toPlainString))

  test("every supported type round-trips value and NULL through frame + typed view") {
    val rnd = new scala.util.Random(4242)
    val samples = (1L to 25L).map(gen(rnd, _))
    val nullRowId = 1000L
    val frames: Seq[Array[Byte]] =
      PgOutputEncoder.relation(rel) +: PgOutputEncoder.begin() +:
        (samples.map(s => PgOutputEncoder.insert(7, literal(s))) :+
          PgOutputEncoder.insert(7,
            Some(nullRowId.toString) +: Seq.fill(9)(None)) :+
          PgOutputEncoder.commit())
    val path = Files.createTempDirectory("rt").resolve("rt.frames").toString
    FrameFile.write(path, frames.zipWithIndex.map { case (f, i) => (i.toLong, f) })

    val typed = Envelope.typedView(ReplayDecode.batchDf(spark, path), rel)
    val rows = typed.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(rows.size === 26)

    samples.foreach { s =>
      val r = rows(s.id)
      assert(r.getAs[String]("string") === s.s)
      assert(r.getAs[Int]("int") === s.i)
      assert(r.getAs[Long]("bigint") === s.l)
      assert(r.getAs[Boolean]("bool") === s.b)
      assert(r.getAs[Seq[Int]]("int_array") === s.ia)
      assert(r.getAs[Seq[Long]]("long_array") === s.la)
      assert(r.getAs[Seq[Double]]("double_array") === s.da)
      assert(r.getAs[Seq[String]]("string_array") === s.sa)
      assert(r.getAs[java.math.BigDecimal]("bigdecimal").compareTo(s.bd) === 0)
    }
    val n = rows(nullRowId)
    assert(n.getAs[String]("string") === null)
    assert(n.isNullAt(n.fieldIndex("int")))
    assert(n.isNullAt(n.fieldIndex("bigint")))
    assert(n.getAs[Boolean]("bool") === false) // reference: NULL bool is false
    assert(n.getAs[Seq[Int]]("int_array") === null)
    assert(n.getAs[Seq[Long]]("long_array") === null)
    assert(n.getAs[Seq[Double]]("double_array") === null)
    assert(n.getAs[Seq[String]]("string_array") === null)
    assert(n.getAs[java.math.BigDecimal]("bigdecimal") === null)
  }

  test("bytea: hex and legacy escape formats both decode; malformed escape throws") {
    import spark.implicits._
    // the cell accessor needs `columns`/`nulls` shape — build via a tiny envelope
    def viaEnvelope(wire: String): Array[Byte] = {
      val env = Seq(("I", 1L, 1L, "public", "b", Map("data" -> wire),
        Seq.empty[String], Map.empty[String, String], 0L))
        .toDF("op", "lsn", "txid", "schema", "table", "columns", "nulls", "before", "seq")
      val meta = graft.wal.PgOutput.RelationMeta(1, "public", "b", Vector(
        graft.wal.PgOutput.RelationColumn("data", 17, -1, 0)))
      Envelope.typedView(env, meta).head().getAs[Array[Byte]]("data")
    }
    assert(viaEnvelope("\\x00ff10ab").toSeq ===
      Seq(0x00, 0xff, 0x10, 0xab).map(_.toByte))
    assert(viaEnvelope("\\000\\\\A\\377").toSeq ===
      Seq(0x00, 0x5c, 0x41, 0xff).map(_.toByte))
    assert(viaEnvelope("plain ascii").toSeq === "plain ascii".getBytes("US-ASCII").toSeq)
    // malformed escape (dangling backslash / bad octal) fails LOUDLY —
    // silently NULLing a cell would be data loss (VERDICT r8 missing #4)
    val ex = intercept[org.apache.spark.SparkException](viaEnvelope("ab\\9"))
    assert(ex.getMessage.contains("malformed bytea escape") ||
      Option(ex.getCause).exists(_.getMessage.contains("malformed bytea escape")))
  }
}
