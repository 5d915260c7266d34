package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension (SCD2) history from a CDC change
  * stream — the canonical downstream materialization of the change
  * envelopes the sources layer decodes (the reference stops at the
  * consumer callback, `CdcEngine.java:114-126`; every warehouse
  * consumer's first move is exactly this validity-interval build).
  * Kimball's type-2 rule: every INSERT/UPDATE opens a version valid
  * from its change time, closed by the NEXT change to the same key;
  * a DELETE closes the open version without opening one. The row
  * whose interval is open (`valid_to_us` null) is `is_current`.
  *
  * Scale shape: ONE key-partitioned window (lead over the per-key
  * change sequence) — the only shuffle, keyed on the dimension key,
  * groups bounded by a key's change count (per-key history, never
  * corpus-sized). Validity bounds emit as epoch MICROSECONDS
  * (BIGINT): exact integer comparisons in any engine, no
  * timestamp-flavor or timezone hazards (the q38 convention).
  */
object ChangeHistory {

  /** Build the SCD2 history. `seq` breaks ties inside one timestamp
    * (the CDC (lsn, seq) discipline: change order must be total per
    * key). `op` is 'I'/'U'/'D' — I and U both open versions (an
    * upsert stream needs no distinction), D only closes. Value
    * columns pass through untouched. */
  def scd2(changes: DataFrame, key: Column, tsMicros: Column, seq: Column,
           op: Column, values: Seq[(String, Column)]): DataFrame = {
    val base = changes.select(
      Seq(key.as("key"), tsMicros.as("valid_from_us"), seq.as("change_id"),
        op.as("__op")) ++ values.map { case (n, c) => c.as(n) }: _*)
    val w = Window.partitionBy(col("key"))
      .orderBy(col("valid_from_us"), col("change_id"))
    base
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .filter(col("__op") =!= "D")
      .withColumn("is_current", col("valid_to_us").isNull)
      .drop("__op")
  }

  /** Point-in-time dimension snapshot from an SCD2 history — "the
    * table as of T", the warehouse time-travel read every type-2
    * consumer runs: rows whose validity interval covers `tsMicros`
    * (half-open [valid_from, valid_to): a version is visible AT its
    * change time and invisible at the instant it is superseded — the
    * Kimball convention [[scd2]]'s lead() bounds encode). A pure
    * row-local filter: no shuffle, and with the history stored sorted
    * or partitioned on the validity bounds it prunes to the covering
    * files at any size. */
  def snapshotAsOf(history: DataFrame, tsMicros: Long): DataFrame =
    history.filter(col("valid_from_us") <= tsMicros &&
      (col("valid_to_us").isNull || col("valid_to_us") > tsMicros))

  /** Incremental SCD2 merge — apply a NEW batch of CDC changes to an
    * EXISTING history (the daily/micro-batch warehouse pattern: a full
    * rebuild re-reads the whole change log; the merge touches only the
    * increment plus one pass over the history). Produces EXACTLY what
    * [[scd2]] over the concatenated change stream would (the q120
    * oracle compares the merge against DuckDB's full rebuild
    * row-for-row), provided the CDC ordering contract holds: every
    * batch change is strictly later than every change already folded
    * into `current` (the (lsn, seq) discipline delivers batches in
    * order; a time-split replay satisfies it by construction).
    *
    * Mechanics: keys untouched by the batch pass through; a touched
    * key's OPEN version closes at the batch's first change time for
    * that key (whatever the op — a DELETE closes it too); the batch's
    * own changes chain among themselves by the [[scd2]] rule.
    *
    * Scale shape: [[scd2]] on the batch is batch-sized; the history
    * pays ONE left join against the batch's first-change-per-key
    * table (batch-key-sized — broadcast under `broadcastKeyBound`, so
    * the history does not shuffle at all in the normal case; exact
    * shuffle-hash above it) and a row-local close projection. Closed
    * historical versions are never rewritten, only streamed through. */
  def scd2Merge(current: DataFrame, batch: DataFrame, key: Column,
                tsMicros: Column, seq: Column, op: Column,
                values: Seq[(String, Column)],
                broadcastKeyBound: Long = 10000000L): DataFrame = {
    val inc = scd2(batch, key, tsMicros, seq, op, values)
    val firstChange = batch
      .select(key.as("key"), tsMicros.cast("long").as("__ts"))
      .groupBy("key").agg(min(col("__ts")).as("__close_us"))
    val side =
      if (SizeDispatch.atMost(firstChange, broadcastKeyBound)) broadcast(firstChange)
      else firstChange.hint("shuffle_hash")
    val closed = current.join(side, Seq("key"), "left")
      .withColumn("valid_to_us",
        when(col("is_current") && col("__close_us").isNotNull, col("__close_us"))
          .otherwise(col("valid_to_us")))
      .withColumn("is_current", col("is_current") && col("__close_us").isNull)
      .drop("__close_us")
    closed.unionByName(inc)
  }

  /** Incremental aggregate-view maintenance from a CDC change batch —
    * classic IVM (Gupta & Mumick 1995, "Maintenance of Materialized
    * Views: Problems, Techniques, and Applications") for the
    * self-maintainable distributive aggregates (COUNT/SUM, AVG by
    * quotient): a GROUP BY view over the replicated table stays
    * current by applying the batch's NET per-key effect — retract the
    * pre-batch row's contribution, add the post-batch row's — without
    * EVER rescanning the base table or recomputing untouched groups.
    * At 100 TB of base data with a trickle of changes, this is the
    * difference between a per-batch full aggregation and work
    * proportional to the batch.
    *
    * Inputs are the engine's own shapes: `typedChanges` is an
    * [[graft.cdc.Envelope.typedView]] batch (op/lsn/seq + typed data
    * columns + the `__unchanged` TOAST list), `base` is the
    * current-state table BEFORE this batch (the
    * [[graft.cdc.Envelope.applyChanges]] output the A13 sink already
    * maintains — callers apply both verbs to the same batch). The
    * view carries, per group: `n_rows` (COUNT(*)), `n_val`
    * (COUNT(valueCol)) and `sum_val` (SUM with NULL as 0 —
    * retractable; SQL's all-NULL-sum-is-NULL projects back as
    * `CASE WHEN n_val > 0 THEN sum_val END`, and AVG as
    * sum_val / n_val).
    *
    * Semantics mirror [[graft.cdc.Envelope.applyChanges]] exactly —
    * the maintained view EQUALS the aggregate over the applyChanges
    * output (the q143 oracle and ChangeHistorySpec assert this
    * row-for-row): (lsn, seq)-latest change per key wins inside the
    * batch, a TRUNCATE marker resets view and retractions and only
    * strictly-later changes contribute, an UPDATE whose value/group
    * column is UNCHANGED/TOAST resolves it from the pre-batch row, a
    * group-key-changing UPDATE moves the row's mass between groups
    * (retract old group, add new), and groups retracted to zero rows
    * vanish.
    *
    * Scale shape: one key-window over the BATCH (batch-sized shuffle);
    * the base pays ONE inner join against the batch's touched keys
    * (broadcast under `broadcastKeyBound`, so the base never shuffles
    * in the normal case); contributions explode row-locally, aggregate
    * at delta size, and merge into the view with one null-safe
    * group-key join (view is group-cardinality — small by
    * construction). */
  def maintainAggView(view: Option[DataFrame], base: DataFrame,
                      typedChanges: DataFrame, rowKeys: Seq[String],
                      groupKeys: Seq[String], valueCol: String,
                      broadcastKeyBound: Long = 10000000L): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = typedChanges.sparkSession
    val sumType: DataType = base.schema(valueCol).dataType match {
      case d: DecimalType => DecimalType(38, d.scale)
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => LongType
      case _ => DoubleType
    }
    // ---- the applyChanges ordering/truncate discipline, verbatim
    val seqC = if (typedChanges.columns.contains("seq")) col("seq") else lit(0L)
    val pos = struct(col("lsn"), seqC)
    val tmax = typedChanges.agg(max(when(col("op") === "T", pos)).as("__tmax"))
    val basePruned = base.crossJoin(broadcast(tmax))
      .filter(col("__tmax").isNull).drop("__tmax")
    val changes = typedChanges.crossJoin(broadcast(tmax))
      .filter(col("op") =!= "T" && (col("__tmax").isNull || pos > col("__tmax")))
      .drop("__tmax")
    val w = Window.partitionBy(rowKeys.map(col): _*)
      .orderBy(col("lsn").desc, seqC.desc, col("op").desc)
    val hasUnchanged = typedChanges.columns.contains(graft.cdc.Envelope.UnchangedCol)
    val needed = rowKeys ++ (groupKeys :+ valueCol).filterNot(rowKeys.contains)
    val latest = changes
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select((Seq(col("op")) ++ needed.map(col) ++
        (if (hasUnchanged) Seq(col(graft.cdc.Envelope.UnchangedCol)) else Nil)): _*)
    // ---- pre-batch rows of the touched keys: the base never shuffles —
    // the touched-key list is batch-sized and broadcasts
    val touched = latest.select(rowKeys.map(col): _*)
    val touchedSide =
      if (SizeDispatch.atMost(touched, broadcastKeyBound)) broadcast(touched)
      else touched.hint("shuffle_hash")
    val oldRows = basePruned.join(touchedSide, rowKeys)
      .select(rowKeys.map(col) ++
        groupKeys.map(g => col(g).as(s"__old_$g")) :+
        col(valueCol).as("__old_v") :+ lit(true).as("__in_base"): _*)
    val joined = latest.join(oldRows, rowKeys, "left")
    // ---- contributions: retract the old row, add the final row — ONE
    // row-local explode, no second pass over the join
    def resolved(c: String, oldC: Column): Column =
      if (!hasUnchanged) col(c)
      else when(array_contains(col(graft.cdc.Envelope.UnchangedCol), c) &&
        col("__in_base").isNotNull, oldC).otherwise(col(c))
    val contribType = // shared struct shape so array() unifies; the
      // sign rides BOTH the row count and the value mass
      (sign: Int, g: Seq[Column], v: Column) =>
        struct((g.zip(groupKeys).map { case (c, n) => c.as(s"__g_$n") } :+
          lit(sign.toLong).as("__dn") :+
          (v.cast(sumType) * lit(sign)).cast(sumType).as("__dv")): _*)
    val retract = when(col("__in_base").isNotNull,
      contribType(-1, groupKeys.map(g => col(s"__old_$g")), col("__old_v")))
    val insert = when(col("op") =!= "D",
      contribType(1, groupKeys.map(g => resolved(g, col(s"__old_$g"))),
        resolved(valueCol, col("__old_v"))))
    val contrib = joined
      .select(explode(array(retract, insert)).as("__c"))
      .filter(col("__c").isNotNull)
      .select(col("__c.*"))
    val deltaView = contrib
      .groupBy(groupKeys.map(n => col(s"__g_$n").as(n)): _*)
      .agg(sum(col("__dn")).as("__ddn"),
        sum(when(col("__dv").isNotNull, col("__dn")).otherwise(0L)).as("__ddnv"),
        sum(coalesce(col("__dv"), lit(0).cast(sumType))).as("__ddv"))
    // ---- merge into the existing view (null-safe group-key join: a
    // NULL group key is a group like any other)
    val prior = view match {
      case Some(v) => v.crossJoin(broadcast(tmax)).filter(col("__tmax").isNull)
        .drop("__tmax")
      case None => spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(groupKeys.map(g => base.schema(g).copy(name = g)) ++
          Seq(StructField("n_rows", LongType), StructField("n_val", LongType),
            StructField("sum_val", sumType))))
    }
    val l = prior.alias("v"); val r2 = deltaView.alias("d")
    val cond = groupKeys.map(g => col(s"v.$g") <=> col(s"d.$g")).reduce(_ && _)
    l.join(r2, cond, "full_outer")
      .select(groupKeys.map(g => coalesce(col(s"v.$g"), col(s"d.$g")).as(g)) ++ Seq(
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__ddn"), lit(0L))).as("n_rows"),
        (coalesce(col("n_val"), lit(0L)) + coalesce(col("__ddnv"), lit(0L))).as("n_val"),
        (coalesce(col("sum_val"), lit(0).cast(sumType)) +
          coalesce(col("__ddv"), lit(0).cast(sumType))).cast(sumType).as("sum_val")): _*)
      .filter(col("n_rows") > 0)
  }

  /** Incremental MIN/MAX view — the published completion of the IVM
    * family (Gupta, Mumick & Subrahmanian 1993, "Maintaining Views
    * Incrementally": MIN/MAX are NOT self-maintainable under deletes —
    * retracting the current extremum needs the base — so the
    * maintenance rule is RECOMPUTE ONLY THE AFFECTED GROUPS): groups
    * untouched by the batch keep their rows verbatim (never read,
    * never recomputed); groups the batch touches — a touched key's OLD
    * group or its NEW one — recompute from the post-batch base through
    * one semi join on the batch-sized affected-group list (broadcast
    * under `broadcastKeyBound`; with the base partitioned/bucketed by
    * the group key this prunes to the affected partitions at any
    * scale). `newBase` is the [[graft.cdc.Envelope.applyChanges]]
    * output for the SAME batch — the q143 caller pairing. The view
    * carries per group: n_rows, min_val, max_val (SQL semantics: NULLs
    * ignored, all-NULL group → NULL extrema); groups whose last row
    * disappears vanish with the recompute.
    *
    * The uniform recompute-affected rule is deliberate: an
    * insert-only-group fast path (extrema are monotone under inserts)
    * saves nothing at the group sizes that matter and forks the
    * semantics; the affected-group set is batch-bounded either way.
    *
    * `base` is the PRE-batch state and `newBase` the applyChanges
    * output for the same batch — the pair every q143-style caller
    * already holds. Both are needed for correctness, not convenience:
    * a DELETE under replica identity DEFAULT carries only key columns
    * (its typedView group column is null), and a group-moving UPDATE
    * carries only the NEW group — the DEPARTED group is recoverable
    * only from the pre-batch rows of the touched keys. Recomputing a
    * group that did not actually change is value-idempotent, so the
    * affected set only has to be a superset. */
  def maintainMinMaxView(view: Option[DataFrame], base: DataFrame,
                         newBase: DataFrame, typedChanges: DataFrame,
                         rowKeys: Seq[String], groupKeys: Seq[String],
                         valueCol: String,
                         broadcastKeyBound: Long = 10000000L): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = typedChanges.sparkSession
    val vType = newBase.schema(valueCol).dataType
    // the applyChanges ordering/truncate discipline: past a TRUNCATE
    // every pre-existing group is affected (the view resets); the
    // truncate-or-not split rides the same broadcast watermark
    val seqC = if (typedChanges.columns.contains("seq")) col("seq") else lit(0L)
    val pos = struct(col("lsn"), seqC)
    val tmax = typedChanges.agg(max(when(col("op") === "T", pos)).as("__tmax"))
    val priorRaw = view.getOrElse(spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(groupKeys.map(g => newBase.schema(g).copy(name = g)) ++
        Seq(StructField("n_rows", LongType),
          StructField("min_val", vType), StructField("max_val", vType)))))
    val prior = priorRaw.crossJoin(broadcast(tmax))
      .filter(col("__tmax").isNull).drop("__tmax")
    val basePruned = base.crossJoin(broadcast(tmax))
      .filter(col("__tmax").isNull).drop("__tmax")
    val changes = typedChanges.crossJoin(broadcast(tmax))
      .filter(col("op") =!= "T" && (col("__tmax").isNull || pos > col("__tmax")))
      .drop("__tmax")
    // affected ⊇ batch-carried NEW groups ∪ pre-batch groups of the
    // touched keys (the departed side); TOAST-unchanged group columns
    // contribute a harmless extra NULL-group recompute
    val touchedKeys = changes.select(rowKeys.map(col): _*).distinct()
    val batchGroups = changes.select(groupKeys.map(col): _*)
    val keySide =
      if (SizeDispatch.atMost(touchedKeys, broadcastKeyBound)) broadcast(touchedKeys)
      else touchedKeys.hint("shuffle_hash")
    val oldGroups = basePruned.join(keySide, rowKeys)
      .select(groupKeys.map(col): _*)
    val affected = batchGroups.unionByName(oldGroups).distinct()
    val affSide =
      if (SizeDispatch.atMost(affected, broadcastKeyBound)) broadcast(affected)
      else affected.hint("shuffle_hash")
    // recompute ONLY the affected groups from the post-batch base
    val joinCond = (b: String) => groupKeys.map(g =>
      col(s"$b.$g") <=> col(s"a.$g")).reduce(_ && _)
    val recomputed = newBase.alias("b")
      .join(affSide.alias("a"), joinCond("b"), "left_semi")
      .groupBy(groupKeys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("min_val"), max(col(valueCol)).as("max_val"))
    // untouched view rows pass through; affected rows are replaced
    val kept = prior.alias("v")
      .join(affSide.alias("a"), joinCond("v"), "left_anti")
    kept.unionByName(recomputed)
  }

  /** Incremental TOP-K view — the ranked generalization of
    * [[maintainMinMaxView]] (k = 1 of it is the max), maintained by the
    * same affected-group-recompute rule: a top-k is not
    * self-maintainable under deletes (evicting a top row needs the
    * base's next-best), so groups the batch touches recompute their
    * top-k from the post-batch base through one broadcast semi join;
    * untouched groups pass through an anti join verbatim. The view
    * carries (groupKeys..., rank 1..k, rowKeys..., orderCol) with rank
    * by orderCol DESC, ties to the low row key — deterministic, and
    * exactly mirrorable as a ROW_NUMBER window (the q149 oracle).
    * `base`/`newBase` are the pre/post applyChanges pair, for the same
    * reason as min/max: the DEPARTED group of a key-only delete or a
    * group-moving update is only in the pre-batch rows. */
  def maintainTopKView(view: Option[DataFrame], base: DataFrame,
                       newBase: DataFrame, typedChanges: DataFrame,
                       rowKeys: Seq[String], groupKeys: Seq[String],
                       orderCol: String, k: Int,
                       broadcastKeyBound: Long = 10000000L): DataFrame = {
    import org.apache.spark.sql.types._
    require(k > 0, s"maintainTopKView: k=$k")
    val spark = typedChanges.sparkSession
    val seqC = if (typedChanges.columns.contains("seq")) col("seq") else lit(0L)
    val pos = struct(col("lsn"), seqC)
    val tmax = typedChanges.agg(max(when(col("op") === "T", pos)).as("__tmax"))
    val priorRaw = view.getOrElse(spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(groupKeys.map(g => newBase.schema(g).copy(name = g)) ++
        Seq(StructField("rank", IntegerType)) ++
        rowKeys.map(rk => newBase.schema(rk).copy(name = rk)) :+
        newBase.schema(orderCol).copy(name = orderCol))))
    val prior = priorRaw.crossJoin(broadcast(tmax))
      .filter(col("__tmax").isNull).drop("__tmax")
    val basePruned = base.crossJoin(broadcast(tmax))
      .filter(col("__tmax").isNull).drop("__tmax")
    val changes = typedChanges.crossJoin(broadcast(tmax))
      .filter(col("op") =!= "T" && (col("__tmax").isNull || pos > col("__tmax")))
      .drop("__tmax")
    val touchedKeys = changes.select(rowKeys.map(col): _*).distinct()
    val keySide =
      if (SizeDispatch.atMost(touchedKeys, broadcastKeyBound)) broadcast(touchedKeys)
      else touchedKeys.hint("shuffle_hash")
    val affected = changes.select(groupKeys.map(col): _*)
      .unionByName(basePruned.join(keySide, rowKeys).select(groupKeys.map(col): _*))
      .distinct()
    val affSide =
      if (SizeDispatch.atMost(affected, broadcastKeyBound)) broadcast(affected)
      else affected.hint("shuffle_hash")
    val joinCond = (b: String) => groupKeys.map(g =>
      col(s"$b.$g") <=> col(s"a.$g")).reduce(_ && _)
    val w = Window.partitionBy(groupKeys.map(col): _*)
      .orderBy(col(orderCol).desc +: rowKeys.map(col(_).asc): _*)
    val recomputed = newBase.alias("b")
      .join(affSide.alias("a"), joinCond("b"), "left_semi")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(groupKeys.map(col) ++ (col("rank") +: rowKeys.map(col)) :+
        col(orderCol): _*)
    val kept = prior.alias("v")
      .join(affSide.alias("a"), joinCond("v"), "left_anti")
    kept.unionByName(recomputed)
  }

  /** One side of a [[maintainJoinView]] maintenance step: the
    * pre-batch state, the applyChanges output for the same batch, the
    * typedView batch itself, and the side's row keys. An untouched
    * side passes its state twice with an empty batch. */
  final case class IvmSide(base: DataFrame, newBase: DataFrame,
                           typedChanges: DataFrame, rowKeys: Seq[String])

  /** Incremental JOIN-view maintenance — the delta-join member of the
    * IVM family (Blakeley, Larson & Tompa 1986, "Efficiently Updating
    * Materialized Views"): a denormalized inner-join view V = L ⋈ R
    * stays current under CDC batches on EITHER side without ever
    * re-joining the untouched keys. The same affected-superset rule as
    * [[maintainMinMaxView]], lifted to join keys: a join key is
    * affected if a batch row carries it (the arriving side) or a
    * touched row held it pre-batch (the departing side — a
    * replica-identity-DEFAULT DELETE and a key-moving UPDATE carry
    * nothing else); recomputing an unchanged key is value-idempotent,
    * so the superset is safe. Untouched view rows pass through an anti
    * join verbatim; affected keys re-join from the two POST-batch
    * states, each restricted by one broadcast semi join (bases
    * bucketed on the join key prune to the affected partitions at any
    * scale). A TRUNCATE on either side empties the pass-through and
    * recomputes from that side's full new key set — all distributed,
    * riding the same broadcast watermark as applyChanges.
    *
    * Non-join column names must be disjoint across the sides (the
    * natural-join shape — TPC-H-style prefixed schemas satisfy it by
    * construction). The maintained view EQUALS `newL ⋈ newR` after
    * every batch — the q146 oracle and JoinViewSpec assert it. */
  def maintainJoinView(view: Option[DataFrame], left: IvmSide, right: IvmSide,
                       joinKeys: Seq[String],
                       broadcastKeyBound: Long = 10000000L): DataFrame = {
    // the truncate probe is a DRIVER-side one-row aggregate per side —
    // the SizeDispatch cost class this verb already pays; folding it
    // into the plan instead would lazily full-scan newBase every batch
    // just in case a truncate happened. Only the BOOLEAN crosses to the
    // driver (the truncated/untouched split is control flow); the
    // watermark VALUE stays columnar via the same broadcast crossJoin
    // as the sibling verbs, so lsn/seq types never round-trip through
    // Row accessors (ADVICE r15: getLong threw on non-Long lsn).
    def sidePieces(s: IvmSide): (DataFrame, Boolean) = {
      val seqC = if (s.typedChanges.columns.contains("seq")) col("seq") else lit(0L)
      val pos = struct(col("lsn"), seqC)
      val tmax = s.typedChanges.agg(max(when(col("op") === "T", pos)).as("__tmax"))
      val truncated = !tmax.head().isNullAt(0)
      val changes = s.typedChanges.crossJoin(broadcast(tmax))
        .filter(col("op") =!= "T" && (col("__tmax").isNull || pos > col("__tmax")))
        .drop("__tmax")
      val affected =
        if (truncated)
          // every pre-existing join row dies; every key of the side's
          // new state recomputes
          s.newBase.select(joinKeys.map(col): _*)
        else {
          val touched = changes.select(s.rowKeys.map(col): _*).distinct()
          val keySide =
            if (SizeDispatch.atMost(touched, broadcastKeyBound)) broadcast(touched)
            else touched.hint("shuffle_hash")
          val oldKeys = s.base.join(keySide, s.rowKeys)
            .select(joinKeys.map(col): _*)
          changes.select(joinKeys.map(col): _*).unionByName(oldKeys)
        }
      (affected, truncated)
    }
    val (affL, truncL) = sidePieces(left)
    val (affR, truncR) = sidePieces(right)
    val affected = affL.unionByName(affR).distinct()
    val affSide =
      if (SizeDispatch.atMost(affected, broadcastKeyBound)) broadcast(affected)
      else affected.hint("shuffle_hash")
    def restrict(df: DataFrame): DataFrame = {
      val cond = joinKeys.map(k => df(k) <=> affSide(k)).reduce(_ && _)
      df.join(affSide, cond, "left_semi")
    }
    val recomputed = restrict(left.newBase).join(restrict(right.newBase), joinKeys)
    val prior = view.getOrElse(recomputed.limit(0))
    // untouched rows pass through — unless a TRUNCATE on either side
    // invalidated every pre-existing join row
    val kept =
      if (truncL || truncR) prior.limit(0)
      else {
        val keptCond = joinKeys.map(k => prior(k) <=> affSide(k)).reduce(_ && _)
        prior.join(affSide, keptCond, "left_anti")
      }
    kept.unionByName(recomputed)
  }

  /** Incremental DISTINCT-COUNT view via persisted mergeable HLL
    * sketches — the Druid/Pinot sketch-rollup pattern: per group the
    * view stores a DataSketches HLL sketch (BINARY, fixed size) plus
    * its estimate, and each change batch folds in with ONE sketch
    * aggregation and a group-sized union merge. At 100 TB this is what
    * makes "unique users per source, ever" a dashboard read instead of
    * a corpus scan: sketch union yields a valid
    * sketch of the union with the SAME error bounds — though not
    * bit-identical to direct building (the union path targets a
    * different internal HLL representation, so estimates can differ
    * within the rsd at dense cardinalities; the q144 contract bounds
    * chained-vs-one-shot at 2%).
    *
    * Semantics are DISTINCT-EVER (the set-union view): I/U/R rows
    * contribute their (group, value); DELETE and TRUNCATE do not
    * retract — an HLL can only grow, and "uniques ever seen" is the
    * metric these rollups track (a retractable distinct needs the q12
    * exact path or a recompute; that asymmetry is fundamental, not an
    * implementation gap). NULL values contribute nothing; a NULL group
    * key is a group like any other. Unlike [[maintainAggView]] this
    * view is SELF-maintainable — no base table read at all. */
  /** Incremental QUANTILE view via persisted mergeable GK sketches —
    * the q144 pattern with [[QuantileSketch]] as the per-group state
    * (r16; VERDICT r15 next #5): "p95 latency per source, maintained"
    * becomes a dashboard read. Per group the view stores the serialized
    * sketch plus `n_val` and one estimate column per requested
    * quantile; each change batch folds in with ONE sketch aggregation
    * at delta size and a group-sized pairwise merge.
    *
    * Semantics are INSERT-MONOTONE like the HLL view: I/U/R rows
    * contribute their (group, value); DELETE and TRUNCATE do not
    * retract — a GK summary only grows, and the retractable alternative
    * is the exact q39 path or a recompute (the same fundamental
    * asymmetry [[maintainDistinctView]] documents). NULL values
    * contribute nothing; a NULL group key is a group like any other.
    * Self-maintainable — no base table read. Estimates carry the GK
    * bound: true rank within ε·n (the q152 contract measures it). */
  def maintainQuantileView(view: Option[DataFrame], typedChanges: DataFrame,
                           groupKeys: Seq[String], valueCol: String,
                           quantiles: Seq[(Double, String)],
                           relativeError: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    require(quantiles.nonEmpty, "maintainQuantileView: no quantiles requested")
    val spark = typedChanges.sparkSession
    val delta = typedChanges
      .filter(col("op").isin("I", "U", "R") && col(valueCol).isNotNull)
      .groupBy(groupKeys.map(col): _*)
      .agg(QuantileSketch.sketchAgg(col(valueCol).cast("double"), relativeError)
        .as("__qs"))
    val prior = view.getOrElse(spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(groupKeys.map(g => typedChanges.schema(g).copy(name = g)) ++
        (StructField("sketch", BinaryType) +: StructField("n_val", LongType) +:
          quantiles.map { case (_, n) => StructField(n, DoubleType) }))))
    val l = prior.alias("v"); val r = delta.alias("d")
    val cond = groupKeys.map(g => col(s"v.$g") <=> col(s"d.$g")).reduce(_ && _)
    val merged = QuantileSketch.mergeSketches(col("sketch"), col("__qs"))
    l.join(r, cond, "full_outer")
      .select(groupKeys.map(g => coalesce(col(s"v.$g"), col(s"d.$g")).as(g)) ++
        (merged.as("sketch") +: QuantileSketch.countOf(merged).as("n_val") +:
          quantiles.map { case (q, n) =>
            QuantileSketch.quantileOf(q)(merged).as(n)
          }): _*)
  }

  def maintainDistinctView(view: Option[DataFrame], typedChanges: DataFrame,
                           groupKeys: Seq[String], valueCol: String,
                           lgConfigK: Int = 12): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = typedChanges.sparkSession
    val delta = typedChanges
      .filter(col("op").isin("I", "U", "R") && col(valueCol).isNotNull)
      .groupBy(groupKeys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("__ds"))
      .filter(col("__ds").isNotNull)
    val prior = view.getOrElse(spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(groupKeys.map(g => typedChanges.schema(g).copy(name = g)) ++
        Seq(StructField("sketch", BinaryType), StructField("uniques", LongType)))))
    val l = prior.alias("v"); val r = delta.alias("d")
    val cond = groupKeys.map(g => col(s"v.$g") <=> col(s"d.$g")).reduce(_ && _)
    // allowDifferentLgConfigK: a view resumed with a different lgConfigK
    // than its persisted sketches unions at the SMALLER lgK (slightly
    // higher rsd on those groups) instead of throwing mid-batch deep
    // inside the union (ADVICE r15) — the mergeable-sketch downgrade
    // rule every DataSketches deployment relies on
    val merged = when(col("sketch").isNotNull && col("__ds").isNotNull,
        hll_union(col("sketch"), col("__ds"), allowDifferentLgConfigK = true))
      .otherwise(coalesce(col("sketch"), col("__ds")))
    l.join(r, cond, "full_outer")
      .select(groupKeys.map(g => coalesce(col(s"v.$g"), col(s"d.$g")).as(g)) ++ Seq(
        merged.as("sketch"),
        hll_sketch_estimate(merged).as("uniques")): _*)
  }
}
