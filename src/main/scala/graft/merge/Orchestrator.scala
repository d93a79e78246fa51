package graft.merge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Generic dependency-ordered multi-table merge — the reference's core
  * deliverable re-expressed as a declarative plan builder
  * (orchestrator.js:66-94: persons/users → locations → patients → … →
  * obs, each mover consuming the id maps of its parents).
  *
  * beehive hardcodes the ~31-table OpenMRS DAG in `prepare()` call
  * order and threads driver-side JS maps between movers. Here the DAG
  * is DATA — a `Seq[TableSpec]` (the reference's config surface,
  * preparation.js:134: match columns, exclusions, per-table modes) —
  * and the orchestrator topologically orders it and threads id maps as
  * DataFrames. Nothing is collected: each table's merge is one
  * declarative plan whose inputs are its parents' id-map plans, so
  * Catalyst sees the whole lineage; id-map join strategy is left to
  * Spark's size-based auto-broadcast (metadata maps broadcast,
  * person-scale maps shuffle — never a forced hint that would OOM the
  * driver on a fact-sized map).
  *
  * Scale notes (100 TB): per-table work is the m1/m2/m9 shape — one
  * range-sort for id assignment, semi/anti-joins for exclusion, map
  * joins for FK rewrite. The orchestrator adds NO driver state beyond
  * the spec list and NO extra shuffles: id maps are reused DataFrames,
  * broadcast when dimension-sized, shuffled when person-scale.
  */
object Orchestrator {

  /** How a table's rows merge into the destination
    * (reference utils.js:83 consolidateTableRecords vs utils.js:161
    * moveAllTableRecords). */
  sealed trait MergeMode
  object MergeMode {
    /** Metadata semantics: rows matching dest on the natural key are
      * deduped into the existing dest row; only unmatched rows are
      * inserted (with fresh ids). */
    case object Consolidate extends MergeMode
    /** Data semantics: every src row moves with a fresh id, EXCEPT
      * rows already present in dest (natural key / uuid match), which
      * map to their dest counterpart and are not re-inserted
      * (preparation.js "not moved if already in destination"). */
    case object Move extends MergeMode
    /** PK-is-FK semantics (reference patient.js:9
      * `preparePatientInsert`: `beehive.personMap.get(row['patient_id'])`
      * — the patient's primary key IS the person FK): the row's id is
      * REWRITTEN THROUGH THE PARENT's completed map, never allocated
      * from this table's own sequence. A row moves iff its parent row
      * moved (parent is_new=1); rows whose parent was already in the
      * destination are excluded, like the reference's patient loop over
      * only-moved persons. Identity is entirely the parent's —
      * naturalKey/uuidCol/mappedKeys play no part. */
    final case class SharedPk(parent: String) extends MergeMode
    /** No-own-id association semantics (reference gaac.js:100
      * `prepareGaacMemberInsert` — the INSERT carries no gaac_member_id
      * — and person-users.js:359 `INSERT IGNORE role_privilege`):
      * every column is either FK or payload. Rows move by FK rewrite
      * alone; when `naturalKey` is declared (the composite PK of an
      * INSERT IGNORE table) incoming rows are set-union-deduped against
      * the destination AND within the batch; with an empty naturalKey
      * every FK-rewritten row is appended (the auto-id gaac_member
      * shape — the destination DB mints row ids, the merge never sees
      * them). Emits NO id map, so a Keyless table cannot be any other
      * table's parent. `idCol` must be empty. */
    case object Keyless extends MergeMode
  }

  /** Declarative per-table merge config — the reference's table-config
    * object (preparation.js:134 match columns + exclusions,
    * utils.js:74 comparison columns) as a case class.
    *
    * @param name       table name (keys `fks` of child specs)
    * @param idCol      primary key column (LONG-castable)
    * @param naturalKey cross-instance identity: Consolidate match
    *                   columns / Move already-in-destination key
    * @param mode       consolidate vs move
    * @param fks        fk column → parent table name; rewritten through
    *                   the parent's completed id map (inner join — the
    *                   strict post-integrity-check path)
    * @param selfFks    nullable self-referential fk columns (changed_by,
    *                   obs_group_id); rewritten through this table's OWN
    *                   completed map in a second phase (left join, nulls
    *                   survive — the m11 semantics)
    * @param uuidCol    optional uuid column: adds the OR-uuid exclusion
    *                   leg (preparation.js:134)
    * @param mappedKeys natural-key columns that are themselves FKs and
    *                   must be rewritten through the parent's map
    *                   BEFORE matching (utils.js:74-103 `mapped` +
    *                   `mappedValueMap` — the m12 semantics); column →
    *                   parent table. Counted as dependency edges.
    * @param saltedFks  fk/selfFk columns with HOT parent keys (the
    *                   OpenMRS shape: one location/provider owning
    *                   most child rows) → salt bucket count. Their
    *                   map joins run through [[MergeOps.remapFk]]'s
    *                   salted shape so no single task carries a hot
    *                   key's whole fact volume; rows are identical
    *                   either way (spec-pinned planted-skew test).
    * @param autoSaltFks when true (the DEFAULT — the config pipeline
    *                   runs the guard on every table; set false to
    *                   opt OUT), [[autoSaltFks]] fills saltedFks
    *                   from the table's OWN fk histograms at plan time
    *                   (the j2 audit metric — [[graft.operators.Skew
    *                   .autoBuckets]]): the hotShare guard decides, so
    *                   wide-uniform tables provably stay on the plain
    *                   shuffle path and only a planted-hot relation
    *                   pays the salted shape. Explicitly declared
    *                   salts win. Direct [[Orchestrator.run]] callers
    *                   compose [[autoSaltFks]] themselves (the
    *                   MergeConfig pipeline does it for them).
    * @param deferredFks nullable fk columns resolved in a SECOND pass
    *                   after ALL tables are merged; column → parent
    *                   table, NOT a dependency edge — this is how
    *                   mutually-referential tables merge (the
    *                   reference's person ⇄ users cycle: persons insert
    *                   with their users-audit columns unresolved, then
    *                   person-users.js:307 back-fills them once the
    *                   users map is complete). Null stays null; an
    *                   unresolvable NON-null value fails loudly at
    *                   execution (raise_error) — deferred columns skip
    *                   the integrity gate, so silently nulling a
    *                   dangling reference would publish corruption.
    */
  final case class TableSpec(
      name: String,
      idCol: String,
      naturalKey: Seq[String],
      mode: MergeMode,
      fks: Map[String, String] = Map.empty,
      selfFks: Seq[String] = Nil,
      uuidCol: Option[String] = None,
      mappedKeys: Map[String, String] = Map.empty,
      deferredFks: Map[String, String] = Map.empty,
      saltedFks: Map[String, Int] = Map.empty,
      autoSaltFks: Boolean = true) {
    require(mode == MergeMode.Keyless || idCol.nonEmpty,
      s"table '$name': idCol required for non-keyless modes")
    mode match {
      case MergeMode.Keyless =>
        require(idCol.isEmpty && selfFks.isEmpty && uuidCol.isEmpty
            && mappedKeys.isEmpty && deferredFks.isEmpty,
          s"table '$name': Keyless tables have no own id — idCol, selfFks, " +
            "uuidCol, mappedKeys and deferredFks must all be empty")
      case MergeMode.SharedPk(_) =>
        require(uuidCol.isEmpty && mappedKeys.isEmpty,
          s"table '$name': SharedPk identity is the parent's — " +
            "uuidCol/mappedKeys must be empty")
      case _ => ()
    }
    /** Tables that must be merged before this one (deferredFks are
      * deliberately absent — they are what BREAKS cycles). */
    def parents: Iterable[String] = fks.values ++ mappedKeys.values ++ (mode match {
      case MergeMode.SharedPk(p) => Seq(p)
      case _                     => Nil
    })
  }

  /** One merged table: the output rows plus the src→dest id map the
    * table's children consumed. `merged` has the src table's columns
    * with idCol/fks/selfFks REWRITTEN IN PLACE, plus lineage columns
    * `src_<idCol>` (original id), `instance` ('src'/'dest') and
    * `merge_source` (which source instance a row came from —
    * orchestrator.js:92 insertSource). */
  final case class MergedTable(merged: DataFrame, idMap: DataFrame)

  /** Kahn topological order over fk dependencies. Self-FKs are not
    * edges (they resolve against the table's own completed map).
    * Throws on unknown parents or cycles — a mis-declared DAG must
    * fail before any plan runs, like the reference's hardcoded call
    * order failing to compile. */
  def topoOrder(specs: Seq[TableSpec]): Seq[TableSpec] = {
    val byName = specs.map(s => s.name -> s).toMap
    specs.foreach { s =>
      (s.parents ++ s.deferredFks.values).foreach { p =>
        require(byName.contains(p), s"table '${s.name}' references unknown parent '$p'")
        require(byName(p).mode != MergeMode.Keyless,
          s"table '${s.name}' references keyless table '$p' as a parent — " +
            "Keyless tables emit no id map")
      }
    }
    val ordered = scala.collection.mutable.ArrayBuffer.empty[TableSpec]
    val done = scala.collection.mutable.Set.empty[String]
    var remaining = specs
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(_.parents.forall(done))
      require(ready.nonEmpty,
        s"cyclic fk dependencies among: ${blocked.map(_.name).mkString(", ")}")
      // stable within a level: declaration order
      ordered ++= ready
      done ++= ready.map(_.name)
      remaining = blocked
    }
    ordered.toSeq
  }

  /** Scalar max id from the destination — one aggregate action, no
    * rows to the driver (utils.js:11 getNextAutoIncrementId). */
  private def maxId(dest: DataFrame, idCol: String): Long =
    dest.agg(coalesce(max(col(idCol)), lit(0L)).cast(LongType)).head().getLong(0)

  /** Move-mode id map: rows matching dest (natural key, then uuid for
    * the remainder) map to their dest counterpart with is_new=0; the
    * rest get contiguous ids past dest's max with is_new=1. */
  private def moveIdMap(src: DataFrame, dest: DataFrame, spec: TableSpec,
                        knownMaxId: Option[Long] = None): DataFrame = {
    val key = effectiveKey(spec)
    val destK = dest.groupBy(key.map(col): _*)
      .agg(min(col(spec.idCol)).cast(LongType).as("dest_id"))
    val byKey = src.join(destK, key)
      .select(col(spec.idCol).cast(LongType).as("src_id"), col("dest_id"), lit(0).as("is_new"))
    val afterKey = src.join(destK, key, "left_anti")
    val (matched, unmatched) = spec.uuidCol match {
      case Some(u) =>
        val destU = dest.groupBy(col(u)).agg(min(col(spec.idCol)).cast(LongType).as("dest_id"))
        val byUuid = afterKey.join(destU, Seq(u))
          .select(col(spec.idCol).cast(LongType).as("src_id"), col("dest_id"), lit(0).as("is_new"))
        (byKey.unionAll(byUuid), afterKey.join(destU, Seq(u), "left_anti"))
      case None => (byKey, afterKey)
    }
    val assigned = MergeOps.assignSequentialIds(
        unmatched.select(col(spec.idCol).cast(LongType).as("src_id")),
        "src_id", "dest_id", knownMaxId.getOrElse(maxId(dest, spec.idCol)))
      .select(col("src_id"), col("dest_id"), lit(1).as("is_new"))
    matched.unionAll(assigned)
  }

  /** Id map for one table given its mode. Complete over ALL src rows
    * (movers and already-present alike), so children and self-FKs
    * always resolve. `mappedKeys` columns are rewritten through the
    * parent maps before any matching — on the SRC side only, since
    * dest values are already in the destination id space. */
  /** src with mappedKeys columns rewritten into dest id space. LEFT
    * join: a null/unmapped mapped key must NOT drop the row (the id
    * map is contractually complete over all src rows) — it becomes a
    * null key value, which matches no dest row and therefore
    * consolidates/moves as new. */
  private def withMappedKeys(src: DataFrame, spec: TableSpec,
                             parentMaps: String => DataFrame): DataFrame =
    spec.mappedKeys.foldLeft(src) { case (df, (c, parent)) =>
      MergeOps.remapFk(df, c, parentMaps(parent), s"__mapped_$c", joinType = "left")
        .drop(c).withColumnRenamed(s"__mapped_$c", c)
    }

  /** Cross-instance identity columns: the declared natural key plus
    * every mapped key (both modes match on the same composite —
    * a row is "the same row" only if its mapped parents agree too). */
  private def effectiveKey(spec: TableSpec): Seq[String] =
    spec.naturalKey ++ spec.mappedKeys.keys.filterNot(spec.naturalKey.contains)

  def idMapFor(src: DataFrame, dest: DataFrame, spec: TableSpec,
               parentMaps: String => DataFrame): DataFrame =
    idMapMapped(withMappedKeys(src, spec, parentMaps), dest, spec, parentMaps)

  /** SharedPk id map: the child's id joined through the PARENT's
    * completed map (patient.js:25 `personMap.get(row['patient_id'])`) —
    * dest_id AND the move decision (is_new) are both the parent's; no
    * id is allocated. Inner join: a child id absent from the parent
    * map (no such parent row in src) drops — the strict
    * post-integrity-check path, same contract as remapFk "inner". */
  private def sharedPkIdMap(src: DataFrame, spec: TableSpec, parentMap: DataFrame): DataFrame =
    src.select(col(spec.idCol).cast(LongType).as("src_id"))
      .join(parentMap.select(col("src_id"), col("dest_id"), col("is_new")), Seq("src_id"))

  /** Schema-correct EMPTY id map (Keyless tables emit no map but
    * [[MergedTable]] carries one for API uniformity). */
  private def emptyIdMap(src: DataFrame): DataFrame =
    src.sparkSession.range(0).select(
      col("id").as("src_id"), col("id").as("dest_id"), lit(1).as("is_new"))

  /** As [[idMapFor]], but `srcMapped` already has mappedKeys in dest
    * id space. */
  private def idMapMapped(srcMapped: DataFrame, dest: DataFrame, spec: TableSpec,
                          parentMaps: String => DataFrame,
                          knownMaxId: Option[Long] = None): DataFrame =
    spec.mode match {
      case MergeMode.Consolidate =>
        MergeOps.consolidate(srcMapped, dest, effectiveKey(spec), spec.idCol, knownMaxId)
      case MergeMode.Move        => moveIdMap(srcMapped, dest, spec, knownMaxId)
      case MergeMode.SharedPk(p) => sharedPkIdMap(srcMapped, spec, parentMaps(p))
      case MergeMode.Keyless     => emptyIdMap(srcMapped)
    }

  /** Keyless association-table merge (MergeMode.Keyless): FK rewrite
    * through the parents' completed maps (inner_or_null — the strict
    * nullable-FK contract every declared FK rides), then either
    *   - naturalKey declared → INSERT IGNORE semantics
    *     (person-users.js:359): set-union dedup against dest on the
    *     composite key AND within the incoming batch. With payload
    *     columns outside the key, the in-batch survivor is the MINIMUM
    *     payload tuple — deterministic where MySQL's first-arriving-row
    *     is scheduler luck;
    *   - naturalKey empty → append-all (gaac.js:100: the destination
    *     mints auto ids the merge never sees).
    * Emits an empty id map — nothing can FK-reference these rows.
    * Scale: one shuffle per fk map join + (keyed form) one dedup
    * aggregate on the composite key; never a window, never a sort. */
  private def keylessMerge(src: DataFrame, dest: DataFrame, spec: TableSpec,
                           maps: String => DataFrame, sourceTag: String): MergedTable = {
    val fkDone0 = spec.fks.foldLeft(src) { case (df, (fkCol, parent)) =>
      MergeOps.remapFk(df, fkCol, maps(parent), s"__new_$fkCol", joinType = "inner_or_null",
          saltBuckets = spec.saltedFks.getOrElse(fkCol, 0))
        .drop(fkCol).withColumnRenamed(s"__new_$fkCol", fkCol)
    }
    val cols = src.columns.toSeq
    val fkDone = fkDone0.select(cols.map(col): _*)
    val incoming =
      if (spec.naturalKey.isEmpty) fkDone
      else {
        val payload = cols.filterNot(spec.naturalKey.contains)
        val batchDeduped =
          if (payload.isEmpty) fkDone.dropDuplicates(spec.naturalKey)
          else fkDone.groupBy(spec.naturalKey.map(col): _*)
            .agg(min(struct(payload.map(col): _*)).as("__p"))
            .select(cols.map(c =>
              if (spec.naturalKey.contains(c)) col(c) else col(s"__p.$c").as(c)): _*)
        batchDeduped.join(
          dest.select(spec.naturalKey.map(col): _*).distinct(), spec.naturalKey, "left_anti")
      }
    val srcOut = incoming.select((cols.map(col) :+
      lit("src").as("instance") :+ lit(sourceTag).as("merge_source")): _*)
    val destOut = dest.select((cols.map(col) :+
      lit("dest").as("instance") :+ lit("dest").as("merge_source")): _*)
    MergedTable(destOut.unionByName(srcOut), emptyIdMap(src))
  }

  /** Fill `saltedFks` from each OPTED-IN spec's own fk histograms
    * (the j2 heavy-key audit run at plan time over the SOURCE fact —
    * [[graft.operators.Skew.autoBucketsAll]], ONE fact scan for all
    * of a table's candidate fks): a declared-hot relation needs no
    * hand-tuned bucket count, and a uniform one stays on the plain
    * shuffle path. Explicit saltedFks entries always win; specs
    * without the flag are returned untouched (zero audit cost). */
  def autoSaltFks(specs: Seq[TableSpec], src: String => DataFrame,
                  hotShare: Double = 0.125, maxBuckets: Int = 32): Seq[TableSpec] =
    specs.map { t =>
      if (!t.autoSaltFks) t
      else {
        val candidates = (t.fks.keys ++ t.selfFks).toSeq.distinct
          .filterNot(t.saltedFks.contains)
        val auto = graft.operators.Skew.autoBucketsAll(
          src(t.name), candidates, hotShare, maxBuckets)
        if (auto.isEmpty) t else t.copy(saltedFks = t.saltedFks ++ auto)
      }
    }

  /** Run the full pipeline: topological order, id maps threaded
    * parents→children, merged output per table.
    *
    * @param src/dest   table name → instance DataFrame
    * @param sourceTag  provenance label recorded on every row moved
    *                   from the source instance (orchestrator.js:92)
    */
  def run(specs: Seq[TableSpec],
          src: String => DataFrame, dest: String => DataFrame,
          sourceTag: String, pinIdMaps: Boolean = false): Map[String, MergedTable] = {
    val maps = scala.collection.mutable.Map.empty[String, DataFrame]
    // r14-opt (guide §2.6): every Consolidate/Move table's dest
    // max-id scalar depends ONLY on the raw destination table, yet
    // inline it was one serial driver action per table on the id-map
    // chain's critical path (the chain itself is dependency-true and
    // cannot overlap). Prefetch them all concurrently up front; the
    // values are identical by construction, so dry-run-equals-actual
    // and every id map's rows are unchanged (OrchestratorSpec pins
    // both).
    val order = topoOrder(specs)
    val knownMaxIds: Map[String, Long] = graft.operators.Overlap.map(
      order.filter(s =>
        s.mode == MergeMode.Consolidate || s.mode == MergeMode.Move)) { s =>
      s.name -> maxId(dest(s.name), s.idCol)
    }.toMap
    val firstPass = order.map { spec =>
      if (spec.mode == MergeMode.Keyless) {
        spec.name -> keylessMerge(src(spec.name), dest(spec.name), spec, maps, sourceTag)
      } else {
      // mappedKeys rewritten once, used for BOTH matching and output —
      // new rows must land in dest with dest-space key values
      val s = withMappedKeys(src(spec.name), spec, maps)
      val d = dest(spec.name)
      // the id map has 3+ consumers (this table's movers join and
      // self-FK remap, every child's FK remap); by default each
      // re-derives it from lineage, which is SAFE
      // (assignSequentialIds is a deterministic range-sort +
      // numbering) and measured faster than a persist() round-trip
      // when the run has the machine to itself. `pinIdMaps` eagerly
      // cuts each map once instead (localCheckpoint) so every
      // consumer reads the materialized frame — the wall is similar
      // in isolation (the deepest chain dominates either way, the r7
      // measurement) but TOTAL CPU drops ~3×, which is what matters
      // when the run shares the machine with concurrent pipelines
      // (the bench's artifact phase) . At 100 TB the map for a
      // fact-sized table should instead be WRITTEN once (a parquet id
      // table, the reference's durable mapping) and read by consumers.
      val idMap0 = idMapMapped(s, d, spec, maps, knownMaxIds.get(spec.name))
      val idMap = if (pinIdMaps) idMap0.localCheckpoint(true) else idMap0
      maps(spec.name) = idMap

      // src rows that produce NEW dest rows; their id becomes dest_id
      val newIds = idMap.filter(col("is_new") === 1)
        .select(col("src_id"), col("dest_id"))
      val movers = s.join(newIds, s(spec.idCol).cast(LongType) === col("src_id"))

      // fk rewrite through each parent's completed map. inner_or_null:
      // a NULL declared FK survives with null (the reference copies
      // null-FK rows verbatim, and orphanCheck only gates non-null
      // FKs — a plain inner join would silently drop those rows AND
      // desync dryRun's would_insert from the actual run), while a
      // non-null FK missing from the map still drops (strict
      // post-integrity-check path). Self-FKs then ride the OWN map
      // (left: null means no parent — m11 two-phase).
      // (join strategy: remapFk defaults to size-based auto-broadcast
      // — small maps broadcast, person-scale maps shuffle)
      val fkDone = spec.fks.foldLeft(movers) { case (df, (fkCol, parent)) =>
        MergeOps.remapFk(df, fkCol, maps(parent), s"__new_$fkCol", joinType = "inner_or_null",
            saltBuckets = spec.saltedFks.getOrElse(fkCol, 0))
          .drop(fkCol).withColumnRenamed(s"__new_$fkCol", fkCol)
      }
      val selfDone = spec.selfFks.foldLeft(fkDone) { (df, fkCol) =>
        MergeOps.remapFk(df, fkCol, idMap, s"__new_$fkCol", joinType = "left",
            saltBuckets = spec.saltedFks.getOrElse(fkCol, 0))
          .drop(fkCol).withColumnRenamed(s"__new_$fkCol", fkCol)
      }
      val dataCols = s.columns.filter(_ != spec.idCol)
      val srcOut = selfDone.select(
        (col("dest_id").as(spec.idCol) +:
          dataCols.map(col) :+
          col("src_id").as(s"src_${spec.idCol}") :+
          lit("src").as("instance") :+
          lit(sourceTag).as("merge_source")).toIndexedSeq: _*)
      val destOut = d.select(
        (col(spec.idCol).cast(LongType).as(spec.idCol) +:
          dataCols.map(col) :+
          col(spec.idCol).cast(LongType).as(s"src_${spec.idCol}") :+
          lit("dest").as("instance") :+
          lit("dest").as("merge_source")).toIndexedSeq: _*)
      spec.name -> MergedTable(destOut.unionByName(srcOut), idMap)
      }
    }.toMap

    // second pass: deferred FKs, now that EVERY table's map is
    // complete (person-users.js:307 — the reference back-fills
    // persons' users-audit columns only after the users mover ran).
    // Only SRC-instance rows are rewritten (dest rows already carry
    // dest-space values). Null stays null (the selfFks convention —
    // deferred columns are nullable by contract), but a NON-null value
    // with no map entry fails LOUDLY at execution: deferredFks are
    // ordinary declared FKs that merely sit on a cycle, and
    // orphanCheck (non-null-only) has already run — silently nulling
    // a dangling reference would publish corruption indistinguishable
    // from a legitimate null, breaking the strict-remap invariant
    // (unresolvable references never silently become nulls).
    val byName = specs.map(s => s.name -> s).toMap
    firstPass.map { case (name, mt) =>
      val deferred = byName(name).deferredFks
      if (deferred.isEmpty) name -> mt
      else {
        val merged = deferred.foldLeft(mt.merged) { case (df, (fkCol, parent)) =>
          val m = maps(parent)
            .select(col("src_id").as("__dfk_src"), col("dest_id").as("__dfk_dest"))
          df.join(m,
              df(fkCol) === col("__dfk_src") && df("instance") === lit("src"), "left")
            .withColumn(fkCol,
              when(col("instance") === "src" && col(fkCol).isNotNull
                     && col("__dfk_dest").isNull,
                raise_error(concat(
                  lit(s"unresolvable deferred FK $name.$fkCol -> $parent: src value "),
                  col(fkCol).cast("string"))))
              .when(col("instance") === "src", col("__dfk_dest"))
              .otherwise(col(fkCol)))
            .drop("__dfk_src", "__dfk_dest")
        }
        name -> MergedTable(merged, mt.idMap)
      }
    }
  }

  /** Dry-run (reference orchestrator.js:26 `--dry-run`: full rehearsal,
    * then ROLLBACK): per-table would-happen counts as ONE DataFrame —
    * a pure plan over the id maps, zero writes. The reference rehearses
    * by executing then rolling back; a declarative engine can report
    * the same numbers without executing the merge at all. */
  def dryRun(specs: Seq[TableSpec],
             src: String => DataFrame, dest: String => DataFrame): DataFrame = {
    val maps = scala.collection.mutable.Map.empty[String, DataFrame]
    // only parents whose map another table's DECISION depends on need a
    // REAL id map (its construction runs the dest-max scalar action):
    // mappedKeys parents, SharedPk parents (the decision IS the
    // parent's is_new) and Keyless tables' fk parents (the set-union
    // key matches in dest id space). Transitive: a needed SharedPk
    // parent's own map needs ITS parent's map. Every other table's dry
    // count is pure semi/anti-join shape.
    val byName = specs.map(s => s.name -> s).toMap
    val mapConsumers = scala.collection.mutable.Set.empty[String]
    def needMap(n: String): Unit = if (mapConsumers.add(n)) byName(n).mode match {
      case MergeMode.SharedPk(p) => needMap(p)
      case _                     => ()
    }
    specs.foreach { s =>
      s.mappedKeys.values.foreach(needMap)
      s.mode match {
        case MergeMode.SharedPk(p) => needMap(p)
        case MergeMode.Keyless     => s.fks.values.foreach(needMap)
        case _                     => ()
      }
    }
    topoOrder(specs).map { spec =>
      if (spec.mode == MergeMode.Keyless) keylessDryRow(src(spec.name), dest(spec.name), spec, maps)
      else {
      val s = withMappedKeys(src(spec.name), spec, maps)
      val d = dest(spec.name)
      // children's dry shapes still thread the REAL parent maps (their
      // mappedKeys must land in dest id space before matching)
      if (mapConsumers(spec.name)) maps(spec.name) = idMapMapped(s, d, spec, maps)
      // counts need only the match DECISION per src row, not ids —
      // semi/anti joins replicate idMapMapped's matching (the SAME
      // effective key: naturalKey + mappedKeys, then uuid for the Move
      // remainder) with no range sort, no zipWithIndex jobs, no
      // dest-max action. The OrchestratorSpec dry-run-equals-actual
      // test pins this equivalence.
      val shape = spec.mode match {
        case MergeMode.SharedPk(p) =>
          // the decision IS the parent's: join src ids through the
          // parent's real map (ids absent from it drop, as in the run)
          s.select(col(spec.idCol).cast(LongType).as("src_id"))
            .join(maps(p).select(col("src_id"), col("is_new")), Seq("src_id"))
            .select(col("is_new"))
        case _ =>
          val key = effectiveKey(spec)
          val destKeys = d.select(key.map(col): _*).distinct()
          val matchedKey = s.join(destKeys, key, "left_semi")
            .select(lit(0).as("is_new"))
          val rest = s.join(destKeys, key, "left_anti")
          spec.uuidCol.filter(_ => spec.mode == MergeMode.Move) match {
            case Some(u) =>
              val destU = d.select(col(u)).distinct()
              matchedKey
                .unionAll(rest.join(destU, Seq(u), "left_semi").select(lit(0).as("is_new")))
                .unionAll(rest.join(destU, Seq(u), "left_anti").select(lit(1).as("is_new")))
            case None =>
              matchedKey.unionAll(rest.select(lit(1).as("is_new")))
          }
      }
      shape.agg(
          count(lit(1)).as("src_rows"),
          sum(when(col("is_new") === 0, 1L).otherwise(0L)).as("already_in_dest"),
          sum(when(col("is_new") === 1, 1L).otherwise(0L)).as("would_insert"))
        .select(
          lit(spec.name).as("table_name"),
          lit(modeLabel(spec.mode)).as("mode"),
          col("src_rows"), col("already_in_dest"), col("would_insert"))
      }
    }.reduce(_ unionAll _)
  }

  private[merge] def modeLabel(mode: MergeMode): String = mode match {
    case MergeMode.Consolidate => "consolidate"
    case MergeMode.Move        => "move"
    case MergeMode.SharedPk(_) => "shared_pk"
    case MergeMode.Keyless     => "keyless"
  }

  /** Keyless dry-run row: src_rows counts the RAW src table (what the
    * reference's getCount reports); already_in_dest / would_insert
    * replicate [[keylessMerge]] exactly (FK rewrite through the real
    * parent maps, batch dedup, key match against dest), so
    * `would_insert` equals the rows the actual run appends. With
    * internal batch duplicates src_rows > already + would — the same
    * gap INSERT IGNORE's affectedRows shows. */
  private def keylessDryRow(s: DataFrame, d: DataFrame, spec: TableSpec,
                            maps: String => DataFrame): DataFrame = {
    val fkDone0 = spec.fks.foldLeft(s) { case (df, (fkCol, parent)) =>
      MergeOps.remapFk(df, fkCol, maps(parent), s"__new_$fkCol", joinType = "inner_or_null")
        .drop(fkCol).withColumnRenamed(s"__new_$fkCol", fkCol)
    }
    val srcRows = s.agg(count(lit(1)).as("src_rows"))
    val decided =
      if (spec.naturalKey.isEmpty)
        fkDone0.agg(lit(0L).as("already_in_dest"), count(lit(1)).as("would_insert"))
      else {
        val batch = fkDone0.dropDuplicates(spec.naturalKey)
        val destKeys = d.select(spec.naturalKey.map(col): _*).distinct()
        batch.join(destKeys, spec.naturalKey, "left_semi").select(lit(0).as("is_new"))
          .unionAll(batch.join(destKeys, spec.naturalKey, "left_anti").select(lit(1).as("is_new")))
          .agg(
            sum(when(col("is_new") === 0, 1L).otherwise(0L)).as("already_in_dest"),
            sum(when(col("is_new") === 1, 1L).otherwise(0L)).as("would_insert"))
      }
    srcRows.crossJoin(decided).select(
      lit(spec.name).as("table_name"), lit(modeLabel(spec.mode)).as("mode"),
      col("src_rows"),
      coalesce(col("already_in_dest"), lit(0L)).as("already_in_dest"),
      coalesce(col("would_insert"), lit(0L)).as("would_insert"))
  }

  /** Declarative exclusion set for one table (preparation.js:134): the
    * src ids that would NOT move because a dest row matches on the
    * spec's cross-instance identity (effectiveKey: naturalKey +
    * mappedKeys, the SAME composite the Move-mode id map uses — this
    * is exactly its is_new=0 side, exposed as an id list) OR its uuid.
    * Specs with mappedKeys need the parents' completed maps. */
  def excludedIds(src: DataFrame, dest: DataFrame, spec: TableSpec,
                  parentMaps: String => DataFrame =
                    name => sys.error(s"excludedIds: parent map for '$name' required by mappedKeys"))
  : DataFrame = {
    spec.mode match {
      case MergeMode.Keyless =>
        sys.error(s"excludedIds: keyless table '${spec.name}' has no ids to exclude")
      case MergeMode.SharedPk(p) =>
        // excluded iff the parent row did not move (patient loop shape)
        src.select(col(spec.idCol).cast(LongType).as("__id"))
          .join(parentMaps(p).filter(col("is_new") === 0).select(col("src_id").as("__id")),
            Seq("__id"), "left_semi")
          .select(col("__id").as(spec.idCol)).distinct()
      case _ =>
        val s = withMappedKeys(src, spec, parentMaps)
        val key = effectiveKey(spec)
        spec.uuidCol match {
          case Some(u) => MergeOps.excludeMoved(s, dest, key, u, spec.idCol)
          case None =>
            s.join(dest.select(key.map(col): _*).distinct(), key, "left_semi")
              .select(col(spec.idCol)).distinct()
        }
    }
  }

  /** UUID handling for moved rows (reference utils.js:55 config flag
    * `generateNewUuids`, uuid-checks.js:26 initial→final report).
    *
    * `generateNewUuids = false`: keep uuids, regenerate ONLY dest
    * collisions (the m3 semantics). `true`: regenerate EVERY moved
    * row's uuid. Either way the report lists every src row with its
    * initial and final uuid plus a `regenerated` flag — the reference's
    * per-table uuid report. Replacement uuids are md5-derived from the
    * old (deterministic: re-runs are idempotent, and the oracle can
    * reproduce them). */
  def uuidRemapReport(src: DataFrame, dest: DataFrame, idCol: String,
                      uuidCol: String, generateNewUuids: Boolean): DataFrame = {
    val fresh = MergeOps.formatUuid(md5(concat(lit("graft-remap:"), col(uuidCol))))
    if (generateNewUuids)
      src.select(col(idCol).cast(LongType).as("src_id"),
        col(uuidCol).as("initial_uuid"), fresh.as("final_uuid"),
        lit(1).as("regenerated"))
    else {
      // no forced broadcast: dest's distinct uuids are fact-sized at
      // the 100 TB target — size-based auto-broadcast decides
      val collided = dest.select(col(uuidCol)).distinct()
      src.join(collided.withColumn("__hit", lit(1)), Seq(uuidCol), "left")
        .select(col(idCol).cast(LongType).as("src_id"),
          col(uuidCol).as("initial_uuid"),
          when(col("__hit").isNotNull, fresh).otherwise(col(uuidCol)).as("final_uuid"),
          when(col("__hit").isNotNull, 1).otherwise(0).as("regenerated"))
    }
  }
}
