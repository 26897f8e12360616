package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis: per entity, how far through an ordered sequence of
  * step predicates did its event stream get?
  *
  * Reference surface: apache/pinot `AggregationFunctionType.java:193-202`
  * (FUNNELMAXSTEP, FUNNELCOMPLETECOUNT, FUNNELCOUNT, FUNNELMATCHSTEP) and
  * `pinot-core/.../query/aggregation/function/funnel/`.
  *
  * Scale design: ONE shuffle (groupBy entity) collecting (ts, step-id)
  * pairs — step-id is resolved BEFORE the shuffle so only a byte-sized
  * tag rides the exchange, not the raw event row. The per-entity fold is
  * a higher-order `aggregate` over the sorted pair array: pure Catalyst
  * expressions, codegen'd, no UDF. Entities with pathologically many
  * events are the only skew concern — same as any sessionization.
  */
object Funnel {

  /** max step reached per entity.
    *
    * @param steps ordered step predicates as (name, boolean Column); an
    *              event can only advance the funnel to step k+1 if steps
    *              1..k were already matched by strictly earlier events
    *              (sorted by orderCol, tie-broken by tieCol).
    */
  def maxStep(
      events: DataFrame,
      entityCol: String,
      orderCol: String,
      tieCol: String,
      steps: Seq[Column]): DataFrame = {

    // Resolve each event to the first step predicate it satisfies (or 0).
    val stepId = steps.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (pred, i)) => when(pred, lit(i + 1)).otherwise(acc)
    }
    val tagged = events
      .withColumn("__step", stepId)
      .filter(col("__step") > 0)
      .select(col(entityCol), struct(col(orderCol), col(tieCol).as("tie"),
        col("__step").as("step")).as("__evt"))

    val n = steps.size
    tagged
      .groupBy(entityCol)
      .agg(sort_array(collect_list(col("__evt"))).as("__evts"))
      .withColumn("max_step",
        aggregate(col("__evts"), lit(0),
          (acc, e) => when(acc < n && e.getField("step") === acc + 1, acc + 1)
            .otherwise(acc)))
      .drop("__evts")
  }

  /** FUNNELCOMPLETECOUNT: entities that completed the whole funnel. */
  def completeCount(
      events: DataFrame,
      entityCol: String,
      orderCol: String,
      tieCol: String,
      steps: Seq[Column]): DataFrame =
    maxStep(events, entityCol, orderCol, tieCol, steps)
      .filter(col("max_step") === steps.size)
      .agg(count(lit(1)).as("n_complete"))

  /** Windowed funnel runs — the sliding-window semantics of the
    * reference's window funnel family (`FunnelBaseAggregationFunction
    * .java:44` fillWindow/processWindow, default mode): per entity,
    * every step-1 event anchors a window of `windowMillis`; scanning
    * events in (ts, step) order within the window, the expected step
    * advances greedily when an event matches it (other events are
    * ignored — no strict_order). A window's run is the array of matched
    * step timestamps. The reference pops every queue head as an anchor;
    * only step-1 anchors can produce nonzero runs, and a step-1 anchor's
    * window contains any later head's matches, so max-over-step-1-anchors
    * equals the reference's max-over-heads.
    *
    * ONE shuffle (groupBy entity); the per-entity fold is a higher-order
    * aggregate inside a transform over anchors — pure Catalyst, no UDF.
    * Cost is O(anchors × events) per entity, the same window re-scan the
    * reference does.
    */
  /** Funnel matching modes (reference `FunnelBaseAggregationFunction
    * .java` FunnelModes / `FunnelMatchStepAggregationFunction
    * .processWindow`): STRICT_DEDUPLICATION aborts a window when the
    * just-matched step repeats; STRICT_ORDER aborts on any intervening
    * tagged event that isn't the expected step; STRICT_INCREASE only
    * advances on strictly increasing timestamps. */
  final case class Modes(
      strictOrder: Boolean = false,
      strictDedup: Boolean = false,
      strictIncrease: Boolean = false)

  private def runs(
      events: DataFrame,
      entityCol: String,
      tsMillis: Column,
      steps: Seq[Column],
      windowMillis: Long,
      modes: Modes = Modes(),
      extra: Option[Column] = None): DataFrame = {
    val stepId = steps.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (pred, i)) => when(pred, lit(i + 1)).otherwise(acc)
    }
    // r15: the `ext` payload rides the collected struct ONLY when the
    // caller asked for it (every other funnel query shuffled an empty
    // string per event before), and the per-anchor fold no longer
    // accumulates an exts array — the matched extra fields are looked
    // up from __evts for the (single) winning window afterwards (see
    // eventsFunctionEval), so each advance is one long-array append
    // instead of two. Runs are identical: tss is untouched, and the
    // matched event for step i at ts t is always the FIRST event in
    // (ts, step, ext) order with (t, i) — events equal in (ts, step)
    // are interchangeable for the state machine and are scanned in
    // ext order, so the first of them triggers the transition.
    val evtFields = Seq(tsMillis.cast("long").as("ts"),
      col("__step").as("step")) ++
      extra.map(e => e.cast("string").as("ext"))
    val tagged = events
      .withColumn("__step", stepId)
      .filter(col("__step") > 0)
      .select(col(entityCol), struct(evtFields: _*).as("__evt"))
    // per-anchor scan state: expected step, matched timestamps, ts of
    // the last advance (STRICT_INCREASE), dead flag (strict aborts —
    // the reference's early `return maxStep`)
    def zero = struct(lit(1).as("expect"),
      array().cast("array<long>").as("tss"),
      lit(-1L).as("last_ts"), lit(false).as("dead"))
    tagged.groupBy(entityCol)
      .agg(sort_array(collect_list(col("__evt"))).as("__evts"))
      .withColumn("__runs",
        transform(filter(col("__evts"), e => e.getField("step") === 1),
          // r14 perf: restrict each anchor's fold to its WINDOW SLICE
          // first — out-of-window events were provable no-ops in the
          // fold (`when(!inWin, st)`), but each still paid the full
          // 6-branch struct-getter walk; the slice filter is two long
          // compares per event. Identical runs by construction.
          a => aggregate(
            filter(col("__evts"), e =>
              e.getField("ts") >= a.getField("ts") &&
                e.getField("ts") < a.getField("ts") + windowMillis),
            zero,
            (st, e) => {
              val ts = e.getField("ts"); val step = e.getField("step")
              val expect = st.getField("expect")
              val advance = struct((expect + 1).as("expect"),
                concat(st.getField("tss"), array(ts)).as("tss"),
                ts.as("last_ts"), lit(false).as("dead"))
              val dead = struct(expect.as("expect"),
                st.getField("tss").as("tss"),
                st.getField("last_ts").as("last_ts"), lit(true).as("dead"))
              // mirror of processWindow's check order: dedup abort,
              // order abort, increase skip, advance
              when(st.getField("dead"), st)
                .when(lit(modes.strictDedup) && step === expect - 1, dead)
                .when(lit(modes.strictOrder) && step =!= expect, dead)
                .when(lit(modes.strictIncrease) &&
                  ts === st.getField("last_ts"), st)
                .when(step === expect, advance)
                .otherwise(st)
            },
            st => st.getField("tss"))))
  }

  /** FUNNELMATCHSTEP (reference `FunnelMatchStepAggregationFunction
    * .java:49`): per entity, an int array with a 1 for every step the
    * entity reached in its best window, plus the max step itself.
    * Output: (entity, max_step, match_steps array). */
  def matchStep(
      events: DataFrame,
      entityCol: String,
      tsMillis: Column,
      steps: Seq[Column],
      windowMillis: Long,
      modes: Modes = Modes()): DataFrame = {
    val n = steps.size
    runs(events, entityCol, tsMillis, steps, windowMillis, modes)
      .withColumn("max_step",
        coalesce(array_max(transform(col("__runs"), r => size(r))), lit(0)))
      .withColumn("match_steps",
        transform(sequence(lit(1), lit(n)),
          i => when(i <= col("max_step"), 1).otherwise(0)))
      .drop("__runs", "__evts")
  }

  /** FUNNELSTEPDURATIONSTATS (reference
    * `FunnelStepDurationStatsAggregationFunction.java:43`): stats over
    * the durations between consecutive matched steps, across entities
    * that completed the funnel. The reference aggregates durations from
    * every completing sliding window (overlapping windows re-counted);
    * this implementation uses each entity's FIRST completing window —
    * deterministic, per-entity-weighted, and SQL-mirrorable. Returns one
    * row per step transition k→k+1: (transition, n_complete, avg_ms,
    * min_ms, max_ms, med_ms). */
  def stepDurationStats(
      events: DataFrame,
      entityCol: String,
      tsMillis: Column,
      steps: Seq[Column],
      windowMillis: Long,
      modes: Modes = Modes()): DataFrame = {
    val n = steps.size
    runs(events, entityCol, tsMillis, steps, windowMillis, modes)
      .withColumn("__tss",
        // get() (0-based) is null-safe on the empty array, unlike
        // element_at under ANSI mode
        get(filter(col("__runs"), r => size(r) === n), lit(0)))
      .filter(col("__tss").isNotNull)
      .select(col(entityCol),
        posexplode(zip_with(slice(col("__tss"), 2, n - 1),
          slice(col("__tss"), 1, n - 1), (b, a) => b - a))
          .as(Seq("__i", "__d")))
      .groupBy((col("__i") + 1).as("transition"))
      .agg(count(lit(1)).as("n_complete"),
        round(avg(col("__d")), 4).as("avg_ms"),
        min(col("__d")).as("min_ms"),
        max(col("__d")).as("max_ms"),
        round(expr("percentile(__d, 0.5)"), 4).as("med_ms"))
  }

  /** FUNNELEVENTSFUNCTIONEVAL (reference
    * `funnel/window/FunnelEventsFunctionEvalAggregationFunction.java:59`):
    * for entities that complete the funnel inside a window, surface the
    * EXTRA FIELDS of the matched per-step events (the reference flattens
    * them into a string array; callers then post-process). As with
    * [[stepDurationStats]], this implementation takes each entity's FIRST
    * completing window (the reference re-counts overlapping windows) —
    * deterministic and SQL-mirrorable. Output: (entity, matched_csv)
    * where matched_csv joins the n matched events' extra-field values in
    * step order. Same ONE-shuffle plan as the rest of the family: the
    * extra field rides the collected struct, the fold is pure Catalyst.
    *
    * r15: the fold no longer carries the exts; the winning window's
    * matched extra fields are recovered from the sorted event array —
    * the event that advanced step i at ts tss[i-1] is exactly the
    * first event in (ts, step, ext) order with (tss[i-1], i): the
    * state machine scans events in that order and events equal in
    * (ts, step) are interchangeable for every transition, so the
    * first of them is the one that fired (see runs()). */
  def eventsFunctionEval(
      events: DataFrame,
      entityCol: String,
      tsMillis: Column,
      steps: Seq[Column],
      windowMillis: Long,
      extra: Column,
      modes: Modes = Modes()): DataFrame = {
    val n = steps.size
    runs(events, entityCol, tsMillis, steps, windowMillis, modes,
        extra = Some(extra))
      .withColumn("__win",
        get(filter(col("__runs"), r => size(r) === n), lit(0)))
      .filter(col("__win").isNotNull)
      .select(col(entityCol),
        array_join(
          transform(col("__win"), (t, i) =>
            get(filter(col("__evts"), e =>
              e.getField("ts") === t && e.getField("step") === i + 1),
              lit(0)).getField("ext")),
          ",").as("matched_csv"))
  }

  /** Number of entities that reached each step: rows (step, n_entities). */
  def funnelCount(
      events: DataFrame,
      entityCol: String,
      orderCol: String,
      tieCol: String,
      steps: Seq[Column]): DataFrame = {
    val ms = maxStep(events, entityCol, orderCol, tieCol, steps)
    ms.filter(col("max_step") >= 1)
      .select(explode(sequence(lit(1), col("max_step"))).as("step"))
      .groupBy("step").agg(count("*").as("n_entities"))
  }
}
