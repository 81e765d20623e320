package graft

/** Plan-SHAPE regression gate for the most expensive bench queries: the
  * SURVEY §2.11 plan-audit claims (exchange counts, broadcast-not-SMJ,
  * no cartesian products, no corpus rejoins) as enforced invariants
  * instead of prose. Round 5 found four corpus-rejoin shapes by manual
  * audit (q48/q49/q63/q66); this spec catches the next one at commit
  * time.
  *
  * Budgets are CEILINGS pinned from the measured executed plans at the
  * fixture scale (PlanBudgetReport prints them): fewer
  * shuffles/joins/scans is an improvement and passes, one more fails.
  * `scans` counts file + in-memory sources — an injected rejoin shows
  * up as an extra source (and usually an extra join) even when AQE
  * broadcasts it at test scale, so the gate holds at sf0.001 where every
  * join side fits under the broadcast threshold. Cartesian products are
  * banned outright everywhere (the only cross joins in the engine are
  * against broadcast one-row/tiny frames, which plan as BNLJ).
  */
class PlanBudgetSpec extends SparkSpec {
  import PlanWalk.{Shape, shapeOf}

  // transcribed from PlanBudgetReport at sf0.001 (each field a ceiling)
  private[graft] val budgets = PlanBudgetSpec.budgets

  budgets.toSeq.sortBy(_._1).foreach { case (name, budget) =>
    test(s"plan budget: $name") {
      // hermetic measurement: leftover MEMORY_AND_DISK frames from
      // earlier queries otherwise leak into this plan (a cached subtree
      // substitutes, or pressure evicts THIS query's own internal
      // persist and its exchanges reappear once per consumer — q94
      // measured 5 shuffles instead of 2 after the r14 PQ-family tests
      // filled the cache). Each query must budget its OWN shape.
      spark.catalog.clearCache()
      val got = shapeOf(SparkEntry.queries(name)(spark, sf))
      assert(got.cartesian == 0,
        s"$name plans a CartesianProduct:\n  got $got")
      def leq(v: Int, b: Int, what: String): Unit =
        assert(v <= b, s"$name exceeds its $what budget ($v > $b)\n  got    $got\n  budget $budget")
      leq(got.shuffles, budget.shuffles, "shuffle-exchange")
      leq(got.broadcasts, budget.broadcasts, "broadcast-exchange")
      // raw node counts vs the canonical-distinct counts (r14 advice):
      // a lost persist re-executes an identical exchange — same
      // canonical form, so the distinct budget alone can't see it. A
      // small slack absorbs the best-effort AQE reuse race (two
      // identical stages materializing concurrently both survive as
      // raw nodes); systematic duplication beyond it fails here.
      val reuseSlack = 2
      leq(got.rawShuffles, got.shuffles + reuseSlack, "raw-shuffle-duplication")
      leq(got.rawBroadcasts, got.broadcasts + reuseSlack, "raw-broadcast-duplication")
      leq(got.joins, budget.joins, "join")
      leq(got.smj, budget.smj, "sort-merge-join")
      leq(got.bnlj, budget.bnlj, "broadcast-nested-loop-join")
      leq(got.scans, budget.scans, "source-scan")
    }
  }

  test("job budget: the q112 PQ fit ladder stays fused (r15)") {
    // the PQ family's fixture-scale wall was the sequential driver-
    // blocking job ladder, not compute: pre-fusion q112 ran 25 jobs
    // (each Lloyd rung re-aggregated and re-broadcast the 32-row
    // codebook inside the plan); the fused ladder collects each rung's
    // centroids and rebuilds the codebook as a literal local relation —
    // 12 jobs end-to-end. Pin it with headroom so a reintroduced
    // chained-broadcast rung (2-3 jobs per iteration) fails here.
    spark.catalog.clearCache()
    // count ONLY this query's jobs via a job group — other suites may
    // share the session concurrently and their jobs must not pollute
    val tag = s"q112-job-budget-${System.nanoTime()}"
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (tag == js.properties.getProperty("spark.jobGroup.id"))
          jobCount.incrementAndGet(): Unit
    }
    spark.sparkContext.addSparkListener(l)
    spark.sparkContext.setJobGroup(tag, "q112 job-budget probe")
    try {
      SparkEntry.queries("q112_pq_search")(spark, sf).collect()
      // listener events are asynchronous; jobs all STARTED by the time
      // collect returns (the last job blocks it), a short drain suffices
      Thread.sleep(500)
      assert(jobCount.get() <= 15,
        s"q112 fit ladder regrew: ${jobCount.get()} jobs (fused form runs 12)")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(l)
    }
  }

  test("plan budget: CC loop PER-ROUND shapes (q41 hash-min, q60 star)") {
    // the q41/q60 whole-query cost is rounds × the round body, so the
    // budget that matters is per round: hash-min = join + min-agg (ONE
    // visible shuffle here — AQE broadcasts the label side at fixture
    // scale; at 100 TB the join adds its keyed exchange, giving the
    // documented 2/round), star = two groupBy mins + closing distinct
    // (3 shuffles). An extra per-round distinct/join/convergence-probe —
    // the r6 except() regression shape — fails HERE at commit time
    // instead of surfacing as a bench-ledger mystery.
    import spark.implicits._
    val ids = (0L to 50L).toDF("id").localCheckpoint()
    val edges = (0L until 50L).map(i => (i, i + 1)).toDF("src", "dst")
    val both = edges.unionAll(edges.select($"dst".as("src"), $"src".as("dst")))
      .unionAll(ids.select($"id".as("src"), $"id".as("dst"))).localCheckpoint()
    val lab = ids.select($"id", $"id".as("root")).localCheckpoint()
    val cc = shapeOf(Dedup.ccRound(both, lab))
    assert(cc.cartesian == 0 && cc.shuffles <= 1 && cc.joins <= 1,
      s"hash-min round widened: $cc")
    val e = edges.select($"src".as("u"), $"dst".as("v")).localCheckpoint()
    val star = shapeOf(Dedup.starRound(e))
    assert(star.cartesian == 0 && star.shuffles <= 3 && star.joins <= 3,
      s"star round widened: $star")
  }

  test("meta: an injected corpus rejoin EXCEEDS its query's budget (gate sensitivity)") {
    // the failure mode this suite exists for, demonstrated live: take a
    // budgeted single-scan query and join the corpus back onto its own
    // derivative — the shape must blow the scan/join ceilings even at
    // test scale where AQE broadcasts the join
    val base = SparkEntry.queries("q42_pii_scrub")(spark, sf)
    val rejoined = base.join(Tables.documents(spark, sf).select("doc_id"), "doc_id")
    val got = shapeOf(rejoined)
    val b = budgets("q42_pii_scrub")
    assert(got.scans > b.scans && got.joins > b.joins,
      s"an added corpus rejoin must exceed the scan+join budget: got $got, budget $b")
  }
}

object PlanBudgetSpec {
  import PlanWalk.Shape
  /** Measured executed-plan shapes at sf0.001 (PlanBudgetReport),
    * pinned as ceilings. Covers the ~18 most expensive bench queries
    * (r5: everything ≥ ~0.5 s) plus the four r5 rejoin-rewrite sites. */
  val budgets: Map[String, Shape] = Map(
    // +1 shuffle on q01/q09/q42/q50 = the gated Tables.fanOut exchange
    // (test-scale only; the gate is a no-op at production file counts).
    // q31 keeps 2: its doc_id fan-out SATISFIES the downstream
    // (doc_id, tok) clustering, replacing the TF shuffle outright.
    "q01_pricing_summary" -> Shape(shuffles = 2, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    "q03_region_revenue" -> Shape(shuffles = 1, broadcasts = 4, joins = 4, smj = 0, cartesian = 0, bnlj = 0, scans = 5),
    "q05_history_context" -> Shape(shuffles = 1, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    "q07_tumbling_counts" -> Shape(shuffles = 1, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    "q08_sessionize" -> Shape(shuffles = 1, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    "q09_clean_text" -> Shape(shuffles = 1, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    "q11_hyperlink_headings" -> Shape(shuffles = 1, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    // r7: q15 regained its fan-out exchange (the r6 regression fix);
    // q34 is pinned at its bare two-phase aggregate — a future fan-out
    // reintroduction (rejected by measurement, see splitAssign) or a
    // second md5 projection would widen the plan and fail here
    "q15_qp_roundtrip" -> Shape(shuffles = 1, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    "q34_split_assign" -> Shape(shuffles = 1, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    // r8: q39/q40 pinned after the r7 bench mystery (6.8x/5.9x ledger
    // lines on untouched code that did not reproduce next session) — the
    // budgets turn "probably environment" into a commit-time proof that
    // the PLAN at least did not flip. q39: the two historyByKey context
    // aggregates must come back as broadcast sides (no SMJ) over one
    // window exchange each; q40: a bare scan+project, zero exchanges.
    "q39_event_routing" -> Shape(shuffles = 2, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 0, scans = 3),
    "q40_media_base64" -> Shape(shuffles = 0, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    "q20_lang_id" -> Shape(shuffles = 0, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    // r8 additions: q70 = per-row signing + ONE keyed exchange for the
    // cluster-argmax window; q71 = pure per-row rule battery whose only
    // exchange is the gated test-scale fan-out
    "q70_simhash_keep" -> Shape(shuffles = 1, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    "q71_quality_gate" -> Shape(shuffles = 1, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    // r9: q72 = per-row feature hashing (mapPartitions, no shuffle beyond
    // the gated fan-out) + ONE one-row broadcast weight frame (BNLJ, the
    // q38 codebook shape); the corpus crosses zero keyed exchanges
    "q72_classifier_score" -> Shape(shuffles = 1, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 1, scans = 1),
    "q23_minhash_lsh" -> Shape(shuffles = 3, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 0, scans = 3),
    "q27_ann_lsh" -> Shape(shuffles = 1, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    "q28_label_centroids" -> Shape(shuffles = 1, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    "q31_keyword_summary" -> Shape(shuffles = 2, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    "q32_embed_neardup" -> Shape(shuffles = 2, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 4),
    "q38_ivf_search" -> Shape(shuffles = 0, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    "q42_pii_scrub" -> Shape(shuffles = 1, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    // 5→2 shuffles (r6): the doc_id fan-out partitioning satisfies the
    // TF groupBy, the distinct, AND the top-3/doc window — only the
    // fan-out itself and the vocabulary DF aggregate exchange remain
    "q43_tfidf" -> Shape(shuffles = 2, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 1, scans = 3),
    "q48_decontaminate" -> Shape(shuffles = 2, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    "q49_boilerplate" -> Shape(shuffles = 1, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    "q50_variant_path" -> Shape(shuffles = 3, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    "q54_session_funnel" -> Shape(shuffles = 1, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    "q63_contamination" -> Shape(shuffles = 2, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    "q65_approx_distinct" -> Shape(shuffles = 2, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    "q66_bloom_decontaminate" -> Shape(shuffles = 2, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    // q67: stats persists (|sources| rows, 2 consumers) so the corpus
    // aggregates ONCE; visible exchanges = stats agg + audit agg; tiny
    // rate build broadcasts twice (totals → crossJoin, rates → corpus
    // join); 3 scans = file ×2 (stats build + sampling pass) + memory
    "q67_temperature_mix" -> Shape(shuffles = 2, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 1, scans = 3),
    // q68: ONE hash-repartition on source; the pack fold is narrow
    "q68_sequence_pack" -> Shape(shuffles = 1, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    // q73: the q68 shape with the codegen'd token count fused into the scan
    "q73_token_pack" -> Shape(shuffles = 1, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    // q69: ONE visible exchange — the line-df aggregate (its partial
    // distinct phase is satisfied by the doc_id partitioning, and the
    // rebuild reuses it too; the fan-out sits inside the persisted
    // lines frame's build). Frequent set broadcasts; 2 scans = file +
    // in-memory lines frame.
    "q69_line_dedup" -> Shape(shuffles = 1, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    // r11: q74 = LM counts aggregate off the reference slice and come
    // back as broadcasts (+ the one-row V frame as BNLJ); the corpus
    // crosses ONE keyed exchange (the per-doc fold) plus the gated
    // fan-out. q75 = IVF-style assignment (one-row codebook broadcast,
    // zero corpus shuffle), triangle-blocked pair stage keyed by cell,
    // verdict joined back on vec_id (broadcast at test scale).
    // q74's 5 exchanges: 3 are REFERENCE-SLICE-sized aggregates (unigram,
    // bigram, V) that come back as the 3 broadcasts; the corpus itself
    // crosses only the gated fan-out + the per-doc fold
    "q74_lm_perplexity" -> Shape(shuffles = 5, broadcasts = 3, joins = 3, smj = 0, cartesian = 0, bnlj = 1, scans = 4),
    // q75 (r13, DE-DRIVERED codebook): seed fit = quantile-prefilter +
    // distributed rank (jobs, not plan nodes — nothing k-sized on the
    // driver); level-2 assignment is a JOIN against the distributed
    // seed frame (broadcast at fixture, keyed exchange at 10⁷⁺ seeds)
    // + the per-vector argmax fold; with AQE the measured shape is
    // UNCHANGED from r12's closure form — the argmax fold coalesced
    // into the pair-exchange stage budget
    "q75_semdedup" -> Shape(shuffles = 3, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 0, scans = 3),
    // q76: the gated fan-out + ONE keyed aggregate (six conditional
    // moment sums in a single pass — no pivot, no self-join)
    "q76_ab_ttest" -> Shape(shuffles = 2, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    // q78's 5 exchanges: 2 are the 128-row bucket-count aggregates
    // (target + raw) that fold into the one-row Δ broadcast (BNLJ);
    // the scoring corpus crosses only the gated fan-out — per-row
    // hashing + exact integer graft_dot, no keyed corpus exchange
    "q78_dsir_weight" -> Shape(shuffles = 5, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 2, scans = 3),
    // q79 is the audit harness — everything downstream of the md5-order
    // sample (top-50 limit + candidate chain + exact self-join) is
    // SAMPLE-sized; r12 fused the four summary aggregates into ONE
    // tagged-union conditional aggregate (was 10 shuffles / 6 joins /
    // 4 BNLJ crossJoin chains)
    "q79_lsh_audit" -> Shape(shuffles = 7, broadcasts = 3, joins = 3, smj = 0, cartesian = 0, bnlj = 1, scans = 7),
    // q77: pair-count aggregate + user-distinct + the tiny per-type
    // aggregate; mean and variant totals ride one-row broadcasts (BNLJ)
    "q77_ab_chisq" -> Shape(shuffles = 4, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 2, scans = 3),
    // q80 (r13): the semantic-dedup audit through the SAME de-drivered
    // assignment as q75 (seed fit = separate jobs; assignment join +
    // argmax); sample filter broadcasts, exact ground truth is a
    // broadcast self-join over the 100-row sample, and the whole
    // report is ONE tagged-union conditional aggregate — measured
    // shape unchanged from r12
    "q80_semdedup_audit" -> Shape(shuffles = 1, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 1, scans = 3),
    // q81 (r12): the ANN recall audit — exact ground truth reduces
    // per-partition through the TopKCos aggregator (the keyed exchange
    // carries 10 five-row buffers, never the corpus), the q27 chain
    // re-runs unchanged, one tagged-union aggregate emits the report
    "q81_ann_audit" -> Shape(shuffles = 4, broadcasts = 4, joins = 4, smj = 0, cartesian = 0, bnlj = 1, scans = 7),
    // q82 (r12): multi-probe ANN — the probe explode multiplies the
    // BROADCAST side only (9 probe rows per query); the corpus side is
    // the same scan + broadcast hash join + one window exchange as q27
    "q82_ann_multiprobe" -> Shape(shuffles = 1, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    // q83 (r12): the q81 audit body against the multi-probe chain —
    // q81's shape plus one exchange for the probe-exploded query frame
    // (measured 4 solo / 5 in suite order, where q81's maybePersist of
    // the shared withLsh frame shifts which side re-exchanges)
    "q83_multiprobe_audit" -> Shape(shuffles = 5, broadcasts = 4, joins = 4, smj = 0, cartesian = 0, bnlj = 1, scans = 7),
    // q85 (r12): fuzzy decontamination — corpus signed once (persisted),
    // deny bands BROADCAST to the corpus-side probe (no corpus shuffle
    // for candidates); keyed exchanges = candidate distinct + dropped
    // distinct + the report aggregate
    "q85_fuzzy_decontaminate" -> Shape(shuffles = 4, broadcasts = 4, joins = 4, smj = 0, cartesian = 0, bnlj = 0, scans = 5),
    // q86 (r12): IVF nprobe=2 — q38's shape plus the one-row codebook
    // re-broadcast for the query's top-2 routing
    "q86_ivf_probe2" -> Shape(shuffles = 2, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 1, scans = 3),
    // q87 (r12): int8 search — per-row quantize fused with the scan,
    // one-row broadcast query, TakeOrdered shortlist, 20-row re-rank;
    // the corpus crosses ZERO exchanges (measured shuffles = 0)
    "q87_int8_search" -> Shape(shuffles = 0, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 1, scans = 2),
    // q88 (r12): cluster-balanced mix — the q84 assignment chain ends in
    // a persisted (vec_id, cid) frame, so the visible plan is ONE keyed
    // count to k rows + the broadcast rate table + the per-row keep agg
    "q88_cluster_mix" -> Shape(shuffles = 2, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 1, scans = 3),
    // q84 (r12): Lloyd k-means — centroids ride one-row broadcasts
    // (BNLJ per assignment pass), each round's update is ONE keyed
    // VecCentroid exchange; the corpus crosses zero assignment shuffles
    // measured: 7 shuffles = 3 VecCentroid keyed exchanges + 3 one-row
    // cells aggregates + the final groupBy; 4 BNLJ = the 4 broadcast
    // codebook crossJoins (one per assignment pass); 5 scans = file +
    // 4 in-memory passes over the persisted corpus frame
    "q84_kmeans" -> Shape(shuffles = 7, broadcasts = 4, joins = 4, smj = 0, cartesian = 0, bnlj = 4, scans = 5),
    // q89 (r12): substring-window dedup — ONE visible keyed exchange at
    // fixture scale (window-df aggregate; AQE broadcasts the post-cut
    // dup set here, and the doc regroup reuses the fan-out
    // partitioning). At 100 TB the dup-set join adds its keyed exchange
    // — the documented 3-exchange shape; the ceiling pins the fixture
    // plan so an injected rejoin still trips scans/joins
    "q89_window_dedup" -> Shape(shuffles = 1, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    // q90 (r12): curation funnel — the fused per-row pass, ONE
    // corpus-keyed exchange (the dedup-key window over the slim frame),
    // the broadcast deny join, and the singleton report aggregate
    "q90_curation_funnel" -> Shape(shuffles = 3, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    // q91 (r12): hard negatives — TopKCos keyed exchange of 10 five-row
    // buffers; the anchor frame and the ≤50-row label fetch ride
    // broadcasts (the crossJoin is the one-row-side BNLJ)
    "q91_hard_negatives" -> Shape(shuffles = 1, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 1, scans = 3),
    // q93 (r12): heavy hitters — the sketch pass is a singleton typed
    // aggregate (one buffer per partition); the visible exchanges are
    // the exact-yardstick token groupBy + its one-row total broadcast
    // (4 shuffles = gated fan-out + token groupBy + total agg + the
    // presentation sort's range exchange)
    "q93_heavy_hitters" -> Shape(shuffles = 4, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 1, scans = 2),
    // q94 (r12): PSI drift — the corpus crosses the (type, week, bin)
    // count aggregate plus the value-extremes singleton (2 shuffles);
    // the dense expansion, week self-join, and PSI fold run on the tiny
    // aggregate (AQE broadcasts both post-agg joins; the extremes row
    // is the third broadcast)
    "q94_psi_drift" -> Shape(shuffles = 2, broadcasts = 3, joins = 3, smj = 0, cartesian = 0, bnlj = 0, scans = 4),
    // q95 (r12): BPE induction — the RETURNED frame is the 3-row
    // driver-built merge table (all zeros by construction, like q92);
    // the corpus work runs in the fit jobs: ONE word-frequency keyed
    // exchange, then vocab-sized pair aggregates per round
    "q95_bpe_merges" -> Shape(shuffles = 0, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 0),
    // q96 (r12): split leakage — the fused fingerprint+bucket per-row
    // pass, one fp-keyed exchange, the combination regroup on the
    // collapsed frame (pin from PlanBudgetReport)
    "q96_split_leakage" -> Shape(shuffles = 2, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    // q97 (r12): DSIR resampling — q78's chain (two 128-row bucket
    // aggregates, one-row delta broadcast, zero corpus keyed exchange)
    // plus a per-row keep projection (pin from PlanBudgetReport)
    "q97_dsir_resample" -> Shape(shuffles = 5, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 2, scans = 3),
    // q98 (r12): JL distortion — per-row projection on the 20-row
    // md5-sample, broadcast self-join, everything sample-sized
    "q98_jl_distortion" -> Shape(shuffles = 0, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 1, scans = 2),
    // q99 (r12): calibration — fused per-row scoring + ONE 4-row
    // aggregate; the corpus crosses a single tiny keyed exchange
    "q99_calibration" -> Shape(shuffles = 2, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    // q100 (r12): export manifest — q90's flag chain grouped by
    // (split, source); same corpus shape as q90 plus the tiny regroup
    "q100_export_manifest" -> Shape(shuffles = 3, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    // q101 (r12): edit-distance verify — q23's shape through the
    // candidate stage, the REPARTITION_BY_NUM per-row-CPU gate (+1
    // shuffle, deliberately uncoalescible), then two broadcast text
    // joins for the DP verifier
    "q101_edit_verify" -> Shape(shuffles = 4, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 0, scans = 3),
    // q102 (r12): incremental dedup — index signs once, delta bands and
    // shingles BROADCAST to the index side (candidates and verify never
    // shuffle the index); the verdict aggregate is delta-sized
    "q102_incremental_dedup" -> Shape(shuffles = 3, broadcasts = 4, joins = 4, smj = 0, cartesian = 0, bnlj = 0, scans = 6),
    // q92 (r12): PCA power iteration — the RETURNED frame is the 64-row
    // driver-built result (all zeros by construction); the corpus work
    // runs in the fit jobs (VecCentroid + 3 VecLongSum singleton
    // aggregates over the persisted projection), each a zero-shuffle
    // scan + one-buffer-per-partition reduction, not visible here
    "q92_pca_power" -> Shape(shuffles = 0, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 0),
    // q107 (r14): image dHash dedup — one mapPartitions signing pass
    // (base + twin in the same pass), band-blocked candidates (the q23
    // triangle machinery), hash-vector verify joins over the persisted
    // 4-int hash frame (broadcast at fixture scale)
    "q107_image_dedup" -> Shape(shuffles = 3, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 0, scans = 3),
    // q108/q109 (r14): like q92, the RETURNED frame is driver-built
    // (the corpus work runs in the m·iters fit jobs / the moment pass)
    "q108_pca_topm" -> Shape(shuffles = 0, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 0),
    "q109_pca_whitening" -> Shape(shuffles = 0, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 0),
    // q110 (r14): q107's pair chain feeds a checkpointed edge frame; the
    // visible plan is the CC fixpoint join + sizes agg + keep window
    "q110_image_keep" -> Shape(shuffles = 2, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    // q111 (r14): the q107 shape with 12 band keys per video
    "q111_video_dedup" -> Shape(shuffles = 3, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 0, scans = 3),
    // q114 (r14): BPE encode — corpus word explode joins the encoded
    // vocab (persisted from the fit loop, AQE-broadcast at fixture
    // scale) + ONE partial-aggregated doc-count exchange; the fit's own
    // exchanges sit behind the persisted vocab frame
    "q114_bpe_encode" -> Shape(shuffles = 1, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    // q113 (r14): audio fingerprint dedup — q107's chain over the
    // energy-difference fingerprint frame
    "q113_audio_dedup" -> Shape(shuffles = 3, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 0, scans = 3),
    // q117 (r14): q107's pair chain + two caption-shingle lookups onto
    // the pair frame (broadcast at fixture scale)
    "q117_crossmodal" -> Shape(shuffles = 5, broadcasts = 3, joins = 4, smj = 0, cartesian = 0, bnlj = 0, scans = 5),
    // q112 (r14): PQ-ADC search — like q84, the whole lazy chain (fit +
    // encode + search) is one plan: 7 BNLJ = the one-row broadcast
    // crossJoins (2 Lloyd assign passes, seed slice, ADC-table build,
    // shortlist's codebook + query + dtab sides); 8 shuffles = the
    // 2×(s,cid) centroid exchanges + cells one-row aggs + seed window +
    // shortlist/re-rank TakeOrdereds; 8 scans = file + in-memory passes
    // over the persisted sub-vector corpus. The CORPUS itself never
    // crosses a keyed exchange — the exchanges carry m·k-row frames
    "q112_pq_search" -> Shape(shuffles = 8, broadcasts = 7, joins = 7, smj = 0, cartesian = 0, bnlj = 7, scans = 8),
    // q115 (r14): IVF-PQ — q112's lazy fit/search chain over the
    // PERSISTED residual corpus (the coarse-quantizer lineage sits
    // behind it), plus the cell-scoped broadcast-hash probe join in
    // place of one BNLJ; the corpus still never crosses a keyed
    // exchange outside the (s,cid) decimal centroid updates
    "q115_ivfpq_search" -> Shape(shuffles = 8, broadcasts = 7, joins = 7, smj = 0, cartesian = 0, bnlj = 6, scans = 8),
    // q119 (r14): standing-index probe — centroid/codebook one-row agg,
    // routed delta broadcast onto the cell-scoped index scan, max-struct
    // top-1 exchange; q119b's frame is driver-built (the build ran in
    // its own write jobs)
    "q119_incremental_ann" -> Shape(shuffles = 2, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 1, scans = 4),
    "q119b_ann_index_build" -> Shape(shuffles = 0, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 0),
    // q120 (r14): q115's chain with the probe fan-out on the broadcast
    // query side only (2 probe rows) + the coarse-codebook broadcast
    "q120_ivfpq_probe2" -> Shape(shuffles = 10, broadcasts = 8, joins = 8, smj = 0, cartesian = 0, bnlj = 7, scans = 9),
    // q118 (r14): kNN graph — bucket-size broadcast + triangle-blocked
    // pair groupByKey + the top-k keyed reduction (5-row buffers)
    "q118_knn_graph" -> Shape(shuffles = 3, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    // q122 (r14): margin mining — the visible plan is the mutual-best
    // broadcast self-join of the PERSISTED 4-column top2 frame + the
    // output sort (the q114 discipline: the candidate machinery — bucket
    // broadcast, triangle-blocked pair exchange, TopKCos keyed
    // reduction — sits behind the persisted frame; its shape is pinned
    // by the q118 entry, whose chain q122 reuses verbatim)
    "q122_bitext_margin" -> Shape(shuffles = 1, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    // q123 (r14): kNN-density pruning — the full q118 chain in the open
    // (no persisted frame): the 4-slice clone union is computed twice
    // (bucket-size stats + the pair stage — re-scan beats materializing
    // the corpus, hence 8 scans), bucket-size broadcast +
    // triangle-blocked pair groupByKey + TopKCos keyed reduction, then
    // a per-row slice-mean + filter — no join-back, no output sort
    "q123_knn_density" -> Shape(shuffles = 3, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 8),
    // q124 (r14): centroid-distance outliers — visible plan is the ONE
    // keyed stats exchange + the k-row broadcast join-back over the
    // PERSISTED assignment frame (the q114/q122 discipline: the q84
    // fit/assign chain sits behind the persisted frame and is pinned by
    // the q84 entry); the corpus crosses exactly one post-fit exchange
    "q124_centroid_outliers" -> Shape(shuffles = 1, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    // q125 (r14, re-pinned r21): embedding drift — since the r21 fit-
    // ladder fusion the q84 Lloyd chain is COLLECTED at construction
    // (literal codebook, pinned by the q84 entry), so the visible plan
    // is the psi crossJoin over the persisted terms frame PLUS the two
    // keyed assignment counts to k rows (previously hidden behind the
    // chained fit's broadcast subtrees). Still zero corpus exchanges:
    // both counts reduce to k rows under a one-row codebook broadcast.
    "q125_embedding_drift" -> Shape(shuffles = 2, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 1, scans = 2),
    // q126 (r14): compressed-index probe — the index NEVER shuffles:
    // 2 exchanges carry only the ≤5-row ADC buffers (TopKCos reduction)
    // and the per-delta re-rank argmax; 3 broadcasts (routed-delta dtab
    // into the codes-only scan, the shortlist into the orig-only scan,
    // the delta chain's cb); 4 scans = codes artifact ×2 (column-pruned
    // each way, BucketingSpec pins it) + coarse + codebook artifacts
    "q126_pq_index_probe" -> Shape(shuffles = 2, broadcasts = 3, joins = 3, smj = 0, cartesian = 0, bnlj = 0, scans = 4),
    // q127 (r14): MaxSim — the query set is the ONE broadcast (BNLJ of a
    // one-row frame); exchanges = the test-scale fanOut gate + the
    // (doc, q)-granular partial-max reduction + the doc-granular sum;
    // top-10 is TakeOrdered. The per-vector cos stream never crosses.
    "q127_maxsim" -> Shape(shuffles = 3, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 1, scans = 3),
    // q128 (r14): MRL audit — ZERO shuffles: both top-20s are
    // TakeOrdered over the persisted both-cosines scan, the 20-row
    // join and the 3-row k frame broadcast; no corpus-keyed exchange
    "q128_mrl_audit" -> Shape(shuffles = 0, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 1, scans = 2),
    // q130 (r14): RRF — ZERO shuffles visible: three TakeOrdered heads
    // over the two persisted scored frames + the q38 assignment chain
    // behind its persist (pinned at q38); the fusion unions three
    // <=20-row frames, so everything after the heads is constant-size
    "q130_rrf_fusion" -> Shape(shuffles = 0, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 4),
    // q131 (r15): hybrid BM25+vector RRF — exactly the q129 lexical
    // head's two corpus-keyed exchanges; the q26 dense head adds its
    // broadcast-nested-loop scan pair and the fusion is constant-size
    // (two <=10-row frames; its groupBy folds into the heads' output,
    // no extra corpus exchange)
    "q131_hybrid_rrf" -> Shape(shuffles = 2, broadcasts = 4, joins = 4, smj = 0, cartesian = 0, bnlj = 2, scans = 6),
    // q132 (r15): standing-lexical-index probe — the postings scan is
    // bucket-pruned (BucketingSpec), the 3-row query broadcasts, the
    // per-doc sum is the one corpus-keyed exchange; build ran in q132b
    // r19: the lifecycle read discipline is PLAN-NEUTRAL on the base
    // index — the crash-dupe distinct is gated on segmented-ness
    // (lexHasSegments) and the tombstone anti-join on log existence, so
    // the un-maintained gate artifact keeps the r18 shape; q142/q143
    // below pin the segmented form
    "q132_lex_index_probe" -> Shape(shuffles = 1, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 0, scans = 3),
    "q132b_lex_index_build" -> Shape(shuffles = 0, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 0),
    // q142/q143 (r19): the lexical lifecycle rows — the measured plan is
    // the post-maintenance PROBE (merge/forget ran at artifact time);
    // q143 adds the tombstone anti-joins on postings AND doclens
    "q142_lex_index_merge" -> Shape(shuffles = 2, broadcasts = 3, joins = 3, smj = 0, cartesian = 0, bnlj = 0, scans = 4),
    "q143_lex_index_forget" -> Shape(shuffles = 2, broadcasts = 4, joins = 5, smj = 0, cartesian = 0, bnlj = 0, scans = 5),
    // q144 (r19b): the auto-maintained probe — COMPACTED artifact, so no
    // crash-dupe distinct (single segment: one shuffle like the base
    // q132) but both tombstone anti-joins (the root log outlives
    // compaction as the merge-side replay guard)
    "q144_lex_index_maintain" -> Shape(shuffles = 1, broadcasts = 3, joins = 4, smj = 0, cartesian = 0, bnlj = 0, scans = 4),
    // q145/q146 (r19b): the dedup-index lifecycle rows — the q102 probe
    // shape (3 shuffles: delta sign fan-in, candidate distinct, verdict
    // agg) + on q146 the tombstone anti-joins on bands AND shingles
    "q145_dedup_index_merge" -> Shape(shuffles = 3, broadcasts = 4, joins = 4, smj = 0, cartesian = 0, bnlj = 0, scans = 6),
    "q146_dedup_index_forget" -> Shape(shuffles = 3, broadcasts = 5, joins = 6, smj = 0, cartesian = 0, bnlj = 0, scans = 7),
    // q147/q148 (r19b): the PQ-index lifecycle rows — the q126 probe
    // shape + on q148 the tombstone anti-joins on the ADC scan AND the
    // re-rank scan (lazy deletion, both stored-side reads guarded)
    "q147_pq_index_merge" -> Shape(shuffles = 2, broadcasts = 3, joins = 3, smj = 0, cartesian = 0, bnlj = 0, scans = 4),
    "q148_pq_index_forget" -> Shape(shuffles = 2, broadcasts = 4, joins = 5, smj = 0, cartesian = 0, bnlj = 0, scans = 5),
    // q149/q150 (r19c): the PQ distortion report (its bnlj are the
    // 1-row coarse/codebook/stat broadcasts — the q112 codebook-
    // crossJoin pattern; the corpus is scanned once per distortion
    // pass) and the refit probe (≡ the q148 post-takedown shape: the
    // refit output serves through the same live-read discipline)
    "q149_pq_index_distortion" -> Shape(shuffles = 3, broadcasts = 3, joins = 3, smj = 0, cartesian = 0, bnlj = 3, scans = 4),
    "q150_pq_index_refit" -> Shape(shuffles = 2, broadcasts = 4, joins = 5, smj = 0, cartesian = 0, bnlj = 0, scans = 5),
    // q133 (r15): hybrid probe over BOTH standing indexes — the q132
    // lexical probe shape (its one corpus-keyed per-doc sum is the only
    // shuffle) + a one-cell-pruned assignments scan behind the 1-row
    // lookup (the BNLJ broadcast); fusion constant-size (two <=10-row
    // frames); builds ran in q132b/q119b
    "q133_hybrid_index_probe" -> Shape(shuffles = 1, broadcasts = 3, joins = 3, smj = 0, cartesian = 0, bnlj = 1, scans = 5),
    // q134 (r15): index merge — the rewrite runs at build time
    // (broadcast-routed delta, dynamic partition overwrite of the hit
    // cells); the measured plan is the post-merge per-cell report:
    // one partitioned scan + one keyed count
    "q134_ann_index_merge" -> Shape(shuffles = 2, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 1),
    // q140 (r18): ANN refit report — a pure read of the rebuilt version
    // joined to the pre-refit artifact on vec_id (audit-time only; the
    // rebuild itself ran at build time, its Lloyd rounds shuffling only
    // k decimal buffers per task)
    "q140_ann_index_rebuild" -> Shape(shuffles = 2, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 0, scans = 2),
    // q141 (r18): the drift report — k-row dense frame + broadcast
    // totals; the build/merge ran at artifact time
    "q141_ann_drift_check" -> Shape(shuffles = 2, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 1, scans = 2),
    // q135 (r15→r19): forget is a tombstone-log append (LAZY deletion —
    // the artifact is never rewritten); the measured plan is the
    // post-delete report: LIVE counts (assignments scan + the broadcast
    // tombstone anti-join) joined to the per-cell tombstone counts
    "q135_index_forget" -> Shape(shuffles = 3, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 0, scans = 3),
    // q136 (r17): standing-media-index probe — delta bands BROADCAST to
    // the index band scan (the index never shuffles for candidates);
    // the 3 exchanges are delta-sized (candidate distinct, per-delta
    // verdict agg, + the test-scale fanOut gate on the corpus scan)
    "q136_media_index_probe" -> Shape(shuffles = 3, broadcasts = 4, joins = 4, smj = 0, cartesian = 0, bnlj = 0, scans = 5),
    // q136b: the returned row is a driver-local count — writes happen
    // inside the build, the reported plan is the 1-row local frame
    "q136b_media_index_build" -> Shape(shuffles = 0, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 0),
    // q137 (r17): media forget — rewrite at forget/compact time; the
    // measured plan is the post-delete report: three 1-row aggregates
    // cross-joined (bnlj on single-row frames — constant at any scale)
    "q137_media_index_forget" -> Shape(shuffles = 3, broadcasts = 2, joins = 2, smj = 0, cartesian = 0, bnlj = 2, scans = 3),
    // q138/q138b (r17): the audio-grain index — the q136 machinery
    // verbatim over the afp kernels; identical shapes by construction
    "q138_audio_index_probe" -> Shape(shuffles = 3, broadcasts = 4, joins = 4, smj = 0, cartesian = 0, bnlj = 0, scans = 5),
    "q138b_audio_index_build" -> Shape(shuffles = 0, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 0),
    // q139: video grain — same probe machinery, frame-aligned verify
    "q139_video_index_probe" -> Shape(shuffles = 3, broadcasts = 4, joins = 4, smj = 0, cartesian = 0, bnlj = 0, scans = 5),
    "q139b_video_index_build" -> Shape(shuffles = 0, broadcasts = 0, joins = 0, smj = 0, cartesian = 0, bnlj = 0, scans = 0),
    // q129 (r14): BM25 — two corpus-keyed exchanges ((doc, term) tf +
    // doc-length counts off the persisted token frame); df/stats/query
    // terms collapse term-granular and ride the 3-row broadcast, so
    // scoring touches only matching tf rows; top-10 is TakeOrdered
    "q129_bm25" -> Shape(shuffles = 2, broadcasts = 3, joins = 3, smj = 0, cartesian = 0, bnlj = 1, scans = 4),
    // q121 (r14): semantic decontamination — deny slice broadcast into
    // the corpus crossJoin (the ONE BNLJ), per-vector max collapsed in
    // the partial aggregate (the expanded row×deny stream never crosses
    // an exchange), then the 3-row slice rollup + sort
    "q121_sem_decontaminate" -> Shape(shuffles = 3, broadcasts = 1, joins = 1, smj = 0, cartesian = 0, bnlj = 1, scans = 3),
    // q116 (r14): both PQ fit chains (each behind its persisted corpus)
    // + two broadcast encode passes + two one-row micro-unit aggregates
    // + the union, in one lazy plan
    "q116_pq_resid_audit" -> Shape(shuffles = 10, broadcasts = 6, joins = 6, smj = 0, cartesian = 0, bnlj = 6, scans = 8),
  )
}
