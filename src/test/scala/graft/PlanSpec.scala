package graft

import graft.queries.{DomainQueries, LakeQueries, RelationalQueries, SpectralQueries}

/** Physical-plan audits: the 100 TB story depends on WHICH plan Catalyst
  * picks, not just on results matching. These pin the load-bearing plan
  * properties so a refactor that silently de-optimizes (loses a
  * pushdown, drops a broadcast, forces a global sort) fails CI.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("point lookup pushes the id predicate into the parquet scan (F2)") {
    val p = plan(RelationalQueries.f2PointLookup(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(event_id), EqualTo(event_id,4242)]"),
      s"missing pushed filter in:\n${p.take(2000)}")
  }

  test("scans prune columns: q1 reads only the 4 needed lineitem columns") {
    val p = plan(Queries.q1Agg(spark, sf))
    val readSchema = "ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_returnflag:string,l_linestatus:string>"
    assert(p.contains(readSchema), s"column pruning lost in:\n${p.take(2000)}")
  }

  test("q1 aggregates partially map-side (two HashAggregate stages)") {
    val p = plan(Queries.q1Agg(spark, sf))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("dimension join broadcasts the small side (J1)") {
    val p = plan(RelationalQueries.j1BroadcastDim(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("semi join stays a broadcast LeftSemi — no payload shuffle (J3)") {
    val p = plan(RelationalQueries.j3SemiJoin(spark, sf))
    assert(p.contains("LeftSemi"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("order-by-limit is TakeOrderedAndProject, not a global sort (O2)") {
    val p = plan(RelationalQueries.o2TopK(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Sort ["), s"global sort crept in:\n${p.take(2000)}")
  }

  test("keep-max dedup is ONE shuffle: gaps-and-islands and the pick window share it (W4)") {
    // lag/running-sum partition by (ub, type_str); the ranking window
    // adds cid, which HashPartitioning(ub, type_str) already satisfies
    // (subset rule) — a second Exchange here would double the shuffle
    // cost of every curation merge at scale.
    val p = plan(DomainQueries.w4MergeDedup(spark, sf))
    val n = "Exchange".r.findAllIn(p).size
    assert(n == 1, s"expected exactly 1 Exchange, found $n:\n${p.take(3000)}")
  }

  test("lake upsert shuffles once on the merge key (S6)") {
    import org.apache.spark.sql.functions._
    val a = spark.range(10).select(col("id"), lit("a").as("tag"))
    val b = spark.range(5).select(col("id"), lit("b").as("tag"))
    val p = plan(graft.sources.OsdbJson.upsertEvents(a, b, "id"))
    val n = "Exchange".r.findAllIn(p).size
    assert(n == 1, s"expected exactly 1 Exchange, found $n:\n${p.take(3000)}")
  }

  /** Counts of (hash, roundrobin) exchanges plus a position pin for the
    * r19 fixture spread: the ONE allowed RoundRobinPartitioning exchange
    * is OsdbFixture's narrow-row repartition and must sit BELOW any
    * grouping exchange (deeper in the tree = later in the plan string),
    * i.e. it shuffles the ~150 B pre-array fixture rows, never a
    * post-grouping / post-array payload. */
  private def exchangeShape(p: String): (Int, Int) = {
    val hash = "Exchange hashpartitioning".r.findAllIn(p).size
    val rr = "Exchange RoundRobinPartitioning".r.findAllIn(p).size
    val total = "Exchange".r.findAllIn(p).size
    assert(total == hash + rr,
      s"unexpected Exchange kind (not hash/roundrobin) in:\n${p.take(3000)}")
    if (hash > 0 && rr > 0)
      assert(p.indexOf("Exchange hashpartitioning") <
             p.indexOf("Exchange RoundRobinPartitioning"),
        s"fixture spread exchange is ABOVE the grouping exchange — " +
          s"it would shuffle the grouped payload:\n${p.take(3000)}")
    (hash, rr)
  }

  test("per-event domain ops are one grouping shuffle (W8 buffer)") {
    // dp2vectors = groupByKey(eventId).flatMapGroups: one hash exchange
    // on the event key, plus the fixture's narrow-row round-robin spread
    // below it (r19: every driver table is a single-split parquet file).
    val p = plan(DomainQueries.w8NnBuffer(spark, sf))
    assert(exchangeShape(p) == ((1, 1)),
      s"expected 1 hash + 1 roundrobin Exchange, got ${exchangeShape(p)}:\n${p.take(3000)}")
  }

  test("band-power over tone datapoints has no grouping shuffle (P4)") {
    // the per-datapoint DFT is embarrassingly parallel — a hash Exchange
    // here would mean the fixture or the kernel accidentally grouped.
    // The single round-robin exchange is the fixture's narrow-row spread
    // before the compute-amplifying tone generation (r19).
    val p = plan(SpectralQueries.p4BandPower(spark, sf))
    assert(exchangeShape(p) == ((0, 1)),
      s"expected 0 hash + 1 roundrobin Exchange, got ${exchangeShape(p)}:\n${p.take(3000)}")
  }

  test("epoch feature extraction is one grouping shuffle (P12/W5)") {
    // groupByKey(eventId).flatMapGroups over map-side fixture generation:
    // exactly one hash exchange on the event key (like the W8 buffer) +
    // the fixture's narrow-row round-robin spread below it (r19).
    val p = plan(SpectralQueries.p12EpochFeatures(spark, sf))
    assert(exchangeShape(p) == ((1, 1)),
      s"expected 1 hash + 1 roundrobin Exchange, got ${exchangeShape(p)}:\n${p.take(3000)}")
  }

  test("saltedJoin shuffles on (key, __salt): hot keys spread across partitions (SK1)") {
    // AQE splits partitions, not keys — one hot key always hashes to one
    // partition unless the salt is IN the partitioning expression. Pin
    // that the exchange carries both.
    val p = plan(graft.queries.TextQueries.sk1SaltedJoin(spark, sf))
    assert("hashpartitioning\\(hk#\\d+L?, __salt#\\d+L?".r.findFirstIn(p).isDefined,
      s"no (hk, __salt) exchange in:\n${p.take(3000)}")
  }

  test("pipe1 dedup window takes top-1 map-side before the exchange (WindowGroupLimit Partial)") {
    // at 100 TB the dedup window's shuffle carries only the per-partition
    // winner of each fingerprint group, not every duplicate: Spark plans
    // row_number()=1 as WindowGroupLimit Partial (before the exchange) +
    // Final (after). Losing the Partial stage would shuffle the full
    // corpus text through the fingerprint exchange.
    val p = plan(graft.queries.TextQueries.pipe1CorpusPipeline(spark, sf))
    val n = "WindowGroupLimit".r.findAllIn(p).size
    assert(n == 2, s"expected Partial+Final WindowGroupLimit, found $n:\n${p.take(3000)}")
    assert(p.contains("Partial"), s"no map-side group limit in:\n${p.take(3000)}")
  }

  test("lake1: category-partitioned lake read prunes to one directory (S6 layout)") {
    // the normalized lake is partitionBy(category); a category-filtered
    // read must hit the partition index, not scan+filter — at 100 TB this
    // is the difference between reading one directory and reading all.
    // Pin the EXACT read DataFrame the declared lake1 entry executes.
    val dir = graft.queries.LakeQueries.lake1Write(spark, sf)
    val p = plan(graft.queries.LakeQueries.lake1Read(spark, dir))
    // loose match on purpose: the exact explain rendering (filter
    // order, isnotnull inclusion) varies across Spark versions — the
    // invariant is a non-empty PartitionFilters naming the category
    val pf = "PartitionFilters: \\[[^\\]]+\\]".r.findFirstIn(p)
    assert(pf.exists(f => f.contains("category") && f.contains("purchase")),
      s"no category=purchase partition pruning in:\n${p.take(2000)}")
  }

  test("lake2: bucketed fact-dim join runs with NO exchange on either input") {
    // both tables are written bucketed by user_id into 16 buckets; the
    // sort-merge join must consume the bucket layout directly — an
    // Exchange on user_id means the write-time shuffle is being paid
    // AGAIN at read time and the layout is dead weight.
    val (evT, dimT) = LakeQueries.lake2Write(spark, sf)
    val p = plan(LakeQueries.lake2Read(spark, evT, dimT))
    assert("Bucketed: true".r.findAllIn(p).size == 2,
      s"expected both scans bucketed in:\n${p.take(3000)}")
    assert(p.contains("SortMergeJoin"),
      s"bucketed join did not plan as SMJ:\n${p.take(3000)}")
    assert(!"Exchange hashpartitioning\\(user_id".r.findFirstIn(p).isDefined,
      s"join key re-shuffled despite bucketing:\n${p.take(3000)}")
    assert(!p.contains("BroadcastExchange"),
      s"merge hint lost, dim broadcast crept back:\n${p.take(3000)}")
  }

  test("e4 IVF scores bucket-locally: map-side top-k, no pair-keyed join") {
    // the rewrite that survives 100x: candidate pairs explode INSIDE the
    // list join's tasks and the only post-join exchange is the top-k
    // window, planned as WindowGroupLimit Partial (k rows per query per
    // task) + Final. A SortMergeJoin on id/nid would mean pair rows are
    // being shuffled again — the shape that filled local disk at 100x.
    val p = plan(graft.queries.TextQueries.e4IvfKnn(spark, sf))
    assert("WindowGroupLimit".r.findAllIn(p).size == 2,
      s"expected Partial+Final WindowGroupLimit in:\n${p.take(3000)}")
    assert(p.contains("Partial"), s"no map-side top-k in:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin"),
      s"pair-keyed shuffle join crept back into IVF:\n${p.take(3000)}")
  }

  test("e9 IVF-PQ keeps e4's plan shape with code-sized list entries") {
    // same bucket-local probe join + map-side top-k as e4; the entries
    // arrays must pack codes, never the raw vector column, so the
    // shuffled list payload is code-sized (the compression IS the point)
    val p = plan(graft.queries.TextQueries.e9IvfPq(spark, sf))
    assert("WindowGroupLimit".r.findAllIn(p).size == 2,
      s"expected Partial+Final WindowGroupLimit in:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin"),
      s"pair-keyed shuffle join crept into IVF-PQ:\n${p.take(3000)}")
    val entriesAgg = p.linesIterator.find(_.contains("collect_list"))
    assert(entriesAgg.exists(l => l.contains("codes") && !l.contains("struct(id, v")),
      s"list entries must pack codes, not vectors: ${entriesAgg.getOrElse("<missing>")}")
  }

  test("bloom1 probes the Bloom filter on the fact side before the semi join") {
    // the constant-Bloom might_contain must survive optimization as a
    // Filter over the lineitem scan (inside whole-stage codegen, before
    // the join's exchange) and the join must be LeftSemi — if either
    // disappears, the prefilter is dead weight and the full fact table
    // rides the shuffle again.
    val p = plan(graft.queries.RelationalQueries.bloom1SemiFilter(spark, sf))
    assert(p.contains("might_contain"),
      s"bloom probe missing from the plan:\n${p.take(3000)}")
    assert(p.contains("LeftSemi"), s"no semi join in:\n${p.take(3000)}")
  }

  test("t6 vocab top-k: partial agg before the exchange, TakeOrdered not global sort") {
    // the explode multiplies rows by tokens/doc; the shuffle must carry
    // per-partition (token, partial_count), and the top-100 must be
    // per-partition heaps + driver merge, never a range-partitioned sort.
    val p = plan(graft.queries.TextQueries.t6VocabTopk(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k planned as a global sort:\n${p.take(3000)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"no partial aggregation before the exchange:\n${p.take(3000)}")
    assert(!p.contains("rangepartitioning"),
      s"global sort exchange crept in:\n${p.take(3000)}")
  }

  test("bloom2 short-circuits: union of a join-free NOT-probe branch and a LeftAnti sliver") {
    // rows failing the Bloom probe are provably new and must reach the
    // output WITHOUT a join (a Union branch that is just scan+filter);
    // only the might-contain sliver goes through LeftAnti. One join in
    // the whole plan — two would mean the short-circuit collapsed.
    // (Catalyst pushes the probe filter through the batch's own union,
    // so each branch may split into one leg per union input — assert the
    // SHAPE, not an exact join count.)
    val p = plan(graft.queries.TextQueries.bloom2AntiIngest(spark, sf))
    assert(p.contains("Union"), s"short-circuit union missing:\n${p.take(3000)}")
    assert(p.contains("LeftAnti"), s"exact anti join missing:\n${p.take(3000)}")
    assert(p.contains("NOT might_contain"),
      s"join-free provably-new branch missing:\n${p.take(3000)}")
    assert(!p.contains("LeftSemi"), s"unexpected semi join:\n${p.take(3000)}")
  }

  test("token packing has NO single-partition stage (PIPE2 prefix sum)") {
    // a global ORDER-BY window would plan Exchange SinglePartition — one
    // task owning the whole corpus. The two-pass prefix sum must keep
    // every stage partition-parallel (range exchange + hash agg only).
    val p = plan(graft.queries.TextQueries.pipe2TokenPacking(spark, sf))
    assert(!p.contains("SinglePartition"),
      s"single-partition stage crept into the packing plan:\n${p.take(3000)}")
  }

  test("events time-range filter pushes down to the parquet scan") {
    // events.ts is now parquet TIMESTAMP(MICROS); with inferTimestampNTZ
    // disabled the scan emits TimestampType directly (Tables.normalizeTs),
    // so time predicates land in PushedFilters and the scan prunes row
    // groups by min/max stats instead of decoding a decade of history.
    // (Under the retired TIMESTAMP(NANOS)-as-long rendition this was
    // impossible — the predicate sat above a reconstruction expression —
    // and this test pinned that limitation; the pin flips with the data.)
    val p = plan(RelationalQueries.f8TimeRange(spark, sf))
    assert(p.contains("GreaterThanOrEqual(ts") && p.contains("LessThan(ts"),
      s"time-range predicate did not reach PushedFilters:\n${p.take(3000)}")
  }

  test("pipe4 ships the mixture rates back as broadcasts — no corpus-keyed shuffle join") {
    // pass 1 reduces the corpus to per-source token totals; those few
    // rows must come BACK to pass 2's scan as a broadcast. A
    // SortMergeJoin on source here would shuffle every doc row to join
    // against a 20-row table.
    val p = plan(graft.queries.TextQueries.pipe4DomainMixture(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"mixture rates not broadcast:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-keyed shuffle join crept in:\n${p.take(3000)}")
  }

  test("shuf1 keeps the corpus shuffle partition-parallel (no SinglePartition)") {
    // the prefix-sum position assignment must never plan a global
    // single-partition stage (pipe2's invariant, inherited through
    // Pack.prefixSum). Join strategy is deliberately NOT pinned: both
    // join inputs are N-row at scale so size-based planning picks the
    // right join there, and pinning no-broadcast here would just fail
    // at fixture scale where broadcasting the small side is correct.
    val p = plan(graft.queries.TextQueries.shuf1DeterministicShuffle(spark, sf))
    assert(!p.contains("SinglePartition"),
      s"single-partition stage in the shuffle plan:\n${p.take(3000)}")
  }

  test("t8 BM25 stays join-free: windows over the tf table, scalars by 1-row broadcast") {
    // the docblock's claim: dl and df are window aggregates on the tf
    // table, NOT joins back onto it — a SortMergeJoin here would mean
    // the corpus-sized tf table shuffles an extra time per statistic.
    // The only join allowed is the 1-row scalar cross join (planned as
    // a BroadcastNestedLoopJoin, harmless at any scale: one row).
    val p = plan(graft.queries.TextQueries.t8Bm25(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"tf-table statistic became a shuffled join:\n${p.take(3000)}")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1,
      s"expected exactly the one scalar cross join:\n${p.take(3000)}")
  }

  test("decon1 broadcasts the eval shingle set — the train side never shuffles text") {
    // the decontamination contract at 100 TB: the eval corpus (small)
    // rides a broadcast to every train scan task; a SortMergeJoin here
    // would shuffle every train shingle instance — corpus-linear
    // exchange volume instead of contaminated-doc-bounded.
    val p = plan(graft.queries.TextQueries.decon1EvalOverlap(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"eval shingles not broadcast:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin"),
      s"train-side shingle shuffle crept in:\n${p.take(3000)}")
  }

  test("d7 span removal: equi-keyed throughout, winner min collapses map-side") {
    // every join in the span-removal plan is keyed (gram, then doc id) —
    // a CartesianProduct/BNLJ would mean occurrence pairing went
    // all-pairs; and the winner min(struct) must aggregate PARTIALLY so
    // repeated grams collapse before the exchange (two aggregate stages
    // around the gram shuffle), keeping the exchange distinct-gram-
    // bounded rather than occurrence-bounded.
    val p = plan(graft.operators.Dedup.duplicateSpanRemoval(
      graft.Tables.documents(spark, sf), "doc_id", "text", n = 20))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in span removal:\n${p.take(3000)}")
    assert("HashAggregate".r.findAllIn(p).size +
      "SortAggregate".r.findAllIn(p).size +
      "ObjectHashAggregate".r.findAllIn(p).size >= 4,
      s"winner/span aggregates lost their partial stage:\n${p.take(3000)}")
    // round-10: the gram exchanges must key on the 128-bit xxhash64
    // fingerprint (two flat longs), never the raw ~130-byte gram text
    assert(p.contains("xxhash64"),
      s"gram fingerprint projection missing from the plan:\n${p.take(3000)}")
  }

  test("pipe6 SemDeDup: the in-cluster pair join is cluster-keyed, never all-pairs") {
    // the whole point of clustering first is that candidate pairing is
    // an EQUI join on the cluster id — a BNLJ/Cartesian here is the
    // O(N²) all-pairs cosine SemDeDup exists to avoid.
    val p = plan(graft.queries.TextQueries.pipe6SemDedup(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in SemDeDup:\n${p.take(3000)}")
  }

  test("w12 EMA is exactly ONE exchange: the per-key fold shares the groupBy shuffle") {
    val p = plan(RelationalQueries.w12Ema(spark, sf))
    val n = "Exchange".r.findAllIn(p).size
    assert(n == 1, s"expected exactly 1 Exchange, found $n:\n${p.take(3000)}")
  }

  test("lm1 bigram LM: prefix counts broadcast; no cartesian beyond the 1-row scalar") {
    // the c1 prefix table must reach the scoring join as a broadcast
    // (vocab-bounded); the only nested-loop allowed is the single-row
    // (V) scalar crossJoin. A CartesianProduct anywhere is the
    // corpus x corpus disaster.
    val p = plan(graft.queries.TextQueries.lm1BigramScore(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"c1 broadcast lost:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n${p.take(3000)}")
  }

  test("g2 triangles: every join equi-keyed — degree orientation never BNLJs") {
    val p = plan(RelationalQueries.g2Triangles(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in triangle counting:\n${p.take(3000)}")
  }

  test("g1 PageRank: rank tables broadcast into every round's contribution join") {
    // three rounds -> >= 3 BroadcastHashJoins against the persisted edge
    // table; the 1-row node-count scalar is the only BNLJ allowed.
    val p = plan(RelationalQueries.g1PageRank(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"rank broadcast lost:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n${p.take(3000)}")
  }

  test("j9 full outer joins pre-aggregated sides, never raw events x events") {
    val p = plan(RelationalQueries.j9FullOuter(spark, sf))
    assert(p.contains("FullOuter"), s"full outer missing:\n${p.take(2000)}")
    // both inputs collapse per (user, day) BEFORE the join: partial+final
    // aggregates on each side = at least 4 HashAggregates below it
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"pre-aggregation lost:\n${p.take(3000)}")
  }

  test("e11 hard negatives: query set broadcasts, ONE pair shuffle, map-side top-k") {
    // the label-mismatch predicate is non-equi BY DESIGN — it must ride
    // a BroadcastNestedLoopJoin with the (small) query side as the
    // build. The pinned shape: exactly TWO non-broadcast Exchanges —
    // the r20 narrow-row spread of the BNLJ's stream side (round robin,
    // BELOW the join: pre-score bytes move, never the scored pairs) and
    // the rank window's qid partitioning — plus a WindowGroupLimit
    // BELOW the rank exchange so the |corpus|x|queries| pair stream
    // collapses to top-k-per-query on the map side before it moves.
    val p = plan(graft.queries.TextQueries.e11HardNegatives(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), s"broadcast NL lost:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian:\n${p.take(3000)}")
    val nEx = "Exchange".r.findAllIn(p).size -
      "BroadcastExchange".r.findAllIn(p).size
    assert(nEx == 2, s"expected 2 non-broadcast Exchanges, found $nEx:\n${p.take(3000)}")
    val rr = "Exchange RoundRobinPartitioning".r.findAllIn(p).size
    assert(rr == 1, s"expected 1 RoundRobin spread exchange, found $rr:\n${p.take(3000)}")
    // the spread must sit below the join (stream side), not above it —
    // a round robin ABOVE the BNLJ would shuffle scored pairs
    assert(p.indexOf("Exchange RoundRobinPartitioning") >
      p.indexOf("BroadcastNestedLoopJoin"),
      s"spread exchange not on the BNLJ stream side:\n${p.take(3000)}")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"map-side top-k (WindowGroupLimit below the exchange) lost:\n${p.take(3000)}")
  }

  test("lake7 ORC read prunes partitions: the category filter never scans other dirs") {
    val p = plan(graft.queries.LakeQueries.lake7Orc(spark, sf))
    assert(p.contains("PartitionFilters") && p.contains("category"),
      s"ORC partition pruning lost:\n${p.take(3000)}")
  }

  test("a19 histogram: the binning scan prunes to the value column alone") {
    val p = plan(RelationalQueries.a19Histogram(spark, sf))
    assert(p.contains("ReadSchema: struct<value:double>"),
      s"histogram scan reads more than `value`:\n${p.take(3000)}")
  }

  test("LPA rounds aggregate their winners — no per-node sort window in the plan") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val p = plan(graft.operators.Graph.labelPropagation(und, rounds = 3))
    // the round-10 argmax rewrite: winner selection must plan as hash
    // aggregates (map-side partials), never a Window (whose per-node
    // sort is the term that grows with graph size)
    assert(!p.contains("Window"),
      s"LPA winner selection regressed to a window:\n${p.take(3000)}")
    assert("HashAggregate".r.findAllIn(p).size +
      "ObjectHashAggregate".r.findAllIn(p).size >= 6,
      s"expected partial+final aggregates per round:\n${p.take(3000)}")
  }
}
