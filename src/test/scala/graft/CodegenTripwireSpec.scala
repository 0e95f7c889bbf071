package graft

import org.apache.spark.sql.graft.CodegenAudit

/** The always-on tripwire for the round-15 Janino 64 KB silent-
  * interpretation trap: every expression-stacking registered query runs
  * at sf0.001 and EVERY whole-stage codegen stage of its final plan
  * must compile with its largest generated method below the
  * hugeMethodLimit cliff — the audit that would have flagged ml4i RED
  * (its pre-fix plan failed whole-stage compilation outright and ran
  * interpreted at ~15×) before a bench ever saw it. */
class CodegenTripwireSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The queries that stack custom codegen expressions (the recurrence
    * ladder, conv fronts, tower fusion, native signal kernels) plus the
    * widest built-in expression pipelines — the population at risk of
    * the per-method blowup. */
  private val atRisk = Seq(
    "ml3_cnn_forward", "ml4_lstm_forward", "ml4b_lstm_stack",
    "ml4c_lstm_attn", "ml4d_lstm_bidir", "ml4e_lstm_fusion",
    "ml4f_conv_pipe", "ml4g_conv3d_pipe", "ml4h_multiclass",
    "ml4i_tower_fusion", "ml5_ensemble", "ml8_rf", "ml10_spec_cnn",
    "viz1_dataviz_series", "p12_epoch_features", "c5n_native_mag",
    // the round-16 CodegenSweep catches: t1's lang-id tree sat 1.4 KB
    // under the cliff and pipe3's Project was OVER it (silently
    // interpreted); all three now ride the native LangIdExpr and this
    // gate keeps them down
    "t1_langid", "pipe1_corpus_pipeline", "pipe3_incremental_refresh")

  test("no expression-stacked query's whole-stage codegen falls off the 64 KB cliff") {
    val hugeLimit = spark.conf
      .get("spark.sql.codegen.hugeMethodLimit", "65535").toInt
    val missing = atRisk.filterNot(Queries.all.contains)
    assert(missing.isEmpty, s"unknown query names in the tripwire list: $missing")
    atRisk.foreach { name =>
      val df = Queries.all(name)(spark, sf)
      val reports = CodegenAudit.audit(df)
      assert(reports.nonEmpty,
        s"$name: no whole-stage codegen stage at all — the hot path is interpreted")
      reports.foreach { r =>
        assert(r.error.isEmpty,
          s"$name stage ${r.stage}: whole-stage compile FAILED (silent " +
            s"interpreted fallback at runtime): ${r.error.getOrElse("")}")
        assert(r.maxMethodCodeSize <= hugeLimit,
          s"$name stage ${r.stage}: max generated method " +
            s"${r.maxMethodCodeSize} bytes exceeds hugeMethodLimit " +
            s"$hugeLimit — Spark will silently interpret this stage")
      }
      val worst = reports.maxBy(_.maxMethodCodeSize)
      info(f"$name%-22s stages=${reports.size}%2d " +
        f"worst=${worst.maxMethodCodeSize}%6d B (${worst.stage})")
    }
  }
}
