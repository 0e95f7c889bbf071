package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftExpressions

/** The native codegen expression tier (§7.3(b)): ArrayDot must match the
  * UDF kernel bit-for-bit, stay inside whole-stage codegen, and register
  * through both the runtime registry and SparkSessionExtensions. */
class GraftExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = {
    val rng = new scala.util.Random(11)
    (0 until 50).map(i =>
      (i.toLong, Seq.fill(64)(rng.nextGaussian()), Seq.fill(64)(rng.nextGaussian())))
  }

  test("array_dot matches the UDF kernel bit-for-bit (same fold order)") {
    val df = vecs.toDF("id", "a", "b")
    val rows = df.select(
      GraftExpressions.arrayDot(col("a"), col("b")).as("native"),
      graft.operators.Similarity.dotUdf(col("a"), col("b")).as("viaUdf"))
      .collect()
    rows.foreach { r =>
      // bit-identical, not approximately equal: both accumulate in index order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("array_dot compiles under codegen with fallback disabled") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // range-based input with array() construction: a literal Seq would
      // constant-fold into a LocalTableScan (interpreted eval), and
      // transform() HOFs are CodegenFallback and would evict the whole
      // stage from codegen — either way doGenCode would never run
      val aCols = array((0 until 64).map(j => (col("id") * j % 97).cast("double")): _*)
      val bCols = array((0 until 64).map(j => ((col("id") + j) % 89).cast("double")): _*)
      val df = spark.range(100).select(aCols.as("a"), bCols.as("b"))
        .select(GraftExpressions.arrayDot(col("a"), col("b")).as("d"))
      val total = df.agg(sum("d")).collect().head.getDouble(0)
      assert(!total.isNaN && total > 0)
      val codegenStages = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("array_dot") => w
      }
      assert(codegenStages.nonEmpty,
        df.queryExecution.executedPlan.toString.take(1500))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("array_dot: null inputs yield null; float arrays cast implicitly") {
    val df = Seq(
      (1L, Option(Seq(1.0, 2.0)), Option(Seq(3.0, 4.0))),
      (2L, None: Option[Seq[Double]], Option(Seq(3.0, 4.0))))
      .toDF("id", "a", "b")
    val out = df.select(col("id"), GraftExpressions.arrayDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) == Some(11.0) && out(2L).isEmpty)

    // array<float> embeddings cast through ImplicitCastInputTypes
    val fl = Seq((1L, Seq(1.0f, 2.0f), Seq(2.0f, 0.5f))).toDF("id", "a", "b")
    val d = fl.select(GraftExpressions.arrayDot(col("a"), col("b"))).collect().head.getDouble(0)
    assert(d == 3.0)
  }

  test("array_dot registers for SQL use (runtime + extensions)") {
    GraftExpressions.register(spark)
    val d = spark.sql("SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(d == 11.0)
    // the extensions injector exposes the same builder
    val ext = new graft.plans.GraftExtensions
    assert(ext.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }

  test("array_mag3d matches Signal.magnitude3D bit-for-bit in both modes") {
    val rng = new scala.util.Random(13)
    val rows = (0 until 30).map(i =>
      (i.toLong, Seq.fill(45)(rng.nextInt(2001) - 1000.0)))
    val df = rows.toDF("id", "xyz")
    for (mode <- Seq("V1", "V2")) {
      val native = df.select(col("id"),
          GraftExpressions.arrayMag3D(col("xyz"), mode).as("m"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      rows.foreach { case (id, xyz) =>
        val expect = graft.functions.Signal.magnitude3D(xyz.toArray, mode)
        val got = native(id)
        assert(got.length == expect.length)
        expect.indices.foreach(i =>
          assert(java.lang.Double.doubleToLongBits(got(i)) ==
            java.lang.Double.doubleToLongBits(expect(i)), s"$mode mismatch at $i"))
      }
    }
  }

  test("array_mag3d compiles under codegen with fallback disabled; SQL form works") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val xyz = array((0 until 45).map(j => ((col("id") + j) % 89).cast("double")): _*)
      val df = spark.range(50).select(xyz.as("xyz"))
        .select(GraftExpressions.arrayDot(
          GraftExpressions.arrayMag3D(col("xyz"), "V2"),
          GraftExpressions.arrayMag3D(col("xyz"), "V1")).as("d"))
      val total = df.agg(sum("d")).collect().head.getDouble(0)
      assert(!total.isNaN && total > 0)
      val codegenStages = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("array_mag3d") => w
      }
      assert(codegenStages.nonEmpty,
        df.queryExecution.executedPlan.toString.take(1500))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
    GraftExpressions.register(spark)
    val m = spark.sql("SELECT array_mag3d(array(3.0d, 4.0d, 0.0d)) AS m")
      .collect().head.getSeq[Double](0)
    assert(m == Seq(5.0))
    val m1 = spark.sql("SELECT array_mag3d(array(3.0d, -4.0d, 0.0d), 'V1') AS m")
      .collect().head.getSeq[Double](0)
    assert(m1 == Seq(7.0))
  }

  test("GraftFunctions.registerAll exposes the signal library to SQL") {
    graft.functions.GraftFunctions.registerAll(spark)
    val sine = Array.tabulate(125)(i =>
      100.0 * math.sin(2 * math.Pi * 5 * i / 25.0))
    val lit125 = sine.mkString("array(", "d,", "d)")
    val r = spark.sql(
      s"""SELECT osd_spec_power($lit125) AS sp, osd_roi_power($lit125) AS rp,
         |  osd_mean_line_length($lit125) AS mll,
         |  osd_std_pct(array(1000.0d, 1000.0d, 1000.0d)) AS pct,
         |  size(osd_magnitude3d(array(3.0d, 4.0d, 0.0d), 'V2')) AS nmag,
         |  array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot
         |""".stripMargin).collect().head
    assert(math.abs(r.getAs[Double]("sp") - graft.functions.Signal.specPower(sine)) < 1e-9)
    assert(math.abs(r.getAs[Double]("rp") - graft.functions.Signal.roiPower(sine)) < 1e-9)
    assert(r.getAs[Double]("mll") > 0)
    assert(r.getAs[Double]("pct") == 0.0) // constant signal
    assert(r.getAs[Int]("nmag") == 1)
    assert(r.getAs[Double]("dot") == 11.0)
  }

  test("Similarity.cosine (native path) agrees with plain-scala cosine") {
    val a = Array(1.0, 2.0, 3.0); val b = Array(-1.0, 0.5, 2.0)
    val expected = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val got = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(graft.operators.Similarity.cosine(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(math.abs(got - expected) < 1e-15)
  }

  test("lstm_hard_logit compiles under codegen with fallback disabled") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rnd = new scala.util.Random(9)
      val h = 3
      val m = graft.ml.Lstm.LstmModel(h, 24,
        wx = Array.fill(4 * h)(rnd.nextGaussian() * 0.5),
        wh = Array.fill(4 * h * h)(rnd.nextGaussian() * 0.3),
        b = Array.fill(4 * h)(rnd.nextGaussian() * 0.2),
        dense = Array.fill(h)(rnd.nextGaussian()),
        bias = 0.1, mean = 12.0, std = 9.0)
      // range-based window construction keeps the input out of
      // LocalTableScan so doGenCode must run
      val winCol = array((0 until 24).map(j =>
        ((col("id") * 5 + j) % 29).cast("double")): _*)
      val df = spark.range(40).select(col("id"), winCol.as("w"))
        .select(col("id"), graft.ml.Lstm.logitCol(m, col("w")).as("z"))
      val rows = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val codegenStages = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("lstm_hard_logit") => w
      }
      assert(codegenStages.nonEmpty,
        df.queryExecution.executedPlan.toString.take(1500))
      // codegen path == JVM loop bit-for-bit
      (0 until 40).foreach { i =>
        val win = Array.tabulate(24)(j => ((i * 5 + j) % 29).toDouble)
        assert(java.lang.Double.doubleToLongBits(rows(i.toLong)) ==
          java.lang.Double.doubleToLongBits(graft.ml.Lstm.forward(m, win)))
      }
      // empty window: NULL under codegen too
      val nul = spark.range(1)
        .select(array().cast("array<double>").as("w"))
        .select(graft.ml.Lstm.logitCol(m, col("w")))
        .collect().head
      assert(nul.isNullAt(0))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("conv1d_maxpool_logit compiles under codegen with fallback disabled") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rnd = new scala.util.Random(3)
      val m = graft.ml.Cnn.CnnModel(3, 5, 32,
        filters = Array.fill(15)(rnd.nextGaussian()),
        filterBias = Array.fill(3)(rnd.nextGaussian() * 0.1),
        dense = Array.fill(3)(rnd.nextGaussian()),
        bias = 0.2, mean = 10.0, std = 4.0)
      // range-based window construction, same rationale as array_dot:
      // keep the input out of LocalTableScan so doGenCode must run
      val winCol = array((0 until 32).map(j =>
        ((col("id") * 7 + j) % 37).cast("double")): _*)
      val df = spark.range(50).select(col("id"), winCol.as("w"))
        .select(col("id"), graft.ml.Cnn.logitCol(m, col("w")).as("z"))
      val rows = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val codegenStages = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("conv1d_maxpool_logit") => w
      }
      assert(codegenStages.nonEmpty,
        df.queryExecution.executedPlan.toString.take(1500))
      // codegen path == JVM loop bit-for-bit
      (0 until 50).foreach { i =>
        val win = Array.tabulate(32)(j => ((i * 7 + j) % 37).toDouble)
        assert(java.lang.Double.doubleToLongBits(rows(i.toLong)) ==
          java.lang.Double.doubleToLongBits(graft.ml.Cnn.forward(m, win)))
      }
      // short window: NULL under codegen too
      val nul = spark.range(1)
        .select(array(lit(1.0), lit(2.0)).as("w"))
        .select(graft.ml.Cnn.logitCol(m, col("w")))
        .collect().head
      assert(nul.isNullAt(0))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("conv_front_seq nested in bidir+mha lstm_stack_logit compiles under codegen with fallback disabled") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rnd = new scala.util.Random(97)
      val front = graft.ml.ConvFront.ConvFrontModel(24,
        blocks = Seq(
          graft.ml.ConvFront.ConvBlock(1, 2, 3,
            w = Array.fill(6)(rnd.nextGaussian() * 0.5),
            b = Array.fill(2)(rnd.nextGaussian() * 0.1),
            scale = Array.fill(2)(1.0 + rnd.nextGaussian() * 0.1),
            shift = Array.fill(2)(rnd.nextGaussian() * 0.1)),
          graft.ml.ConvFront.ConvBlock(2, 2, 3,
            w = Array.fill(12)(rnd.nextGaussian() * 0.5),
            b = Array.fill(2)(rnd.nextGaussian() * 0.1),
            scale = Array.fill(2)(1.0 + rnd.nextGaussian() * 0.1),
            shift = Array.fill(2)(rnd.nextGaussian() * 0.1))),
        mix = Array.fill(2)(rnd.nextGaussian()),
        mixBias = 0.1, mean = 14.0, std = 8.0)
      val h1 = 2; val h2 = 2; val nH = 2
      val stack = graft.ml.LstmStack.Lstm2Model(h1, h2, front.outLen,
        wx1 = Array.fill(4 * h1)(rnd.nextGaussian() * 0.5),
        wh1 = Array.fill(4 * h1 * h1)(rnd.nextGaussian() * 0.3),
        b1 = Array.fill(4 * h1)(rnd.nextGaussian() * 0.2),
        wx2 = Array.fill(4 * h2 * 2 * h1)(rnd.nextGaussian() * 0.5),
        wh2 = Array.fill(4 * h2 * h2)(rnd.nextGaussian() * 0.3),
        b2 = Array.fill(4 * h2)(rnd.nextGaussian() * 0.2),
        dense = Array.fill(h2)(rnd.nextGaussian()),
        bias = 0.1, mean = 0.0, std = 1.0,
        head = "mha", bidir = true,
        wx1b = Array.fill(4 * h1)(rnd.nextGaussian() * 0.5),
        wh1b = Array.fill(4 * h1 * h1)(rnd.nextGaussian() * 0.3),
        b1b = Array.fill(4 * h1)(rnd.nextGaussian() * 0.2),
        nHeads = nH,
        attA = Array.fill(nH * h2)(rnd.nextGaussian() * 0.5),
        attCs = Array.fill(nH)(rnd.nextGaussian() * 0.3),
        attD = Array.fill(nH * h2)(rnd.nextGaussian()))
      val m = graft.ml.ConvPipe.ConvPipeModel(front, stack)
      // range-based window so doGenCode must run (no LocalTableScan)
      val winCol = array((0 until 24).map(j =>
        ((col("id") * 7 + j) % 31).cast("double")): _*)
      val df = spark.range(30).select(col("id"), winCol.as("w"))
        .select(col("id"),
          graft.ml.ConvPipe.logitCol(m, col("w")).as("z"))
      val rows = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val codegenStages = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("lstm_stack_logit") &&
            w.toString.contains("conv_front_seq") => w
      }
      assert(codegenStages.nonEmpty,
        df.queryExecution.executedPlan.toString.take(1500))
      (0 until 30).foreach { i =>
        val win = Array.tabulate(24)(j => ((i * 7 + j) % 31).toDouble)
        assert(java.lang.Double.doubleToLongBits(rows(i.toLong)) ==
          java.lang.Double.doubleToLongBits(graft.ml.ConvPipe.forward(m, win)),
          s"row $i")
      }
      // degenerate inputs stay NULL under codegen
      val nul = spark.range(1)
        .select(array((0 until 6).map(_ => lit(1.0)): _*)
          .cast("array<double>").as("w"))
        .select(graft.ml.ConvFront.seqCol(front, col("w")))
        .collect().head
      assert(nul.isNullAt(0))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("3-channel conv_front_seq and K-class lstm_stack_logit compile under codegen with fallback disabled") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rnd = new scala.util.Random(83)
      // multi-channel front: 3 interleaved channels, per-channel T=16
      val front = graft.ml.ConvFront.ConvFrontModel(16,
        blocks = Seq(graft.ml.ConvFront.ConvBlock(3, 2, 3,
          w = Array.fill(18)(rnd.nextGaussian() * 0.4),
          b = Array.fill(2)(rnd.nextGaussian() * 0.1),
          scale = Array.fill(2)(1.0 + rnd.nextGaussian() * 0.1),
          shift = Array.fill(2)(rnd.nextGaussian() * 0.1))),
        mix = Array.fill(2)(rnd.nextGaussian()),
        mixBias = 0.1, mean = 3.0, std = 5.0)
      val winCol = array((0 until 48).map(j =>
        ((col("id") * 7 + j) % 31).cast("double")): _*)
      val df = spark.range(20).select(col("id"), winCol.as("w"))
        .select(col("id"),
          graft.ml.ConvFront.seqCol(front, col("w")).as("seq"))
      val rows = df.collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val stages = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("conv_front_seq") => w
      }
      assert(stages.nonEmpty)
      (0 until 20).foreach { i =>
        val win = Array.tabulate(48)(j => ((i * 7 + j) % 31).toDouble)
        assert(rows(i.toLong) ==
          graft.ml.ConvFront.forward(front, win).toSeq, s"row $i")
      }
      // a non-multiple-of-cIn0 input is NULL under codegen too
      assert(spark.range(1)
        .select(array((0 until 47).map(j => lit(j.toDouble)): _*).as("w"))
        .select(graft.ml.ConvFront.seqCol(front, col("w")))
        .collect().head.isNullAt(0))

      // K-class stacked readout under codegen
      val h1 = 2; val h2 = 2
      val m = graft.ml.LstmStack.Lstm2Model(h1, h2, 16,
        wx1 = Array.fill(4 * h1)(rnd.nextGaussian() * 0.5),
        wh1 = Array.fill(4 * h1 * h1)(rnd.nextGaussian() * 0.3),
        b1 = Array.fill(4 * h1)(rnd.nextGaussian() * 0.2),
        wx2 = Array.fill(4 * h2 * h1)(rnd.nextGaussian() * 0.5),
        wh2 = Array.fill(4 * h2 * h2)(rnd.nextGaussian() * 0.3),
        b2 = Array.fill(4 * h2)(rnd.nextGaussian() * 0.2),
        dense = Array.fill(h2)(rnd.nextGaussian()),
        bias = 0.1, mean = 2.0, std = 4.0)
      val kh = graft.ml.LstmStack.KHead(3,
        denseK = Array.fill(3 * h2)(rnd.nextGaussian()),
        biasK = Array.fill(3)(rnd.nextGaussian() * 0.2))
      val winCol2 = array((0 until 16).map(j =>
        ((col("id") * 5 + j) % 23).cast("double")): _*)
      val dfk = spark.range(20).select(col("id"), winCol2.as("w"))
        .select(col("id"),
          graft.ml.LstmStack.logitsKCol(m, kh, col("w")).as("lk"))
      val rowsK = dfk.collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val stagesK = dfk.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("lstm_stack_logit") => w
      }
      assert(stagesK.nonEmpty)
      (0 until 20).foreach { i =>
        val win = Array.tabulate(16)(j => ((i * 5 + j) % 23).toDouble)
        assert(rowsK(i.toLong) ==
          graft.ml.LstmStack.forwardK(m, kh, win).toSeq, s"row $i")
      }
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("spec_cnn2d_logit: INTERPRETED eval == JVM forward bit-for-bit; wrong shape null") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val rnd = new scala.util.Random(29)
    val layers = Array(
      graft.ml.SpecCnn.Layer(1, 2,
        Array.fill(18)(rnd.nextGaussian()), Array.fill(2)(rnd.nextGaussian())),
      graft.ml.SpecCnn.Layer(2, 3,
        Array.fill(54)(rnd.nextGaussian()), Array.fill(3)(rnd.nextGaussian())))
    val m = graft.ml.SpecCnn.SpecCnnModel(5, 6, layers,
      Array.fill(3 * 2 * 2)(rnd.nextGaussian()), rnd.nextGaussian(),
      mean = 0.11, std = 1.3)
    def exprOf(img: Array[Double]) =
      org.apache.spark.sql.graft.SpecCnn2dLogit(
        Literal.create(img.toSeq, ArrayType(DoubleType)), 5, 6,
        m.layers.map(l => (l.cIn, l.cOut)).toSeq,
        m.layers.map(_.w.toSeq).toSeq, m.layers.map(_.b.toSeq).toSeq,
        m.dense.toSeq, m.bias, m.mean, m.std)
    (0 until 15).foreach { i =>
      val img = Array.fill(30)(rnd.nextGaussian() * 3)
      val got = exprOf(img).eval(null)
      assert(got != null, s"trial $i: null for a well-shaped image")
      assert(java.lang.Double.doubleToLongBits(got.asInstanceOf[Double]) ==
        java.lang.Double.doubleToLongBits(graft.ml.SpecCnn.forward(m, img)),
        s"trial $i: interpreted eval diverges from forward")
    }
    assert(exprOf(Array.fill(29)(1.0)).eval(null) == null)
  }

  test("lang_id: native expression == the original column composition; null/tie/zh edges") {
    import graft.operators.TextAnalysis
    // the ORIGINAL greatest+when composition, restated inline as the
    // independent truth side (the form the native expression replaced)
    def langIdColumnForm(text: org.apache.spark.sql.Column) = {
      val scores = TextAnalysis.LangProfiles.map { case (l, p) =>
        (l, TextAnalysis.langScore(text, p)) }
      val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
      scores.foldRight(lit("und")) { case ((l, s), acc) =>
        when(s === best && s > 0, lit(l)).otherwise(acc)
      }
    }
    val rows = Seq(
      "The cat and the dog, that is the point of it all",
      "el que la casa y de la madre",
      "le chat et les chiens des villes",
      "der Hund und die Katze ist nicht da",
      "这是不在的了",
      // TIE case: ' la ' is in BOTH the es and fr profiles (and no
      // other), so es and fr genuinely tie and the cross-language
      // tiebreak (strict > vs the foldRight pick order → first
      // declared, es) is what's exercised
      " la la ",
      "no stopwords here whatsoever xyz",
      "",
      null)
    val df = rows.toDF("text")
    val both = df.select(
        TextAnalysis.langId(col("text")).as("native"),
        langIdColumnForm(col("text")).as("column"))
      .collect()
    both.zip(rows).foreach { case (r, t) =>
      assert(r.getString(0) == r.getString(1),
        s"'$t': native ${r.getString(0)} != column ${r.getString(1)}")
    }
    // the es/fr tie resolves to the FIRST declared language in both
    // forms (native first-strict-max == foldRight pick order)
    assert(both(5).getString(0) == "es" && both(5).getString(1) == "es")
    // null text: BOTH forms yield "und" (the when-chain null-propagates
    // to the otherwise; the native expression handles null itself)
    val nulls = both.last
    assert(nulls.getString(0) == "und" && nulls.getString(1) == "und")
  }

  test("fusion_dense_logit: INTERPRETED eval == independent restatement; wrong dim raises") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val rnd = new scala.util.Random(31)
    val dims = Seq(3, 2, 4)
    val d = dims.sum
    val h = 3
    val fuse = Array.fill(d * d)(rnd.nextGaussian() * 0.2)
    val w1 = Array.fill(h * d)(rnd.nextGaussian())
    val b1 = Array.fill(h)(rnd.nextGaussian() * 0.1)
    val w2 = Array.fill(h)(rnd.nextGaussian())
    val b2 = rnd.nextGaussian()
    // independent restatement of the documented accumulation order
    def expected(v: Array[Double]): Double = {
      val fused = Array.tabulate(d)(j =>
        (0 until d).foldLeft(v(j))((a, i) => a + fuse(j * d + i) * v(i)))
      (0 until h).foldLeft(b2) { (z, r) =>
        val hr = (0 until d).foldLeft(b1(r))((a, j) => a + w1(r * d + j) * fused(j))
        z + w2(r) * (if (hr > 0.0) hr else 0.0)
      }
    }
    def exprOf(towers: Seq[Array[Double]]) =
      org.apache.spark.sql.graft.FusionDenseLogit(
        towers.map(t => Literal.create(t.toSeq, ArrayType(DoubleType))),
        dims, fuse.toSeq, w1.toSeq, b1.toSeq, w2.toSeq, b2)
    (0 until 15).foreach { i =>
      val towers = dims.map(n => Array.fill(n)(rnd.nextGaussian()))
      val got = exprOf(towers).eval(null)
      assert(got != null, s"trial $i")
      assert(java.lang.Double.doubleToLongBits(got.asInstanceOf[Double]) ==
        java.lang.Double.doubleToLongBits(expected(towers.flatten.toArray)),
        s"trial $i: interpreted eval diverges from the restatement")
    }
    // a wrong-length tower child is a CONSTRUCTION bug (dims and the
    // tower children derive from one model object) — it raises rather
    // than silently nulling every logit
    intercept[IllegalStateException] {
      exprOf(Seq(Array.fill(3)(1.0), Array.fill(1)(1.0),
        Array.fill(4)(1.0))).eval(null)
    }
  }
}
