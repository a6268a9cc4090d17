package graft

import graft.kernels.DeepModels.{ClassifierFit, DeepFit}
import graft.kernels.NeuralNet._

/** DuckDB oracles for the neural tier (DEC / IDEC / contrastive
  * clustering, ResNet / InceptionTime classification, vision embeddings).
  *
  * Unlike the pinned elastic-clustering oracles — which replay only the
  * final assignment — these replay the ENTIRE eval-mode forward pass:
  * the trained weights are inlined as `%.17e` literals and each layer of
  * the [[graft.kernels.NeuralNet.NOp]] spec becomes one CTE over
  * `DOUBLE[]` feature-map columns (one column per channel). Because the
  * Scala interpreter (`NeuralNet.evalForward`) and this generator share
  * an accumulation-order contract (conv taps summed (channel, tap)
  * ascending left-to-right, GAP as a 0-seeded left fold, linear as
  * bias-then-ascending, batchnorm as ((x − rm)/sqrt(rv + ε))·γ + β),
  * both engines produce bit-identical doubles, and the cluster/class
  * decision (argmin distance / argmax logit, first index on ties)
  * hash-matches without tolerance.
  */
object NeuralOracle {

  private def dlit(v: Double): String =
    if (v == Double.NegativeInfinity) "'-infinity'::DOUBLE"
    else "%.17e".format(v)

  /** Stateful CTE-chain builder; `cols` are the current tensor's channel
    * columns (DOUBLE[] in map mode, scalar DOUBLE after NGap). */
  private final class Gen {
    val ctes = collection.mutable.ArrayBuffer.empty[String]
    private var n = 0
    def fresh(): String = { n += 1; s"nn$n" }
  }

  private final case class T(cte: String, cols: Vector[String], len: Int,
      scalar: Boolean = false)

  private def zeroList(pad: Int): String =
    (1 to pad).map(_ => "0.0").mkString("[", ", ", "]") + "::DOUBLE[]"

  private def infList(pad: Int): String =
    (1 to pad).map(_ => "'-infinity'::DOUBLE").mkString("[", ", ", "]")

  private def genOps(g: Gen, ops: Seq[NOp], in: T): T =
    ops.foldLeft(in)((t, op) => genOp(g, op, t))

  private def genOp(g: Gen, op: NOp, in: T): T = op match {
    case NConv(w, pad) =>
      val src = if (pad == 0) in else {
        val name = g.fresh()
        val cols = in.cols.indices.map(i => s"${name}_c$i").toVector
        g.ctes += s"$name AS (SELECT user_id, " +
          in.cols.zip(cols).map { case (c, nc) =>
            s"${zeroList(pad)} || $c || ${zeroList(pad)} AS $nc"
          }.mkString(", ") + s" FROM ${in.cte})"
        T(name, cols, in.len + 2 * pad)
      }
      val k = w(0)(0).length
      val outLen = in.len + 2 * pad - k + 1
      val name = g.fresh()
      val cols = w.indices.map(i => s"${name}_c$i").toVector
      g.ctes += s"$name AS (SELECT user_id, " +
        w.indices.map { co =>
          val terms = for (ci <- w(co).indices; t <- 0 until k) yield {
            val idx = if (t == 0) "p" else s"p + $t"
            s"${dlit(w(co)(ci)(t))} * ${src.cols(ci)}[$idx]"
          }
          s"list_transform(generate_series(1, $outLen), p -> ${terms.mkString(" + ")}) AS ${cols(co)}"
        }.mkString(",\n  ") + s" FROM ${src.cte})"
      T(name, cols, outLen)
    case NBn(rm, rv, ga, be) =>
      val name = g.fresh()
      val cols = in.cols.indices.map(i => s"${name}_c$i").toVector
      g.ctes += s"$name AS (SELECT user_id, " +
        in.cols.zipWithIndex.map { case (c, i) =>
          s"list_transform($c, v -> (v - ${dlit(rm(i))}) / sqrt(${dlit(rv(i))} + 1e-05) " +
            s"* ${dlit(ga(i))} + ${dlit(be(i))}) AS ${cols(i)}"
        }.mkString(",\n  ") + s" FROM ${in.cte})"
      T(name, cols, in.len)
    case NRelu =>
      val name = g.fresh()
      val cols = in.cols.indices.map(i => s"${name}_c$i").toVector
      // post-GAP tensors carry one scalar DOUBLE per channel (the MLP
      // stages of the LLM-PS decoder); map-form tensors carry lists
      g.ctes += s"$name AS (SELECT user_id, " +
        in.cols.zip(cols).map { case (c, nc) =>
          if (in.scalar) s"CASE WHEN $c > 0.0 THEN $c ELSE 0.0 END AS $nc"
          else s"list_transform($c, v -> CASE WHEN v > 0.0 THEN v ELSE 0.0 END) AS $nc"
        }.mkString(", ") + s" FROM ${in.cte})"
      T(name, cols, in.len, scalar = in.scalar)
    case NMaxPool(k, pad) =>
      val padded = if (pad == 0) in else {
        val name = g.fresh()
        val cols = in.cols.indices.map(i => s"${name}_c$i").toVector
        g.ctes += s"$name AS (SELECT user_id, " +
          in.cols.zip(cols).map { case (c, nc) =>
            s"${infList(pad)} || $c || ${infList(pad)} AS $nc"
          }.mkString(", ") + s" FROM ${in.cte})"
        T(name, cols, in.len + 2 * pad)
      }
      val outLen = in.len + 2 * pad - k + 1
      val name = g.fresh()
      val cols = in.cols.indices.map(i => s"${name}_c$i").toVector
      g.ctes += s"$name AS (SELECT user_id, " +
        padded.cols.zip(cols).map { case (c, nc) =>
          val args = (0 until k).map(t => if (t == 0) s"$c[p]" else s"$c[p + $t]")
          s"list_transform(generate_series(1, $outLen), p -> greatest(${args.mkString(", ")})) AS $nc"
        }.mkString(", ") + s" FROM ${padded.cte})"
      T(name, cols, outLen)
    case NGap =>
      val name = g.fresh()
      val cols = in.cols.indices.map(i => s"${name}_c$i").toVector
      g.ctes += s"$name AS (SELECT user_id, " +
        in.cols.zip(cols).map { case (c, nc) =>
          s"list_reduce(list_prepend(0.0::DOUBLE, $c), (a, b) -> a + b) / ${in.len}.0 AS $nc"
        }.mkString(", ") + s" FROM ${in.cte})"
      T(name, cols, 1, scalar = true)
    case NLinear(w, b) =>
      require(in.scalar, "NLinear expects the post-GAP scalar tensor")
      val name = g.fresh()
      val cols = w.indices.map(i => s"${name}_c$i").toVector
      g.ctes += s"$name AS (SELECT user_id, " +
        w.indices.map { j =>
          val terms = w(j).indices.map(i => s"${dlit(w(j)(i))} * ${in.cols(i)}")
          s"${dlit(b(j))} + ${terms.mkString(" + ")} AS ${cols(j)}"
        }.mkString(",\n  ") + s" FROM ${in.cte})"
      T(name, cols, 1, scalar = true)
    case NResidual(main, shortcut) =>
      val m = genOps(g, main, in)
      val s = if (shortcut.isEmpty) in else genOps(g, shortcut, in)
      val len = math.min(m.len, s.len)
      val name = g.fresh()
      val cols = m.cols.indices.map(i => s"${name}_c$i").toVector
      g.ctes += s"$name AS (SELECT m.user_id, " +
        m.cols.indices.map { c =>
          val sum = s"m.${m.cols(c)}[p] + s.${s.cols(c)}[p]"
          s"list_transform(generate_series(1, $len), p -> " +
            s"CASE WHEN $sum > 0.0 THEN $sum ELSE 0.0 END) AS ${cols(c)}"
        }.mkString(",\n  ") +
        s" FROM ${m.cte} m JOIN ${s.cte} s ON m.user_id = s.user_id)"
      T(name, cols, len)
    case NConcat(branches) =>
      val outs = branches.map(genOps(g, _, in))
      val allScalar = outs.forall(_.scalar)
      // kernel contract (NeuralNet.evalOp NConcat): min channel length
      // over ALL branches — a scalar sibling (len 1) truncates its list
      // siblings to length 1, exactly the interpreter's take(len)
      val len = outs.map(_.len).min
      val name = g.fresh()
      val total = outs.map(_.cols.length).sum
      val cols = (0 until total).map(i => s"${name}_c$i").toVector
      val aliases = outs.indices.map(i => s"b$i")
      var idx = -1
      val selects = outs.zip(aliases).flatMap { case (o, a) =>
        // all-scalar concat stays plain DOUBLEs (the LlmPs shape); in a
        // MIXED concat a scalar column lifts to a 1-element LIST so the
        // output is uniformly list-typed (a DOUBLE must never be sliced
        // — DuckDB type error) while list siblings slice to the kernel's
        // truncation length
        o.cols.map { c =>
          idx += 1
          if (allScalar) s"$a.$c AS ${cols(idx)}"
          else if (o.scalar) s"[$a.$c] AS ${cols(idx)}"
          else s"$a.$c[1:$len] AS ${cols(idx)}"
        }
      }
      val joins = outs.zip(aliases).tail
        .map { case (o, a) => s"JOIN ${o.cte} $a ON b0.user_id = $a.user_id" }
      g.ctes += s"$name AS (SELECT b0.user_id, ${selects.mkString(",\n  ")} " +
        s"FROM ${outs.head.cte} b0 ${joins.mkString(" ")})"
      T(name, cols, len, scalar = allScalar)
  }

  /** Shared input: series listed in repo order, zero-padded to the fit's
    * seqLen, normalized with the pinned mean/std. */
  private def inputCtes(g: Gen, mean: Double, std: Double, seqLen: Int): T = {
    g.ctes += "s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs" +
      " FROM events GROUP BY user_id)"
    val name = g.fresh()
    g.ctes += s"$name AS (SELECT user_id, list_transform(generate_series(1, $seqLen), " +
      s"i -> (CASE WHEN i <= len(vs) THEN vs[i] ELSE 0.0 END - ${dlit(mean)}) / ${dlit(std)}) " +
      s"AS ${name}_c0 FROM s)"
    T(name, Vector(s"${name}_c0"), seqLen)
  }

  /** DEC / IDEC / contrastive replay: full encoder forward, then nearest
    * pinned centroid (Student-t argmax ≡ argmin squared distance, first
    * index on ties). Output: (user_id, cluster). */
  def clusterAssignSql(fit: DeepFit): String = {
    val g = new Gen
    val z = genOps(g, fit.spec, inputCtes(g, fit.mean, fit.std, fit.seqLen))
    require(z.scalar, "cluster spec must end at the bottleneck vector")
    val d = fit.centroids(0).length
    val cent = fit.centroids.zipWithIndex.map { case (m, c) =>
      s"($c::INT, ${m.map(dlit).mkString(", ")})"
    }.mkString(",\n  ")
    val mCols = (0 until d).map(i => s"m$i")
    g.ctes += s"cent AS (SELECT * FROM (VALUES\n  $cent) AS __c(cluster, ${mCols.mkString(", ")}))"
    val dd = (0 until d)
      .map(i => s"(${z.cols(i)} - m$i) * (${z.cols(i)} - m$i)").mkString(" + ")
    s"""WITH ${g.ctes.mkString(",\n")},
       |dist AS (SELECT user_id, cluster, $dd AS dd FROM ${z.cte} CROSS JOIN cent)
       |SELECT user_id, cluster FROM (
       |  SELECT user_id, cluster,
       |    row_number() OVER (PARTITION BY user_id ORDER BY dd, cluster) AS rk
       |  FROM dist) WHERE rk = 1""".stripMargin
  }

  /** ResNet / InceptionTime replay: full conv-tower forward, argmax logit
    * (first class on ties). Output: (user_id, predicted_label). */
  def classifySql(fit: ClassifierFit): String = {
    val g = new Gen
    val lo = genOps(g, fit.spec, inputCtes(g, fit.mean, fit.std, fit.seqLen))
    require(lo.scalar, "classifier spec must end at the logit vector")
    val cls = fit.classes.zipWithIndex
      .map { case (c, i) => s"($i::INT, '${c.replace("'", "''")}')" }
      .mkString(",\n  ")
    g.ctes += s"cls AS (SELECT * FROM (VALUES\n  $cls) AS __k(idx, label))"
    val logit = "CASE idx " + fit.classes.indices
      .map(i => s"WHEN $i THEN ${lo.cols(i)}").mkString(" ") + " END"
    s"""WITH ${g.ctes.mkString(",\n")},
       |scored AS (SELECT user_id, label,
       |    row_number() OVER (PARTITION BY user_id ORDER BY $logit DESC, idx) AS rk
       |  FROM ${lo.cte} CROSS JOIN cls)
       |SELECT user_id, label AS predicted_label FROM scored WHERE rk = 1""".stripMargin
  }

  /** N-BEATS replay (kernels.NBeats.forward): leading-zero-padded
    * normalized context, per-block ReLU fc stack → theta heads → (pinned
    * literal) basis expansion, residual subtraction chained block to
    * block, forecasts 0-seeded block-ascending summed, denormalized and
    * rounded 6dp with the 1e-9 nudge, unpivoted onto the repo's
    * min-gap future-date scaffold. Output: (user_id, step, ts, y_hat). */
  def nbeatsSql(fit: graft.kernels.NBeats.Fit): String = {
    val in = fit.inputSize; val h = fit.h
    val ctes = collection.mutable.ArrayBuffer.empty[String]
    ctes += "s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs" +
      " FROM events GROUP BY user_id)"
    ctes += """meta AS (SELECT user_id, max(us) AS last_us, min(us - lus) AS freq FROM
      |  (SELECT user_id, epoch_us(ts) AS us,
      |     lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lus
      |   FROM events) GROUP BY user_id)""".stripMargin
    val xCols = (0 until in).map(i => s"x$i")
    ctes += s"ctx AS (SELECT user_id, " + (0 until in).map { i =>
      val p = i + 1
      s"""(CASE WHEN len(vs) >= $in THEN vs[len(vs) - $in + $p]
         | WHEN $p <= $in - len(vs) THEN 0.0
         | ELSE vs[$p - ($in - len(vs))] END - ${dlit(fit.mean)}) / ${dlit(fit.std)} AS x$i"""
        .stripMargin.replaceAll("\n", "")
    }.mkString(",\n  ") + " FROM s)"

    var resCte = "ctx"
    var resCols: Seq[String] = xCols
    val heads = collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    fit.blocks.zipWithIndex.foreach { case (blk, k) =>
      var cur = resCte
      var hidCols: Seq[String] = resCols
      blk.fc.zipWithIndex.foreach { case ((w, b), li) =>
        val lin = s"b${k}l$li"
        val linCols = w.indices.map(j => s"${lin}_h$j")
        ctes += s"$lin AS (SELECT user_id, ${resCols.mkString(", ")}, " +
          w.indices.map { j =>
            val terms = w(j).indices.map(i => s"${dlit(w(j)(i))} * ${hidCols(i)}")
            s"${dlit(b(j))} + ${terms.mkString(" + ")} AS ${linCols(j)}"
          }.mkString(",\n  ") + s" FROM $cur)"
        val rl = s"${lin}r"
        val rlCols = w.indices.map(j => s"${rl}_h$j")
        ctes += s"$rl AS (SELECT user_id, ${resCols.mkString(", ")}, " +
          linCols.zip(rlCols).map { case (c, nc) =>
            s"CASE WHEN $c > 0.0 THEN $c ELSE 0.0 END AS $nc"
          }.mkString(", ") + s" FROM $lin)"
        cur = rl
        hidCols = rlCols
      }
      // theta heads (generic: theta IS backcast/forecast)
      val th = s"b${k}t"
      val (wb, bb) = blk.thetaB
      val (wf, bf) = blk.thetaF
      val tbCols = wb.indices.map(j => s"${th}_tb$j")
      val tfCols = wf.indices.map(j => s"${th}_tf$j")
      def linExprs(w: Array[Array[Double]], b: Array[Double], cols: Seq[String]) =
        w.indices.map { j =>
          val terms = w(j).indices.map(i => s"${dlit(w(j)(i))} * ${hidCols(i)}")
          s"${dlit(b(j))} + ${terms.mkString(" + ")} AS ${cols(j)}"
        }
      ctes += s"$th AS (SELECT user_id, ${resCols.mkString(", ")}, " +
        (linExprs(wb, bb, tbCols) ++ linExprs(wf, bf, tfCols)).mkString(",\n  ") +
        s" FROM $cur)"
      // expand + residual update
      val ex = s"b${k}e"
      val newRes = (0 until in).map(i => s"${ex}_r$i")
      val fcCols = (0 until h).map(i => s"${ex}_f$i")
      val bcExpr: Int => String = blk.basisBack match {
        case None => i => tbCols(i)
        case Some(bm) => i =>
          "(" + bm.indices.map(d => s"${tbCols(d)} * ${dlit(bm(d)(i))}")
            .mkString("0.0 + ", " + ", "") + ")"
      }
      val fcExpr: Int => String = blk.basisFore match {
        case None => i => tfCols(i)
        case Some(bm) => i =>
          "(" + bm.indices.map(d => s"${tfCols(d)} * ${dlit(bm(d)(i))}")
            .mkString("0.0 + ", " + ", "") + ")"
      }
      ctes += s"$ex AS (SELECT user_id, " +
        ((0 until in).map(i => s"${resCols(i)} - ${bcExpr(i)} AS ${newRes(i)}") ++
         (0 until h).map(i => s"${fcExpr(i)} AS ${fcCols(i)}")).mkString(",\n  ") +
        s" FROM $th)"
      heads += ((ex, fcCols))
      resCte = ex
      resCols = newRes
    }
    val aliases = heads.indices.map(i => s"hd$i")
    val joins = heads.zip(aliases).tail
      .map { case ((c, _), a) => s"JOIN $c $a ON hd0.user_id = $a.user_id" }
    val fCols = (0 until h).map { i =>
      val sum = heads.zip(aliases).map { case ((_, fc), a) => s"$a.${fc(i)}" }
        .mkString("0.0 + ", " + ", "")
      s"round(($sum) * ${dlit(fit.std)} + ${dlit(fit.mean)} + 1e-9, 6) AS f$i"
    }
    ctes += s"fcast AS (SELECT hd0.user_id, ${fCols.mkString(",\n  ")} " +
      s"FROM ${heads.head._1} hd0 ${joins.mkString(" ")})"
    val stepCase = "CASE st.step " +
      (0 until h).map(i => s"WHEN ${i + 1} THEN f$i").mkString(" ") + " END"
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT f.user_id, st.step,
       |  make_timestamp(m.last_us + st.step * m.freq) AS ts,
       |  $stepCase AS y_hat
       |FROM fcast f JOIN meta m ON f.user_id = m.user_id
       |CROSS JOIN (SELECT unnest(generate_series(1, $h)) AS step) st""".stripMargin
  }

  // ==================== transformer forecasters ======================

  /** Generate the post-norm encoder stack over token scalar columns
    * `tokCols(t)(c)` in `inCte`; returns (outCte, outCols). Mirrors
    * `Transformer.encode` term-for-term. The ONLY transcendental is
    * softmax's exp (JVM/DuckDB agree to ≤1 ulp; the 6-decimal output
    * rounding absorbs it — this oracle family is exact-to-rounding,
    * not bit-exact). */
  private def encoderSql(ctes: collection.mutable.ArrayBuffer[String],
      enc: graft.kernels.Transformer.EncoderFit,
      inCte: String, tokCols: Seq[Seq[String]],
      tag: String): (String, Seq[Seq[String]]) = {
    val t = tokCols.length
    val d = tokCols.head.length
    var cur = inCte
    var cols = tokCols
    enc.layers.zipWithIndex.foreach { case (l, li) =>
      val p = s"${tag}l$li"
      val dh = d / l.nHeads
      def denseCols(name: String, dn: graft.kernels.Transformer.Dense,
          in: Seq[Seq[String]], from: String): Seq[Seq[String]] = {
        val out = (0 until t).map(ti => dn.w.indices.map(j => s"${name}_t${ti}_$j"))
        ctes += s"$name AS (SELECT user_id, " +
          (for (ti <- 0 until t; j <- dn.w.indices) yield {
            val terms = dn.w(j).indices.map(i => s"${dlit(dn.w(j)(i))} * ${in(ti)(i)}")
            s"${dlit(dn.b(j))} + ${terms.mkString(" + ")} AS ${out(ti)(j)}"
          }).mkString(",\n  ") + s" FROM $from)"
        out
      }
      // q/k/v are three parallel CTEs over the layer input; the score
      // and attention CTEs join them on user_id
      val qC = denseCols(s"${p}q", l.wq, cols, cur)
      val kC = denseCols(s"${p}k", l.wk, cols, cur)
      val vC = denseCols(s"${p}v", l.wv, cols, cur)
      val sc = s"${p}s"
      val sCols = Array.tabulate(l.nHeads, t, t)((h, i, j) => s"${sc}_h${h}_i${i}_j$j")
      ctes += s"$sc AS (SELECT q.user_id, " +
        (for (h <- 0 until l.nHeads; i <- 0 until t; j <- 0 until t) yield {
          val off = h * dh
          val dot = (0 until dh)
            .map(c => s"q.${qC(i)(off + c)} * k.${kC(j)(off + c)}").mkString(" + ")
          s"($dot) / sqrt(${dh.toDouble}) AS ${sCols(h)(i)(j)}"
        }).mkString(",\n  ") +
        s" FROM ${p}q q JOIN ${p}k k ON q.user_id = k.user_id)"
      val sm = s"${p}p"
      val pCols = Array.tabulate(l.nHeads, t, t)((h, i, j) => s"${sm}_h${h}_i${i}_j$j")
      // softmax: exp(s − greatest(row))/rowsum — expand inline per cell
      ctes += s"$sm AS (SELECT user_id, " +
        (for (h <- 0 until l.nHeads; i <- 0 until t) yield {
          val row = (0 until t).map(j => sCols(h)(i)(j))
          val mx = s"greatest(${row.mkString(", ")})"
          val exps = row.map(c => s"exp($c - $mx)")
          val sum = exps.mkString(" + ")
          (0 until t).map(j => s"${exps(j)} / ($sum) AS ${pCols(h)(i)(j)}").mkString(",\n  ")
        }).mkString(",\n  ") + s" FROM $sc)"
      val ao = s"${p}a"
      val aCols = (0 until t).map(ti => (0 until d).map(c => s"${ao}_t${ti}_$c"))
      ctes += s"$ao AS (SELECT p.user_id, " +
        (for (ti <- 0 until t; c <- 0 until d) yield {
          val h = c / dh
          val terms = (0 until t).map(j => s"p.${pCols(h)(ti)(j)} * v.${vC(j)(c)}")
          s"${terms.mkString(" + ")} AS ${aCols(ti)(c)}"
        }).mkString(",\n  ") +
        s" FROM $sm p JOIN ${p}v v ON p.user_id = v.user_id)"
      val wo = denseCols(s"${p}o", l.wo, aCols, ao)
      // residual 1 + layernorm 1
      val (n1Cte, n1Cols) = layerNormSql(ctes, s"${p}n1",
        (ti: Int, c: Int) => s"r.${cols(ti)(c)} + o.${wo(ti)(c)}",
        s"$cur r JOIN ${p}o o ON r.user_id = o.user_id", t, d, l.ln1g, l.ln1b)
      // FFN
      val f1 = denseCols(s"${p}f1", l.ff1, n1Cols, n1Cte)
      val rl = s"${p}rl"
      val rlCols = (0 until t).map(ti => l.ff1.w.indices.map(j => s"${rl}_t${ti}_$j"))
      ctes += s"$rl AS (SELECT user_id, " +
        (for (ti <- 0 until t; j <- l.ff1.w.indices) yield
          s"CASE WHEN ${f1(ti)(j)} > 0.0 THEN ${f1(ti)(j)} ELSE 0.0 END AS ${rlCols(ti)(j)}")
          .mkString(", ") + s" FROM ${p}f1)"
      val f2 = denseCols(s"${p}f2", l.ff2, rlCols, rl)
      val (n2Cte, n2Cols) = layerNormSql(ctes, s"${p}n2",
        (ti: Int, c: Int) => s"r.${n1Cols(ti)(c)} + o.${f2(ti)(c)}",
        s"$n1Cte r JOIN ${p}f2 o ON r.user_id = o.user_id", t, d, l.ln2g, l.ln2b)
      cur = n2Cte
      cols = n2Cols
    }
    (cur, cols)
  }

  /** residual-sum → per-token mean/var → normalized affine, in three
    * chained CTEs (matches Transformer.layerNorm's accumulation). */
  private def layerNormSql(ctes: collection.mutable.ArrayBuffer[String],
      p: String, sumExpr: (Int, Int) => String, from: String, t: Int, d: Int,
      g: Array[Double], b: Array[Double]): (String, Seq[Seq[String]]) = {
    val rCols = (0 until t).map(ti => (0 until d).map(c => s"${p}r_t${ti}_$c"))
    ctes += s"${p}r AS (SELECT r.user_id, " +
      (for (ti <- 0 until t; c <- 0 until d) yield
        s"${sumExpr(ti, c)} AS ${rCols(ti)(c)}").mkString(",\n  ") + s" FROM $from)"
    val mCols = (0 until t).map(ti => s"${p}m_t$ti")
    val vCols = (0 until t).map(ti => s"${p}v_t$ti")
    ctes += s"${p}m AS (SELECT user_id, " +
      ((0 until t).map { ti =>
        s"(${rCols(ti).mkString(" + ")}) / ${d.toDouble} AS ${mCols(ti)}"
      } ++ (0 until t).map { ti => s"${rCols(ti).mkString(", ")}" })
        .mkString(", ") + s" FROM ${p}r)"
    ctes += s"${p}v AS (SELECT user_id, ${(0 until t).flatMap(ti => rCols(ti)).mkString(", ")}, ${mCols.mkString(", ")}, " +
      (0 until t).map { ti =>
        val sq = rCols(ti).map(c => s"($c - ${mCols(ti)}) * ($c - ${mCols(ti)})")
        s"(${sq.mkString(" + ")}) / ${d.toDouble} AS ${vCols(ti)}"
      }.mkString(",\n  ") + s" FROM ${p}m)"
    val nCols = (0 until t).map(ti => (0 until d).map(c => s"${p}n_t${ti}_$c"))
    ctes += s"${p}n AS (SELECT user_id, " +
      (for (ti <- 0 until t; c <- 0 until d) yield
        s"(${rCols(ti)(c)} - ${mCols(ti)}) / sqrt(${vCols(ti)} + 1e-05) " +
          s"* ${dlit(g(c))} + ${dlit(b(c))} AS ${nCols(ti)(c)}")
        .mkString(",\n  ") + s" FROM ${p}v)"
    (s"${p}n", nCols)
  }

  /** PatchTST replay (Transformer.patchForward): context → patch
    * projection + positional embedding → encoder → flatten → head →
    * denormalize, rounded 6dp + 1e-9, on the future-date scaffold.
    * Output: (user_id, step, ts, y_hat). */
  def patchTstSql(fit: graft.kernels.Transformer.PatchFit): String = {
    val in = fit.inputSize; val h = fit.h; val pl = fit.patchLen
    val nP = in / pl
    val d = fit.proj.w.length
    val ctes = collection.mutable.ArrayBuffer.empty[String]
    ctes += "s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs" +
      " FROM events GROUP BY user_id)"
    ctes += """meta AS (SELECT user_id, max(us) AS last_us, min(us - lus) AS freq FROM
      |  (SELECT user_id, epoch_us(ts) AS us,
      |     lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lus
      |   FROM events) GROUP BY user_id)""".stripMargin
    ctes += s"ctx AS (SELECT user_id, " + (0 until in).map { i =>
      val p = i + 1
      s"""(CASE WHEN len(vs) >= $in THEN vs[len(vs) - $in + $p]
         | WHEN $p <= $in - len(vs) THEN 0.0
         | ELSE vs[$p - ($in - len(vs))] END - ${dlit(fit.mean)}) / ${dlit(fit.std)} AS x$i"""
        .stripMargin.replaceAll("\n", "")
    }.mkString(",\n  ") + " FROM s)"
    // tokens: dense(proj, patch) + posEmbed (pos term LAST, matching
    // `dense(...) then + pos` in patchForward)
    val tokCols = (0 until nP).map(t => (0 until d).map(c => s"tok_t${t}_$c"))
    ctes += "tok AS (SELECT user_id, " +
      (for (t <- 0 until nP; c <- 0 until d) yield {
        val terms = (0 until pl).map(i =>
          s"${dlit(fit.proj.w(c)(i))} * x${t * pl + i}")
        s"${dlit(fit.proj.b(c))} + ${terms.mkString(" + ")} + " +
          s"${dlit(fit.enc.posEmbed(t)(c))} AS ${tokCols(t)(c)}"
      }).mkString(",\n  ") + " FROM ctx)"
    val (encCte, encCols) = encoderSql(ctes, fit.enc, "tok", tokCols, "e")
    // head over the row-major flatten, denormalized
    val fCols = (0 until h).map { j =>
      val terms = (0 until nP * d).map { i =>
        val t = i / d; val c = i % d
        s"${dlit(fit.head.w(j)(i))} * ${encCols(t)(c)}"
      }
      s"round((${dlit(fit.head.b(j))} + ${terms.mkString(" + ")}) * " +
        s"${dlit(fit.std)} + ${dlit(fit.mean)} + 1e-9, 6) AS f$j"
    }
    ctes += s"fcast AS (SELECT user_id, ${fCols.mkString(",\n  ")} FROM $encCte)"
    val stepCase = "CASE st.step " +
      (0 until h).map(i => s"WHEN ${i + 1} THEN f$i").mkString(" ") + " END"
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT f.user_id, st.step,
       |  make_timestamp(m.last_us + st.step * m.freq) AS ts,
       |  $stepCase AS y_hat
       |FROM fcast f JOIN meta m ON f.user_id = m.user_id
       |CROSS JOIN (SELECT unnest(generate_series(1, $h)) AS step) st""".stripMargin
  }

  /** MultivariatePatchTST / iTransformer replay
    * (Transformer.mvForward): hourly event_type pivot (the only
    * engine-divergent step — Spark and DuckDB sum `avg` in different
    * orders, ~1e-16 relative on the inputs, absorbed by the 6-decimal
    * output rounding), leading-zero-padded per-variable normalization,
    * kind-specific tokenization, shared encoder replay, per-variable
    * head + denormalization. Output:
    * (user_id='events', step, ts, <var>_hat...). */
  def mvTransformerSql(fit: graft.kernels.Transformer.MvFit,
      names: Array[String]): String = {
    val in = fit.inputSize; val h = fit.h; val v = fit.nVars
    val d = fit.proj.w.length
    val ctes = collection.mutable.ArrayBuffer.empty[String]
    ctes += "w AS (SELECT 'events' AS user_id, date_trunc('hour', ts) AS hh, " +
      names.zipWithIndex.map { case (n, i) =>
        s"coalesce(avg(value) FILTER (WHERE event_type = '$n'), 0.0) AS v$i"
      }.mkString(", ") + " FROM events WHERE event_type IN (" +
      names.map(n => s"'$n'").mkString(", ") + ") GROUP BY 1, 2)"
    ctes += s"l AS (SELECT user_id, " +
      names.indices.map(i => s"list(v$i ORDER BY hh) AS s$i").mkString(", ") +
      ", list(epoch_us(hh) ORDER BY hh) AS hs FROM w GROUP BY user_id)"
    ctes += """meta AS (SELECT user_id, hs[len(hs)] AS last_us,
      |  list_min(list_transform(generate_series(2, len(hs)), i ->
      |    hs[i::INT] - hs[i::INT - 1])) AS freq FROM l)""".stripMargin
    // normalized context: x_{row}_{var}, leading-zero rows for short data
    ctes += "ctx AS (SELECT user_id, " +
      (for (r <- 0 until in; vi <- 0 until v) yield {
        val p = r + 1
        s"""(CASE WHEN len(s$vi) >= $in THEN s$vi[len(s$vi) - $in + $p]
           | WHEN $p <= $in - len(s$vi) THEN 0.0
           | ELSE s$vi[$p - ($in - len(s$vi))] END - ${dlit(fit.mean(vi))}) / ${dlit(fit.std(vi))} AS x_${r}_$vi"""
          .stripMargin.replaceAll("\n", "")
      }).mkString(",\n  ") + " FROM l)"
    // tokens per kind (posEmbed term last, as in mvTokens)
    val nP = fit.enc.posEmbed.length
    val tokCols = (0 until nP).map(t => (0 until d).map(c => s"tok_t${t}_$c"))
    val tokExprs = fit.kind match {
      case "mvpatch" =>
        val pl = fit.patchLen
        val start = in - nP * pl
        for (t <- 0 until nP; c <- 0 until d) yield {
          val terms = (0 until pl * v).map { i =>
            val r = i / v; val vi = i % v
            s"${dlit(fit.proj.w(c)(i))} * x_${start + t * pl + r}_$vi"
          }
          s"${dlit(fit.proj.b(c))} + ${terms.mkString(" + ")} + " +
            s"${dlit(fit.enc.posEmbed(t)(c))} AS ${tokCols(t)(c)}"
        }
      case _ =>
        for (t <- 0 until nP; c <- 0 until d) yield {
          val terms = (0 until in).map(r =>
            s"${dlit(fit.proj.w(c)(r))} * x_${r}_$t")
          s"${dlit(fit.proj.b(c))} + ${terms.mkString(" + ")} + " +
            s"${dlit(fit.enc.posEmbed(t)(c))} AS ${tokCols(t)(c)}"
        }
    }
    ctes += s"tok AS (SELECT user_id, ${tokExprs.mkString(",\n  ")} FROM ctx)"
    val (encCte, encCols) = encoderSql(ctes, fit.enc, "tok", tokCols, "e")
    // head + denorm per (step, var)
    val outExprs = fit.kind match {
      case "mvpatch" =>
        for (t <- 0 until h; vi <- 0 until v) yield {
          val o = t * v + vi
          val terms = (0 until nP * d).map { i =>
            s"${dlit(fit.head.w(o)(i))} * ${encCols(i / d)(i % d)}"
          }
          s"round((${dlit(fit.head.b(o))} + ${terms.mkString(" + ")}) * " +
            s"${dlit(fit.std(vi))} + ${dlit(fit.mean(vi))} + 1e-9, 6) AS f_${t}_$vi"
        }
      case _ =>
        for (t <- 0 until h; vi <- 0 until v) yield {
          val terms = (0 until d).map(c =>
            s"${dlit(fit.head.w(t)(c))} * ${encCols(vi)(c)}")
          s"round((${dlit(fit.head.b(t))} + ${terms.mkString(" + ")}) * " +
            s"${dlit(fit.std(vi))} + ${dlit(fit.mean(vi))} + 1e-9, 6) AS f_${t}_$vi"
        }
    }
    ctes += s"fcast AS (SELECT user_id, ${outExprs.mkString(",\n  ")} FROM $encCte)"
    val varCols = names.zipWithIndex.map { case (n, vi) =>
      "CASE st.step " +
        (0 until h).map(t => s"WHEN ${t + 1} THEN f_${t}_$vi").mkString(" ") +
        s" END AS ${n}_hat"
    }
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT f.user_id, st.step,
       |  make_timestamp(m.last_us + st.step * m.freq) AS ts,
       |  ${varCols.mkString(",\n  ")}
       |FROM fcast f JOIN meta m ON f.user_id = m.user_id
       |CROSS JOIN (SELECT unnest(generate_series(1, $h)) AS step) st""".stripMargin
  }

  /** Vision-embedding replay (ops.VisionEmbed.forward): z-norm →
    * recurrence plot → counter-seeded 3×3 conv bank (out-of-bounds taps
    * contribute exact zero) → ReLU → quadrant means (flat-index-ascending
    * scan) → random projection, rounded 6dp with the 1e-9 nudge.
    * Output: (user_id, emb_0..emb_{d−1}). */
  def visionEmbedSql(nFilters: Int, embDim: Int, eps: Double, seed: Long): String = {
    val (conv, lin) = graft.ops.VisionEmbed.weights(nFilters, embDim, seed)
    val zn =
      """s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs
        |  FROM events GROUP BY user_id),
        |m1 AS (SELECT *, list_reduce(vs, (a, b) -> a + b)/len(vs) AS __mu FROM s),
        |m2 AS (SELECT *, sqrt(list_reduce(list_prepend(0.0::DOUBLE,
        |    list_transform(vs, v -> (v - __mu)*(v - __mu))), (a, b) -> a + b)/len(vs)) AS __sd
        |  FROM m1),
        |z AS (SELECT user_id, len(vs) AS ll,
        |  CASE WHEN __sd = 0.0 THEN list_transform(vs, v -> 0.0::DOUBLE)
        |       ELSE list_transform(vs, v -> (v - __mu)/__sd) END AS za
        |  FROM m2)""".stripMargin
    val img =
      s"""img AS (SELECT user_id, ll, list_transform(generate_series(0, ll*ll - 1), i ->
         |  CASE WHEN abs(za[(i // ll)::INT + 1] - za[(i % ll)::INT + 1]) <= ${dlit(eps)}
         |       THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END) AS im FROM z)""".stripMargin
    // raw conv sums in one CTE, ReLU as a column map in the next — the
    // inline-CASE version evaluated every 9-term sum twice (half the
    // oracle's runtime was that duplication)
    val convRawCols = conv.indices.map { f =>
      val terms = for (dr <- 0 until 3; dc <- 0 until 3) yield {
        val d0 = dr - 1; val d1 = dc - 1
        s"""CASE WHEN (i // ll) + ($d0) >= 0 AND (i // ll) + ($d0) < ll
           | AND (i % ll) + ($d1) >= 0 AND (i % ll) + ($d1) < ll
           | THEN ${dlit(conv(f)(dr)(dc))} * im[(((i // ll) + ($d0)) * ll + (i % ll) + ($d1))::INT + 1]
           | ELSE 0.0 END""".stripMargin.replaceAll("\n", "")
      }
      s"list_transform(generate_series(0, ll*ll - 1), i -> " +
        s"${terms.mkString(" + ")}) AS cw$f"
    }
    val cvRaw = s"cvr AS (SELECT user_id, ll, ${convRawCols.mkString(",\n  ")} FROM img)"
    val cv = s"cv AS (SELECT user_id, ll, " + conv.indices.map(f =>
      s"list_transform(cw$f, v -> CASE WHEN v > 0.0 THEN v ELSE 0.0 END) AS cv$f")
      .mkString(", ") + " FROM cvr)"
    // quadrant means, flat scan with region mask (h = ll // 2)
    val featCols = for (f <- conv.indices; q <- 0 until 4) yield {
      val rCond = if (q < 2) "(i // ll) < h" else "(i // ll) >= h"
      val cCond = if (q % 2 == 0) "(i % ll) < h" else "(i % ll) >= h"
      val cnt = (if (q < 2) "h" else "(ll - h)") + " * " + (if (q % 2 == 0) "h" else "(ll - h)")
      s"CASE WHEN $cnt > 0 THEN list_reduce(list_prepend(0.0::DOUBLE, " +
        s"list_transform(generate_series(0, ll*ll - 1), i -> " +
        s"CASE WHEN $rCond AND $cCond THEN cv$f[i::INT + 1] ELSE 0.0 END)), " +
        s"(a, b) -> a + b) / ($cnt) ELSE 0.0 END AS ft${f * 4 + q}"
    }
    val ft = s"ft AS (SELECT user_id, ${featCols.mkString(",\n  ")} " +
      "FROM (SELECT *, ll // 2 AS h FROM cv))"
    val embCols = lin.indices.map { j =>
      val terms = lin(j).indices.map(i => s"${dlit(lin(j)(i))} * ft$i")
      s"round(${terms.mkString(" + ")} + 1e-9, 6) AS emb_$j"
    }
    s"""WITH $zn,
       |$img,
       |$cvRaw,
       |$cv,
       |$ft
       |SELECT user_id, ${embCols.mkString(",\n  ")} FROM ft""".stripMargin
  }

  // ============== Time-LLM / LLM-PS (per-window-norm inputs) ==========

  /** Appends s/meta + the EDGE-padded raw context (TimeLlm.edgeContext:
    * the truncated window's first value repeats at the front) + the
    * per-series window stats (population mean/std + 1e-8, ascending
    * accumulation — TimeLlm.windowStats). Returns (statsCte, rawCols):
    * `statsCte` carries user_id, r0.., mu, sd. */
  private def edgeStatCtes(ctes: collection.mutable.ArrayBuffer[String],
      in: Int): (String, Seq[String]) = {
    ctes += "s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs" +
      " FROM events GROUP BY user_id)"
    ctes += """meta AS (SELECT user_id, max(us) AS last_us, min(us - lus) AS freq FROM
      |  (SELECT user_id, epoch_us(ts) AS us,
      |     lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lus
      |   FROM events) GROUP BY user_id)""".stripMargin
    val rCols = (0 until in).map(i => s"r$i")
    ctes += s"ctxr AS (SELECT user_id, " + (0 until in).map { i =>
      val p = i + 1
      // len >= in → plain tail window; shorter → edge-pad with vs[1]
      s"""CASE WHEN len(vs) >= $in THEN vs[len(vs) - $in + $p]
         | WHEN $p <= $in - len(vs) THEN vs[1]
         | ELSE vs[$p - ($in - len(vs))] END AS r$i"""
        .stripMargin.replaceAll("\n", "")
    }.mkString(",\n  ") + " FROM s)"
    ctes += s"stm AS (SELECT user_id, ${rCols.mkString(", ")}, " +
      s"(${rCols.mkString(" + ")}) / ${in.toDouble} AS mu FROM ctxr)"
    ctes += s"sts AS (SELECT user_id, ${rCols.mkString(", ")}, mu, " +
      s"sqrt((${rCols.map(c => s"($c - mu) * ($c - mu)").mkString(" + ")}) " +
      s"/ ${in.toDouble}) + 1e-8 AS sd FROM stm)"
    ("sts", rCols)
  }

  /** Shared closing select: h forecast columns f0..f{h−1} in `fCte`,
    * denormalized with sts.mu/sd, rounded 6dp + 1e-9, unpivoted onto
    * the future-date scaffold. Output: (user_id, step, ts, y_hat). */
  private def denormScaffoldSql(ctes: collection.mutable.ArrayBuffer[String],
      fCte: String, fCols: Seq[String], h: Int): String = {
    val stepCase = "CASE st.step " + fCols.zipWithIndex.map { case (c, i) =>
      s"WHEN ${i + 1} THEN round(f.$c * n.sd + n.mu + 1e-9, 6)"
    }.mkString(" ") + " END"
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT f.user_id, st.step,
       |  make_timestamp(m.last_us + st.step * m.freq) AS ts,
       |  $stepCase AS y_hat
       |FROM $fCte f JOIN sts n ON f.user_id = n.user_id
       |JOIN meta m ON f.user_id = m.user_id
       |CROSS JOIN (SELECT unnest(generate_series(1, $h)) AS step) st""".stripMargin
  }

  /** Time-LLM replay (TimeLlm.forward): edge-padded per-window-normalized
    * context → patch projection → cross-attention against the pinned
    * prototypes (K/V are pure literals: dense(wk/wv, proto_j) folds at
    * SQL-build time) → out-projection → flatten → ReLU MLP decoder →
    * denormalize. Output: (user_id, step, ts, y_hat). */
  def timeLlmSql(fit: graft.kernels.TimeLlm.Fit): String = {
    val in = fit.inputSize; val pl = fit.patchLen; val h = fit.h
    val nP = fit.nPatches; val usable = nP * pl; val skip = in - usable
    val d = fit.proj.w.length
    val nH = fit.nHeads; val dh = d / nH
    val nProto = fit.proto.length
    def denseLit(dn: graft.kernels.Transformer.Dense,
        x: Array[Double]): Array[Double] =
      Array.tabulate(dn.w.length) { j =>
        var acc = dn.b(j)
        var i = 0
        while (i < dn.w(j).length) { acc += dn.w(j)(i) * x(i); i += 1 }
        acc
      }
    val kLit = fit.proto.map(denseLit(fit.wk, _))
    val vLit = fit.proto.map(denseLit(fit.wv, _))
    val ctes = collection.mutable.ArrayBuffer.empty[String]
    val (_, rCols) = edgeStatCtes(ctes, in)
    // normalized usable tail
    val xCols = (0 until usable).map(i => s"x$i")
    ctes += s"ctx AS (SELECT user_id, " + (0 until usable).map { i =>
      s"(${rCols(skip + i)} - mu) / sd AS x$i"
    }.mkString(", ") + " FROM sts)"
    // tokens: dense(proj, patch)
    val tokCols = (0 until nP).map(t => (0 until d).map(c => s"tok_t${t}_$c"))
    ctes += "tok AS (SELECT user_id, " +
      (for (t <- 0 until nP; c <- 0 until d) yield {
        val terms = (0 until pl).map(i =>
          s"${dlit(fit.proj.w(c)(i))} * ${xCols(t * pl + i)}")
        s"${dlit(fit.proj.b(c))} + ${terms.mkString(" + ")} AS ${tokCols(t)(c)}"
      }).mkString(",\n  ") + " FROM ctx)"
    // queries
    val qCols = (0 until nP).map(t => (0 until d).map(c => s"q_t${t}_$c"))
    ctes += "q AS (SELECT user_id, " +
      (for (t <- 0 until nP; c <- 0 until d) yield {
        val terms = (0 until d).map(i =>
          s"${dlit(fit.wq.w(c)(i))} * ${tokCols(t)(i)}")
        s"${dlit(fit.wq.b(c))} + ${terms.mkString(" + ")} AS ${qCols(t)(c)}"
      }).mkString(",\n  ") + " FROM tok)"
    // scores vs literal keys, per head
    val sCols = Array.tabulate(nH, nP, nProto)((hh, i, j) => s"sc_h${hh}_i${i}_j$j")
    ctes += "sc AS (SELECT user_id, " +
      (for (hh <- 0 until nH; i <- 0 until nP; j <- 0 until nProto) yield {
        val off = hh * dh
        val dot = (0 until dh)
          .map(c => s"${qCols(i)(off + c)} * ${dlit(kLit(j)(off + c))}")
          .mkString(" + ")
        s"($dot) / sqrt(${dh.toDouble}) AS ${sCols(hh)(i)(j)}"
      }).mkString(",\n  ") + " FROM q)"
    // softmax rows over the prototype axis
    val pCols = Array.tabulate(nH, nP, nProto)((hh, i, j) => s"p_h${hh}_i${i}_j$j")
    ctes += "sm AS (SELECT user_id, " +
      (for (hh <- 0 until nH; i <- 0 until nP) yield {
        val row = (0 until nProto).map(j => sCols(hh)(i)(j))
        val mx = s"greatest(${row.mkString(", ")})"
        val exps = row.map(c => s"exp($c - $mx)")
        val sum = exps.mkString(" + ")
        (0 until nProto).map(j =>
          s"${exps(j)} / ($sum) AS ${pCols(hh)(i)(j)}").mkString(",\n  ")
      }).mkString(",\n  ") + " FROM sc)"
    // attention output against literal values, then out-projection
    val aCols = (0 until nP).map(t => (0 until d).map(c => s"a_t${t}_$c"))
    ctes += "ao AS (SELECT user_id, " +
      (for (t <- 0 until nP; c <- 0 until d) yield {
        val hh = c / dh
        val terms = (0 until nProto).map(j =>
          s"${pCols(hh)(t)(j)} * ${dlit(vLit(j)(c))}")
        s"${terms.mkString(" + ")} AS ${aCols(t)(c)}"
      }).mkString(",\n  ") + " FROM sm)"
    val oCols = (0 until nP).map(t => (0 until d).map(c => s"o_t${t}_$c"))
    ctes += "wo AS (SELECT user_id, " +
      (for (t <- 0 until nP; c <- 0 until d) yield {
        val terms = (0 until d).map(i =>
          s"${dlit(fit.wo.w(c)(i))} * ${aCols(t)(i)}")
        s"${dlit(fit.wo.b(c))} + ${terms.mkString(" + ")} AS ${oCols(t)(c)}"
      }).mkString(",\n  ") + " FROM ao)"
    // decoder: flatten row-major → dense → ReLU → dense
    val hidCols = (0 until d).map(c => s"hid$c")
    ctes += "dec AS (SELECT user_id, " +
      (0 until d).map { c =>
        val terms = (0 until nP * d).map { i =>
          val t = i / d; val cc = i % d
          s"${dlit(fit.dec1.w(c)(i))} * ${oCols(t)(cc)}"
        }
        val lin = s"${dlit(fit.dec1.b(c))} + ${terms.mkString(" + ")}"
        s"CASE WHEN $lin > 0.0 THEN $lin ELSE 0.0 END AS ${hidCols(c)}"
      }.mkString(",\n  ") + " FROM wo)"
    val fCols = (0 until h).map(j => s"f$j")
    ctes += "fcast AS (SELECT user_id, " +
      (0 until h).map { j =>
        val terms = (0 until d).map(c =>
          s"${dlit(fit.dec2.w(j)(c))} * ${hidCols(c)}")
        s"${dlit(fit.dec2.b(j))} + ${terms.mkString(" + ")} AS f$j"
      }.mkString(",\n  ") + " FROM dec)"
    denormScaffoldSql(ctes, "fcast", fCols, h)
  }

  /** LLM-PS replay (LlmPs.forward): edge-padded per-window-normalized
    * context → the trained net's full NOp spec through the generic
    * renderer (multi-scale conv branches → GAP concat → ReLU MLP) →
    * denormalize. Output: (user_id, step, ts, y_hat). */
  def llmPsSql(fit: graft.kernels.LlmPs.Fit): String = {
    val in = fit.inputSize; val h = fit.h
    val g = new Gen
    val (_, rCols) = edgeStatCtes(g.ctes, in)
    g.ctes += "ctxn AS (SELECT user_id, [" +
      rCols.map(c => s"($c - mu) / sd").mkString(", ") +
      "]::DOUBLE[] AS c0 FROM sts)"
    val out = genOps(g, fit.spec, T("ctxn", Vector("c0"), in))
    require(out.scalar && out.cols.length == h,
      s"LLM-PS spec must end at the $h-vector, got ${out.cols.length}")
    denormScaffoldSql(g.ctes, out.cte, out.cols, h)
  }
}
