package graft.functions

import graft.pipeline.Yaml._

/** K11 `special_values` / K12 `special_functions` string DSL and the
  * K13 starred-key parameter grid (reference: utility.py:589–654
  * special_values, 658–699 special_functions, 736–763 get_suffix,
  * 766–819 get_grid).
  *
  * Value grids in spec files are strings like `"linspace(0.1, 2, 5)"`
  * or `"random:uniform(0, 1, 8)"`; starred keys (`rattle*`) fan the
  * containing parameter set out into one variant per value, with a
  * `key3-suffix` naming scheme. The reference evals numpy/scipy; here
  * the same grammar parses to deterministic Scala kernels (the
  * `random:` family uses a seeded JDK generator — deterministic per
  * seed, not bit-identical to numpy's Mersenne stream, which no
  * consumer of the grid shape depends on).
  */
object SpecialValues {

  private val callR = raw"^(\w+)\s*\(([^)]*)\)$$".r

  private def args(s: String): Seq[Double] =
    s.split(",").map(_.trim).filter(_.nonEmpty).map(_.toDouble).toSeq

  /** `special_values`: expand a value string into its list form.
    * Returns None when the string is not a special directive (the
    * reference returns the input unchanged). */
  def values(vs: String, seed: Long = 42L): Option[Seq[Double]] = {
    val v = vs.replace("|nogs|", "").trim
    v match {
      case s if s.startsWith("linspace(") || s.startsWith("logspace(") =>
        val callR(name, a) = s: @unchecked
        val Seq(start, stop, len) = args(a)
        val n = len.toInt
        val lin =
          if (n == 1) Seq(start)
          else (0 until n).map(i => start + (stop - start) * i / (n - 1))
        Some(if (name == "linspace") lin else lin.map(math.pow(10, _)))
      case s if s.startsWith("range(") =>
        val callR(_, a) = s: @unchecked
        val xs = args(a)
        val (start, stop, step) = xs match {
          case Seq(b) => (0.0, b, 1.0)
          case Seq(a0, b) => (a0, b, 1.0)
          case Seq(a0, b, st) => (a0, b, st)
          case other => throw new IllegalArgumentException(s"range$other")
        }
        val n = math.max(0, math.ceil((stop - start) / step - 1e-12).toInt)
        Some((0 until n).map(i => start + i * step))
      case s if s.startsWith("random:") || s.startsWith("distr:") =>
        val body = s.dropWhile(_ != ':').drop(1)
        val callR(id, a) = body: @unchecked
        Some(sample(id, args(a), seed))
      case s if s.startsWith("[") && s.endsWith("]") =>
        // slicer form "[2, 4:7, 9]": indices/ranges over 1..max
        // (utility.py:552–570 slicer over range(1, max))
        val parts = s.stripPrefix("[").stripSuffix("]")
          .split(",").map(_.trim).filter(_.nonEmpty)
        val picked = parts.flatMap {
          case r if r.contains(':') =>
            val Array(lo, hi) = r.split(":", 2).map(_.trim.toInt)
            lo until hi
          case x => Seq(x.toInt)
        }
        Some(picked.distinct.sorted.map(_.toDouble).toSeq)
      case _ => None
    }
  }

  /** `random:{id}` / `distr:{id}` sampling on a seeded generator.
    * Supported ids cover the reference specs' usage: uniform, normal
    * (random) and norm, uniform, expon (scipy-style loc/scale). */
  private def sample(id: String, a: Seq[Double], seed: Long): Seq[Double] = {
    val rng = new java.util.Random(seed)
    id match {
      case "uniform" => // (low, high, size) | loc/scale form
        val (lo, hi, n) = a match {
          case Seq(l, h, n0) => (l, h, n0.toInt)
          case Seq(l, h) => (l, h, 1)
          case Seq(n0) => (0.0, 1.0, n0.toInt)
          case _ => (0.0, 1.0, 1)
        }
        Seq.fill(n)(lo + (hi - lo) * rng.nextDouble())
      case "normal" | "norm" => // (loc, scale, size)
        val (mu, sig, n) = a match {
          case Seq(m, s0, n0) => (m, s0, n0.toInt)
          case Seq(m, s0) => (m, s0, 1)
          case _ => (0.0, 1.0, 1)
        }
        Seq.fill(n)(mu + sig * rng.nextGaussian())
      case "randint" => // (low, high, size)
        val Seq(lo, hi, n) = a
        Seq.fill(n.toInt)((lo + rng.nextInt((hi - lo).toInt)).toDouble)
      case "expon" => // (loc, scale, size)
        val (loc, sc, n) = a match {
          case Seq(l, s0, n0) => (l, s0, n0.toInt)
          case Seq(s0, n0) => (0.0, s0, n0.toInt)
          case _ => (0.0, 1.0, 1)
        }
        Seq.fill(n)(loc - sc * math.log(1.0 - rng.nextDouble()))
      case other =>
        throw new IllegalArgumentException(s"unsupported distribution: $other")
    }
  }

  /** K12 `special_functions`: `module:op` applied to a value list,
    * with optional reshape to r×c for the matrix ops
    * (utility.py:658–699; reshape via the dict form {func, reshape}).
    */
  def functions(sf: String, xs: Seq[Double],
      reshape: Option[(Int, Int)] = None): Double = {
    val Array(mod, op) = sf.split(":", 2)
    def mat: Seq[Seq[Double]] = {
      val (r, c) = reshape.getOrElse(
        throw new IllegalArgumentException(s"$sf needs a reshape"))
      require(r * c == xs.length, s"reshape $r x $c vs ${xs.length} values")
      xs.grouped(c).map(_.toSeq).toSeq
    }
    (mod, op) match {
      case ("numpy", "mean") => xs.sum / xs.length
      case ("numpy", "sum") => xs.sum
      case ("numpy", "prod") => xs.product
      case ("numpy", "min") => xs.min
      case ("numpy", "max") => xs.max
      case ("numpy", "median") =>
        val s = xs.sorted; val n = s.length
        if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
      case ("numpy", "std") =>
        val m = xs.sum / xs.length
        math.sqrt(xs.map(x => (x - m) * (x - m)).sum / xs.length)
      case ("math", f) =>
        require(xs.length == 1, s"math:$f takes a single value")
        f match {
          case "sqrt" => math.sqrt(xs.head)
          case "exp" => math.exp(xs.head)
          case "log" => math.log(xs.head)
          case "log10" => math.log10(xs.head)
          case "floor" => math.floor(xs.head)
          case "ceil" => math.ceil(xs.head)
          case other => throw new IllegalArgumentException(s"math:$other")
        }
      case ("linalg", "det") => graft.core.Lattice.det(mat)
      case ("linalg", "norm") => math.sqrt(xs.map(x => x * x).sum)
      case other => throw new IllegalArgumentException(s"special fn $other")
    }
  }

  /** Suffix for one grid value (utility.py:736–763 get_suffix):
    * `<key>_suffix` entries override (a special-function string
    * applied to the values, or an explicit `<key>_suffix*` list
    * indexed by position); default is the 1-based index. Rendered as
    * first-3-chars-of-key + "-" + value (floats as %.2f). */
  private def suffixFor(params: YMap, starKey: String, index: Int,
      value: Node): String = {
    val nk = starKey.stripSuffix("*")
    val sKey = s"${nk}_suffix"
    val keyval: Any = params.get(sKey) match {
      case Some(YStr(sf)) if sf.contains(':') =>
        functions(sf, Seq(num(value)))
      case Some(other) =>
        // format-template semantics (utility.py:752 `.format(values)`):
        // `{}` is replaced by the grid value so suffixes stay unique
        val tpl = str(other)
        if (tpl.contains("{}")) tpl.replace("{}", str(value))
        else s"$tpl${index + 1}" // no placeholder: index keeps names unique
      case None => params.get(sKey + "*") match {
        case Some(YList(xs)) =>
          require(index < xs.length,
            s"$sKey* has ${xs.length} entries but $starKey expands to more values")
          str(xs(index))
        case _ => index + 1
      }
    }
    keyval match {
      case d: Double => f"${nk.take(3)}-$d%.2f"
      case other => s"${nk.take(3)}-$other"
    }
  }

  /** K13/K11 `get_grid`: expand starred keys (and nested maps holding
    * starred keys) into the full cross product of parameter sets,
    * keyed by composed suffix (utility.py:766–819). Starred string
    * values run through `special_values` first, so
    * `rattle*: "linspace(0, 0.2, 5)"` is a 5-point axis. */
  def getGrid(params: YMap, seed: Long = 42L): Seq[(String, YMap)] = {
    def expandVals(n: Node): Seq[Node] = n match {
      case YList(xs) => xs
      case YStr(s) => values(s, seed) match {
        case Some(ds) => ds.map(YNum)
        case None => Seq(YStr(s))
      }
      case other => Seq(other)
    }
    // Must mirror walk's collectFirst exclusion exactly: a map whose
    // only starred keys are `*_suffix*` helpers has nothing walk can
    // consume, and treating it as "nested" would recurse forever.
    def isNested(m: YMap): Boolean = m.items.exists {
      case (k, _) if k.endsWith("*") && !k.stripSuffix("*").endsWith("_suffix") => true
      case (_, sub: YMap) => isNested(sub)
      case _ => false
    }
    def walk(m: YMap): Seq[(Option[String], YMap)] = {
      m.items.collectFirst {
        case (k, v) if k.endsWith("*") && !k.stripSuffix("*").endsWith("_suffix") =>
          (k, v)
      } match {
        case Some((k, v)) =>
          expandVals(v).zipWithIndex.flatMap { case (value, i) =>
            val suffix = suffixFor(m, k, i, value)
            val replaced = YMap(m.items.filterNot(_._1 == k) :+
              (k.stripSuffix("*") -> value))
            walk(replaced).map { case (s2, mm) =>
              (Some(s2.fold(suffix)(x => s"$suffix-$x")), mm)
            }
          }
        case None =>
          m.items.collectFirst {
            case (k, sub: YMap) if isNested(sub) => (k, sub)
          } match {
            case Some((k, sub)) =>
              walk(sub).flatMap { case (s1, subExpanded) =>
                val replaced = YMap(m.items.map {
                  case (`k`, _) => k -> subExpanded
                  case other => other
                })
                walk(replaced).map { case (s2, mm) =>
                  val comp = (s1.toSeq ++ s2.toSeq).mkString("-")
                  (if (comp.isEmpty) None else Some(comp), mm)
                }
              }
            case None => Seq((None, m))
          }
      }
    }
    // drop consumed *_suffix helper keys from the emitted params, at
    // every nesting level (nested axes carry their own helpers)
    def stripSuffixKeys(m: YMap): YMap =
      YMap(m.items
        .filterNot { case (k, _) => k.stripSuffix("*").endsWith("_suffix") }
        .map {
          case (k, sub: YMap) => k -> stripSuffixKeys(sub)
          case other => other
        })
    walk(params).map { case (s, m) => (s.getOrElse(""), stripSuffixKeys(m)) }
  }
}
