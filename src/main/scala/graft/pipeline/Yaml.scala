package graft.pipeline

/** Minimal YAML-subset parser for pipeline specs (SURVEY §2.1 S11;
  * reference: io.py:345–440 reads the matdb.yml hierarchy — here a
  * dependency-free subset parser: nested maps by 2-space indentation,
  * `- ` list items, inline `[a, b]` lists and `{k: v}` maps, scalar
  * typing for int/double/bool. Enough for the §3.1 spec shape; not a
  * general YAML implementation (no anchors/multiline/flow nesting).
  */
object Yaml {

  sealed trait Node
  final case class YMap(items: Vector[(String, Node)]) extends Node {
    def apply(k: String): Node = items.find(_._1 == k).map(_._2)
      .getOrElse(throw new NoSuchElementException(s"key $k"))
    def get(k: String): Option[Node] = items.find(_._1 == k).map(_._2)
    def keys: Seq[String] = items.map(_._1)
  }
  final case class YList(items: Vector[Node]) extends Node
  final case class YStr(v: String) extends Node
  final case class YNum(v: Double) extends Node
  final case class YBool(v: Boolean) extends Node

  def str(n: Node): String = n match {
    case YStr(s) => s
    case YNum(d) => if (d == d.toLong) d.toLong.toString else d.toString
    case YBool(b) => b.toString
    case other => throw new IllegalArgumentException(s"not a scalar: $other")
  }
  def num(n: Node): Double = n match {
    case YNum(d) => d
    case YStr(s) => s.toDouble
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }

  private def scalar(s: String): Node = {
    val t = s.trim
    if (t == "true" || t == "false") YBool(t.toBoolean)
    else if (t.matches("-?\\d+(\\.\\d+)?([eE][-+]?\\d+)?"))
      YNum(t.toDouble)
    else YStr(t.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'"))
  }

  /** Split a flow-style payload on top-level commas. */
  private def splitFlow(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case c @ ('[' | '{') => depth += 1; cur.append(c)
      case c @ (']' | '}') => depth -= 1; cur.append(c)
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def value(s: String): Node = {
    val t = s.trim
    if (t.startsWith("[") && t.endsWith("]"))
      YList(splitFlow(t.drop(1).dropRight(1)).map(value).toVector)
    else if (t.startsWith("{") && t.endsWith("}"))
      YMap(splitFlow(t.drop(1).dropRight(1)).map { kv =>
        val i = kv.indexOf(':')
        kv.take(i).trim -> value(kv.drop(i + 1))
      }.toVector)
    else scalar(t)
  }

  private final case class Line(indent: Int, text: String)

  def parse(yaml: String): YMap = {
    val lines = toLines(yaml)
    val (node, rest) = parseMap(lines, 0)
    require(rest.isEmpty, s"unparsed trailing lines: ${rest.take(2)}")
    node
  }

  /** Parse a document whose root may be a map OR a list (included
    * sub-spec files are often bare lists). */
  def parseAny(yaml: String): Node = {
    val lines = toLines(yaml)
    if (lines.nonEmpty && lines.head.text.startsWith("- ")) {
      val (node, rest) = parseList(lines, lines.head.indent)
      require(rest.isEmpty, s"unparsed trailing lines: ${rest.take(2)}")
      node
    } else parse(yaml)
  }

  private def toLines(yaml: String): Vector[Line] =
    yaml.linesIterator
      .map(l => l.takeWhile(_ != '#') /* strip comments */)
      .filter(_.trim.nonEmpty)
      .map(l => Line(l.takeWhile(_ == ' ').length, l.trim))
      .toVector

  /** S11 hierarchical spec assembly (reference: io.py:345–440): a
    * string value `":name"` links to `name.yml` resolved against the
    * current context directory; links expand recursively, list items
    * included. A root-level `context:` map gives per-key relative
    * context directories for reads within that item (io.py:430–437).
    *
    * @param context directory the file name resolves against.
    * @param yfile file name relative to context, WITHOUT the `.yml`
    *   extension (the reference requires `.yml`, not `.yaml`).
    */
  def readSpec(context: String, yfile: String): Node =
    readSpec(context, yfile, Vector.empty)

  /** `visiting` is the chain of include targets currently being
    * expanded; a repeat means the spec files include each other and
    * expansion would never terminate, so fail with the chain instead
    * of a StackOverflowError. */
  private def readSpec(context: String, yfile: String,
      visiting: Vector[java.nio.file.Path]): Node = {
    val name = if (yfile.startsWith(":")) yfile.drop(1) else yfile
    val target = java.nio.file.Paths.get(context).resolve(name + ".yml")
    require(java.nio.file.Files.isRegularFile(target),
      s"template file '$yfile.yml' not found relative to '$context'")
    // toRealPath resolves symlinks (the file exists — checked above), so
    // a cycle routed through a symlinked path or directory still keys to
    // the same real file and is caught instead of overflowing the stack.
    val canon = target.toRealPath()
    if (visiting.contains(canon))
      throw new IllegalArgumentException(
        s"cyclic :link include: ${(visiting :+ canon).mkString(" -> ")}")
    val chain = visiting :+ canon
    val root = parseAny(java.nio.file.Files.readString(target))
    val ncontext = canon.getParent.toString
    root match {
      case m: YMap =>
        // local context: {key: relative-dir} for reads within that item
        val lcontext = m.get("context") match {
          case Some(cm: YMap) =>
            cm.items.map { case (k, v) => k -> str(v) }.toMap
          case _ => Map.empty[String, String]
        }
        unpack(ncontext,
          YMap(m.items.filterNot(_._1 == "context")), lcontext, chain)
      case other => unpack(ncontext, other, Map.empty, chain)
    }
  }

  private def isLink(n: Node): Boolean = n match {
    case YStr(s) => s.startsWith(":")
    case _ => false
  }

  private def unpack(context: String, node: Node,
      lcontext: Map[String, String],
      visiting: Vector[java.nio.file.Path]): Node = node match {
    case m: YMap => YMap(m.items.map { case (k, v) =>
      val nctx = lcontext.get(k).map(rel =>
        java.nio.file.Paths.get(context).resolve(rel)
          .normalize().toString).getOrElse(context)
      if (isLink(v)) k -> readSpec(nctx, str(v), visiting)
      else k -> unpack(nctx, v, Map.empty, visiting)
    })
    case YList(xs) => YList(xs.map { o =>
      if (isLink(o)) readSpec(context, str(o), visiting)
      else unpack(context, o, Map.empty, visiting)
    })
    case other => other
  }

  private def parseMap(lines: Vector[Line], indent: Int): (YMap, Vector[Line]) = {
    var rest = lines
    val items = Vector.newBuilder[(String, Node)]
    while (rest.nonEmpty && rest.head.indent == indent &&
        !rest.head.text.startsWith("- ")) {
      val Line(_, text) = rest.head
      val i = text.indexOf(':')
      require(i > 0, s"expected key: value, got '$text'")
      val key = text.take(i).trim
      val payload = text.drop(i + 1).trim
      rest = rest.tail
      if (payload.nonEmpty) items += key -> value(payload)
      else if (rest.nonEmpty && rest.head.indent > indent &&
          rest.head.text.startsWith("- ")) {
        val (l, r) = parseList(rest, rest.head.indent)
        items += key -> l; rest = r
      } else if (rest.nonEmpty && rest.head.indent > indent) {
        val (m, r) = parseMap(rest, rest.head.indent)
        items += key -> m; rest = r
      } else items += key -> YStr("")
    }
    (YMap(items.result()), rest)
  }

  private def parseList(lines: Vector[Line], indent: Int): (YList, Vector[Line]) = {
    var rest = lines
    val items = Vector.newBuilder[Node]
    while (rest.nonEmpty && rest.head.indent == indent &&
        rest.head.text.startsWith("- ")) {
      val inner = rest.head.text.drop(2).trim
      rest = rest.tail
      val isMapItem = inner.contains(":") &&
        !inner.startsWith("[") && !inner.startsWith("{")
      if (isMapItem) {
        // map item: the inline pair + every deeper-indented line
        val cont = rest.takeWhile(_.indent > indent)
        rest = rest.drop(cont.length)
        val (m, leftover) = parseMap(Line(indent + 2, inner) +: cont, indent + 2)
        require(leftover.isEmpty, s"bad list-item map near '$inner'")
        items += m
      } else items += value(inner)
    }
    (YList(items.result()), rest)
  }
}
