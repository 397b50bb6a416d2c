package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

import graft.functions.AflowDsl
import graft.functions.AflowDsl.{And, Cmp, Not, Or, Pred}

/** AFLOW REST (AFLUX) source — the reference's only external data
  * source (SURVEY §2.1 S9, §2.2 G10; reference: database/aflux.py —
  * query fields 186–191, `_build_query` 263–277, response→configs
  * 279–316; calculators/aflux.py:113–131 re-hydrates the downloaded
  * entry).
  *
  * Split into the two halves that are pure code (no socket in this
  * environment, as in the reference's own tests which pre-fill
  * responses from a canned JSON file, tests/conftest.py:71–92):
  *
  *  1. '''Request builder''': compiles the filter DSL ([[AflowDsl]]),
  *     select/exclude lists, orderby and paging into AFLUX matchbook
  *     URLs. Grammar per the published AFLUX API (Rose & Curtarolo,
  *     "AFLUX: The LUX materials search API for the AFLOW data
  *     repositories", Comput. Mater. Sci. 137 (2017) 362–370):
  *     comma-joined `keyword(condition)` blocks; within a condition
  *     `,`=AND `:`=OR `!`=NOT, `value*`/`*value`/`*value*` loose
  *     prefix/suffix/substring (≥/≤ for numbers); directives are
  *     `$`-prefixed (`$paging(page,count)`, `$catalog(name)`); the
  *     first keyword in the matchbook is the sort key, `$`-prefixed
  *     to reverse.
  *  2. '''Response mapper''': AFLUX responses are JSON objects keyed
  *     `"<rank> of <total>"` → {keyword: value}. Parsed entirely with
  *     codegen'd built-ins (`from_json` on a map schema + `explode`),
  *     so a directory of paged response files ingests as one
  *     distributed scan — no driver-side JSON work at any page count.
  */
object Aflux {

  val DefaultServer = "http://aflowlib.duke.edu/search/API/"

  /** The reference's canned AFLUX response (its `paper` test fixture,
    * tests/conftest.py:71–92): 20 entries of the 912-row
    * electrically-insulating-heat-sinks query. */
  val PaperFixture = "/root/reference/tests/files/aflow/data.json"

  /** Response keyword → config param renames applied on ingest
    * (database/aflux.py:196–204). */
  val DefaultKeywords: Map[String, String] =
    Map("energy_cell" -> "ref_energy", "forces" -> "ref_force")

  /** Declarative AFLUX query: the reference's S9 constructor surface
    * (catalog/filters/select/orderby/exclude/limit,
    * database/aflux.py:147–191). */
  final case class Query(
      filters: Seq[Pred] = Nil,
      select: Seq[String] = Nil,
      exclude: Seq[String] = Nil,
      orderby: Option[String] = None,
      reverse: Boolean = false,
      catalog: Option[String] = None,
      batchSize: Int = 100,
      limit: Option[Int] = None) {

    def matchbook: String = Aflux.matchbook(this)

    /** Full request URL for 1-based page `page`. */
    def requestUrl(page: Int, server: String = DefaultServer): String =
      s"$server?$matchbook,${directives(page)}"

    /** All page URLs needed to satisfy `limit` (reference slices
      * `result[0:nconfigs]` over `batch_size` pages, aflux.py:273–277);
      * without a limit, the caller pages until a short response. */
    def pageUrls(server: String = DefaultServer): Seq[String] = {
      val n = limit.getOrElse(
        throw new IllegalArgumentException("pageUrls needs a limit"))
      val pages = (n + batchSize - 1) / batchSize
      (1 to pages).map(requestUrl(_, server))
    }

    private def directives(page: Int): String = {
      val cat = catalog.map(c => s"$$catalog($c)").toSeq
      (cat :+ s"$$paging($page,$batchSize)").mkString(",")
    }
  }

  /** One `keyword(condition)` fragment per keyword touched by `p` —
    * EXACTLY one: a cross-keyword AND regroups its children per
    * keyword and merges each keyword's conditions with `,` (AND
    * inside the parens), since a property may appear only once in an
    * AFLUX matchbook. OR across different keywords is not expressible
    * in one AFLUX request. */
  def matchbookItems(p: Pred): Seq[(String, String)] = p match {
    case And(ps @ _*) if keysOf(p).size > 1 =>
      require(ps.forall(c => keysOf(c).size == 1),
        s"AFLUX cannot nest a cross-keyword clause inside AND: $p")
      ps.groupBy(c => keysOf(c).head).toSeq.sortBy {
        case (k, _) => ps.indexWhere(c => keysOf(c).head == k)
      }.map { case (k, same) =>
        k -> (if (same.length == 1) condition(same.head)
              else condition(And(same: _*)))
      }
    case _ =>
      val ks = keysOf(p)
      require(ks.size == 1,
        s"AFLUX cannot express a cross-keyword ${p.getClass.getSimpleName}: $ks")
      Seq(ks.head -> condition(p))
  }

  private def keysOf(p: Pred): Set[String] = p match {
    case Cmp(k, _, _) => Set(k)
    case And(ps @ _*) => ps.flatMap(keysOf).toSet
    case Or(ps @ _*)  => ps.flatMap(keysOf).toSet
    case Not(q)       => keysOf(q)
  }

  /** Inside-the-parens condition text for a single-keyword predicate. */
  private def condition(p: Pred): String = p match {
    case Cmp(_, op, v) =>
      val q = quote(v)
      op match {
        case "==" => q
        case ">"  => s"$q*" // ≥ for numbers, prefix for strings
        case "<"  => s"*$q" // ≤ for numbers, suffix for strings
        case "%"  => s"*$q*"
        case o => throw new IllegalArgumentException(s"AFLUX op: $o")
      }
    case And(ps @ _*) => ps.map(group).mkString(",")
    case Or(ps @ _*)  => ps.map(group).mkString(":")
    case Not(q)       => s"!${group(q)}"
  }

  /** Parenthesize composite children so AND/OR nesting is explicit. */
  private def group(p: Pred): String = p match {
    case _: Cmp => condition(p)
    case Not(_: Cmp) => condition(p)
    case _ => s"(${condition(p)})"
  }

  private def quote(v: Any): String = v match {
    case s: String if !s.forall(c => c.isLetterOrDigit || c == '_') => s"'$s'"
    case other => other.toString
  }

  /** Matchbook: orderby keyword first (`$` = descending), then filter
    * fragments, then bare select keywords, then `$`-excluded ones.
    * Each keyword appears at most once: a filtered (or orderby'd)
    * keyword is already returned by AFLUX, so bare select duplicates
    * of it are dropped. */
  def matchbook(q: Query): String = {
    val order = q.orderby.map(k => (if (q.reverse) "$" else "") + k).toSeq
    val filtItems = q.filters.flatMap(matchbookItems)
    val filt = filtItems.map { case (k, cond) => s"$k($cond)" }
    val sel = q.select.filterNot(k =>
      q.orderby.contains(k) || filtItems.exists(_._1 == k))
    val excl = q.exclude.map("$" + _)
    (order ++ filt ++ sel ++ excl).mkString(",")
  }

  /** Parse AFLUX response JSON file(s) at `path` (a file or a
    * directory of paged responses) into one row per entry:
    * `(idx, total, entry: Map[String,String])`. Distributed: each
    * response file parses in its own task via codegen'd `from_json`. */
  def responses(s: SparkSession, path: String): DataFrame = {
    val entrySchema = MapType(StringType, MapType(StringType, StringType))
    s.read.option("wholetext", "true").text(path)
      .select(explode(from_json(col("value"), entrySchema))
        .as(Seq("rank_key", "entry")))
      .select(
        split(col("rank_key"), " of ").getItem(0).cast("int").as("idx"),
        split(col("rank_key"), " of ").getItem(1).cast("long").as("total"),
        col("entry"))
  }

  /** Response entries → config rows: standard identity columns plus
    * one column per requested keyword, renamed through `keywords`
    * (G10's keyword→param mapping, aflux.py:279–316). `numeric`
    * keywords cast to double (AFLUX returns all values as strings). */
  def toConfigs(entries: DataFrame, select: Seq[String],
      numeric: Set[String] = Set.empty,
      keywords: Map[String, String] = DefaultKeywords): DataFrame = {
    val ident = Seq(col("idx"), col("total"),
      col("entry")("auid").as("auid"),
      col("entry")("compound").as("compound"),
      col("entry")("aurl").as("aurl"))
    val params = select.map { kw =>
      val c = col("entry")(kw)
      val cast = if (numeric(kw)) c.cast("double") else c
      cast.as(keywords.getOrElse(kw, kw))
    }
    entries.select(ident ++ params: _*)
  }

  /** The reference's paper query (tests/conftest.py:71–92): insulating
    * heat sinks — `Egap > 6`, select thermal conductivity, descending. */
  val paperQuery: Query = Query(
    filters = Seq(Cmp("Egap", ">", 6)),
    select = Seq("agl_thermal_conductivity_300K", "Egap"),
    orderby = Some("agl_thermal_conductivity_300K"),
    reverse = true,
    batchSize = 20,
    limit = Some(20))

  /** S9 end-to-end over the canned fixture: request built (URL
    * recorded as a literal column for provenance), responses ingested,
    * keywords mapped — the full source path minus the socket. */
  def s9Aflux(s: SparkSession, dir: String): DataFrame =
    toConfigs(responses(s, PaperFixture),
      select = Seq("Egap", "agl_thermal_conductivity_300K"),
      numeric = Set("Egap", "agl_thermal_conductivity_300K"),
      keywords = Map("Egap" -> "egap",
        "agl_thermal_conductivity_300K" -> "ref_thermal_k"))
      .select(col("idx"), col("total"), col("auid"), col("compound"),
        col("egap"), col("ref_thermal_k"))
      .orderBy(col("idx"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s9_aflux" -> (s9Aflux _))

  val oracle: Map[String, String] = Map(
    "s9_aflux" ->
      s"""WITH raw AS (SELECT json(content) AS j FROM read_text('$PaperFixture')),
         |keys AS (SELECT j, unnest(json_keys(j)) AS rank_key FROM raw),
         |e AS (SELECT rank_key,
         |        json_extract(j, '$$."' || rank_key || '"') AS entry
         |      FROM keys)
         |SELECT CAST(split_part(rank_key, ' of ', 1) AS INT) AS idx,
         |  CAST(split_part(rank_key, ' of ', 2) AS BIGINT) AS total,
         |  entry->>'auid' AS auid, entry->>'compound' AS compound,
         |  CAST(entry->>'Egap' AS DOUBLE) AS egap,
         |  CAST(entry->>'agl_thermal_conductivity_300K' AS DOUBLE)
         |    AS ref_thermal_k
         |FROM e ORDER BY idx""".stripMargin)
}
