package graft.model

import scala.util.matching.Regex

/** Config loading with the reference's semantics (config.py:16-100;
  * config/google_apis.yaml):
  *
  *  - declarative queries: name / entity / date_column / fields;
  *  - top-level source settings: customer_ids (CSV split+trim, X3),
  *    lookback_days_daily, catch_up_window_days, default_currency;
  *  - `${VAR}` environment interpolation — documented in the reference
  *    (README.md:26) but never implemented there (config.py:93-100);
  *    implemented here for real, with missing-variable errors;
  *  - validation errors that name the offending field (the Pydantic
  *    role).
  *
  * The wire format is a minimal indentation-based subset of YAML
  * sufficient for the reference's config shape (no new dependencies —
  * offline build). A Scala DSL constructor is also provided for
  * programmatic use.
  */
final case class SourceConfig(
    name: String,
    customerIds: Seq[String],
    lookbackDaysDaily: Int,
    catchUpWindowDays: Int,
    defaultCurrency: String,
    queries: Seq[QueryDefinition],
) {
  def queryByName(n: String): QueryDefinition =
    queries.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"unknown query '$n' (have: ${queries.map(_.name).mkString(", ")})"))
}

object ConfigLoader {
  private val varPattern: Regex = raw"\$$\{([A-Za-z_][A-Za-z0-9_]*)\}".r

  /** `${VAR}` interpolation against `env`; unknown variables are errors
    * (silent empty substitution hides misconfiguration).
    */
  def interpolate(s: String, env: Map[String, String]): String =
    varPattern.replaceAllIn(s, m =>
      Regex.quoteReplacement(env.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"undefined environment variable $${${m.group(1)}}"))))

  /** X3 — CSV split + trim, dropping empties (config.py:31-36). */
  def splitCustomerIds(csv: String): Seq[String] =
    csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** `.env` file loading (reference env.py:1-17, which proxies
    * python-dotenv): `KEY=VALUE` lines, `#` comments, optional
    * `export ` prefix, optional single/double quotes around the value.
    * Returns the parsed map; [[envWithFile]] applies dotenv's default
    * merge rule (the real environment wins over the file).
    */
  def loadEnvFile(path: java.nio.file.Path): Map[String, String] = {
    require(java.nio.file.Files.exists(path), s".env file not found: $path")
    // readAllLines (not Files.lines): the stream variant holds the file
    // descriptor until close(), which a drained iterator never calls
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(path)).asScala
      .iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l =>
        val noExport = l.stripPrefix("export ").trim
        val Array(k, v) = noExport.split("=", 2)
        val unquoted = v.trim match {
          case q if q.length >= 2 && (q.startsWith("\"") && q.endsWith("\"") ||
            q.startsWith("'") && q.endsWith("'")) => q.substring(1, q.length - 1)
          case other => other
        }
        k.trim -> unquoted
      }
      .toMap
  }

  /** Environment for interpolation: file values overlaid by the real
    * environment (dotenv `override=False` semantics — an exported
    * variable beats the file).
    */
  def envWithFile(path: java.nio.file.Path, base: Map[String, String] = sys.env): Map[String, String] =
    loadEnvFile(path) ++ base

  /** Credential-block validation (google_ads_client.py:11-49): gather
    * `<PREFIX>_<FIELD>` for every required field, reporting ALL missing
    * keys in one actionable error rather than failing on the first —
    * the reference's operator-experience contract for client setup.
    */
  def requiredEnv(
      prefix: String,
      fields: Seq[String],
      env: Map[String, String] = sys.env,
  ): Map[String, String] = {
    val keyed = fields.map(f =>
      f -> s"${prefix.toUpperCase(java.util.Locale.ROOT)}_$f")
    val missing = keyed.collect { case (_, k) if env.get(k).forall(_.isEmpty) => k }
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Missing environment variables: ${missing.sorted.mkString(", ")}")
    keyed.map { case (f, k) => f -> env(k) }.toMap
  }

  /** Parse the minimal YAML subset:
    * {{{
    * source: google_ads
    * customer_ids: "123-456, 789"
    * lookback_days_daily: 2
    * catch_up_window_days: 35
    * default_currency: USD
    * queries:
    *   - name: campaign_daily
    *     entity: campaign
    *     date_column: segments.date
    *     fields: campaign.id, metrics.clicks
    * }}}
    */
  def parse(text: String, env: Map[String, String] = sys.env): SourceConfig = {
    val lines = text.linesIterator
      .map(_.takeWhile(_ != '#'))
      .filter(_.trim.nonEmpty)
      .toSeq
    val top = scala.collection.mutable.Map[String, String]()
    val queries = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.Map[String, String]]()
    var inQueries = false
    lines.foreach { raw =>
      val indent = raw.takeWhile(_ == ' ').length
      val line = raw.trim
      if (indent == 0) {
        inQueries = line.startsWith("queries:")
        if (!inQueries) {
          val (k, v) = splitKv(line)
          top(k) = v
        }
      } else if (inQueries) {
        if (line.startsWith("- ")) {
          queries += scala.collection.mutable.Map[String, String]()
          val rest = line.stripPrefix("- ").trim
          if (rest.nonEmpty) { val (k, v) = splitKv(rest); queries.last(k) = v }
        } else {
          require(queries.nonEmpty, s"query attribute before first '-': $line")
          val (k, v) = splitKv(line)
          queries.last(k) = v
        }
      } else throw new IllegalArgumentException(s"unexpected indented line outside queries: $line")
    }

    def req(m: collection.Map[String, String], k: String, ctx: String): String =
      interpolate(
        m.getOrElse(k, throw new IllegalArgumentException(s"missing required field '$k' in $ctx")),
        env)

    val qdefs = queries.zipWithIndex.map { case (m, i) =>
      val ctx = s"queries[$i]"
      val fields = req(m, "fields", ctx).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(fields.nonEmpty, s"$ctx: fields must be non-empty")
      QueryDefinition(req(m, "name", ctx), req(m, "entity", ctx), req(m, "date_column", ctx), fields)
    }.toSeq
    require(qdefs.map(_.name).distinct.size == qdefs.size, "duplicate query names")

    SourceConfig(
      name = req(top, "source", "top level"),
      customerIds = splitCustomerIds(req(top, "customer_ids", "top level")),
      lookbackDaysDaily = req(top, "lookback_days_daily", "top level").toInt,
      catchUpWindowDays = req(top, "catch_up_window_days", "top level").toInt,
      defaultCurrency = top.get("default_currency").map(interpolate(_, env)).getOrElse("USD"),
      queries = qdefs,
    )
  }

  private def splitKv(line: String): (String, String) = {
    val idx = line.indexOf(':')
    require(idx > 0, s"expected 'key: value', got: $line")
    (line.take(idx).trim, stripQuotes(line.drop(idx + 1).trim))
  }

  private def stripQuotes(v: String): String =
    if (v.length >= 2 && ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v
}
