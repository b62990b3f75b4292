package graft.analysis

import java.time.Instant
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

/** Alert message rendering — the template layer of the reference's
  * check-alerts task (packages/api/src/tasks/checkAlerts/template.ts):
  * threshold wording, value formatting to the threshold's precision, the
  * default title/body texts with the group line for grouped alerts, and a
  * minimal `{{var}}` substitution for user webhook body templates.
  * Driver-side strings — the rendered payload feeds
  * [[graft.compile.Sinks.notifyEachBatch]]'s callback (transport stays
  * the caller's concern, as declared since round 1).
  */
object AlertTemplates {
  import Alerts._
  import Alerts.ThresholdType._

  /** The message shape handed to the webhook transport
    * (template.ts:176-184). */
  final case class Message(title: String, body: String, state: AlertState,
      startTime: Instant, endTime: Instant, link: String)

  /** Wording when the value violates the threshold (template.ts:80-101). */
  def describeThresholdViolation(t: ThresholdType): String = t match {
    case Above => "meets or exceeds"
    case AboveExclusive => "exceeds"
    case Below => "falls below"
    case BelowOrEqual => "falls to or below"
    case Equal => "equals"
    case NotEqual => "does not equal"
    case Between => "falls between"
    case NotBetween => "falls outside"
  }

  /** Wording when the value has recovered (template.ts:103-124). */
  def describeThresholdResolution(t: ThresholdType): String = t match {
    case Above => "falls below"
    case AboveExclusive => "falls to or below"
    case Below => "meets or exceeds"
    case BelowOrEqual => "exceeds"
    case Equal => "does not equal"
    case NotEqual => "equals"
    case Between => "falls outside"
    case NotBetween => "falls between"
  }

  /** The threshold text: one number, or "a and b" for range types
    * (template.ts:126-130). */
  def describeThreshold(threshold: Double, thresholdMax: Option[Double],
      t: ThresholdType): String = t match {
    case Between | NotBetween =>
      s"${num(threshold)} and ${thresholdMax.map(num).getOrElse("?")}"
    case _ => num(threshold)
  }

  /** Shortest decimal rendering of a double (JS Number-style: integral
    * values print without a trailing `.0`). */
  private def num(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else BigDecimal(d).bigDecimal.stripTrailingZeros.toPlainString

  /** Format `value` with exactly the threshold's decimal places, rounding
    * half away from zero like JS Intl.NumberFormat
    * (template.ts:195-215). */
  def formatValueToMatchThreshold(value: Double, threshold: Double)
      : String = {
    val ts = num(threshold)
    val i = ts.indexOf('.')
    val dp = if (i == -1) 0 else ts.length - i - 1
    BigDecimal(value).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.toPlainString
  }

  /** Minimal template substitution over a flat view: `{{key}}` and
    * `{{{key}}}` insert view(key), missing keys render empty — the subset
    * of Handlebars the reference's default templates use (no helpers;
    * values are data, never re-parsed as template source, matching the
    * reference's untrusted-value rule, template.ts:570-573). */
  def render(template: String, view: Map[String, String]): String = {
    val re = "\\{\\{\\{?\\s*([A-Za-z0-9_.]+)\\s*\\}?\\}\\}".r
    re.replaceAllIn(template, m =>
      scala.util.matching.Regex
        .quoteReplacement(view.getOrElse(m.group(1), "")))
  }

  /** Fallback generic-webhook body when none is configured
    * (template.ts:140-141). */
  val DefaultGenericWebhookBody: String =
    "{\"text\": \"{{title}} | {{body}} | {{link}} | {{state}} | " +
      "{{startTime}} | {{endTime}} | {{eventId}}\"}"

  private val fmtDate = DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  /** "Time Range (UTC): [start - end)" line (template.ts:672-676). */
  def timeRangeMessage(start: Instant, end: Instant): String =
    s"Time Range (UTC): [${fmtDate.format(start)} - ${fmtDate.format(end)})"

  /** Default title: state emoji + the saved-search text
    * (template.ts:442-470). */
  def title(alertName: String, state: AlertState, value: Double): String = {
    val emoji = if (state == OK) "✅ " else "🚨 "
    s"""${emoji}Alert for "$alertName" - ${num(value)} lines found"""
  }

  /** Default body: the resolved arm or the saved-search violation arm,
    * prefixed with the group line for grouped alerts
    * (template.ts:679-770). */
  def body(cfg: AlertRunner.AlertConfig, state: AlertState,
      group: Seq[String], value: Double, start: Instant, end: Instant)
      : String = {
    val groupLine =
      if (group.isEmpty) "" else s"""Group: "${group.mkString(", ")}""""
    if (state == OK) {
      val prefix = if (groupLine.isEmpty) "" else groupLine + " - "
      s"${prefix}The alert has been resolved.\n" +
        timeRangeMessage(start, end)
    } else {
      val prefix = if (groupLine.isEmpty) "" else groupLine + "\n"
      s"$prefix${num(value)} lines found, which " +
        s"${describeThresholdViolation(cfg.thresholdType)} the threshold " +
        s"of ${describeThreshold(cfg.threshold, cfg.thresholdMax,
          cfg.thresholdType)} lines\n" +
        timeRangeMessage(start, end)
    }
  }

  /** Render the full Message for one AlertRunner result; the last closed
    * window is the event window. */
  def message(alertName: String, cfg: AlertRunner.AlertConfig,
      r: AlertRunner.AlertResult, link: String = ""): Message = {
    val (lastStart, value) = r.windowValues.last
    val end = lastStart.plusSeconds(cfg.intervalMinutes * 60L)
    Message(title(alertName, r.state, value),
      body(cfg, r.state, r.group, value, lastStart, end),
      r.state, lastStart, end, link)
  }

  /** JSON string-literal escaping for substituted values: backslash,
    * quote, and all control characters. Without it the default title
    * (embedded quotes) and body (newlines) make every rendered payload
    * unparseable. */
  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** The generic-webhook JSON payload for a Message via the (default or
    * user-supplied) body template. Values are JSON-string-escaped
    * before substitution — the template places them inside JSON string
    * literals (the reference escapes likewise before JSON.parse,
    * template.ts translateExternalActionsToInternal). */
  def webhookPayload(m: Message,
      template: String = DefaultGenericWebhookBody,
      eventId: String = ""): String =
    render(template, Map(
      "title" -> m.title,
      "body" -> m.body,
      "link" -> m.link,
      "state" -> m.state.toString,
      "startTime" -> m.startTime.toString,
      "endTime" -> m.endTime.toString,
      "eventId" -> eventId).view.mapValues(jsonEscape).toMap)

  /** Slack mrkdwn requires `& < >` to ride as entities inside text —
    * otherwise a title containing `<` opens a phantom link span
    * (api.slack.com/reference/surfaces/formatting#escaping; the
    * reference passes raw strings and inherits the glitch). */
  private def mrkdwnEscape(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** The Slack-shaped webhook body (template.ts:252-262,
    * handleSendSlackWebhook): top-level `text` carries the title (the
    * notification line), and one mrkdwn section block renders
    * `*<link | title>*` followed by the default body — the threshold
    * wording, the group values line for grouped alerts, and the time
    * range all arrive through [[body]]. With no chart link the title
    * renders plain-bold (a `<|…>` with an empty URL is a broken span).
    * Fired vs recovered transitions differ exactly as [[title]]/
    * [[body]] differ: 🚨 + violation wording vs ✅ + resolution. */
  def slackPayload(m: Message): String = {
    val t = mrkdwnEscape(m.title)
    val headline =
      if (m.link.isEmpty) s"*$t*"
      else s"*<${mrkdwnEscape(m.link)} | $t>*"
    val section = jsonEscape(s"$headline\n${mrkdwnEscape(m.body)}")
    s"""{"text": ${"\"" + jsonEscape(m.title) + "\""}, "blocks": [""" +
      s"""{"type": "section", "text": {"type": "mrkdwn", """ +
      s""""text": "$section"}}]}"""
  }
}
