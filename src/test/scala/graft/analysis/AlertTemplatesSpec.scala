package graft.analysis

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

class AlertTemplatesSpec extends AnyFunSuite {
  import AlertTemplates._

  private val cfg = AlertRunner.AlertConfig(source = "logs", where = None,
    intervalMinutes = 5, threshold = 10,
    thresholdType = Alerts.ThresholdType.Above)

  private val w = Instant.parse("2024-01-05T10:10:00Z")

  test("ungrouped firing alert renders the violation body") {
    val r = AlertRunner.AlertResult(Nil, Alerts.ALERT, Seq(w -> 14.0))
    val m = message("error spike", cfg, r)
    assert(m.title == "🚨 Alert for \"error spike\" - 14 lines found")
    assert(m.body ==
      "14 lines found, which meets or exceeds the threshold of 10 lines\n" +
        "Time Range (UTC): [2024-01-05 10:10:00 - 2024-01-05 10:15:00)")
    assert(m.startTime == w &&
      m.endTime == Instant.parse("2024-01-05T10:15:00Z"))
  }

  test("grouped alert renders the group line; resolved uses its arm") {
    val firing = AlertRunner.AlertResult(Seq("api"), Alerts.ALERT,
      Seq(w -> 12.0))
    assert(message("err", cfg, firing).body.startsWith(
      "Group: \"api\"\n12 lines found, which meets or exceeds"))
    val resolved = AlertRunner.AlertResult(Seq("api"), Alerts.OK,
      Seq(w -> 2.0))
    val m = message("err", cfg, resolved)
    assert(m.title.startsWith("✅ "))
    assert(m.body ==
      "Group: \"api\" - The alert has been resolved.\n" +
        "Time Range (UTC): [2024-01-05 10:10:00 - 2024-01-05 10:15:00)")
  }

  test("threshold wording covers every type; range text uses both bounds") {
    import Alerts.ThresholdType._
    assert(describeThresholdViolation(Below) == "falls below")
    assert(describeThresholdResolution(Below) == "meets or exceeds")
    assert(describeThresholdViolation(NotBetween) == "falls outside")
    assert(describeThreshold(1.5, Some(4.0), Between) == "1.5 and 4")
    assert(describeThreshold(3.0, None, Above) == "3")
  }

  test("value formats to the threshold's decimal precision, half-up") {
    assert(formatValueToMatchThreshold(9.5, 10) == "10")
    assert(formatValueToMatchThreshold(3.14159, 0.5) == "3.1")
    assert(formatValueToMatchThreshold(2.0, 0.25) == "2.00")
  }

  test("webhook payload substitutes the default template") {
    val m = Message("t", "b", Alerts.ALERT, w, w.plusSeconds(300), "L")
    val payload = webhookPayload(m, eventId = "e1")
    assert(payload == "{\"text\": \"t | b | L | ALERT | " +
      "2024-01-05T10:10:00Z | 2024-01-05T10:15:00Z | e1\"}")
    // unknown keys render empty; triple-stache accepted
    assert(render("a {{{title}}} z {{nope}}!", Map("title" -> "X")) ==
      "a X z !")
  }

  test("webhook payload stays valid JSON for the DEFAULT title and body") {
    // the default title embeds double quotes, the default body newlines —
    // both must arrive escaped inside the JSON string literal
    val cfg = AlertRunner.AlertConfig(source = "", where = None,
      threshold = 10)
    val m = Message(
      title("my \"quoted\" search", Alerts.ALERT, 42),
      body(cfg, Alerts.ALERT, Seq("svc-a"), 42, w, w.plusSeconds(300)),
      Alerts.ALERT, w, w.plusSeconds(300), "http://x/y?z=1")
    val payload = webhookPayload(m)
    // parses as JSON: extract the text field back and check content
    // round-tripped (a tiny manual parse: the payload is one flat object)
    assert(payload.startsWith("{\"text\": \"") && payload.endsWith("\"}"))
    val inner = payload.stripPrefix("{\"text\": \"").stripSuffix("\"}")
    // no raw quotes or control chars may remain inside the literal
    assert(!inner.replace("\\\"", "").contains('"'), payload)
    assert(!inner.exists(_ < ' '), payload)
    assert(inner.contains("\\\"my \\\"quoted\\\" search\\\""))
    assert(inner.contains("\\n"))
  }

  test("slack payload: fired transition renders text + one mrkdwn " +
      "section with the linked title, threshold wording, and group") {
    val firing = AlertRunner.AlertResult(Seq("api", "us-east"),
      Alerts.ALERT, Seq(w -> 14.0))
    val m = message("error spike", cfg, firing,
      link = "http://h/search/abc?from=1")
    val p = slackPayload(m)
    // Jackson parse: the payload must be real JSON with the Slack shape
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(p)
    assert(root.get("text").asText.contains("🚨 Alert for"))
    val blocks = root.get("blocks")
    assert(blocks.isArray && blocks.size == 1)
    val sect = blocks.get(0)
    assert(sect.get("type").asText == "section")
    assert(sect.get("text").get("type").asText == "mrkdwn")
    val md = sect.get("text").get("text").asText
    // *<link | title>* headline, then the default body: group line,
    // threshold wording, time range
    // the wrapping < > are the REAL Slack link span; only the URL and
    // title contents are entity-escaped
    assert(md.startsWith("*<http://h/search/abc?from=1 | "), md)
    assert(md.contains("meets or exceeds the threshold of 10"), md)
    assert(md.contains("Group: \"api, us-east\""), md)
    assert(md.contains("Time Range (UTC):"), md)
  }

  test("slack payload: recovered transition uses the resolution arm " +
      "and a linkless title renders plain-bold") {
    val resolved = AlertRunner.AlertResult(Nil, Alerts.OK, Seq(w -> 2.0))
    val m = message("error spike", cfg, resolved)
    val p = slackPayload(m)
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(p)
    assert(root.get("text").asText.startsWith("✅ "))
    val md = root.get("blocks").get(0).get("text").get("text").asText
    assert(md.startsWith("*✅ Alert for"), md) // no <|> span without a link
    assert(md.contains("The alert has been resolved."), md)
    // mrkdwn escaping: a title with < > & cannot open a phantom span
    val tricky = Message("a <b> & c", "body", Alerts.ALERT, w,
      w.plusSeconds(300), "")
    val md2 = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(slackPayload(tricky))
      .get("blocks").get(0).get("text").get("text").asText
    assert(md2.startsWith("*a &lt;b&gt; &amp; c*"), md2)
  }
}
