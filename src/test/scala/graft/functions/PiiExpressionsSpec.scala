package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** scrub_pii: rule-by-rule redaction (email, IPv4, Luhn-gated cards,
  * E.164-envelope phones), rule-order interactions, non-matches that
  * MUST survive, idempotency, interpreted == codegen. */
class PiiExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("PiiExpressionsSpec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    PiiExpressions.register(s)
    s
  }

  private def scrub(t: String): String =
    spark.sql(s"select scrub_pii('${t.replace("'", "''")}')").head().getString(0)

  test("emails: plain, dotted, plus-tagged; non-emails survive") {
    assert(scrub("mail me at a.b+tag@sub.example.co please")
      === "mail me at <EMAIL> please")
    assert(scrub("x@y.io and w_z%q@d-1.org") === "<EMAIL> and <EMAIL>")
    assert(scrub("not an email: a@b (no tld), @lone, a at b.com")
      === "not an email: a@b (no tld), @lone, a at b.com")
  }

  test("ipv4: valid octets only, never inside longer runs") {
    assert(scrub("server 192.168.100.250 responded") === "server <IP> responded")
    assert(scrub("octet overflow 256.1.1.1 is not an ip")
      === "octet overflow 256.1.1.1 is not an ip")
    assert(scrub("version 1.2.3.4.5 is not an ip") === "version 1.2.3.4.5 is not an ip")
    assert(scrub("edge 0.0.0.0 and 255.255.255.255 both are")
      === "edge <IP> and <IP> both are")
  }

  test("cards: Luhn decides; grouped and bare forms; non-Luhn lookalikes survive") {
    assert(scrub("pay 4242 4242 4242 4242 now") === "pay <CARD> now")
    assert(scrub("pay 4242-4242-4242-4242 now") === "pay <CARD> now")
    assert(scrub("pay 4242424242424242 now") === "pay <CARD> now")
    // 16 digits, Luhn-INVALID: not a card; too many digits for a phone
    assert(PiiKit.luhnValid("4242424242424242"))
    assert(!PiiKit.luhnValid("1234567890123456"))
    assert(scrub("id 1234567890123456 stays") === "id 1234567890123456 stays")
    // a 19-digit Luhn number (maximal PAN length)
    assert(scrub("pan 6011111111111111110 x") === "pan <CARD> x")
  }

  test("phones: E.164 envelope 10-15 digits; dates and short ids survive") {
    assert(scrub("call +1 555-010-1234 today") === "call <PHONE> today")
    assert(scrub("call (020) 7946-0958-99 today") === "call <PHONE> today",
      "parenthesised area code")
    assert(scrub("call 555.010.1234 today") === "call <PHONE> today")
    assert(scrub("date 2024-06-01 is not a phone") === "date 2024-06-01 is not a phone")
    assert(scrub("order 12-34 id 123-4567 stay") === "order 12-34 id 123-4567 stay",
      "under 10 total digits never matches")
  }

  test("rule order: IP claimed before phone could eat its digit runs") {
    // 12 digits dotted — inside the phone envelope, but it IS an ip
    assert(scrub("host 192.168.100.250.") === "host <IP>.")
    // card claimed before phone (16 > 15 digits would skip phone anyway;
    // a 13-digit Luhn run is inside BOTH envelopes — card must win)
    assert(PiiKit.luhnValid("4222222222222"))
    assert(scrub("n 4222222222222 m") === "n <CARD> m")
  }

  test("idempotency, null, empty, and interpreted == codegen") {
    val hostile = "a@b.co 10.0.0.1 4242 4242 4242 4242 +44 20 7946 0958"
    val once = scrub(hostile)
    assert(once === "<EMAIL> <IP> <CARD> <PHONE>")
    assert(scrub(once) === once, "placeholders carry no digits or @ — idempotent")
    assert(scrub("") === "")
    assert(spark.sql("select scrub_pii(cast(null as string))").head().isNullAt(0))
    val df = spark.range(0, 100).toDF("id").selectExpr(
      """concat('user', cast(id as string), '@ex', cast(id % 5 as string),
               '.org wrote from 10.1.', cast(id % 200 as string), '.7') as t""")
    val gen = df.selectExpr("scrub_pii(t) as s").collect().map(_.getString(0))
    val interp = df.collect().map(r => PiiKit.scrubJava(r.getString(0)))
    assert(gen.toSeq === interp.toSeq)
    assert(gen.forall(_ === "<EMAIL> wrote from <IP>"))
  }
}
