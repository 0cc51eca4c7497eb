package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PiiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows = Seq(
    (1L, "reach me at jane.doe+spam@mail.example.org or 555-0199 thanks"),
    (2L, "server lives on 10.2.33.4 behind the lb"),
    (3L, "no pii here just words about spark and shuffles"),
    (4L, "two mails a@b.io c.d@e-f.co one phone 555-1234 ip 10.0.0.1"))
    .toDF("id", "text")

  test("piiCount counts each family independently") {
    val got = rows.select(col("id"),
      Pii.piiCount(col("text"), "email").as("e"),
      Pii.piiCount(col("text"), "phone").as("p"),
      Pii.piiCount(col("text"), "ip").as("i"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3)))
      .toMap
    assert(got(1L) === ((1, 1, 0)))
    assert(got(2L) === ((0, 0, 1)))
    assert(got(3L) === ((0, 0, 0)))
    assert(got(4L) === ((2, 1, 1)))
  }

  test("redact replaces every family with its tag and nothing else") {
    val out = rows.select(col("id"), Pii.redact(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) ===
      "reach me at [EMAIL] or [PHONE] thanks")
    assert(out(2L) === "server lives on [IP] behind the lb")
    assert(out(3L) === rows.collect()(2).getString(1)) // untouched
    assert(out(4L) === "two mails [EMAIL] [EMAIL] one phone [PHONE] ip [IP]")
  }

  test("email redaction runs before the IP pass (host dots absorbed)") {
    // a host that CONTAINS a dotted quad: the email pass must consume it
    val df = Seq((1L, "mail me x@10.1.2.3.example.com ok")).toDF("id", "text")
    val out = df.select(Pii.redact(col("text"))).as[String].head()
    assert(out === "mail me [EMAIL] ok")
  }

  test("unknown family fails loudly") {
    intercept[RuntimeException](Pii.pattern("ssn"))
  }
}
