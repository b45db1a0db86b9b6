package graft.xml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's six scalar parsers as Column transforms (SURVEY.md §1.2,
  * reference Parser.cs:15-95). Input: the raw string content of an element
  * (null = element missing, "" = present but empty). ANSI-mode safe:
  * null-propagating parsers use try_cast, the strict parser keeps the
  * ANSI cast so bad input errors like Convert.ToInt32 does.
  */
object XmlValues {

  /** `Int` (Parser.cs:26-32): missing -> 0; present-but-unparseable (incl.
    * empty) -> error, matching Convert.ToInt32 throwing. */
  def intStrict(c: Column): Column =
    when(c.isNull, lit(0)).otherwise(trim(c).cast("int"))

  /** `NullInt` (Parser.cs:58-67): empty/missing -> null; unparseable -> null
    * (deviation: reference throws on garbage — [[nullIntStrict]] restores
    * that; this default is the distributed-friendly posture where one bad
    * record must not kill a 100 TB job). */
  def nullInt(c: Column): Column = trim(c).try_cast("int")

  /** `NullInt` with full reference parity (Parser.cs:58-67): empty/missing
    * -> null, but non-empty unparseable text THROWS like Convert.ToInt32 —
    * the ANSI cast raises CAST_INVALID_INPUT. */
  def nullIntStrict(c: Column): Column =
    when(c.isNull || trim(c) === "", lit(null).cast("int"))
      .otherwise(trim(c).cast("int"))

  /** `NullBool` (Parser.cs:15-24): empty/missing -> null; "true"/"false". */
  def nullBool(c: Column): Column = trim(c).try_cast("boolean")

  /** `NullDecimal` (Parser.cs:69-84): empty/missing/unparseable -> null.
    * The reference's culture-separator quirk (Parser.cs:79) is deliberately
    * NOT applied here (SURVEY.md §7.3) — this is the sane default;
    * [[nullDecimalCulture]] restores bug-for-bug parity. */
  def nullDecimal(c: Column): Column = trim(c).try_cast(DecimalType(38, 18))

  /** `NullDecimal` with full reference parity, QUIRK INCLUDED. Parser.cs:79
    * runs `str.Replace(".", numberFormatInfo.NumberGroupSeparator)` where
    * `new NumberFormatInfo()` is invariant-culture: the group separator is
    * `","`. So every `.` becomes a THOUSANDS separator and .NET's TryParse
    * (NumberStyles.Number) strips group separators regardless of position:
    * `"123.45"` parses as `12345`, `"1.2.3"` as `123`, and an input that
    * already used `","` groups (`"1,234"`) also parses as `1234`. A LEADING
    * or TRAILING separator (`".5"`, `"5."`) makes TryParse fail -> null,
    * which the guards below reproduce. Opt-in only — use when byte-for-byte
    * agreement with reference output matters more than correct decimals. */
  def nullDecimalCulture(c: Column): Column = {
    val t = trim(c)
    val sep = t.rlike("^[^.,].*[.,]") && !t.rlike("[.,]$") // no lead/trail sep
    val stripped = regexp_replace(t, "[.,]", "")
    when(sep, stripped.try_cast(DecimalType(38, 18)))
      .otherwise(when(t.rlike("[.,]"), lit(null).cast(DecimalType(38, 18)))
        .otherwise(t.try_cast(DecimalType(38, 18))))
  }

  /** `NullDate` (Parser.cs:86-95): empty/missing -> null. */
  def nullDate(c: Column): Column = try_to_timestamp(trim(c))

  /** `String` (Parser.cs:34-56): identity — mixed-content concatenation is
    * handled upstream (native source serialization or XmlStax value). */
  def str(c: Column): Column = c
}
