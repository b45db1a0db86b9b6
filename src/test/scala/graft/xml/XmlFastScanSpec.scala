package graft.xml

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** [[XmlFastScan]] must be bit-equivalent to the StAX path on everything it
  * accepts, and must Bail (never diverge) on everything else. */
class XmlFastScanSpec extends AnyFunSuite {

  private def fast(xml: String, patterns: Seq[String],
      needValue: Boolean = true): AnyRef =
    XmlFastScan.children(UTF8String.fromString(xml), patterns,
      "spec:" + patterns.mkString(",") + needValue, fromRoot = true,
      needOuter = false, needValue = needValue)

  private def stax(xml: String, patterns: Seq[String],
      needValue: Boolean = true): Seq[XmlStax.Child] =
    XmlStax.children(xml, patterns, fromRoot = true,
      "specstax:" + patterns.mkString(",") + needValue, needOuter = false,
      needValue = needValue)

  private def rows(a: AnyRef): Seq[(String, String, Map[String, String])] = {
    val arr = a.asInstanceOf[GenericArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.array(i).asInstanceOf[InternalRow]
      val m = r.getMap(3)
      val attrs = (0 until m.numElements()).map { j =>
        (m.keyArray.getUTF8String(j).toString,
          m.valueArray.getUTF8String(j).toString)
      }.toMap
      (r.getUTF8String(0).toString, r.getUTF8String(2).toString, attrs)
    }
  }

  private def staxRows(cs: Seq[XmlStax.Child])
      : Seq[(String, String, Map[String, String])] =
    cs.map(c => (c.tag, c.value, c.attrs.toMap))

  /** Fast result must exist and agree with StAX. */
  private def agreeFast(xml: String, patterns: Seq[String]): Unit = {
    val f = fast(xml, patterns)
    assert(f ne XmlFastScan.Bail, s"unexpected Bail for: $xml")
    assert(rows(f) == staxRows(stax(xml, patterns)), s"diverged on: $xml")
  }

  /** Fast path must refuse (the StAX path then decides). */
  private def mustBail(xml: String, patterns: Seq[String]): Unit =
    assert(fast(xml, patterns) eq XmlFastScan.Bail, s"no Bail for: $xml")

  test("x4 alternatives shape is handled and agrees with StAX") {
    agreeFast("<m><id>4011</id><v>17.00</v><v>20531.56</v>" +
      "<item1>1</item1></m>", Seq("item1", "item2"))
    agreeFast("<m><id>4012</id><v>36.00</v><v>48777.31</v>" +
      "<item2>2</item2></m>", Seq("item1", "item2"))
  }

  test("attributes, self-closing, empty values, whitespace, globs") {
    agreeFast("<r><a x='1' y=\"2\">v</a><b/><c></c></r>", Seq("a", "b", "c"))
    agreeFast("<r>\n  <item ln='1'>7</item>\n  <item ln='2'>9</item>\n</r>",
      Seq("item"))
    agreeFast("<r><q_A>1</q_A><zz>2</zz><q_B>3</q_B></r>", Seq("q_*"))
    agreeFast("<r><a>1</a></r>", Seq.empty) // empty patterns = all
    agreeFast("<root/>", Seq("a"))
    agreeFast("<r><skip><deep><deeper x='9'>t</deeper></deep></skip>" +
      "<a>1</a></r>", Seq("a")) // deep unmatched subtrees skip cleanly
  }

  test("bails on everything outside the proven subset") {
    mustBail("<?xml version='1.0'?><r><a>1</a></r>", Seq("a")) // prolog
    mustBail("<!DOCTYPE r [<!ENTITY e 'x'>]><r><a>&e;</a></r>", Seq("a"))
    mustBail("<r><a>one &amp; two</a></r>", Seq("a")) // entity in value
    mustBail("<r><a x='&lt;'>v</a></r>", Seq("a")) // entity in attr
    mustBail("<r><a><nested>1</nested></a></r>", Seq("a")) // non-leaf match
    mustBail("<r><a><![CDATA[v]]></a></r>", Seq("a")) // CDATA
    mustBail("<r><!-- c --><a>1</a></r>", Seq("a")) // comment
    mustBail("<ns:r><a>1</a></ns:r>", Seq("a")) // namespaces
    mustBail("<r xmlns='u'><a>1</a></r>", Seq("a"))
    mustBail("<r><ns:a>1</ns:a></r>", Seq("a"))
    mustBail("<rec><id>", Seq("id")) // truncated (x10 shape)
    mustBail("<r><a>1</b></r>", Seq("a")) // mismatched end tag
    mustBail("<r><x><a>1</a></z></r>", Seq("a")) // bad nesting in skip
    mustBail("<r><a>1</a>", Seq("a")) // unclosed root
    mustBail("<r><a>1</a></r>trailing", Seq("a")) // garbage after root
    // '&' ANYWHERE bails — an undefined entity would null the row in StAX
    mustBail("<r><skip>&amp;</skip><a>1</a></r>", Seq("a"))
    mustBail("<r><skip x='&amp;'>t</skip><a>1</a></r>", Seq("a"))
    mustBail("<r>&amp;<a>1</a></r>", Seq("a"))
  }

  test("needValue=false (tag/attrs-only) captures empty value like StAX") {
    val f = fast("<r><a x='1'>ignored</a></r>", Seq("a"), needValue = false)
    assert(f ne XmlFastScan.Bail)
    assert(rows(f) == Seq(("a", "", Map("x" -> "1"))))
    assert(rows(f) ==
      staxRows(stax("<r><a x='1'>ignored</a></r>", Seq("a"),
        needValue = false)))
  }

  test("childrenAt fused descent: agrees with StAX; absent container is " +
      "null; second container occurrence ignored; post-container " +
      "malformation bails") {
    def fastAt(xml: String, cont: String, pats: Seq[String]): AnyRef =
      XmlFastScan.childrenAt(UTF8String.fromString(xml), cont, pats,
        "specat:" + cont + pats.mkString(","), needOuter = false,
        needValue = true)
    def staxAt(xml: String, cont: String,
        pats: Seq[String]): Seq[XmlStax.Child] =
      XmlStax.childrenAt(xml, cont, pats,
        "specatstax:" + cont + pats.mkString(","), needOuter = false,
        needValue = true)
    val doc = "<r><id>7</id><vals><q_A>1.5</q_A><zz>x</zz>" +
      "<q_B>2.5</q_B></vals><tail>t</tail></r>"
    val f = fastAt(doc, "vals", Seq("q_*"))
    assert(f ne XmlFastScan.Bail)
    assert(rows(f) == staxRows(staxAt(doc, "vals", Seq("q_*"))))
    assert(rows(f).map(_._1) == Seq("q_A", "q_B"))
    // absent container -> null (both engines)
    assert(fastAt("<r><id>7</id></r>", "vals", Seq("q_*")) == null)
    assert(staxAt("<r><id>7</id></r>", "vals", Seq("q_*")) == null)
    // only the FIRST container occurrence is descended
    val two = "<r><vals><q_A>1</q_A></vals><vals><q_B>2</q_B></vals></r>"
    assert(rows(fastAt(two, "vals", Seq("q_*"))) ==
      staxRows(staxAt(two, "vals", Seq("q_*"))))
    // a malformation AFTER the container must not be silently accepted
    assert(fastAt("<r><vals><q_A>1</q_A></vals><bad>", "vals",
      Seq("q_*")) eq XmlFastScan.Bail)
    // empty and self-closing containers
    assert(rows(fastAt("<r><vals></vals></r>", "vals", Seq("q_*"))).isEmpty)
    assert(rows(fastAt("<r><vals/></r>", "vals", Seq("q_*"))).isEmpty)
  }

  test("flatStruct randomized sweep: whenever the fast path accepts, it " +
      "equals Spark's own XmlToStructsEvaluator") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("_a1", StringType),
      StructField("s", ArrayType(StringType)),
      StructField("arr", ArrayType(StructType(Seq(
        StructField("zz", ArrayType(StringType))))))))
    val spec = XmlFastScan.FlatSpec.of(schema).get
    val evaluator = {
      val opts = Map.newBuilder[String, String]
      Bind.xmlOptions.forEach((k, v) => opts += (k -> v))
      org.apache.spark.sql.catalyst.expressions.xml.XmlToStructsEvaluator(
        opts.result(), schema, "_corrupt_record", Some("UTC"),
        org.apache.spark.sql.catalyst.expressions.Literal(
          UTF8String.fromString(""), StringType))
    }
    val toScala = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToScalaConverter(schema)
    val rnd = new scala.util.Random(4242)
    var accepted = 0
    (1 to 600).foreach { _ =>
      val attr = rnd.nextInt(3) match {
        case 0 => ""
        case 1 => s" a1='${rnd.nextInt(100)}'"
        case _ => s" a1=\"w${rnd.nextInt(10)}\""
      }
      val kids = (0 until rnd.nextInt(5)).map { _ =>
        rnd.nextInt(6) match {
          case 0 => s"<s>${rnd.nextInt(1000)}</s>"
          case 1 => s"<s>word${rnd.nextInt(10)}</s>"
          case 2 =>
            val zz = (0 until rnd.nextInt(3))
              .map(_ => s"<zz>${rnd.nextInt(50)}</zz>").mkString
            s"<arr>$zz</arr>"
          case 3 => s"<junk><deep>${rnd.nextInt(9)}</deep></junk>"
          case 4 => "<arr/>"
          case _ => s"<s>mixed &amp; entity</s>" // outside the subset
        }
      }.mkString
      val doc = s"<root$attr>$kids</root>"
      val fast = XmlFastScan.flatStruct(UTF8String.fromString(doc), spec)
      if (!(fast eq XmlFastScan.Bail)) {
        accepted += 1
        val viaSpark = evaluator.evaluate(UTF8String.fromString(doc))
        assert(toScala(fast) == toScala(viaSpark), s"diverged on: $doc")
      }
    }
    assert(accepted > 150) // the fast subset must actually trigger
  }

  test("randomized equivalence sweep: fast accepts => identical to StAX") {
    val rnd = new scala.util.Random(42)
    val tags = Seq("aa", "bb", "cc", "item1", "item2")
    var accepted = 0
    (1 to 500).foreach { _ =>
      val kids = (1 to rnd.nextInt(5)).map { _ =>
        val t = tags(rnd.nextInt(tags.length))
        val attr = if (rnd.nextBoolean()) s" k='${rnd.nextInt(10)}'" else ""
        val content = rnd.nextInt(4) match {
          case 0 => ""
          case 1 => rnd.nextInt(1000).toString
          case 2 => s"<inner>${rnd.nextInt(10)}</inner>"
          case _ => "text value"
        }
        if (content.isEmpty && rnd.nextBoolean()) s"<$t$attr/>"
        else s"<$t$attr>$content</$t>"
      }.mkString
      val doc = s"<root>$kids</root>"
      val pats = Seq(tags(rnd.nextInt(tags.length)), "item*")
      val f = fast(doc, pats)
      if (!(f eq XmlFastScan.Bail)) {
        accepted += 1
        assert(rows(f) == staxRows(stax(doc, pats)), s"diverged on: $doc")
      }
    }
    assert(accepted > 100) // the fast subset must actually trigger
  }
}
