package graft.expr

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import java.sql.Timestamp

class ExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val df = {
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("j", IntegerType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("t", TimestampType), StructField("b", BooleanType),
      StructField("nullS", StringType), StructField("nullI", IntegerType)))
    spark.createDataFrame(
      java.util.List.of(
        Row(7, 2, 2.5, "hello", Timestamp.valueOf("2020-01-31 10:30:00"),
            true, null, null)),
      schema)
  }

  def eval(e: String, vars: Map[String, Any] = Map.empty): Any =
    df.select(Compiler.compile(e, df.schema, vars).as("v")).head.get(0)

  test("arithmetic and precedence") {
    assert(eval("1 + 2 * 3") == 7)
    assert(eval("(1 + 2) * 3") == 9)
    assert(eval("10 % 3") == 1)
    assert(eval("2 * i - j") == 12)
  }

  test("integer division is integral (C semantics), float division is not") {
    assert(eval("7 / 2") == 3)
    assert(eval("[i] / [j]") == 3)
    assert(eval("7.0 / 2") == 3.5)
    assert(eval("[d] / 2") == 1.25)
  }

  test("string + is concatenation") {
    assert(eval("\"a\" + \"b\"") == "ab")
    assert(eval("[s] + \"!\"") == "hello!")
    assert(eval("UPPER([s]) + \"_\" + \"x\"") == "HELLO_x")
  }

  test("comparison, logical ops") {
    assert(eval("i > j") == true)
    assert(eval("i == 7 && j == 2") == true)
    assert(eval("i == 7 && j == 3") == false)
    assert(eval("i == 1 || j == 2") == true)
    assert(eval("!(i == 1)") == true)
    assert(eval("i != j") == true)
  }

  test("IIF is the ?: ternary (reference: expression_translator.py:59)") {
    assert(eval("IIF(i > j, \"yes\", \"no\")") == "yes")
    assert(eval("IIF(i < j, 1, 0)") == 0)
    assert(eval("IIF(ISNULL(nullI), -1, nullI)") == -1)
  }

  test("nested ternaries (the reference's regex translator breaks here)") {
    assert(eval("i > 1 ? (j > 1 ? \"both\" : \"only-i\") : \"none\"") == "both")
    assert(eval("i > 100 ? \"big\" : i > 5 ? \"mid\" : \"small\"") == "mid")
    assert(eval("i > 100 ? \"big\" : i > 6 ? j > 100 ? \"x\" : \"y\" : \"small\"") == "y")
  }

  test("ISNULL is a boolean test, not coalesce") {
    assert(eval("ISNULL(nullS)") == true)
    assert(eval("ISNULL(s)") == false)
    assert(eval("ISNULL([nullI]) ? -1 : [nullI]") == -1)
    assert(eval("!ISNULL([s])") == true)
    assert(eval("REPLACENULL(nullS, \"dflt\")") == "dflt")
    assert(eval("REPLACENULL(s, \"dflt\")") == "hello")
  }

  test("FINDSTRING arg order and occurrence counting") {
    assert(eval("FINDSTRING(\"abcabc\", \"bc\", 1)") == 2)
    assert(eval("FINDSTRING(\"abcabc\", \"bc\", 2)") == 5)
    assert(eval("FINDSTRING(\"abcabc\", \"bc\", 3)") == 0)
    assert(eval("FINDSTRING(\"abcabc\", \"zz\", 1)") == 0)
  }

  test("SUBSTRING is 1-based; LEFT/RIGHT/LEN/REVERSE/REPLICATE") {
    assert(eval("SUBSTRING(\"hello\", 2, 3)") == "ell")
    assert(eval("LEFT(\"hello\", 2)") == "he")
    assert(eval("RIGHT(\"hello\", 2)") == "lo")
    assert(eval("LEN(\"hello\")") == 5)
    assert(eval("REVERSE(\"abc\")") == "cba")
    assert(eval("REPLICATE(\"ab\", 3)") == "ababab")
  }

  test("REPLACE is literal (not regex)") {
    assert(eval("REPLACE(\"a.b.c\", \".\", \"-\")") == "a-b-c")
  }

  test("TOKEN/TOKENCOUNT skip empty tokens") {
    assert(eval("TOKEN(\"a,b;;c\", \",;\", 2)") == "b")
    assert(eval("TOKEN(\"a,b;;c\", \",;\", 3)") == "c")
    assert(eval("TOKEN(\"a,b;;c\", \",;\", 9)") == null)
    assert(eval("TOKENCOUNT(\"a,b;;c\", \",;\")") == 3)
  }

  test("HEX / CODEPOINT / math functions") {
    assert(eval("HEX(255)") == "FF")
    assert(eval("CODEPOINT(\"A\")") == 65)
    assert(eval("POWER(2, 10)") == 1024.0)
    assert(eval("ROUND(2.567, 2)") == 2.57)
    assert(eval("ABS(0 - 5)") == 5)
    assert(eval("SQUARE(3)") == 9)
    assert(eval("SIGN(0 - 9)") == -1.0)
    assert(eval("FLOOR(2.9)") == 2L)
    assert(eval("CEILING(2.1)") == 3L)
  }

  test("DT casts") {
    assert(eval("(DT_I4)\"42\"") == 42)
    assert(eval("(DT_I8)i") == 7L)
    assert(eval("(DT_R8)\"2.5\"") == 2.5)
    assert(eval("(DT_STR, 10, 1252)i") == "7")
    assert(eval("(DT_BOOL)1") == true)
    assert(eval("(DT_NUMERIC, 10, 2)d") == new java.math.BigDecimal("2.50"))
    assert(eval("(DT_I4)(i + j)") == 9)
    // cast binds tighter than binary +: (DT_I8)i + j is (cast i) + j
    assert(eval("(DT_I8)i + j") == 9L)
  }

  test("typed NULL(DT_I4)") {
    assert(eval("NULL(DT_I4)") == null)
    assert(eval("REPLACENULL(NULL(DT_I4), 5)") == 5)
  }

  test("date functions with T-SQL boundary semantics") {
    assert(eval("YEAR(t)") == 2020)
    assert(eval("MONTH(t)") == 1)
    assert(eval("DAY(t)") == 31)
    assert(eval("DATEPART(\"hh\", t)") == 10)
    // calendar-aware month add: Jan 31 + 1 month = Feb 29 (2020 is leap)
    assert(eval("DATEADD(\"mm\", 1, t)") == Timestamp.valueOf("2020-02-29 10:30:00"))
    assert(eval("DATEADD(\"dd\", 1, t)") == Timestamp.valueOf("2020-02-01 10:30:00"))
    assert(eval("DATEADD(\"hh\", 14, t)") == Timestamp.valueOf("2020-02-01 00:30:00"))
    // boundary counting: Jan 31 23:00 → Feb 01 01:00 is 1 day, 1 month
    assert(eval("DATEDIFF(\"dd\", t, (DT_DBTIMESTAMP)\"2020-02-01 01:00:00\")") == 1L)
    assert(eval("DATEDIFF(\"mm\", t, (DT_DBTIMESTAMP)\"2020-02-01 01:00:00\")") == 1L)
    assert(eval("DATEDIFF(\"yyyy\", t, (DT_DBTIMESTAMP)\"2021-01-01 00:00:00\")") == 1L)
    assert(eval("DATEDIFF(\"hh\", t, (DT_DBTIMESTAMP)\"2020-01-31 11:05:00\")") == 1L)
    assert(eval("DATEDIFF(\"ss\", t, (DT_DBTIMESTAMP)\"2020-01-31 10:31:30\")") == 90L)
  }

  test("variables @[User::X]") {
    assert(eval("@[User::Threshold] + 1", Map("Threshold" -> 10)) == 11)
    assert(eval("@[User::Name] + \"!\"", Map("Name" -> "bob")) == "bob!")
    assert(eval("i > @Threshold", Map("Threshold" -> 10)) == false)
    intercept[ExprParseException](eval("@[User::Missing]"))
  }

  test("column reference forms") {
    assert(eval("[s]") == "hello")
    assert(eval("s") == "hello")
    assert(eval("[SomeComponent].[s]") == "hello")
    assert(eval("[SomeComponent].s") == "hello")
    assert(eval("#{Pkg\\Comp.Outputs[Out].Columns[s]}") == "hello")
  }

  test("bitwise and shift operators") {
    assert(eval("5 & 3") == 1)
    assert(eval("5 | 3") == 7)
    assert(eval("5 ^ 3") == 6)
    assert(eval("1 << 4") == 16)
    assert(eval("16 >> 2") == 4)
    assert(eval("~0") == -1)
  }

  test("parse errors are reported, not silently mistranslated") {
    intercept[ExprParseException](eval("1 +"))
    intercept[ExprParseException](eval("FINDSTRING(\"a\")"))
    intercept[ExprParseException](eval("NOSUCHFN(1)"))
    intercept[ExprParseException](eval("\"unterminated"))
    intercept[ExprParseException](eval("a ? b"))
  }

  test("fixture expressions from Sample_Medium_Package.dtsx") {
    // Sample_Medium_Package.dtsx:328 — checksum derived column
    val cs = spark.createDataFrame(
      java.util.List.of(Row(3, 17, 5)),
      StructType(Seq(StructField("CountryID", IntegerType),
        StructField("CategoryID", IntegerType),
        StructField("LocalCategoryID", IntegerType))))
    val v = cs.select(Compiler.compile(
      "(DT_I4)([CountryID] + [CategoryID] + [LocalCategoryID])", cs.schema).as("v"))
      .head.get(0)
    assert(v == 25)
    // :368 — ISNULL-as-bool null patching
    val np = spark.createDataFrame(
      java.util.List.of(Row(null), Row(java.lang.Byte.valueOf(1.toByte))),
      StructType(Seq(StructField("DeletedFlag_OLD", ByteType))))
    val got = np.select(Compiler.compile(
      "ISNULL(DeletedFlag_OLD) == TRUE ? 0 : DeletedFlag_OLD", np.schema).as("v"))
      .collect().map(_.get(0)).toSeq
    assert(got == Seq(0, 1))
    // :289 — ProcessFlag literal
    assert(eval("(1 == 1)") == true)
  }
}
