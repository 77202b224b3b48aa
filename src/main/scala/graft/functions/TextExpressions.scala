package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, first-occurrence order —
  * the unit of Jaccard/MinHash dedup.
  *
  * Why a custom Catalyst expression: the HOF form
  * (`array_distinct(transform(sequence(...), i => concat_ws(...)))`) is
  * interpreted — per-token lambda dispatch dominates t01/d02/d03 and its
  * megamorphic call sites give multi-× run-to-run swings. This expression
  * is one tight generated loop over the token array (UTF8String concat +
  * LinkedHashSet) and stays inside whole-stage codegen. Same output as the
  * HOF form: distinct space-joined n-grams, empty array when there are
  * fewer than n tokens.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  @transient private lazy val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= len) {
      var s = arr.getUTF8String(i)
      var j = 1
      while (j < n) { s = UTF8String.concatWs(space, s, arr.getUTF8String(i + j)); j += 1 }
      set.add(s)
      i += 1
    }
    new GenericArrayData(set.toArray.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", space, classOf[UTF8String].getName)
    val utf8 = classOf[UTF8String].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len")
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      s"""
         |int $len = $a.numElements();
         |if ($len < $n) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  java.util.LinkedHashSet<$utf8> $set = new java.util.LinkedHashSet<$utf8>();
         |  for (int $i = 0; $i + $n <= $len; $i++) {
         |    $utf8 $s = $a.getUTF8String($i);
         |    for (int $j = 1; $j < $n; $j++) {
         |      $s = $utf8.concatWs($sepRef, $s, $a.getUTF8String($i + $j));
         |    }
         |    $set.add($s);
         |  }
         |  ${ev.value} = new $gad($set.toArray());
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}
