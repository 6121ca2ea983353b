package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {

  private def fixture(n: Int): Seq[(Long, String, Int)] = {
    val rnd = new scala.util.Random(7)
    val good = Vector("clear", "prose", "well", "written", "useful", "facts")
    val bad = Vector("spam", "click", "buy", "now", "cheap", "deal")
    (1 to n).map { i =>
      val pos = i % 2 == 0
      val pool = if (pos) good else bad
      val text = Seq.fill(8)(pool(rnd.nextInt(pool.size))).mkString(" ")
      (i.toLong, text, if (pos) 1 else 0)
    }
  }

  test("train: distributed model is bit-identical to the local twin") {
    import spark.implicits._
    val rows = fixture(40)
    val df = rows.toDF("doc_id", "text", "label").repartition(7)
    val dist = Classifier.train(df, "text", "label", dim = 256, epochs = 3, lr = 2.0)
    val local = Classifier.trainLocal(
      rows.map { case (_, t, y) => (t.split(" ").toSeq, y.toDouble) },
      dim = 256, epochs = 3, lr = 2.0)
    assert(dist.weights.toSeq == local.weights.toSeq, "weights must match exactly")
    assert(dist.bias == local.bias)
    assert(dist.epochLoss.toSeq == local.epochLoss.toSeq)
    assert(dist.epochAccuracy.toSeq == local.epochAccuracy.toSeq)
  }

  test("train: same bits under any partitioning") {
    import spark.implicits._
    val rows = fixture(60)
    val a = Classifier.train(rows.toDF("doc_id", "text", "label").repartition(1),
      "text", "label", dim = 512, epochs = 3, lr = 2.0)
    val b = Classifier.train(rows.toDF("doc_id", "text", "label").repartition(11),
      "text", "label", dim = 512, epochs = 3, lr = 2.0)
    assert(a.weights.toSeq == b.weights.toSeq)
    assert(a.bias == b.bias && a.epochLoss.toSeq == b.epochLoss.toSeq)
  }

  test("train: separable corpus learns — loss falls, accuracy rises to 1") {
    import spark.implicits._
    val df = fixture(80).toDF("doc_id", "text", "label")
    val m = Classifier.train(df, "text", "label", dim = 256, epochs = 6, lr = 4.0)
    assert(m.epochLoss.last < m.epochLoss.head, "loss must decrease")
    assert(m.epochAccuracy.last == 1.0, "disjoint vocabularies are separable")
  }

  test("score: trained model separates, empty doc scores null/keep=false") {
    import spark.implicits._
    val rows = fixture(80)
    val df = rows.toDF("doc_id", "text", "label")
    val m = Classifier.train(df, "text", "label", dim = 256, epochs = 8, lr = 4.0)
    val scored = Classifier.score(
      (rows :+ ((999L, "", 0))).toDF("doc_id", "text", "label"),
      "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), r.getBoolean(2)))).toMap
    rows.foreach { case (id, _, y) =>
      val (p, keep) = scored(id)
      assert(p.isDefined && keep == (y == 1),
        s"doc $id label $y scored $p keep $keep")
    }
    assert(scored(999L)._1.isEmpty && !scored(999L)._2)
  }
}
