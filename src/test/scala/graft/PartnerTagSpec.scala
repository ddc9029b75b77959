package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Partner-application tagging — mirrors the reference's 4 application-ID
  * tests (tests/test_core.py:149-261), which monkeypatch `connect` and
  * assert every connection carries the tag. Our observable is the job
  * group every Spark job carries; a listener plays the monkeypatch. */
class PartnerTagSpec extends SparkSpec {

  private def jobGroupsDuring[T](body: => T): Seq[String] = {
    val groups = mutable.Buffer.empty[String]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val g = js.properties.getProperty("spark.jobGroup.id")
        if (g != null) groups.synchronized { groups += g }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try { body; Thread.sleep(500) } // let the listener bus drain
    finally spark.sparkContext.removeSparkListener(listener)
    groups.toSeq
  }

  test("default tag on every job (test_core.py:149-170)") {
    val gs = jobGroupsDuring {
      Graft.withPartnerTag(spark) {
        Graft.read(spark, sfDir, "SELECT * FROM region").count()
      }
    }
    assert(gs.nonEmpty &&
      gs.forall(_ == s"graft.partner=${Graft.DefaultPartner}"), gs)
  }

  test("config override (test_core.py:173-196)") {
    spark.conf.set(Graft.PartnerConfKey, "acme")
    try {
      val gs = jobGroupsDuring {
        Graft.withPartnerTag(spark) {
          Graft.read(spark, sfDir, "SELECT * FROM region").count()
        }
      }
      assert(gs.nonEmpty && gs.forall(_ == "graft.partner=acme"), gs)
    } finally spark.conf.unset(Graft.PartnerConfKey)
  }

  test("explicit beats config beats default (test_core.py:237-261)") {
    spark.conf.set(Graft.PartnerConfKey, "acme")
    try {
      assert(Graft.partnerTag(spark, Some("explicit")) == "explicit")
      assert(Graft.partnerTag(spark) == "acme")
    } finally spark.conf.unset(Graft.PartnerConfKey)
    assert(Graft.partnerTag(spark) == "graft")
  }
}
