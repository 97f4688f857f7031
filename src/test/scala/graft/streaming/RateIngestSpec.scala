package graft.streaming

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke test for the unbounded-source (rate) ingest demo — the
  * Kafka-shape parity row. `rate-micro-batch` batches are a pure function
  * of (startTimestamp, rowsPerBatch, batch id), so closed windows have
  * exactly predictable contents. */
class RateIngestSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("rate-source pipeline emits exact closed windows through watermark + tumble") {
    val out = RateIngest.runDemo(spark, "rate_ingest_smoke", batches = 4)
      .collect()
    assert(out.nonEmpty, "no closed windows emitted after 4 micro-batches")

    // every emitted row belongs to a synthesized user and a 10s-aligned window
    out.foreach { r =>
      val uid = r.getLong(r.fieldIndex("user_id"))
      assert(uid >= 0 && uid < 8, s"user_id $uid outside synthesized range")
      val start = r.getTimestamp(r.fieldIndex("win_start")).getTime
      assert(start % 10000 == 0, s"window start $start not 10s-aligned")
    }

    // a CLOSED window covers 10s at 250ms step = 40 events = 5 per user;
    // append mode only emits closed windows, so every row says 5
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_events")) == 5L,
        s"closed window should hold exactly 5 events per user, got $r")
    }
  }
}
